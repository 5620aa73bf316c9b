"""TPU dtype guards: TPU implements LuDecomposition only for f32/c64 and
no complex128 at all (found by the round-5 on-chip zoo sweep: DGPLVM
priors, Laplace's non-psd branch, state-space expm/parallel solves, and
the LFM kernels all failed to compile at f64/c128). These tests pin the
guard behavior and verify the reduced-precision paths stay accurate.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpy_tpu.config as cfg
from gpy_tpu.util import linalg as gl
from gpy_tpu.util.wofz import wofz, erf_complex


def test_lu_dtype_mapping(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert gl._lu_dtype(jnp.float64) == jnp.float32
    assert gl._lu_dtype(jnp.complex128) == jnp.complex64
    assert gl._lu_dtype(jnp.float32) == jnp.float32
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert gl._lu_dtype(jnp.float64) == jnp.float64


def test_complex_dtype_backend_switch(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    assert cfg.complex_dtype() == jnp.complex64
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert cfg.complex_dtype() == jnp.complex128


def test_safe_wrappers_match_unguarded_on_cpu():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((6, 6)) + 6 * np.eye(6)
    b = rng.standard_normal((6, 2))
    np.testing.assert_allclose(gl.solve_lu_safe(jnp.asarray(A), jnp.asarray(b)),
                               np.linalg.solve(A, b), rtol=1e-10)
    s, ld = gl.slogdet_lu_safe(jnp.asarray(A))
    s0, ld0 = np.linalg.slogdet(A)
    assert float(s) == pytest.approx(s0)
    assert float(ld) == pytest.approx(ld0, rel=1e-10)
    import scipy.linalg
    M = 0.3 * rng.standard_normal((5, 5))
    np.testing.assert_allclose(gl.expm_safe(jnp.asarray(M)),
                               scipy.linalg.expm(M), rtol=1e-8)


def test_safe_wrappers_cast_under_tpu_backend(monkeypatch):
    """Under a mocked TPU backend the wrappers must compute through f32
    (so the program contains no f64 LU) and return f64, staying within
    f32-class accuracy."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    rng = np.random.default_rng(1)
    A = rng.standard_normal((6, 6)) + 6 * np.eye(6)
    b = rng.standard_normal((6, 1))
    out = gl.solve_lu_safe(jnp.asarray(A), jnp.asarray(b))
    assert out.dtype == jnp.float64
    np.testing.assert_allclose(out, np.linalg.solve(A, b), rtol=2e-5)
    s, ld = gl.slogdet_lu_safe(jnp.asarray(A))
    assert ld.dtype == jnp.float64
    assert float(ld) == pytest.approx(np.linalg.slogdet(A)[1], rel=1e-4)


def test_wofz_complex64_accuracy(monkeypatch):
    """The Weideman series at c64 must stay ~1e-5-accurate over the
    argument range the LFM kernels use (|z| up to ~30, both half-planes)."""
    rng = np.random.default_rng(2)
    # |z| kept moderate: the lower-half-plane reflection 2 e^{-z^2} - w(-z)
    # overflows for large |z| in any precision (kernels pre-group via erfcx)
    z = (rng.standard_normal(200) * 3) + 1j * (rng.standard_normal(200) * 3)
    ref = np.asarray(wofz(jnp.asarray(z, dtype=jnp.complex128)))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    got = np.asarray(wofz(jnp.asarray(z)))
    assert got.dtype == np.complex64
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=1e-5)
    ref_e = np.asarray(erf_complex(jnp.asarray(z / 4, dtype=jnp.complex128)))
    got_e = np.asarray(erf_complex(jnp.asarray(z / 4)))
    np.testing.assert_allclose(got_e, ref_e, rtol=2e-3, atol=1e-4)


def test_eq_ode2_gram_c64_close_to_c128(monkeypatch):
    """EQ_ODE2 K under the c64 (TPU) path vs the c128 reference — and the
    c64 program must contain no complex128 intermediates (promotion
    audit: jax raises on mixed c64/f64 only through result dtype)."""
    from gpy_tpu.kern.eq_ode2 import EQ_ODE2

    k = EQ_ODE2(2, output_dim=2, rank=2)
    t = np.linspace(0.1, 3.0, 12)
    X = np.c_[t, np.r_[np.zeros(6), np.ones(6)]]
    K_ref = np.asarray(k.K(jnp.asarray(X)))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    K_c64 = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K_c64, K_ref, rtol=5e-4, atol=5e-5)

    # promotion audit: trace the output-output block under the mocked TPU
    # backend and assert no c128 appears anywhere in the jaxpr (K() itself
    # needs concrete index columns, so trace _Kff on the time axis)
    idx = jnp.asarray(np.r_[np.zeros(6, int), np.ones(6, int)])
    jaxpr = jax.make_jaxpr(
        lambda tt: k._Kff(tt, idx, tt, idx))(jnp.asarray(t))
    txt = str(jaxpr)
    assert "c128" not in txt and "complex128" not in txt, (
        "complex128 leaked back into the EQ_ODE2 trace under TPU backend")


def test_state_space_trace_has_no_f64_lu(monkeypatch):
    """The state-space objective under the mocked TPU backend must not
    contain an f64 LU (TPU would refuse to compile it)."""
    from gpy_tpu.models import StateSpace
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(3)
    X = np.sort(rng.random(50)).reshape(-1, 1) * 5
    Y = np.sin(X) + 0.1 * rng.standard_normal((50, 1))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    m = StateSpace(X, Y, kernel=gk.sde_Matern32(1) + gk.sde_Exponential(1))
    flat = jnp.asarray(m.get_flat_raw())
    jaxpr = jax.make_jaxpr(m._flat_objective)(flat)

    def walk(jxp, out):
        for eqn in jxp.eqns:
            if eqn.primitive.name == "lu":
                out.append(eqn.invars[0].aval.dtype)
            for v in eqn.params.values():
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    walk(inner, out)
                if isinstance(v, (list, tuple)):
                    for vi in v:
                        inner = getattr(vi, "jaxpr", None)
                        if inner is not None:
                            walk(inner, out)
        return out

    lus = walk(jaxpr.jaxpr, [])
    assert lus, "expected the guard-cast f32 LU to appear in the trace"
    assert all(dt != jnp.float64 for dt in lus), f"f64 LU in trace: {lus}"
    # objective still finite and correct-ish vs cpu-backend value
    v_tpu_guard = float(m.objective_function())
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    m2 = StateSpace(X, Y, kernel=gk.sde_Matern32(1) + gk.sde_Exponential(1))
    v_cpu = float(m2.objective_function())
    assert v_tpu_guard == pytest.approx(v_cpu, rel=1e-4)
