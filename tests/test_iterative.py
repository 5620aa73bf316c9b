"""Matrix-free iterative exact-GP inference (inference/iterative.py):
CG + SLQ vs dense Cholesky inference.

Oracles: predictions must match dense near-exactly (CG converges), the
NLML value within SLQ probe noise, gradients within probe noise, and the
blockwise matvec must equal the dense product exactly.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpy_tpu.models import GPRegression
from gpy_tpu.inference.iterative import (
    IterativeGaussianInference, cg_batched, _slq_logdet)
from gpy_tpu.ops.gram_matvec import gram_matvec
import gpy_tpu.kern as gk

rng = np.random.default_rng(0)


def _problem(N=400, D=3):
    X = rng.uniform(0, 10, (N, D))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    return X, Y


def test_gram_matvec_matches_dense():
    X, _ = _problem(300)
    k = gk.Matern52(3, variance=0.8, lengthscale=1.2)
    V = jnp.asarray(rng.standard_normal((300, 4)))
    noise = jnp.full(300, 0.3)
    dense = (k.K(jnp.asarray(X)) + jnp.diag(noise)) @ V
    # block not dividing N exercises the padding path
    stream = gram_matvec(k, jnp.asarray(X), V, noise=noise, block=128)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(dense), atol=1e-10)


def test_cg_solves_and_slq_logdet():
    X, _ = _problem(300)
    k = gk.RBF(3, variance=1.1, lengthscale=1.5)
    K = k.K(jnp.asarray(X)) + 0.1 * jnp.eye(300)
    B = jnp.asarray(rng.standard_normal((300, 3)))
    sol, _, _, _ = cg_batched(lambda V: K @ V, B, maxiter=120)
    np.testing.assert_allclose(np.asarray(K @ sol), np.asarray(B), atol=1e-6)
    # SLQ logdet within probe-noise tolerance of the dense value
    P = 64
    Z = jax.random.rademacher(jax.random.PRNGKey(0), (300, P), dtype=K.dtype)
    _, a, b, _ = cg_batched(lambda V: K @ V, Z, maxiter=120)
    est = float(_slq_logdet(a, b, jnp.sum(Z * Z, 0), 300, P))
    truth = float(2 * jnp.sum(jnp.log(jnp.diagonal(jnp.linalg.cholesky(K)))))
    assert est == pytest.approx(truth, rel=0.05)


def test_iterative_matches_dense_inference():
    X, Y = _problem(400)
    kd = gk.RBF(3, variance=1.2, lengthscale=1.5)
    ki = gk.RBF(3, variance=1.2, lengthscale=1.5)
    m_d = GPRegression(X, Y, kernel=kd, noise_var=0.05)
    m_i = GPRegression(X, Y, kernel=ki, noise_var=0.05,
                       inference_method=IterativeGaussianInference(
                           max_cg=80, n_probes=32, block=128, seed=0))
    ld = float(m_d.log_likelihood())
    li = float(m_i.log_likelihood())
    assert li == pytest.approx(ld, rel=0.05)  # SLQ probe noise on logdet
    gd = np.asarray(m_d._objective_and_grad(m_d.get_flat_raw())[1])
    gi = np.asarray(m_i._objective_and_grad(m_i.get_flat_raw())[1])
    assert np.abs(gd - gi).max() / np.abs(gd).max() < 0.1
    Xs = rng.uniform(0, 10, (9, 3))
    mu_d, v_d = m_d.predict(Xs)
    mu_i, v_i = m_i.predict(Xs)
    np.testing.assert_allclose(mu_i, mu_d, atol=1e-3)
    np.testing.assert_allclose(v_i, v_d, atol=1e-3)


def test_iterative_optimize_improves():
    X, Y = _problem(300)
    m = GPRegression(X, Y, noise_var=0.5,
                     inference_method=IterativeGaussianInference(
                         max_cg=60, n_probes=16, block=128, seed=0))
    f0 = float(m.objective_function())
    m.optimize(max_iters=25)
    assert float(m.objective_function()) < f0
    # posterior predictions after optimize track the data
    mu, _ = m.predict(X[:40])
    assert np.corrcoef(mu.ravel(), np.asarray(Y)[:40, 0])[0, 1] > 0.8


def test_materialized_matches_streamed():
    """The materialize-once CG path must agree with the streamed path
    (identical probes; only matmul association differs)."""
    import jax.numpy as jnp
    from gpy_tpu.inference.iterative import IterativeGaussianInference
    from gpy_tpu.models import GPRegression

    rng = np.random.default_rng(4)
    N = 700
    X = rng.random((N, 3)) * 5.0
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    vals, grads = [], []
    for mat in (True, False):
        m = GPRegression(X, Y, noise_var=0.1,
                         inference_method=IterativeGaussianInference(
                             max_cg=64, n_probes=6, block=256, materialize=mat))
        og = m._get_objgrad()
        v, g = og(m.get_flat_raw())
        vals.append(float(v))
        grads.append(np.asarray(g))
    assert vals[0] == pytest.approx(vals[1], rel=1e-6)
    # CG with fixed iteration count is trajectory-sensitive to matmul
    # association; solutions agree to solver tolerance, not machine eps
    np.testing.assert_allclose(grads[0], grads[1], rtol=1e-3, atol=1e-5)


def test_pivoted_cholesky_and_woodbury():
    from gpy_tpu.ops.pivoted_chol import (
        pivoted_cholesky, woodbury_inverse_apply, woodbury_logdet)
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(0)
    N = 300
    X = rng.random((N, 2)) * 5.0
    k = gk.RBF(2, variance=1.2, lengthscale=1.0)
    K = np.asarray(k.K(jnp.asarray(X)))
    L = np.asarray(pivoted_cholesky(k, jnp.asarray(X), 60))
    assert np.linalg.norm(K - L @ L.T) / np.linalg.norm(K) < 1e-2
    noise = 0.1 + 0.05 * rng.random(N)
    P = L @ L.T + np.diag(noise)
    pinv = woodbury_inverse_apply(jnp.asarray(L), jnp.asarray(noise))
    V = rng.standard_normal((N, 3))
    np.testing.assert_allclose(np.asarray(pinv(jnp.asarray(V))),
                               np.linalg.solve(P, V), rtol=1e-8, atol=1e-10)
    ld = float(woodbury_logdet(jnp.asarray(L), jnp.asarray(noise)))
    assert ld == pytest.approx(np.linalg.slogdet(P)[1], rel=1e-10)


def test_preconditioned_cg_inference_beats_plain_at_equal_budget():
    """BBMM pivoted-chol PCG: on a smooth kernel, 20 PCG iterations must be
    near-exact where 20 plain-CG iterations are far off (NLML + grads vs
    dense)."""
    from gpy_tpu.inference.iterative import IterativeGaussianInference
    from gpy_tpu.models import GPRegression

    rng = np.random.default_rng(1)
    N = 400
    X = rng.random((N, 2)) * 5.0
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))
    vd, gd = GPRegression(X, Y, noise_var=0.1)._get_objgrad()(
        GPRegression(X, Y, noise_var=0.1).get_flat_raw())
    outs = {}
    for rank in (60, 0):
        m = GPRegression(X, Y, noise_var=0.1,
                         inference_method=IterativeGaussianInference(
                             max_cg=20, n_probes=10, block=128,
                             precond_rank=rank, materialize=True))
        outs[rank] = m._get_objgrad()(m.get_flat_raw())
    err_p = abs(float(outs[60][0]) - float(vd))
    err_u = abs(float(outs[0][0]) - float(vd))
    assert err_p < 0.1, err_p
    assert err_p < err_u / 10
    np.testing.assert_allclose(np.asarray(outs[60][1]), np.asarray(gd),
                               rtol=0.3, atol=2.0)


def test_bf16_gram_storage_close_to_f32():
    """Opt-in bfloat16 Gram storage: documented-tradeoff knob. The bf16
    entry rounding biases the SLQ logdet; assert the bias stays within the
    documented few-percent envelope (it is NOT probe noise — same probes)."""
    from gpy_tpu.inference.iterative import IterativeGaussianInference
    from gpy_tpu.models import GPRegression

    rng = np.random.default_rng(2)
    N = 500
    X = rng.random((N, 2)) * 5.0
    Y = np.sin(X[:, :1]) + 0.3 * rng.standard_normal((N, 1))
    vals = {}
    for tag, dt in (("f32", None), ("bf16", "bfloat16")):
        m = GPRegression(X.astype(np.float32), Y.astype(np.float32), noise_var=1.0,
                         inference_method=IterativeGaussianInference(
                             max_cg=64, n_probes=8, block=128,
                             materialize=True, gram_dtype=dt))
        vals[tag] = float(m.log_likelihood())
    assert abs(vals["bf16"] - vals["f32"]) < 0.05 * abs(vals["f32"]) + 1.0


def test_fused_inference_gradient_matches_blockwise():
    """fused=True NLML gradients (custom-VJP Pallas path, interpret mode on
    CPU) must match the blockwise differentiable surrogate exactly — same
    probes, same CG, only the dK contraction implementation differs."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gpy_tpu.models import GPRegression
    from gpy_tpu.inference.iterative import IterativeGaussianInference

    rng = np.random.default_rng(0)
    N = 300
    X = (rng.random((N, 2)) * 4.0).astype(np.float32)
    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)

    def og_for(fused):
        m = GPRegression(X, Y, noise_var=0.1,
                         inference_method=IterativeGaussianInference(
                             max_cg=16, n_probes=4, block=128,
                             materialize=False, fused=fused,
                             fused_accum="exact"))
        return m, m._get_objgrad()

    mb, ogb = og_for(False)
    mf, ogf = og_for(True)
    # force the fused branch on CPU (fused_available gates on TPU backend)
    import gpy_tpu.inference.iterative as it_mod
    orig = IterativeGaussianInference._effective_fused
    try:
        IterativeGaussianInference._effective_fused = (
            lambda self, kern, N, dtype=None: self.fused)
        flat = mf.get_flat_raw()
        vb, gb = ogb(flat)
        vf, gf = ogf(flat)
    finally:
        IterativeGaussianInference._effective_fused = orig
    # the fused path computes in f32 while the blockwise path runs at the
    # model dtype (f64 on CPU) -> small CG-trajectory differences; the exact
    # cotangent parity is pinned by test_fused_diff_grads_match_dense
    np.testing.assert_allclose(float(vf), float(vb), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gb),
                               rtol=7e-2, atol=5e-3)
    # gradients must agree in direction (cos similarity)
    ca = float(np.sum(np.asarray(gf) * np.asarray(gb))
               / (np.linalg.norm(np.asarray(gf)) * np.linalg.norm(np.asarray(gb))))
    assert ca > 0.999, ca


def test_fast_grad_moment_surrogate_matches_autodiff():
    """The stored-Gram RBF moment surrogate (fast_grad) must reproduce the
    generic autodiff-rebuild gradients exactly (same quadratics, closed-form
    dK contractions; f64 store on CPU -> tight tolerance). Covers non-ARD,
    ARD, and multi-output Y."""
    from gpy_tpu.inference.iterative import IterativeGaussianInference
    from gpy_tpu.models import GPRegression
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(3)
    n = 300
    X = rng.random((n, 3)) * 5.0
    for ARD, D in ((False, 1), (True, 2)):
        Y = np.sin(X[:, :1]) + 0.05 * rng.standard_normal((n, D))
        kern = gk.RBF(3, ARD=ARD)
        kern.lengthscale = [1.1, 0.9, 1.3] if ARD else 1.2
        ms = []
        for fg in ("auto", False):
            k2 = kern.copy()
            m = GPRegression(X, Y, kernel=k2, noise_var=0.1,
                             inference_method=IterativeGaussianInference(
                                 max_cg=24, n_probes=4, block=128,
                                 materialize=True, fast_grad=fg))
            ms.append(m)
        flat = ms[0].get_flat_raw()
        v_fast, g_fast = ms[0]._get_objgrad()(flat)
        v_auto, g_auto = ms[1]._get_objgrad()(flat)
        np.testing.assert_allclose(float(v_fast), float(v_auto), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_auto),
                                   rtol=1e-6, atol=1e-9)


def test_gram_materialize_symmetric_parity():
    """The (kept, non-default) lower-triangle mirrored build is bit-equal to
    the row-strip build, incl. padding rows, noise diagonal, and bf16 cast."""
    from gpy_tpu.ops.gram_matvec import gram_materialize
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.random((700, 3)) * 5)   # 700 % 256 != 0: padding
    noise = jnp.asarray(0.1 + 0.01 * rng.random(700))
    k = gk.RBF(3, ARD=True)
    for dt in (None, "bfloat16"):
        Ks, Ps = gram_materialize(k, X, noise=noise, block=256,
                                  symmetric=True, out_dtype=dt)
        Kr, Pr = gram_materialize(k, X, noise=noise, block=256,
                                  symmetric=False, out_dtype=dt)
        assert Ps == Pr
        assert jnp.max(jnp.abs(Ks.astype(jnp.float32)
                               - Kr.astype(jnp.float32))) == 0.0
