"""Parity tests for the fused Pallas gram-matvec (ops/pallas_gram_matvec.py).

Run in Pallas interpret mode on CPU; on TPU the same code runs compiled.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.ops.pallas_gram_matvec import rbf_gram_matvec_fused


def _dense_ref(X, V, var, ls, noise):
    k = gk.RBF(X.shape[1], variance=var, ARD=np.ndim(ls) > 0)
    k.lengthscale = ls
    K = np.asarray(k.K(jnp.asarray(X)))
    K = K + np.diag(noise)
    return K @ V


@pytest.mark.parametrize("n,r", [(640, 3), (1024, 9)])
def test_fused_matches_dense(n, r):
    rng = np.random.default_rng(0)
    d = 4
    X = rng.random((n, d)).astype(np.float32) * 3.0
    V = rng.standard_normal((n, r)).astype(np.float32)
    noise = (0.1 + rng.random(n) * 0.1).astype(np.float32)
    ls = (0.5 + rng.random(d)).astype(np.float32)

    out = np.asarray(rbf_gram_matvec_fused(
        jnp.asarray(X), jnp.asarray(V), 1.7, jnp.asarray(ls),
        noise=jnp.asarray(noise), interpret=True))
    ref = _dense_ref(X, V, 1.7, ls, noise)
    assert np.max(np.abs(out - ref)) < 1e-3 * np.max(np.abs(ref)) + 1e-4


@pytest.mark.parametrize("kname", ["Matern32", "Matern52", "Exponential", "OU"])
def test_fused_stationary_family(kname):
    from gpy_tpu.ops.pallas_gram_matvec import kern_gram_matvec_fused

    rng = np.random.default_rng(4)
    n, d = 512, 3
    X = rng.random((n, d)).astype(np.float32) * 3.0
    V = rng.standard_normal((n, 2)).astype(np.float32)
    k = getattr(gk, kname)(d, variance=0.8)
    k.lengthscale = 0.9
    out = np.asarray(kern_gram_matvec_fused(
        k, jnp.asarray(X), jnp.asarray(V), interpret=True))
    ref = np.asarray(k.K(jnp.asarray(X))) @ V
    assert np.max(np.abs(out - ref)) < 1e-3 * np.max(np.abs(ref)) + 1e-3


@pytest.mark.parametrize("accum,tol", [("f32x3", 3e-4), ("fast", 3e-2)])
def test_fused_accum_variants(accum, tol):
    """Reduced-precision accumulate dots stay within their documented error
    class of the exact 6-pass path."""
    from gpy_tpu.ops.pallas_gram_matvec import stationary_gram_matvec_fused

    rng = np.random.default_rng(9)
    X = rng.random((512, 3)).astype(np.float32) * 3.0
    V = rng.standard_normal((512, 4)).astype(np.float32)
    kw = dict(variance=1.3, lengthscale=0.8, family=0, interpret=True)
    ref = np.asarray(stationary_gram_matvec_fused(
        jnp.asarray(X), jnp.asarray(V), accum="exact", **kw))
    out = np.asarray(stationary_gram_matvec_fused(
        jnp.asarray(X), jnp.asarray(V), accum=accum, **kw))
    rel = np.max(np.abs(out - ref)) / (np.max(np.abs(ref)) + 1e-30)
    assert rel < tol, rel


def test_fused_rectangular_slab():
    from gpy_tpu.ops.pallas_gram_matvec import kern_gram_matvec_fused

    rng = np.random.default_rng(6)
    Xr = rng.random((520, 3)).astype(np.float32) * 2.0
    Xc = rng.random((1030, 3)).astype(np.float32) * 2.0
    V = rng.standard_normal((1030, 5)).astype(np.float32)
    k = gk.RBF(3, variance=1.2)
    k.lengthscale = 0.8
    out = np.asarray(kern_gram_matvec_fused(
        k, jnp.asarray(Xr), jnp.asarray(V), X2=jnp.asarray(Xc), interpret=True))
    ref = np.asarray(k.K(jnp.asarray(Xr), jnp.asarray(Xc))) @ V
    assert out.shape == (520, 5)
    assert np.max(np.abs(out - ref)) < 1e-3 * np.max(np.abs(ref)) + 1e-3


def test_sharded_fused_matvec_parity(monkeypatch):
    """Row-sharded fused matvec == serial dense on the 8-device CPU mesh."""
    import jax
    import gpy_tpu.ops.pallas_gram_matvec as pgm
    from gpy_tpu.parallel import make_mesh, sharded_gram_matvec

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    monkeypatch.setattr(pgm, "fused_available", lambda k, backend=None: True)
    rng = np.random.default_rng(7)
    n = 64 * 8
    X = rng.random((n, 2)).astype(np.float32) * 3.0
    V = rng.standard_normal((n, 3)).astype(np.float32)
    noise = np.full(n, 0.25, np.float32)
    k = gk.RBF(2, variance=0.9)
    mesh = make_mesh(8)
    out = np.asarray(sharded_gram_matvec(mesh, k, jnp.asarray(X),
                                         jnp.asarray(V),
                                         noise=jnp.asarray(noise),
                                         block=64, fused=True))
    ref = (np.asarray(k.K(jnp.asarray(X))) + np.diag(noise)) @ V
    assert np.max(np.abs(out - ref)) < 1e-3 * np.max(np.abs(ref)) + 1e-3


def test_fused_vector_rhs():
    rng = np.random.default_rng(1)
    X = rng.random((512, 2)).astype(np.float32)
    v = rng.standard_normal(512).astype(np.float32)
    out = rbf_gram_matvec_fused(jnp.asarray(X), jnp.asarray(v), 1.0, 0.7,
                                interpret=True)
    assert out.shape == (512,)
    ref = _dense_ref(X, v[:, None], 1.0, 0.7, np.zeros(512, np.float32))[:, 0]
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-4 * np.max(np.abs(ref)) + 1e-5


def test_model_fused_inference_matches_blockwise(monkeypatch):
    """IterativeGaussianInference(fused=True) == blockwise path (CPU interp)."""
    from gpy_tpu.inference import iterative as it_mod
    from gpy_tpu.inference.iterative import IterativeGaussianInference
    from gpy_tpu.models import GPRegression
    import gpy_tpu.ops.pallas_gram_matvec as pgm

    monkeypatch.setattr(pgm, "fused_available", lambda k, backend=None: True)
    # iterative.py imports the symbol inside _inference_core via module attr
    rng = np.random.default_rng(2)
    n = 600
    X = rng.random((n, 2)).astype(np.float32) * 4.0
    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)

    vals = {}
    for tag, fused in (("fused", True), ("block", False)):
        # accum="exact" here: this test isolates fused-vs-blockwise path
        # parity; reduced-precision accumulates have their own error-class
        # test above, and at unconverged CG depth their trajectory shift
        # would confound the comparison
        m = GPRegression(X, Y, noise_var=0.1,
                         inference_method=IterativeGaussianInference(
                             max_cg=48, n_probes=4, block=256,
                             materialize=False, fused=fused,
                             fused_accum="exact"))
        mu, var = m.predict(X[:7])
        vals[tag] = (float(m.log_likelihood()), np.asarray(mu), np.asarray(var))
    assert abs(vals["fused"][0] - vals["block"][0]) < 1e-2 * abs(vals["block"][0]) + 1e-2
    # CG trajectories differ at the unconverged-residual level between the
    # f32 fused kernel and the f64 blockwise path — compare both against the
    # dense exact posterior instead of against each other
    md = GPRegression(X, Y, noise_var=0.1)
    mu_d, var_d = (np.asarray(a) for a in md.predict(X[:7]))
    for tag in ("fused", "block"):
        np.testing.assert_allclose(vals[tag][1], mu_d, atol=3e-2)
        np.testing.assert_allclose(vals[tag][2], var_d, atol=3e-2)


# --- differentiable fused matvec (VERDICT r2 item 7) ------------------------

def test_fused_diff_grads_match_dense(monkeypatch):
    """Value + all cotangents (V, variance, lengthscale, noise) of the
    differentiable fused matvec must match autodiff through the dense K."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import gpy_tpu.kern as gk
    from gpy_tpu.ops.pallas_gram_matvec import stationary_gram_matvec_fused_diff

    rng = np.random.default_rng(0)
    N, D, R = 700, 3, 4  # exercises padding (700 < 1024 tile multiple)
    X = jnp.asarray(rng.random((N, D)) * 3.0)
    V = jnp.asarray(rng.standard_normal((N, R)))
    G = jnp.asarray(rng.standard_normal((N, R)))
    noise0 = jnp.asarray(0.1 + 0.05 * rng.random(N))

    for fam, make in ((0, gk.RBF), (1, gk.Matern32), (2, gk.Matern52)):
        def fused_loss(V_, v_, l_, n_):
            y = stationary_gram_matvec_fused_diff(X, V_, v_, l_, n_, fam,
                                                  "exact")
            return jnp.sum(y * G)

        def dense_loss(V_, v_, l_, n_):
            k = make(D, variance=v_, ARD=True, lengthscale=np.ones(D))
            k2 = k.with_raw_dict({"variance": jnp.log(jnp.expm1(v_)),
                                  "lengthscale": jnp.log(jnp.expm1(l_))})
            K = k2.K(X) + jnp.diag(n_)
            return jnp.sum((K @ V_) * G)

        v0 = jnp.asarray(0.8)
        l0 = jnp.asarray(np.array([0.9, 1.2, 0.7]))
        args = (V, v0, l0, noise0)
        vf = fused_loss(*args)
        vd = dense_loss(*args)
        np.testing.assert_allclose(float(vf), float(vd), rtol=2e-5)
        gf = jax.grad(fused_loss, argnums=(0, 1, 2, 3))(*args)
        gd = jax.grad(dense_loss, argnums=(0, 1, 2, 3))(*args)
        for a, b, what in zip(gf, gd, "V var ls noise".split()):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
                err_msg=f"family {fam} d{what}")
