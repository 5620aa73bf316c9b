"""ops/ kernels: pallas/blocked paths == reference XLA math."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.ops.pallas_gram import rbf_gram, _xla_rbf_gram
from gpy_tpu.ops.pallas_psi import rbf_psi2_weighted

rng = np.random.default_rng(4)


def test_rbf_gram_matches_kernel():
    X = jnp.asarray(rng.random((64, 3)))
    X2 = jnp.asarray(rng.random((32, 3)))
    k = gk.RBF(3, variance=1.4, lengthscale=0.6)
    K1 = np.asarray(k.K(X, X2))
    K2 = np.asarray(rbf_gram(X, X2, 1.4, 0.6))
    np.testing.assert_allclose(K1, K2, atol=1e-10)


def test_rbf_gram_grads_match_autodiff():
    X = jnp.asarray(rng.random((16, 2)))
    X2 = jnp.asarray(rng.random((12, 2)))
    ls = jnp.asarray([0.5, 1.2])

    def f_custom(x, l, v):
        return jnp.sum(jnp.tanh(rbf_gram(x, X2, v, l)))

    def f_auto(x, l, v):
        return jnp.sum(jnp.tanh(_xla_rbf_gram(x / l, X2 / l, v)))

    g1 = jax.grad(f_custom, argnums=(0, 1, 2))(X, ls, jnp.asarray(1.3))
    g2 = jax.grad(f_auto, argnums=(0, 1, 2))(X, ls, jnp.asarray(1.3))
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_psi2_weighted_matches_dense():
    k = gk.RBF(2, variance=1.5, lengthscale=[0.7, 1.1], ARD=True)

    class QX:
        mean = jnp.asarray(rng.standard_normal((50, 2)))
        variance = jnp.asarray(0.1 + 0.2 * rng.random((50, 2)))

    Z = jnp.asarray(rng.standard_normal((6, 2)))
    W = jnp.asarray(0.5 + rng.random(50))
    dense = jnp.einsum("n,nmk->mk", W, k.psi2n(Z, QX))
    streamed = rbf_psi2_weighted(1.5, jnp.asarray([0.7, 1.1]), Z, QX.mean, QX.variance, W, block=16)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(streamed), rtol=1e-8, atol=1e-10)


def test_psi2_weighted_grad():
    Z = jnp.asarray(rng.standard_normal((4, 2)))
    mu = jnp.asarray(rng.standard_normal((20, 2)))
    S = jnp.asarray(0.2 + 0.1 * rng.random((20, 2)))
    W = jnp.asarray(np.ones(20))

    def f(v, ls):
        return jnp.sum(rbf_psi2_weighted(v, ls, Z, mu, S, W, block=8))

    g = jax.grad(f, argnums=(0, 1))(jnp.asarray(1.2), jnp.asarray([0.8, 1.0]))
    eps = 1e-6
    fd = (f(jnp.asarray(1.2 + eps), jnp.asarray([0.8, 1.0])) - f(jnp.asarray(1.2 - eps), jnp.asarray([0.8, 1.0]))) / (2 * eps)
    assert float(g[0]) == pytest.approx(float(fd), rel=1e-5)


def test_direct_distance_path_matches_expansion():
    """D<=8 stationary grams use direct per-dim differences (exact f32,
    exact-zero diagonal); must agree with the matmul expansion and keep
    gradient parity."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(0)
    for D in (1, 3, 8):
        X = jnp.asarray(rng.random((40, D)) * 5.0)
        k = gk.Matern52(D, ARD=True, lengthscale=0.5 + rng.random(D))
        r2 = k._scaled_dist2(X)
        assert float(jnp.max(jnp.abs(jnp.diagonal(r2)))) == 0.0
        # expansion reference
        ls = jnp.asarray(k.lengthscale)
        Xs = X / ls
        sq = jnp.sum(Xs * Xs, -1)
        ref = jnp.clip(sq[:, None] + sq[None, :] - 2 * Xs @ Xs.T, 0, None)
        np.testing.assert_allclose(np.asarray(r2), np.asarray(ref),
                                   rtol=1e-10, atol=1e-10)
        g1 = jax.grad(lambda x: jnp.sum(jnp.sin(k._scaled_dist2(x))))(X)
        assert np.isfinite(np.asarray(g1)).all()
    # D>8 keeps the expansion path
    X = jnp.asarray(rng.random((20, 9)))
    k9 = gk.RBF(9)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(k9._scaled_dist2(X))),
                               0.0, atol=1e-12)


def test_pallas_batched_chol_inv_interpret():
    """Both kernel versions and both driver block sizes, interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from gpy_tpu.ops.pallas_chol import pallas_batched_chol_inv

    rng = np.random.default_rng(3)
    G = rng.standard_normal((2, 500, 24)).astype(np.float32)
    K = jnp.asarray(G @ np.swapaxes(G, 1, 2) + 500 * np.eye(500, dtype=np.float32))
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    for ver in (1, 2):
        for blk in (128, 256):
            L, Li = pallas_batched_chol_inv(K, interpret=True, version=ver,
                                            block=blk)
            np.testing.assert_allclose(np.asarray(L), Lr, atol=2e-4)
            for b in range(2):
                np.testing.assert_allclose(
                    np.asarray(Li[b] @ L[b]), np.eye(500), atol=2e-5)
