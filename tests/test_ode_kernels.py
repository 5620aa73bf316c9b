"""Latent-force (ODE) kernel tests — oracle: numerical integration of the
defining ODE covariance integrals (replaces GPy's hand-derived erf algebra
checks)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import quad, dblquad

from gpy_tpu.kern.eq_ode1 import EQ_ODE1


def test_eq_ode1_kfu_vs_quadrature():
    B, l, w = 1.3, 0.6, 0.8
    k = EQ_ODE1(output_dim=1, rank=1, W=np.array([[w]]), lengthscale=[l], decay=[B])
    for t, z in [(0.5, 0.3), (1.5, 1.0), (2.0, 0.2), (0.8, 1.5)]:
        got = float(k.K(jnp.asarray([[t, 0.0]]), jnp.asarray([[z, 1.0]]))[0, 0])
        want, _ = quad(lambda tau: np.exp(-B * (t - tau)) * np.exp(-((tau - z) ** 2) / l**2), 0, t)
        assert got == pytest.approx(w * want, rel=1e-6)


def test_eq_ode1_kdiag_vs_quadrature():
    B, l, w = 1.3, 0.6, 0.8
    k = EQ_ODE1(output_dim=1, rank=1, W=np.array([[w]]), lengthscale=[l], decay=[B])
    for t in [0.4, 1.2, 2.5]:
        got = float(k.Kdiag(jnp.asarray([[t, 0.0]]))[0])
        want, _ = dblquad(
            lambda a, b: np.exp(-B * (2 * t - a - b)) * np.exp(-((a - b) ** 2) / l**2),
            0, t, 0, t,
        )
        assert got == pytest.approx(w * w * want, rel=1e-6)


def test_eq_ode1_kuu_block_structure():
    k = EQ_ODE1(output_dim=2, rank=2)
    X = np.array([[0.1, 2.0], [0.5, 2.0], [0.3, 3.0]])  # latent indices 0,0,1
    K = np.asarray(k.K(jnp.asarray(X)))
    assert K[0, 2] == 0.0 and K[1, 2] == 0.0  # independent latent forces
    assert K[0, 0] == pytest.approx(1.0)
    np.testing.assert_allclose(K, K.T)


def test_eq_ode1_gradients_flow():
    import jax

    k = EQ_ODE1(output_dim=1, rank=1, W=np.array([[0.8]]), lengthscale=[0.6], decay=[1.3])
    Xf = jnp.asarray([[0.7, 0.0], [1.1, 0.0]])
    Xu = jnp.asarray([[0.4, 1.0], [0.9, 1.0]])

    def f(flat):
        k2 = k.with_flat_raw(flat)
        return jnp.sum(k2.K(Xf, Xu))

    g = jax.grad(f)(k.get_flat_raw())
    assert np.all(np.isfinite(np.asarray(g)))
    # FD check on the decay entry
    eps = 1e-6
    flat = np.asarray(k.get_flat_raw())
    for i in range(flat.size):
        fp = flat.copy(); fp[i] += eps
        fm = flat.copy(); fm[i] -= eps
        fd = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        assert float(g[i]) == pytest.approx(fd, rel=1e-4, abs=1e-7)
