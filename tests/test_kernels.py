"""Kernel layer tests: PSD-ness, known values, composition, slicing, psi-stats.

Mirrors GPy/testing/test_kernel.py's strategy (gradient checks are covered at
model level in test_models.py; here we check covariance values and structure).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk

rng = np.random.default_rng(0)


def _psd(K, tol=1e-8):
    w = np.linalg.eigvalsh(np.asarray(K))
    return w.min() > -tol * max(1.0, w.max())


ALL_KERNELS = [
    lambda: gk.RBF(3),
    lambda: gk.RBF(3, ARD=True, lengthscale=[0.5, 1.0, 2.0]),
    lambda: gk.ExpQuad(3),
    lambda: gk.Exponential(3),
    lambda: gk.OU(3),
    lambda: gk.Matern32(3, variance=2.0),
    lambda: gk.Matern52(3),
    lambda: gk.RatQuad(3, power=1.5),
    lambda: gk.Cosine(1, lengthscale=2.0),
    lambda: gk.Sinc(3),
    lambda: gk.ExpQuadCosine(3, period=2.0),
    lambda: gk.Linear(3),
    lambda: gk.Linear(3, ARD=True, variances=[1.0, 2.0, 0.5]),
    lambda: gk.LinearFull(3, rank=2),
    lambda: gk.TruncLinear(3),
    lambda: gk.Bias(3, variance=0.7),
    lambda: gk.White(3, variance=0.3),
    lambda: gk.StdPeriodic(3, period=1.5),
    lambda: gk.PeriodicExponential(1),
    lambda: gk.PeriodicMatern32(1),
    lambda: gk.PeriodicMatern52(1),
    lambda: gk.MLP(3),
    lambda: gk.MLP(3, ARD=True),
    lambda: gk.Poly(3, order=2),
    lambda: gk.Spline(1),
]


@pytest.mark.parametrize("make", ALL_KERNELS, ids=lambda f: f().name)
def test_kernel_basic(make):
    k = make()
    X = rng.standard_normal((7, k.input_dim))
    X2 = rng.standard_normal((5, k.input_dim))
    K = np.asarray(k.K(jnp.asarray(X)))
    assert K.shape == (7, 7)
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert _psd(K)
    # Kdiag == diag(K)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), np.diag(K), atol=1e-8)
    # cross-covariance consistency
    Kx = np.asarray(k.K(jnp.asarray(X), jnp.asarray(X2)))
    assert Kx.shape == (7, 5)
    if not isinstance(k, gk.White):
        full = np.asarray(k.K(jnp.asarray(np.vstack([X, X2]))))
        np.testing.assert_allclose(full[:7, 7:], Kx, atol=1e-8)


def test_brownian():
    k = gk.Brownian()
    X = np.abs(rng.standard_normal((6, 1)))
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, np.minimum(X, X.T), atol=1e-12)


def test_rbf_known_values():
    k = gk.RBF(1, variance=2.0, lengthscale=0.5)
    X = np.array([[0.0], [1.0]])
    K = np.asarray(k.K(jnp.asarray(X)))
    assert K[0, 0] == pytest.approx(2.0)
    assert K[0, 1] == pytest.approx(2.0 * np.exp(-0.5 * (1.0 / 0.5) ** 2))


def test_matern32_known():
    k = gk.Matern32(1, variance=1.0, lengthscale=2.0)
    X = np.array([[0.0], [2.0]])
    r = 1.0
    expected = (1 + np.sqrt(3) * r) * np.exp(-np.sqrt(3) * r)
    assert float(k.K(jnp.asarray(X))[0, 1]) == pytest.approx(expected, rel=1e-8)


def test_add_prod():
    k = gk.RBF(2) + gk.Linear(2) * gk.Bias(2, variance=2.0)
    X = rng.standard_normal((6, 2))
    K = np.asarray(k.K(jnp.asarray(X)))
    Ka = np.asarray(gk.RBF(2).K(jnp.asarray(X)))
    Kl = np.asarray(gk.Linear(2).K(jnp.asarray(X)))
    np.testing.assert_allclose(K, Ka + 2.0 * Kl, atol=1e-8)
    # params reachable through the tree
    names = [p for p, _, _ in k.named_params()]
    assert any("rbf" in n or "parts#0" in n for n in names)


def test_active_dims_slicing():
    k = gk.RBF(1, active_dims=[1])
    X = rng.standard_normal((5, 3))
    K1 = np.asarray(k.K(jnp.asarray(X)))
    K2 = np.asarray(gk.RBF(1).K(jnp.asarray(X[:, [1]])))
    np.testing.assert_allclose(K1, K2, atol=1e-12)


def test_combination_on_different_dims():
    k = gk.RBF(1, active_dims=[0]) + gk.Linear(1, active_dims=[1])
    X = rng.standard_normal((5, 2))
    K = np.asarray(k.K(jnp.asarray(X)))
    expect = np.asarray(gk.RBF(1).K(jnp.asarray(X[:, [0]]))) + np.asarray(
        gk.Linear(1).K(jnp.asarray(X[:, [1]]))
    )
    np.testing.assert_allclose(K, expect, atol=1e-12)


def test_coregionalize():
    k = gk.Coregionalize(1, output_dim=3, rank=2)
    idx = rng.integers(0, 3, size=(8, 1)).astype(float)
    K = np.asarray(k.K(jnp.asarray(idx)))
    B = np.asarray(k.B)
    np.testing.assert_allclose(K, B[idx[:, 0].astype(int)][:, idx[:, 0].astype(int)], atol=1e-10)
    assert _psd(K)


def test_icm_product():
    """ICM = RBF(x) * Coregion(index) on stacked input [x, index]."""
    kx = gk.RBF(1, active_dims=[0])
    kc = gk.Coregionalize(1, output_dim=2, rank=1, active_dims=[1])
    k = kx * kc
    X = np.hstack([rng.standard_normal((6, 1)), rng.integers(0, 2, (6, 1)).astype(float)])
    K = np.asarray(k.K(jnp.asarray(X)))
    assert _psd(K)


def test_independent_outputs():
    k = gk.IndependentOutputs(gk.RBF(1))
    X = np.hstack([rng.standard_normal((6, 1)), np.array([0, 0, 0, 1, 1, 1.0])[:, None]])
    K = np.asarray(k.K(jnp.asarray(X)))
    assert np.all(K[:3, 3:] == 0)
    assert _psd(K)


def test_gradients_X_matches_fd():
    k = gk.RBF(2, variance=1.3, lengthscale=0.8)
    X = rng.standard_normal((5, 2))
    dL = rng.standard_normal((5, 5))
    dL = dL + dL.T
    g = np.asarray(k.gradients_X(jnp.asarray(dL), jnp.asarray(X)))
    eps = 1e-6
    for i in [0, 3]:
        for j in range(2):
            Xp, Xm = X.copy(), X.copy()
            Xp[i, j] += eps
            Xm[i, j] -= eps
            fd = (
                np.sum(dL * np.asarray(k.K(jnp.asarray(Xp))))
                - np.sum(dL * np.asarray(k.K(jnp.asarray(Xm))))
            ) / (2 * eps)
            assert g[i, j] == pytest.approx(fd, rel=1e-4, abs=1e-6)


# ---------------------------------------------------------------------------
# psi statistics: closed forms vs Gauss-Hermite quadrature (GPy old_tests'
# psi-stat expectation tests, automated)
# ---------------------------------------------------------------------------
class _QX:
    def __init__(self, mean, variance):
        self.mean = jnp.asarray(mean)
        self.variance = jnp.asarray(variance)


def test_rbf_psi_vs_quadrature():
    from gpy_tpu.kern.psi_comp import psi0_quadrature, psi1_quadrature, psi2n_quadrature

    k = gk.RBF(2, variance=1.7, lengthscale=[0.8, 1.3], ARD=True)
    qX = _QX(rng.standard_normal((4, 2)), 0.1 + 0.1 * rng.random((4, 2)))
    Z = jnp.asarray(rng.standard_normal((3, 2)))
    np.testing.assert_allclose(
        np.asarray(k.psi0(Z, qX)), np.asarray(psi0_quadrature(k, Z, qX, degree=10)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(k.psi1(Z, qX)), np.asarray(psi1_quadrature(k, Z, qX, degree=10)), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(k.psi2n(Z, qX)), np.asarray(psi2n_quadrature(k, Z, qX, degree=10)), rtol=1e-3, atol=1e-6
    )


def test_linear_psi_vs_quadrature():
    from gpy_tpu.kern.psi_comp import psi0_quadrature, psi1_quadrature, psi2n_quadrature

    k = gk.Linear(2, variances=[0.5, 1.5], ARD=True)
    qX = _QX(rng.standard_normal((4, 2)), 0.1 + 0.1 * rng.random((4, 2)))
    Z = jnp.asarray(rng.standard_normal((3, 2)))
    np.testing.assert_allclose(
        np.asarray(k.psi0(Z, qX)), np.asarray(psi0_quadrature(k, Z, qX, degree=10)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(k.psi1(Z, qX)), np.asarray(psi1_quadrature(k, Z, qX, degree=10)), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(k.psi2n(Z, qX)), np.asarray(psi2n_quadrature(k, Z, qX, degree=10)), rtol=1e-5, atol=1e-7
    )


def test_kernel_params_trainable_in_tree():
    k = gk.RBF(2, ARD=True) + gk.White(2)
    flat = k.get_flat_raw()
    assert flat.shape[0] == 1 + 2 + 1  # rbf var + 2 ls + white var
    k2 = k.with_flat_raw(flat + 0.1)
    assert float(k2.parts[0].variance) != float(k.parts[0].variance)


def test_basis_func_kernels():
    X = rng.random((8, 1)) * 4
    for k in [
        gk.PolynomialBasisFuncKernel(1, 2),
        gk.LinearSlopeBasisFuncKernel(1, 1.0, 3.0),
        gk.ChangePointBasisFuncKernel(1, 2.0),
        gk.DomainKernel(1, 1.0, 3.0),
        gk.LogisticBasisFuncKernel(1, [2.0]),
    ]:
        K = np.asarray(k.K(jnp.asarray(X)))
        np.testing.assert_allclose(K, K.T, atol=1e-10)
        assert _psd(K)
        np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), np.diag(K), atol=1e-9)


def test_integral_limits_kernel():
    # bins: [s, t] with t > s
    s = np.sort(rng.random(6) * 2)
    X = np.stack([s + 0.5, s], axis=1)  # columns [t, s]
    k = gk.Integral_Limits(2, variances=1.3, lengthscale=0.7)
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert _psd(K, tol=1e-6)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), np.diag(K), atol=1e-8)


def test_symmetric_kernel():
    base = gk.RBF(1)
    k = gk.Symmetric(base, np.array([[-1.0]]), "even")
    X = rng.standard_normal((6, 1))
    K = np.asarray(k.K(jnp.asarray(X)))
    assert _psd(K)
    # even symmetry: k(x, x') == k(-x, x')
    K2 = np.asarray(k.K(jnp.asarray(-X), jnp.asarray(X)))
    np.testing.assert_allclose(K, K2, atol=1e-10)


def test_splitkern():
    k = gk.DEtime(Xd=1.0)
    x = np.linspace(0, 2, 6).reshape(-1, 1)
    X = np.vstack([np.hstack([x, np.zeros((6, 1))]), np.hstack([x, np.ones((6, 1))])])
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-10)
    assert _psd(K, tol=1e-6)
    # within-domain block equals base kernel
    np.testing.assert_allclose(K[:6, :6], np.asarray(gk.RBF(1).K(jnp.asarray(x))), atol=1e-10)


# --- Symbolic (sympy-defined) kernel (GPy: kern/src/symbolic.py) -------------
def test_symbolic_kernel_matches_rbf_and_trains():
    sympy = pytest.importorskip("sympy")
    import gpy_tpu.kern as gk
    from gpy_tpu.models import GPRegression

    x, z, variance, lengthscale = sympy.symbols("x z variance lengthscale")
    k_expr = variance * sympy.exp(-(x - z) ** 2 / (2 * lengthscale**2))
    sk = gk.Symbolic(1, k=k_expr, parameters={"variance": 1.3, "lengthscale": 0.7})
    rk = gk.RBF(1, variance=1.3, lengthscale=0.7)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((20, 1))
    np.testing.assert_allclose(np.asarray(sk.K(X)), np.asarray(rk.K(X)), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(sk.Kdiag(X)), np.asarray(rk.Kdiag(X)), rtol=1e-10)
    g1 = sk.gradients_X(jnp.ones((20, 20)), jnp.asarray(X))
    g2 = rk.gradients_X(jnp.ones((20, 20)), jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-8)

    Y = np.sin(2 * X) + 0.05 * rng.standard_normal((20, 1))
    m = GPRegression(X, Y, kernel=gk.Symbolic(1, k=k_expr))
    assert m.checkgrad()
    n0 = float(-m.log_likelihood())
    m.optimize()
    assert float(-m.log_likelihood()) < n0


def test_symbolic_kernel_2d_and_composition():
    sympy = pytest.importorskip("sympy")
    import gpy_tpu.kern as gk

    x0, x1, z0, z1, a = sympy.symbols("x_0 x_1 z_0 z_1 a")
    k2 = sympy.exp(-a * ((x0 - z0) ** 2 + (x1 - z1) ** 2))
    s2 = gk.Symbolic(2, k=k2) + gk.Bias(2, variance=0.2)
    X2 = np.random.default_rng(2).standard_normal((15, 2))
    K2 = np.asarray(s2.K(X2))
    assert K2.shape == (15, 15)
    np.testing.assert_allclose(K2, K2.T, atol=1e-12)
    ev = np.linalg.eigvalsh(K2)
    assert ev.min() > -1e-10


@pytest.mark.parametrize("make", ALL_KERNELS, ids=lambda f: f().name)
def test_gp_regression_checkgrad_per_kernel(make):
    """GPy's dominant test pattern (test_model.py:834+): build a small
    GPRegression with each kernel, randomize, finite-difference checkgrad
    through the WHOLE model (kernel + likelihood params jointly)."""
    from gpy_tpu.models import GPRegression

    k = make()
    r = np.random.default_rng(hash(k.name) % 2**31)
    X = r.standard_normal((12, k.input_dim))
    Y = np.sin(X[:, :1]) + 0.1 * r.standard_normal((12, 1))
    m = GPRegression(X, Y, kernel=k, noise_var=0.3)
    assert m.checkgrad(), f"checkgrad failed for {k.name}"
