"""Exact Add-kernel psi2 cross terms (VERDICT r2 item 6).

Oracle: Gauss-Hermite quadrature of <k_i(x,Z_m) k_j(x,Z_m')> under
q(x)=N(mu, diag(S)) via kern.K (which slices active_dims itself). The
reference (GPy add.py:180-205) raises NotImplementedError for overlapping
dims; these closed forms must match quadrature there too.
"""
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.kern.psi_comp import psi1_quadrature, psi2n_quadrature


class QX:
    def __init__(self, mu, S):
        self.mean = jnp.asarray(mu)
        self.variance = jnp.asarray(S)


rng = np.random.default_rng(0)
N, M, Q = 5, 4, 2
MU = rng.standard_normal((N, Q)) * 0.7
S = 0.1 + 0.3 * rng.random((N, Q))
Z = rng.standard_normal((M, Q))
QX0 = QX(MU, S)


def _quad_psi2n(kern, degree=16):
    return np.asarray(psi2n_quadrature(kern, jnp.asarray(Z), QX0, degree=degree))


@pytest.mark.parametrize("make", [
    lambda: gk.RBF(Q, variance=0.7, lengthscale=[0.8, 1.3], ARD=True)
    + gk.RBF(Q, variance=1.2, lengthscale=0.6),
    lambda: gk.RBF(Q, variance=0.9, lengthscale=1.1)
    + gk.Linear(Q, variances=[0.5, 1.5], ARD=True),
    lambda: gk.Linear(Q, variances=0.8) + gk.Linear(Q, variances=[1.2, 0.4], ARD=True),
    lambda: gk.RBF(Q, lengthscale=0.9) + gk.Bias(Q, variance=0.6),
    lambda: gk.RBF(Q) + gk.White(Q, variance=0.3),
    # overlap only on dim 0 (partial overlap)
    lambda: gk.RBF(1, lengthscale=0.7, active_dims=[0])
    + gk.RBF(2, lengthscale=[1.1, 0.9], ARD=True, active_dims=[0, 1]),
    lambda: gk.RBF(1, lengthscale=0.8, active_dims=[1])
    + gk.Linear(2, variances=[0.9, 1.1], ARD=True, active_dims=[0, 1]),
])
def test_add_psi2n_matches_quadrature(make):
    k = make()
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # exact paths must NOT warn
        got = np.asarray(k.psi2n(jnp.asarray(Z), QX0))
    want = _quad_psi2n(k)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_disjoint_dims_product_exact():
    k = (gk.RBF(1, lengthscale=0.7, active_dims=[0])
         + gk.Matern32(1, lengthscale=1.2, active_dims=[1]))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = np.asarray(k.psi2n(jnp.asarray(Z), QX0))
    # tolerance bounded by the Matern32 part's own degree-5 internal GH
    # quadrature (the cross-term product structure itself is exact)
    want = _quad_psi2n(k)
    np.testing.assert_allclose(got, want, rtol=1.5e-2, atol=1.5e-2)


def test_overlapping_nonclosed_pair_uses_quadrature_at_low_Q():
    """RBF x Matern32 on shared dims has no closed form: at Q<=4 the
    cross term comes from GH quadrature (exact to quadrature error, no
    warning); the reference raises NotImplementedError here."""
    k = gk.RBF(Q, lengthscale=1.1) + gk.Matern32(Q, lengthscale=0.9)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = np.asarray(k.psi2n(jnp.asarray(Z), QX0))
    want = _quad_psi2n(k)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_overlapping_unsupported_pair_warns_at_high_Q():
    Qb = 5
    mu = rng.standard_normal((3, Qb)) * 0.5
    S = 0.1 + 0.2 * rng.random((3, Qb))
    Zb = rng.standard_normal((M, Qb))
    qb = QX(mu, S)
    k = gk.RBF(Qb) + gk.Matern32(Qb)
    with pytest.warns(UserWarning, match="product-of-psi1"):
        out = k.psi2n(jnp.asarray(Zb), qb)
    assert np.isfinite(np.asarray(out)).all()


def test_rbf_psi1_active_dims_subset_matches_quadrature():
    """The closed-form psi1 of a subset-active_dims part must slice its
    inputs (GPy does this in the slicing metaclass)."""
    k = gk.RBF(1, variance=0.8, lengthscale=0.9, active_dims=[1])
    got = np.asarray(k.psi1(jnp.asarray(Z), QX0))
    want = np.asarray(psi1_quadrature(k, jnp.asarray(Z), QX0, degree=10))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    kl = gk.Linear(1, variances=1.4, active_dims=[0])
    got = np.asarray(kl.psi1(jnp.asarray(Z), QX0))
    want = np.asarray(psi1_quadrature(kl, jnp.asarray(Z), QX0, degree=10))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bgplvm_add_kernel_checkgrad():
    from gpy_tpu.models import BayesianGPLVM

    Y = (rng.standard_normal((12, 3)) @ rng.standard_normal((3, 6))
         + 0.05 * rng.standard_normal((12, 6)))
    k = (gk.RBF(2, ARD=True, lengthscale=[1.0, 1.4])
         + gk.Linear(2, variances=[0.5, 0.8], ARD=True))
    m = BayesianGPLVM(Y, 2, kernel=k, num_inducing=5)
    assert m.checkgrad(tolerance=1e-4)
