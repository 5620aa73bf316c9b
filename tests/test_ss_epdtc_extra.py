"""SS psi statistics + SSGPLVM tests."""
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.core.variational import SpikeAndSlabPosterior
from gpy_tpu.models.ss_gplvm import SSGPLVM

rng = np.random.default_rng(5)


def test_ss_psi_reduces_to_gaussian_at_gamma_1():
    k = gk.RBF(2, variance=1.3, lengthscale=[0.8, 1.2], ARD=True)
    mu = rng.standard_normal((5, 2))
    S = 0.1 + 0.1 * rng.random((5, 2))
    qss = SpikeAndSlabPosterior(mu, S, np.full((5, 2), 1 - 1e-12))

    class QG:
        mean = jnp.asarray(mu)
        variance = jnp.asarray(S)

    Z = jnp.asarray(rng.standard_normal((4, 2)))
    np.testing.assert_allclose(np.asarray(k.psi1(Z, qss)), np.asarray(k.psi1(Z, QG)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k.psi2n(Z, qss)), np.asarray(k.psi2n(Z, QG)), rtol=1e-6)


def test_ss_psi_vs_monte_carlo():
    k = gk.RBF(1, variance=1.0, lengthscale=0.9)
    mu = np.array([[0.7]])
    S = np.array([[0.3]])
    g = np.array([[0.6]])
    qss = SpikeAndSlabPosterior(mu, S, g)
    Z = jnp.asarray(np.array([[0.2], [-1.0]]))
    psi1 = np.asarray(k.psi1(Z, qss))
    # Monte Carlo over the mixture
    ns = 200000
    mask = rng.random(ns) < 0.6
    xs = np.where(mask, mu[0, 0] + np.sqrt(S[0, 0]) * rng.standard_normal(ns), 0.0)
    for j in range(2):
        mc = np.mean(np.exp(-0.5 * (xs - float(Z[j, 0])) ** 2 / 0.9**2))
        assert psi1[0, j] == pytest.approx(mc, rel=2e-2)


def test_ssgplvm_runs_and_checkgrads():
    Y = np.sin(rng.standard_normal((15, 2))) @ rng.standard_normal((2, 5))
    m = SSGPLVM(Y, 3, num_inducing=5)
    assert np.isfinite(float(m.log_likelihood()))
    assert m.checkgrad()


def test_ssgplvm_learns_structure():
    """With inclusion probs near 1 the SS bound must recover the 1-D latent
    structure (noise drops, one dominant ARD dim); with free gamma the
    bound improves monotonically (the landscape has an all-noise basin that
    both GPy and this implementation can fall into from a cold start)."""
    rngl = np.random.default_rng(2)
    X = rngl.standard_normal((40, 1))
    Y = np.hstack([np.sin(2 * X), np.cos(3 * X), X**2]) + 0.05 * rngl.standard_normal((40, 3))
    m = SSGPLVM(Y, 4, num_inducing=10, Gamma=np.full((40, 4), 0.9999))
    m.qX.gamma.fix()
    m.optimize(max_iters=300)
    sens = np.asarray(m.kern.input_sensitivity())
    assert float(np.asarray(m.likelihood.variance)) < 0.1
    assert sens.max() > 100 * np.sort(sens)[-2]  # one dominant latent dim

    m2 = SSGPLVM(Y, 4, num_inducing=10)
    ll0 = float(m2.log_likelihood())
    m2.optimize(max_iters=100)
    assert float(m2.log_likelihood()) >= ll0


# --- SSLinear psi statistics (GPy: psi_comp/sslinear_psi_comp.py:1-86) ------

def test_sslinear_psi_reduces_to_gaussian_at_gamma_1():
    k = gk.Linear(2, variances=[0.7, 1.4], ARD=True)
    mu = rng.standard_normal((5, 2))
    S = 0.1 + 0.1 * rng.random((5, 2))
    qss = SpikeAndSlabPosterior(mu, S, np.full((5, 2), 1 - 1e-12))

    class QG:
        mean = jnp.asarray(mu)
        variance = jnp.asarray(S)

    Z = jnp.asarray(rng.standard_normal((4, 2)))
    np.testing.assert_allclose(np.asarray(k.psi0(Z, qss)), np.asarray(k.psi0(Z, QG)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k.psi1(Z, qss)), np.asarray(k.psi1(Z, QG)), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k.psi2n(Z, qss)), np.asarray(k.psi2n(Z, QG)), rtol=1e-6)


def test_sslinear_psi_vs_monte_carlo():
    k = gk.Linear(2, variances=[0.9, 1.3], ARD=True)
    mu = np.array([[0.7, -0.4]])
    S = np.array([[0.3, 0.2]])
    g = np.array([[0.6, 0.8]])
    qss = SpikeAndSlabPosterior(mu, S, g)
    Z = jnp.asarray(np.array([[0.2, 1.0], [-1.0, 0.5], [0.3, -0.7]]))
    ns = 400000
    xs = np.where(rng.random((ns, 2)) < g[0],
                  mu[0] + np.sqrt(S[0]) * rng.standard_normal((ns, 2)), 0.0)
    kx = (xs * np.array([0.9, 1.3])) @ np.asarray(Z).T  # (ns, 3)
    np.testing.assert_allclose(np.asarray(k.psi0(Z, qss))[0],
                               np.mean(np.sum(np.array([0.9, 1.3]) * xs**2, -1)), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(k.psi1(Z, qss))[0], kx.mean(0), atol=5e-3)
    np.testing.assert_allclose(np.asarray(k.psi2n(Z, qss))[0],
                               np.einsum("nm,nk->mk", kx, kx) / ns, rtol=3e-2, atol=5e-3)


def test_ssgplvm_linear_kernel_checkgrads():
    # num_inducing == input_dim: Linear-kernel Kmm = Z v Z' has rank <= Q,
    # so M > Q would be singular and the jitchol jitter ladder would make
    # finite differences see discrete jitter-level switches.
    Y = np.sin(rng.standard_normal((15, 2))) @ rng.standard_normal((2, 5))
    m = SSGPLVM(Y, 3, num_inducing=3, kernel=gk.Linear(3, ARD=True))
    assert np.isfinite(float(m.log_likelihood()))
    assert m.checkgrad()
