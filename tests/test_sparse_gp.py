"""Sparse GP tests. Key oracle (GPy test strategy §4): as M -> N with Z = X,
every sparse bound approaches the exact GP marginal likelihood; VarDTC is a
lower bound; gradient checks incl. dF/dZ.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpy_tpu.models import GPRegression
from gpy_tpu.models.sparse_gp_regression import SparseGPRegression
import gpy_tpu.kern as gk

rng = np.random.default_rng(7)


def _toy(n=30):
    X = np.linspace(0, 5, n).reshape(n, 1)
    Y = np.sin(X) + 0.2 * rng.standard_normal((n, 1))
    return X, Y


@pytest.mark.parametrize("infer", ["vardtc", "fitc", "dtc", "pep"])
def test_full_inducing_matches_exact(infer):
    X, Y = _toy(25)
    exact = GPRegression(X, Y, noise_var=0.1)
    exact.kern.lengthscale = 1.2
    m = SparseGPRegression(X, Y, Z=X.copy(), noise_var=0.1, infer=infer)
    m.kern.lengthscale = 1.2
    lml_exact = float(exact.log_likelihood())
    lml_sparse = float(m.log_likelihood())
    assert lml_sparse == pytest.approx(lml_exact, rel=1e-2, abs=0.5)
    # predictions agree
    Xs = np.linspace(0, 5, 11).reshape(-1, 1)
    mu1, v1 = exact.predict(Xs)
    mu2, v2 = m.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, atol=5e-2)
    np.testing.assert_allclose(v1, v2, atol=5e-2)


def test_vardtc_is_lower_bound():
    X, Y = _toy(30)
    exact = GPRegression(X, Y, noise_var=0.1)
    m = SparseGPRegression(X, Y, num_inducing=8, noise_var=0.1)
    assert float(m.log_likelihood()) <= float(exact.log_likelihood()) + 1e-6


@pytest.mark.parametrize("infer", ["vardtc", "fitc", "dtc", "pep"])
def test_checkgrad_including_Z(infer):
    X, Y = _toy(18)
    m = SparseGPRegression(X, Y, num_inducing=5, infer=infer)
    assert m.checkgrad(), infer


def test_optimize_improves():
    X, Y = _toy(40)
    m = SparseGPRegression(X, Y, num_inducing=8)
    obj0 = float(m.objective_function())
    m.optimize(max_iters=200)
    assert float(m.objective_function()) < obj0
    mu, _ = m.predict(X)
    assert np.sqrt(np.mean((mu - Y) ** 2)) < 0.3


def test_vardtc_heteroscedastic_noise():
    from gpy_tpu.core.sparse_gp import SparseGP
    from gpy_tpu.likelihoods import HeteroscedasticGaussian

    X, Y = _toy(20)
    md = {"output_index": np.arange(20).reshape(-1, 1)}
    lik = HeteroscedasticGaussian(md, variance=0.2)
    m = SparseGP(X, Y, X[::3].copy(), gk.RBF(1), lik, Y_metadata=md, name="het_sgp")
    assert np.isfinite(float(m.log_likelihood()))
    assert m.checkgrad()


def test_vardtc_ard_kernel():
    n = 25
    X = rng.random((n, 3)) * 2
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    m = SparseGPRegression(X, Y, kernel=gk.RBF(3, ARD=True), num_inducing=6)
    assert m.checkgrad()
    m.optimize(max_iters=100)
    assert np.isfinite(float(m.log_likelihood()))
