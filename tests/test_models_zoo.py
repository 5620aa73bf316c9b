"""Zoo-wide model tests: each model family constructs, checkgrads, optimizes
and predicts sensibly. Mirrors GPy/testing/test_model.py's breadth.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
import gpy_tpu.models as gm
from gpy_tpu.likelihoods import Bernoulli, Gaussian

rng = np.random.default_rng(13)


def test_warped_gp():
    n = 30
    X = np.linspace(0, 5, n).reshape(-1, 1)
    latent = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    Y = np.exp(latent)  # positively skewed outputs
    m = gm.WarpedGP(X, Y)
    assert m.checkgrad()
    m.optimize(max_iters=150)
    mu, var = m.predict(X)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    # warped predictions should track Y much better than raw-linear-GP scale
    assert np.corrcoef(mu[:, 0], Y[:, 0])[0, 1] > 0.9
    lo, hi = m.predict_quantiles(X)
    assert np.all(lo <= hi)


def test_input_warped_gp():
    n = 25
    X = rng.random((n, 2)) * 3
    Y = np.sin(X[:, :1] ** 2) + 0.1 * rng.standard_normal((n, 1))
    m = gm.InputWarpedGP(X, Y)
    assert m.checkgrad()
    m.optimize(max_iters=100)
    mu, _ = m.predict(X)
    assert np.sqrt(np.mean((mu - Y) ** 2)) < 0.5


def test_tp_regression():
    n = 30
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    Y[7] += 2.5  # outlier
    m = gm.TPRegression(X, Y, deg_free=4.0)
    # noiseless TP covariance is near-singular: use a larger FD step
    assert m.checkgrad(step=1e-4)
    m.optimize(max_iters=100)
    mu, var = m.predict(X)
    assert np.all(var > 0)
    lo, hi = m.predict_quantiles(X)
    assert np.all(lo < hi)


def test_coregionalized_regression():
    n = 20
    X1 = np.linspace(0, 5, n).reshape(-1, 1)
    X2 = np.linspace(0, 5, n - 5).reshape(-1, 1)
    f = lambda x: np.sin(x)
    Y1 = f(X1) + 0.05 * rng.standard_normal((n, 1))
    Y2 = 2.0 * f(X2) + 0.05 * rng.standard_normal((n - 5, 1))
    m = gm.GPCoregionalizedRegression([X1, X2], [Y1, Y2])
    assert m.checkgrad()
    m.optimize(max_iters=150)
    # predict output 1 at new points: append index column and metadata
    Xs = np.hstack([X1, np.ones((n, 1))])
    mu, var = m.predict(Xs, Y_metadata={"output_index": np.ones((n, 1), dtype=int)})
    assert np.sqrt(np.mean((mu - 2.0 * f(X1)) ** 2)) < 0.5


def test_sparse_coregionalized():
    n = 18
    X1 = np.linspace(0, 5, n).reshape(-1, 1)
    X2 = np.linspace(0, 5, n).reshape(-1, 1)
    Y1 = np.sin(X1) + 0.05 * rng.standard_normal((n, 1))
    Y2 = np.cos(X2) + 0.05 * rng.standard_normal((n, 1))
    m = gm.SparseGPCoregionalizedRegression([X1, X2], [Y1, Y2], num_inducing=8)
    assert np.isfinite(float(m.log_likelihood()))
    # the integer index column of Z is discrete — FD on it is meaningless
    # (its analytic gradient is exactly 0); fix Z for the gradient check
    m.Z.fix()
    assert m.checkgrad()


def test_heteroscedastic_regression():
    n = 25
    X = np.linspace(0, 5, n).reshape(-1, 1)
    noise = 0.05 + 0.3 * (X > 2.5)
    Y = np.sin(X) + noise * rng.standard_normal((n, 1))
    m = gm.GPHeteroscedasticRegression(X, Y)
    assert m.checkgrad()
    m.optimize(max_iters=200)
    v = np.asarray(m.likelihood.variance)
    # learned noise larger in the noisy half
    assert np.median(v[-8:]) > np.median(v[:8])


def test_offset_regression():
    n = 20
    x = np.linspace(0, 5, n).reshape(-1, 1)
    offset_true = 0.7
    X = np.vstack([np.hstack([x, np.zeros((n, 1))]),
                   np.hstack([x, np.ones((n, 1))])])
    Y = np.vstack([np.sin(x), np.sin(x + offset_true)])
    m = gm.GPOffsetRegression(X, Y, noise_var=0.01)
    assert m.checkgrad()
    m.optimize(max_iters=200)
    assert abs(abs(float(np.asarray(m.offset).reshape(-1)[0])) - offset_true) < 0.25


def test_var_gauss_model():
    n = 20
    X = np.linspace(0, 4, n).reshape(-1, 1)
    Y = (np.sin(X) + 0.2 * rng.standard_normal((n, 1)) > 0).astype(float)
    m = gm.GPVariationalGaussianApproximation(X, Y, gk.RBF(1), Bernoulli())
    assert m.checkgrad()
    m.optimize(max_iters=300)
    p, _ = m.predict(X)
    assert np.mean((p > 0.5) == (Y > 0.5)) > 0.7


def test_one_vs_all():
    n = 45
    X = rng.standard_normal((n, 2))
    Y = (X[:, 0] > 0).astype(int) + 2 * (X[:, 1] > 0).astype(int)  # 4 classes-ish
    Y = Y % 3
    m = gm.OneVsAllClassification(X, Y, messages=False)
    probs, pred = m.predict(X)
    assert probs.shape == (n, 3)
    assert np.mean(pred == Y) > 0.6


def test_kronecker_regression():
    n1, n2 = 12, 10
    X1 = np.linspace(0, 3, n1).reshape(-1, 1)
    X2 = np.linspace(0, 2, n2).reshape(-1, 1)
    F = np.sin(X1) @ np.cos(X2).T
    Y = F + 0.05 * rng.standard_normal((n1, n2))
    m = gm.GPKroneckerGaussianRegression(X1, X2, Y, gk.RBF(1), gk.RBF(1), noise_var=0.05)
    assert m.checkgrad()
    m.optimize(max_iters=150)
    mu, var = m.predict(X1, X2)
    assert np.sqrt(np.mean((mu - F) ** 2)) < 0.15
    assert np.all(var > 0)
    # parity with dense exact GP on the same product kernel
    from gpy_tpu.models import GPRegression

    Xd = np.array([[a, b] for a in X1[:, 0] for b in X2[:, 0]])
    kd = gk.RBF(1, active_dims=[0]) * gk.RBF(1, active_dims=[1])
    md = GPRegression(Xd, Y.reshape(-1, 1), kernel=kd, noise_var=0.05)
    # match hyperparams
    md.kern.parts[0].variance = float(np.asarray(m.kern1.variance))
    md.kern.parts[0].lengthscale = float(np.asarray(m.kern1.lengthscale))
    md.kern.parts[1].variance = float(np.asarray(m.kern2.variance))
    md.kern.parts[1].lengthscale = float(np.asarray(m.kern2.lengthscale))
    md.likelihood.variance = float(np.asarray(m.noise_var))
    assert float(md.log_likelihood()) == pytest.approx(float(m.log_likelihood()), rel=1e-5)


def test_grid_regression_3axes():
    ns = (6, 5, 4)
    Xs = [np.linspace(0, 2, n).reshape(-1, 1) for n in ns]
    Y = rng.standard_normal(ns)
    m = gm.GPRegressionGrid(Xs, Y, noise_var=0.5)
    assert m.checkgrad()
    # parity with dense GP
    from itertools import product
    from gpy_tpu.models import GPRegression

    Xd = np.array([[a, b, c] for a in Xs[0][:, 0] for b in Xs[1][:, 0] for c in Xs[2][:, 0]])
    kd = gk.RBF(1, active_dims=[0]) * gk.RBF(1, active_dims=[1]) * gk.RBF(1, active_dims=[2])
    md = GPRegression(Xd, Y.reshape(-1, 1), kernel=kd, noise_var=0.5)
    assert float(md.log_likelihood()) == pytest.approx(float(m.log_likelihood()), rel=1e-5)
    mu, var = m.predict(Xs)
    mud, _ = md.predict(Xd, include_likelihood=False)
    np.testing.assert_allclose(mu.reshape(-1), mud[:, 0], atol=1e-4)


def test_sparse_classification():
    n = 40
    X = rng.standard_normal((n, 2))
    Y = ((X[:, 0] + X[:, 1]) > 0).astype(float).reshape(-1, 1)
    m = gm.SparseGPClassification(X, Y, num_inducing=10)
    assert m.checkgrad()
    m.optimize(max_iters=150)
    p, _ = m.predict(X)
    assert np.mean((p > 0.5) == (Y > 0.5)) > 0.75


def test_bcgplvm_optimize_and_checkgrad():
    """Back-constrained GPLVM: X = mapping.f(Y); mapping weights optimized.
    Reference: GPy/models/bcgplvm.py:11."""
    import gpy_tpu.mappings as mappings
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, 25)
    Y = np.c_[np.sin(t), np.cos(t), np.sin(2 * t)] + 0.05 * rng.normal(size=(25, 3))
    m = gm.BCGPLVM(Y, 2)
    assert m.checkgrad(step=1e-5)
    n0 = float(m.objective_function())
    m.optimize(max_iters=50)
    assert float(m.objective_function()) < n0
    # latent coords are a deterministic function of Y through the mapping
    X = np.asarray(m.latent_X)
    assert X.shape == (25, 2) and np.isfinite(X).all()
    # custom linear mapping path
    m2 = gm.BCGPLVM(Y, 2, mapping=mappings.Linear(3, 2))
    assert m2.checkgrad(step=1e-5)


def test_dp_bayesian_gplvm():
    """BayesianGPLVM with a DGPLVM discriminative prior on q(X) means.
    Reference: GPy/models/dpgplvm.py:6."""
    from gpy_tpu.core.priors import DGPLVM
    rng = np.random.default_rng(1)
    N, D = 20, 4
    labels = rng.integers(0, 2, N); labels[:2] = [0, 1]
    onehot = np.zeros((N, 2)); onehot[np.arange(N), labels] = 1
    Y = rng.normal(size=(N, D)) + 2.0 * onehot[:, :1]
    prior = DGPLVM(1.0, onehot, (N, 2))
    m = gm.DPBayesianGPLVM(Y, 2, prior, num_inducing=8)
    base = gm.BayesianGPLVM(Y, 2, num_inducing=8)
    # objective differs from the unpriored model exactly by -lnpdf(mean)
    diff = float(m.objective_function()) - float(base.objective_function())
    expect = -float(prior.lnpdf(np.asarray(m.qX.mean.values)))
    assert abs(diff - expect) < 1e-6
    n0 = float(m.objective_function())
    m.optimize(max_iters=40)
    assert float(m.objective_function()) < n0
