"""End-to-end exact GP regression: parity vs hand-computed numpy formulas
(the same math GPy's exact_gaussian_inference.py:37-74 implements), gradient
checks, prediction identities. Mirrors GPy/testing/test_model.py patterns.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import norm as scipy_norm

import gpy_tpu
from gpy_tpu.models import GPRegression
import gpy_tpu.kern as gk

rng = np.random.default_rng(42)


def _toy(n=20, d=1):
    X = np.linspace(0, 5, n).reshape(n, 1) if d == 1 else rng.random((n, d)) * 3
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    return X, Y


def _numpy_nlml(X, Y, var, ls, noise):
    # reference formula: exact_gaussian_inference.py:37-74
    d2 = ((X[:, None, :] - X[None, :, :]) / ls) ** 2
    K = var * np.exp(-0.5 * d2.sum(-1))
    Ky = K + (noise + 1e-8) * np.eye(len(X))
    L = np.linalg.cholesky(Ky)
    alpha = np.linalg.solve(Ky, Y)
    logdet = 2 * np.log(np.diag(L)).sum()
    N, D = Y.shape
    return -0.5 * (N * D * np.log(2 * np.pi) + D * logdet + (alpha * Y).sum())


def test_nlml_matches_numpy():
    X, Y = _toy()
    m = GPRegression(X, Y)
    m.kern.variance = 1.7
    m.kern.lengthscale = 0.9
    m.likelihood.variance = 0.05
    got = float(m.log_likelihood())
    want = _numpy_nlml(X, Y, 1.7, 0.9, 0.05)
    assert got == pytest.approx(want, rel=1e-9)


def test_checkgrad():
    X, Y = _toy(15)
    m = GPRegression(X, Y, kernel=gk.RBF(1, ARD=True))
    m.randomize(np.random.default_rng(0))
    assert m.checkgrad()


def test_checkgrad_composite_kernel():
    X, Y = _toy(12, d=2)
    k = gk.RBF(2, ARD=True) + gk.Linear(2) * gk.Bias(2) + gk.White(2, variance=0.1)
    m = GPRegression(X, Y, kernel=k)
    m.randomize(np.random.default_rng(1))
    assert m.checkgrad()


@pytest.mark.parametrize("kern_make", [
    lambda: gk.Matern32(1), lambda: gk.Matern52(1), lambda: gk.Exponential(1),
    lambda: gk.RatQuad(1), lambda: gk.StdPeriodic(1), lambda: gk.MLP(1),
    lambda: gk.Poly(1, order=2), lambda: gk.Brownian(1),
], ids=lambda f: f().name)
def test_checkgrad_kernels(kern_make):
    X = np.abs(rng.random((12, 1))) + 0.1
    Y = np.sin(X * 3) + 0.05 * rng.standard_normal((12, 1))
    m = GPRegression(X, Y, kernel=kern_make())
    assert m.checkgrad(), f"checkgrad failed for {kern_make().name}"


def test_optimize_improves_and_fits():
    X, Y = _toy(40)
    m = GPRegression(X, Y)
    obj0 = float(m.objective_function())
    m.optimize()
    assert float(m.objective_function()) < obj0
    mu, var = m.predict(X)
    assert np.sqrt(np.mean((mu - Y) ** 2)) < 0.2
    assert np.all(var > 0)


def test_predict_train_points_interpolate():
    X, Y = _toy(25)
    m = GPRegression(X, Y, noise_var=1e-6)
    m.kern.lengthscale = 0.5
    mu, _ = m.predict(X, include_likelihood=False)
    # exact parity with the numpy normal-equations solution (conditioning
    # limits absolute interpolation accuracy; verified identical to numpy)
    d2 = ((X[:, None, :] - X[None, :, :]) / 0.5) ** 2
    K = 1.0 * np.exp(-0.5 * d2.sum(-1))
    alpha = np.linalg.solve(K + (1e-6 + 1e-8) * np.eye(len(X)), Y)
    np.testing.assert_allclose(mu, K @ alpha, atol=1e-6)
    np.testing.assert_allclose(mu, Y, atol=0.1)


def test_predict_full_cov_consistent_with_diag():
    X, Y = _toy(15)
    m = GPRegression(X, Y)
    Xs = np.linspace(-1, 6, 7).reshape(-1, 1)
    mu1, var_diag = m.predict(Xs)
    mu2, var_full = m.predict(Xs, full_cov=True)
    np.testing.assert_allclose(mu1, mu2, atol=1e-10)
    np.testing.assert_allclose(np.diag(var_full), var_diag[:, 0], rtol=1e-6, atol=1e-9)


def test_predict_quantiles():
    X, Y = _toy(15)
    m = GPRegression(X, Y)
    Xs = np.array([[2.0]])
    lo, hi = m.predict_quantiles(Xs)
    mu, var = m.predict(Xs)
    assert lo[0, 0] == pytest.approx(mu[0, 0] + scipy_norm.ppf(0.025) * np.sqrt(var[0, 0]), rel=1e-6)
    assert hi[0, 0] == pytest.approx(mu[0, 0] + scipy_norm.ppf(0.975) * np.sqrt(var[0, 0]), rel=1e-6)


def test_normalizer_roundtrip():
    """GPy test_model.py:107 — predictions with/without normalizer agree."""
    X, Y = _toy(20)
    Yb = Y * 47.0 + 203.0
    m1 = GPRegression(X, Yb, normalizer=True)
    m2 = GPRegression(X, Yb, normalizer=None)
    m1.optimize()
    m2.optimize()
    Xs = np.linspace(0, 5, 9).reshape(-1, 1)
    mu1, v1 = m1.predict(Xs)
    mu2, v2 = m2.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-2, atol=0.5)


def test_set_XY():
    X, Y = _toy(15)
    m = GPRegression(X, Y)
    ll0 = float(m.log_likelihood())
    X2, Y2 = _toy(15)
    Y2 = Y2 + 1.0
    m.set_XY(X2, Y2)
    assert float(m.log_likelihood()) != ll0
    # objective still optimizable after data change
    m.optimize(max_iters=20)


def test_mean_function():
    from gpy_tpu.mappings import Constant

    X, Y = _toy(15)
    mf = Constant(1, 1, value=0.0)
    m = GPRegression(X, Y + 5.0, mean_function=mf)
    assert m.checkgrad()
    m.optimize()
    assert float(np.asarray(mf.C).reshape(-1)[0]) == pytest.approx(5.0, abs=1.5)


def test_posterior_samples():
    X, Y = _toy(10)
    m = GPRegression(X, Y)
    s = m.posterior_samples_f(X, size=5)
    assert s.shape == (10, 1, 5)
    s2 = m.posterior_samples(X, size=5)
    assert s2.shape == (10, 1, 5)


def test_log_predictive_density():
    X, Y = _toy(20)
    m = GPRegression(X, Y)
    m.optimize(max_iters=50)
    lpd = m.log_predictive_density(X[:5], Y[:5])
    assert lpd.shape == (5, 1)
    assert np.all(np.isfinite(lpd))


def test_predictive_gradients_fd():
    X, Y = _toy(12)
    m = GPRegression(X, Y)
    m.optimize(max_iters=30)
    Xs = np.array([[1.3], [3.7]])
    dmu, dv = m.predictive_gradients(Xs)
    assert dmu.shape == (2, 1, 1)
    eps = 1e-5
    for i in range(2):
        mu_p, _ = m.predict_noiseless(Xs[i : i + 1] + eps)
        mu_m, _ = m.predict_noiseless(Xs[i : i + 1] - eps)
        fd = (mu_p - mu_m) / (2 * eps)
        assert dmu[i, 0, 0] == pytest.approx(fd[0, 0], rel=1e-4, abs=1e-6)


def test_posterior_covariance_between_points():
    X, Y = _toy(15)
    m = GPRegression(X, Y)
    X1 = np.array([[1.0], [2.0]])
    X2 = np.array([[1.5]])
    c = m.posterior_covariance_between_points(X1, X2)
    assert c.shape == (2, 1)
    _, full = m.predict(np.vstack([X1, X2]), full_cov=True, include_likelihood=False)
    assert c[0, 0] == pytest.approx(full[0, 2], rel=1e-6, abs=1e-10)


def test_fixed_params_stay_fixed_through_optimize():
    X, Y = _toy(15)
    m = GPRegression(X, Y)
    m.kern.lengthscale.fix(2.0)
    m.optimize(max_iters=50)
    assert float(m.kern.lengthscale) == pytest.approx(2.0)


def test_priors_shift_map_estimate():
    X, Y = _toy(20)
    m1 = GPRegression(X, Y)
    m1.optimize()
    ls_ml = float(m1.kern.lengthscale)
    m2 = GPRegression(X, Y)
    m2.kern.lengthscale.set_prior(gpy_tpu.priors.Gamma(100.0, 100.0 / 0.1))  # mean 0.1, tight
    m2.optimize()
    ls_map = float(m2.kern.lengthscale)
    assert ls_map < ls_ml  # dragged toward 0.1


def test_optimizer_zoo_reaches_lbfgs_optimum():
    """GPy's paramz optimizer surface: scg (Moller SCG), simplex
    (Nelder-Mead), rprop/adadelta (climin in the reference; optax here)
    all minimize the same jitted objective."""
    rng = np.random.default_rng(11)
    X = np.sort(rng.uniform(0, 5, 50))[:, None]
    Y = np.sin(X * 1.4) + 0.2 * rng.standard_normal((50, 1))
    ref = GPRegression(X, Y)
    ref.optimize("lbfgsb")
    f_ref = float(ref.objective_function())
    for opt, iters in [("scg", 500), ("simplex", 800), ("rprop", 1500),
                       ("tnc", 500), ("lbfgs_device", 500)]:
        m = GPRegression(X, Y)
        m.optimize(opt, max_iters=iters, step_size=0.05)
        assert float(m.objective_function()) == pytest.approx(f_ref, abs=1e-2), opt
    # adadelta: known-slow; just assert it improves the objective
    m = GPRegression(X, Y)
    f0 = float(m.objective_function())
    m.optimize("adadelta", max_iters=300, step_size=1.0)
    assert float(m.objective_function()) < f0


def test_log_predictive_density_sampling_matches_exact():
    """MC predictive density agrees with the closed form (GPy gp.py:716-732)."""
    rng = np.random.default_rng(0)
    X = np.linspace(0, 5, 30).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.normal(size=X.shape)
    m = gpy_tpu.models.GPRegression(X, Y)
    m.optimize(max_iters=30)
    lpd = m.log_predictive_density(X[:3], Y[:3])
    lpds = m.log_predictive_density_sampling(X[:3], Y[:3], num_samples=20000)
    np.testing.assert_allclose(lpd.ravel(), lpds.ravel(), atol=0.08)


def test_infer_newX_recovers_training_latents():
    """GP.infer_newX (GPy gp.py:686-698 / inferenceX.py) on a trained GPLVM."""
    rng = np.random.default_rng(1)
    t = np.linspace(0, 2 * np.pi, 25)
    Y = np.c_[np.sin(t), np.cos(t), np.sin(2 * t)] + 0.05 * rng.normal(size=(25, 3))
    g = gpy_tpu.models.GPLVM(Y, 2)
    g.optimize(max_iters=100)
    Xs, lp = g.infer_newX(Y[:4])
    d = np.linalg.norm(Xs - np.asarray(g.latent_X)[:4], axis=1)
    assert np.all(d < 0.05) and np.isfinite(lp)
