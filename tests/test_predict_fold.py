"""The folded predict path (likelihood predictive_values traced into the
same jitted program as the raw predict — one tunnel dispatch) must be
bit-compatible with the unfolded raw-predict + eager-likelihood path.
Reference semantics: GPy core/gp.py:308-365."""
import numpy as np

import gpy_tpu.kern as gk
import gpy_tpu.models as gm
from gpy_tpu.likelihoods import Gaussian


def _toy(n=40, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))
    return X, Y


def test_fold_matches_unfolded_exact_gp():
    X, Y = _toy()
    m = gm.GPRegression(X, Y, gk.RBF(2, ARD=True))
    Xs = np.linspace(-2, 2, 15).reshape(-1, 1) @ np.ones((1, 2))
    mu_f, var_f = m.predict(Xs)
    assert m.__dict__.get("_predict_exec_cache"), "folded path not exercised"
    # unfolded reference: raw predict + eager likelihood
    mu_r, var_r = m._raw_predict(Xs)
    mu_u, var_u = m.likelihood.predictive_values(mu_r, var_r, False)
    np.testing.assert_allclose(mu_f, np.asarray(mu_u), rtol=1e-12)
    np.testing.assert_allclose(var_f, np.asarray(var_u), rtol=1e-12)
    # noiseless must differ from folded by exactly the noise variance
    mu_n, var_n = m.predict_noiseless(Xs)
    np.testing.assert_allclose(mu_n, mu_f, rtol=1e-12)
    np.testing.assert_allclose(var_f - var_n,
                               float(np.asarray(m.likelihood.variance)),
                               rtol=1e-10)


def test_fold_full_cov_and_reoptimize_reuses_executable():
    X, Y = _toy(seed=1)
    m = gm.GPRegression(X, Y, gk.RBF(2))
    Xs = X[:7]
    mu1, cov1 = m.predict(Xs, full_cov=True)
    assert cov1.shape[-2:] == (7, 7)
    n_exec = len(m._predict_exec_cache)
    m.optimize(max_iters=20)
    mu2, cov2 = m.predict(Xs, full_cov=True)
    # same executable reused across re-optimization (hyperparams are args)
    assert len(m._predict_exec_cache) == n_exec
    # noise on the diagonal only
    off1 = cov1 - np.diag(np.diag(cov1[0] if cov1.ndim == 3 else cov1))
    assert np.isfinite(mu2).all() and np.isfinite(cov2).all()
    assert np.isfinite(off1).all()


def test_fold_bernoulli_classification():
    rng = np.random.default_rng(2)
    X = rng.standard_normal((60, 2))
    Y = ((X[:, :1] + X[:, 1:2]) > 0).astype(float)
    m = gm.GPClassification(X, Y)
    p_f, v_f = m.predict(X[:9])
    mu_r, var_r = m._raw_predict(X[:9])
    p_u, v_u = m.likelihood.predictive_values(mu_r, var_r, False)
    np.testing.assert_allclose(p_f, np.asarray(p_u), rtol=1e-10)
    np.testing.assert_allclose(v_f, np.asarray(v_u), rtol=1e-10)
    assert ((p_f >= 0) & (p_f <= 1)).all()


def test_quantile_fold_matches_eager():
    X, Y = _toy(seed=5)
    m = gm.GPRegression(X, Y, gk.RBF(2))
    Xs = X[:8]
    lo, hi = m.predict_quantiles(Xs)
    # eager reference
    mu, var = m._raw_predict(Xs)
    lo_r, hi_r = m.likelihood.predictive_quantiles(mu, var, (2.5, 97.5))
    np.testing.assert_allclose(lo, np.asarray(lo_r), rtol=1e-10)
    np.testing.assert_allclose(hi, np.asarray(hi_r), rtol=1e-10)
    assert (lo < hi).all()
    # a folded quantile executable exists in the cache
    assert any(isinstance(k[-1], tuple) and k[-1] and k[-1][0] == "quant"
               for k in m._predict_exec_cache)


def test_custom_likelihood_object_not_cached_as_self():
    X, Y = _toy(seed=3)
    m = gm.GPRegression(X, Y, gk.RBF(2), noise_var=0.25)
    Xs = X[:5]
    _, var_self = m.predict(Xs)
    other = Gaussian(variance=4.0)
    _, var_other = m.predict(Xs, likelihood=other)
    np.testing.assert_allclose(var_other - var_self, 4.0 - 0.25, rtol=1e-8)


def test_posterior_samples_fold_statistics_and_seed_behavior():
    X, Y = _toy(seed=6, n=60)
    m = gm.GPRegression(X, Y, gk.RBF(2))
    m.optimize(max_iters=30)
    Xs = X[:12]
    s = m.posterior_samples_f(Xs, size=4000, seed=7)
    assert s.shape == (12, 1, 4000)
    assert any(isinstance(k[-1], tuple) and k[-1] and k[-1][0] == "samplesf"
               for k in m._predict_exec_cache), "sample fold not exercised"
    # same seed deterministic, different seed different
    s2 = m.posterior_samples_f(Xs, size=4000, seed=7)
    np.testing.assert_array_equal(s, s2)
    s3 = m.posterior_samples_f(Xs, size=4000, seed=8)
    assert not np.array_equal(s, s3)
    # fresh seeds must NOT create new executables (PRNG key is an argument)
    n_exec = len(m._predict_exec_cache)
    for sd in range(20, 25):
        m.posterior_samples_f(Xs, size=4000, seed=sd)
    assert len(m._predict_exec_cache) == n_exec
    # moments match the analytic posterior
    mu, var = m._raw_predict(Xs, full_cov=False)
    emp_mu = s.mean(axis=-1)
    emp_sd = s.std(axis=-1)
    np.testing.assert_allclose(emp_mu, np.asarray(mu), atol=4 * np.sqrt(np.asarray(var)).max() / np.sqrt(4000) + 1e-3)
    np.testing.assert_allclose(emp_sd, np.sqrt(np.asarray(var)), rtol=0.15)
    # y-samples carry the likelihood noise on top
    ys = m.posterior_samples(Xs, size=4000, seed=7, full_cov=False)
    noise = float(np.asarray(m.likelihood.variance))
    np.testing.assert_allclose(np.ravel(ys.std(axis=-1) ** 2),
                               np.ravel(np.asarray(var)) + noise, rtol=0.25)


def test_override_raw_predict_subclasses_still_route():
    # InputWarpedGP overrides _raw_predict; folding must not bypass it
    rng = np.random.default_rng(4)
    X = np.abs(rng.standard_normal((30, 2))) * 2
    Y = np.sin(X[:, :1]) + 0.05 * rng.standard_normal((30, 1))
    m = gm.InputWarpedGP(X, Y)
    mu, var = m.predict(X[:6])
    mu_r, var_r = m._raw_predict(X[:6])
    mu_u, var_u = m.likelihood.predictive_values(mu_r, var_r, False)
    np.testing.assert_allclose(mu, np.asarray(mu_u), rtol=1e-10)
    np.testing.assert_allclose(var, np.asarray(var_u), rtol=1e-10)
