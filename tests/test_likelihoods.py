"""Likelihood tower tests: density normalization, moment identities, EP/VE
consistency — the quadrature analogue of GPy/testing/test_likelihood.py's
derivative-tower grad checks (derivatives here are autodiff, so we test the
*values* and the quadrature engine instead).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import stats as sps

import gpy_tpu.likelihoods as lik


def _f(x):
    return float(np.asarray(x).reshape(-1)[0])

rng = np.random.default_rng(1)


def test_gaussian_logpdf_matches_scipy():
    l = lik.Gaussian(variance=0.7)
    f = rng.standard_normal((5, 1))
    y = rng.standard_normal((5, 1))
    lp = np.asarray(l.logpdf(jnp.asarray(f), jnp.asarray(y)))
    np.testing.assert_allclose(lp, sps.norm.logpdf(y, f, np.sqrt(0.7)), rtol=1e-10)


def test_bernoulli_probit_logpdf():
    l = lik.Bernoulli()
    f = np.array([[0.3], [-1.2]])
    y = np.array([[1.0], [0.0]])
    lp = np.asarray(l.logpdf(jnp.asarray(f), jnp.asarray(y)))
    expect = np.log(sps.norm.cdf(np.array([[0.3], [1.2]])))
    np.testing.assert_allclose(lp, expect, rtol=1e-8)


def test_poisson_logpdf():
    l = lik.Poisson()
    f = np.array([[0.5]])
    y = np.array([[3.0]])
    lp = _f(l.logpdf(jnp.asarray(f), jnp.asarray(y)))
    assert lp == pytest.approx(sps.poisson.logpmf(3, np.exp(0.5)), rel=1e-8)


def test_studentt_logpdf():
    l = lik.StudentT(deg_free=5.0, sigma2=2.0)
    f = np.array([[0.1]])
    y = np.array([[1.3]])
    lp = _f(l.logpdf(jnp.asarray(f), jnp.asarray(y)))
    assert lp == pytest.approx(sps.t.logpdf(1.3, df=5, loc=0.1, scale=np.sqrt(2.0)), rel=1e-8)


def test_gamma_logpdf():
    l = lik.Gamma(beta=1.5)
    f = np.array([[0.4]])
    y = np.array([[2.0]])
    alpha = np.exp(0.4) * 1.5
    lp = _f(l.logpdf(jnp.asarray(f), jnp.asarray(y)))
    assert lp == pytest.approx(sps.gamma.logpdf(2.0, a=alpha, scale=1 / 1.5), rel=1e-8)


def test_weibull_logpdf():
    l = lik.Weibull(beta=2.0)
    f = np.array([[0.3]])
    y = np.array([[1.2]])
    lam = np.exp(0.3)
    # GPy parameterization: scale lambda on y^r
    expect = np.log(2.0) - np.log(lam) + (2 - 1) * np.log(1.2) - 1.2**2 / lam
    assert _f(l.logpdf(jnp.asarray(f), jnp.asarray(y))) == pytest.approx(expect, rel=1e-8)


def test_exponential_logpdf():
    l = lik.Exponential()
    f = np.array([[0.2]])
    y = np.array([[1.5]])
    lam = np.exp(0.2)
    assert _f(l.logpdf(jnp.asarray(f), jnp.asarray(y))) == pytest.approx(
        sps.expon.logpdf(1.5, scale=1 / lam), rel=1e-8
    )


def test_loggaussian_logpdf():
    l = lik.LogGaussian(sigma=0.8)
    f = np.array([[0.1]])
    y = np.array([[2.0]])
    assert _f(l.logpdf(jnp.asarray(f), jnp.asarray(y))) == pytest.approx(
        sps.lognorm.logpdf(2.0, s=0.8, scale=np.exp(0.1)), rel=1e-7
    )


def test_binomial_logpdf():
    l = lik.Binomial()
    f = np.array([[0.4]])
    y = np.array([[3.0]])
    md = {"trials": np.array([[10.0]])}
    p = sps.norm.cdf(0.4)
    assert _f(l.logpdf(jnp.asarray(f), jnp.asarray(y), md)) == pytest.approx(
        sps.binom.logpmf(3, 10, p), rel=1e-8
    )


def test_gaussian_variational_expectations_closed_vs_quadrature():
    l = lik.Gaussian(variance=0.5)
    Y = rng.standard_normal((6, 1))
    m = rng.standard_normal((6, 1))
    v = 0.1 + rng.random((6, 1))
    closed = np.asarray(l.variational_expectations(jnp.asarray(Y), jnp.asarray(m), jnp.asarray(v)))
    quad = np.asarray(
        lik.Likelihood.variational_expectations(l, jnp.asarray(Y), jnp.asarray(m), jnp.asarray(v))
    )
    np.testing.assert_allclose(closed, quad, rtol=1e-6)


def test_gaussian_ep_moments_closed_vs_quadrature():
    l = lik.Gaussian(variance=0.5)
    Y = rng.standard_normal((6, 1))
    tau = 0.5 + rng.random((6, 1))
    v = rng.standard_normal((6, 1))
    z1, m1, s1 = l.moments_match_ep(jnp.asarray(Y), jnp.asarray(tau), jnp.asarray(v))
    z2, m2, s2 = lik.Likelihood.moments_match_ep(l, jnp.asarray(Y), jnp.asarray(tau), jnp.asarray(v), degree=40)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-3, atol=1e-6)


def test_bernoulli_ep_moments_analytic_vs_quadrature():
    l = lik.Bernoulli()
    Y = (rng.random((6, 1)) > 0.5).astype(float)
    tau = 0.5 + rng.random((6, 1))
    v = rng.standard_normal((6, 1))
    z1, m1, s1 = l.moments_match_ep(jnp.asarray(Y), jnp.asarray(tau), jnp.asarray(v))
    z2, m2, s2 = lik.Likelihood.moments_match_ep(l, jnp.asarray(Y), jnp.asarray(tau), jnp.asarray(v), degree=60)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-2, atol=1e-4)


def test_predictive_values_gaussian():
    l = lik.Gaussian(variance=0.3)
    mu = jnp.asarray(rng.standard_normal((4, 1)))
    var = jnp.asarray(0.2 + rng.random((4, 1)))
    m, v = l.predictive_values(mu, var)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mu))
    np.testing.assert_allclose(np.asarray(v), np.asarray(var) + 0.3, rtol=1e-10)


def test_predictive_values_poisson_quadrature():
    l = lik.Poisson()
    mu = jnp.asarray(np.array([[0.5]]))
    var = jnp.asarray(np.array([[0.25]]))
    m, v = l.predictive_values(mu, var)
    # E[y] = E[exp(f)] = exp(mu + var/2)
    assert _f(m) == pytest.approx(np.exp(0.5 + 0.125), rel=1e-4)


def test_mixed_noise():
    l = lik.MixedNoise([lik.Gaussian(variance=0.1), lik.Gaussian(variance=2.0)])
    md = {"output_index": np.array([[0], [1], [0]])}
    nd = np.asarray(l.noise_diagonal(3, md))
    np.testing.assert_allclose(nd, [0.1, 2.0, 0.1], rtol=1e-10)


def test_multioutput_likelihood_routing():
    l = lik.MultioutputLikelihood([lik.Gaussian(variance=1.0), lik.Bernoulli()])
    f = jnp.asarray(np.array([[0.5], [0.5]]))
    y = jnp.asarray(np.array([[0.2], [1.0]]))
    md = {"output_index": np.array([[0], [1]])}
    lp = np.asarray(l.logpdf(f, y, md))
    assert lp[0, 0] == pytest.approx(float(sps.norm.logpdf(0.2, 0.5, 1.0)), rel=1e-7)
    assert lp[1, 0] == pytest.approx(float(np.log(sps.norm.cdf(0.5))), rel=1e-7)


def test_log_predictive_density():
    l = lik.Gaussian(variance=0.4)
    val = _f(l.log_predictive_density(jnp.asarray([[1.0]]), jnp.asarray([[0.5]]), jnp.asarray([[0.3]])))
    assert val == pytest.approx(sps.norm.logpdf(1.0, 0.5, np.sqrt(0.7)), rel=1e-8)


def test_samples_shapes():
    for l, md in [
        (lik.Gaussian(), None),
        (lik.Bernoulli(), None),
        (lik.Poisson(), None),
        (lik.StudentT(), None),
        (lik.Weibull(), None),
        (lik.Exponential(), None),
    ]:
        f = jnp.asarray(rng.standard_normal((5, 1)))
        s = l.samples(f, Y_metadata=md)
        assert s.shape == (5, 1)


def test_mcmc_pdf_samples_gaussian_moments():
    # Metropolis samples of y*|f* should match the (known) Gaussian conditional.
    # GPy: likelihood.py:780 MCMC_pdf_samples (per-point Metropolis chains).
    l = lik.Gaussian(variance=0.25)
    f = jnp.asarray([[0.0], [2.0]])
    chains = l.MCMC_pdf_samples(f, num_samples=4000, stepsize=0.7, burn_in=500, seed=3)
    assert chains.shape == (2, 4000)
    assert 0.05 < l.last_mcmc_accept_ratio < 0.95
    assert np.allclose(chains.mean(axis=1), [0.0, 2.0], atol=0.1)
    assert np.allclose(chains.std(axis=1), 0.5, atol=0.08)


def test_mcmc_pdf_samples_nonanalytic():
    # Works for likelihoods with no direct sampler (positive support via link).
    l = lik.Gamma()
    chains = l.MCMC_pdf_samples(jnp.asarray([[0.5]]), num_samples=500,
                                stepsize=0.5, burn_in=200, seed=0)
    assert chains.shape == (1, 500)
    assert np.isfinite(chains).all()
