"""Uncertain-input (psi-statistics) posterior prediction.

Reference: GPy/inference/latent_function_inference/posterior.py:249-270
(the VariationalPosterior branch of Posterior._raw_predict) and
inferenceX.py:1-173 (variational infer_newX).

Oracles (no importable reference):
  1. variance -> 0 collapses to the deterministic predict path;
  2. Monte-Carlo: sample x ~ q(X*), dense-predict, average — the psi
     branch must match E[mu] and E[var + mu^2] - E[mu]^2 to MC tolerance;
  3. finite-difference checkgrad through the psi-predict (CPU/f64).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from types import SimpleNamespace

from gpy_tpu.models import BayesianGPLVM
from gpy_tpu.core.variational import NormalPosterior

rng = np.random.default_rng(3)


def _bgplvm(n=30, d=4, q=2, m=8):
    Y = rng.standard_normal((n, d))
    Y[:, 0] += np.sin(np.linspace(0, 4, n))
    model = BayesianGPLVM(Y, q, num_inducing=m)
    return model


def test_zero_variance_matches_deterministic():
    m = _bgplvm()
    Xs = rng.standard_normal((5, 2))
    qX = SimpleNamespace(mean=jnp.asarray(Xs), variance=jnp.full((5, 2), 1e-12))
    mu_u, var_u = m._raw_predict(qX)
    mu_d, var_d = m._raw_predict(Xs)
    np.testing.assert_allclose(np.asarray(mu_u), np.asarray(mu_d), atol=1e-6)
    # psi branch gives per-output (N,D) variance; deterministic gives (N,1)
    np.testing.assert_allclose(
        np.asarray(var_u), np.broadcast_to(np.asarray(var_d), var_u.shape), atol=1e-6
    )


def test_monte_carlo_oracle():
    m = _bgplvm()
    mu_x = rng.standard_normal((4, 2)) * 0.5
    S_x = 0.05 + 0.1 * rng.random((4, 2))
    qX = NormalPosterior(mu_x, S_x)
    mu_u, var_u = m._raw_predict(qX)

    # MC oracle: sample x ~ q, predict dense, combine moments
    n_mc = 6000
    xs = mu_x[None] + np.sqrt(S_x)[None] * rng.standard_normal((n_mc, 4, 2))
    post, kern, pv = m.posterior, m.kern, m._predictive_variable

    @jax.jit
    def dense(x):
        return post._raw_predict(kern, x, pv, full_cov=False)

    mus, vars_ = jax.vmap(dense)(jnp.asarray(xs.reshape(-1, 4, 2)))
    mus = np.asarray(mus)          # (n_mc, 4, D)
    vars_ = np.asarray(vars_)
    Ef = mus.mean(0)
    Vf = (vars_ + mus**2).mean(0) - Ef**2
    np.testing.assert_allclose(np.asarray(mu_u), Ef, atol=4 * np.abs(Ef).max() / np.sqrt(n_mc) + 2e-2)
    np.testing.assert_allclose(np.asarray(var_u), Vf, rtol=0.1, atol=2e-2)


def test_checkgrad_through_psi_predict():
    m = _bgplvm()
    post, kern, pv = m.posterior, m.kern, m._predictive_variable
    mu_x = rng.standard_normal((3, 2)) * 0.5
    S_x = 0.05 + 0.1 * rng.random((3, 2))
    w = jnp.asarray(rng.standard_normal((3, m.output_dim)))

    def f(mu, S):
        qX = SimpleNamespace(mean=mu, variance=S)
        mu_p, var_p = post._raw_predict(kern, qX, pv, full_cov=False)
        return jnp.sum(w * mu_p) + jnp.sum(var_p)

    g_mu, g_S = jax.grad(f, argnums=(0, 1))(jnp.asarray(mu_x), jnp.asarray(S_x))
    eps = 1e-6
    for idx in [(0, 0), (1, 1), (2, 0)]:
        e = np.zeros_like(mu_x)
        e[idx] = eps
        fd = (f(jnp.asarray(mu_x + e), jnp.asarray(S_x)) - f(jnp.asarray(mu_x - e), jnp.asarray(S_x))) / (2 * eps)
        assert float(fd) == pytest.approx(float(g_mu[idx]), rel=1e-4, abs=1e-7)
        fd = (f(jnp.asarray(mu_x), jnp.asarray(S_x + e)) - f(jnp.asarray(mu_x), jnp.asarray(S_x - e))) / (2 * eps)
        assert float(fd) == pytest.approx(float(g_S[idx]), rel=1e-4, abs=1e-7)


def test_predict_accepts_normal_posterior():
    m = _bgplvm()
    qX = NormalPosterior(rng.standard_normal((4, 2)), 0.1 * np.ones((4, 2)))
    mu, var = m.predict(qX)
    assert mu.shape == (4, m.output_dim) and var.shape[0] == 4
    assert np.all(np.isfinite(mu)) and np.all(var > 0)


def test_infer_newX_variational():
    m = _bgplvm(n=40)
    m.optimize(optimizer="lbfgsb", max_iters=30, messages=False)
    Y_new = np.asarray(m.Y)[:5] + 0.01 * rng.standard_normal((5, m.output_dim))
    qX, elbo = m.infer_newX(Y_new, optimize_iters=300, lr=5e-2, variational=True)
    assert isinstance(qX, NormalPosterior)
    assert np.asarray(qX.mean).shape == (5, 2)
    assert np.all(np.asarray(qX.variance) > 0)
    assert np.isfinite(elbo)
    # reconstruction through the inferred q(X*) should roughly recover Y_new
    mu, _ = m.predict(qX)
    base = np.mean((Y_new - np.asarray(m.Y).mean(0)) ** 2)
    assert np.mean((mu - Y_new) ** 2) < base
