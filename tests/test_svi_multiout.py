"""Kronecker-factored SVI multi-output (LVMOGP) bound + models.

Reference GPy is not importable here, so correctness is pinned by
mathematical cross-method oracles:
  1. D=1 / Mr=1 / unit row kernel reduces the LVMOGP bound to the plain
     uncollapsed SVGP ELBO (inference/svgp.py), and its posterior to the
     SVGP woodbury prediction.
  2. q(Xr) with variance -> 0 must agree with certain row inputs (the psi
     statistics collapse to Gram matrices).
  3. The missing-data bound on the FULL stacking of (n, d) pairs must equal
     the full-data bound exactly (the reference's two files satisfy the
     same identity).
  4. SparseGPRegressionMD's masked bound equals the sum of independent
     per-output VarDTC bounds on each output's own rows.
"""
import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

import gpy_tpu.kern as gk
from gpy_tpu.core.variational import NormalPosterior
from gpy_tpu.inference.svgp import svgp_elbo_parts
from gpy_tpu.inference.svi_multiout import (PosteriorMultioutput, _common,
                                            svi_multiout_elbo,
                                            svi_multiout_md_elbo)
from gpy_tpu.likelihoods import Gaussian
from gpy_tpu.util.choleskies import triang_to_flat

rng = np.random.default_rng(0)

N, Mc = 25, 7
X = rng.random((N, 2)) * 3
Zc = X[rng.permutation(N)[:Mc]].copy()
NOISE = 0.05

D, Mr, Qr = 4, 3, 2
Yf = np.hstack([np.sin(X[:, :1]), np.cos(X[:, :1]), X[:, :1] * 0.2,
                np.sin(2 * X[:, :1])]) + 0.05 * rng.standard_normal((N, 4))
Xr4 = rng.standard_normal((D, Qr))
Zr4 = rng.standard_normal((Mr, Qr))
mu4 = rng.standard_normal((Mc, Mr)) * 0.5
_B = rng.standard_normal((Mr, Mr)) * 0.3
Sr4 = _B @ _B.T + 0.4 * np.eye(Mr)
_A = rng.standard_normal((Mc, Mc)) * 0.3
Sc_ = _A @ _A.T + 0.5 * np.eye(Mc)


def _kc():
    return gk.RBF(2, variance=0.7, lengthscale=1.3)


def _kr4():
    return gk.RBF(Qr, variance=0.9, lengthscale=1.1)


def test_d1_reduction_matches_svgp_elbo():
    """Mr=1, certain single row at Zr, k_r(0,0)=1 => q(U) == q(u) with
    covariance Sr*Sc = Sc; the bound must equal datafit - KL of the plain
    SVGP ELBO (up to the row-side 1e-6 jitter)."""
    kr = gk.RBF(1, variance=1.0, lengthscale=1.0)
    Xr = np.zeros((1, 1)); Zr = np.zeros((1, 1))
    mu = rng.standard_normal((Mc, 1)) * 0.5
    Y = Yf[:, :1]
    lo = float(svi_multiout_elbo(kr, _kc(), jnp.asarray(Xr), jnp.asarray(X),
                                 jnp.asarray(Zr), jnp.asarray(Zc), NOISE,
                                 jnp.asarray(Y), jnp.asarray(mu),
                                 jnp.eye(1), jnp.asarray(Sc_)))
    Lc_flat = triang_to_flat(jnp.linalg.cholesky(jnp.asarray(Sc_))[None])
    datafit, kl = svgp_elbo_parts(_kc(), jnp.asarray(X), jnp.asarray(Zc),
                                  Gaussian(variance=NOISE), jnp.asarray(Y),
                                  jnp.asarray(mu), Lc_flat)
    ls = float(datafit - kl)
    assert abs(lo - ls) < 1e-4 * (1 + abs(ls)), (lo, ls)


def test_d1_reduction_prediction_matches_svgp_posterior():
    kr = gk.RBF(1, variance=1.0, lengthscale=1.0)
    Xr = np.zeros((1, 1)); Zr = np.zeros((1, 1))
    mu = rng.standard_normal((Mc, 1)) * 0.5
    kc = _kc()
    cm = _common(kr, kc, jnp.asarray(Xr), jnp.asarray(Zr), jnp.asarray(Zc),
                 jnp.asarray(mu), jnp.eye(1), jnp.asarray(Sc_))
    post = PosteriorMultioutput(cm, kc, jnp.asarray(Zc))
    Xnew = rng.random((9, 2)) * 3
    pm, pv = post._raw_predict(jnp.asarray(Xnew))
    Kmm = kc.K(jnp.asarray(Zc)) + 1e-6 * jnp.eye(Mc)
    L = jnp.linalg.cholesky(Kmm)
    kxm = kc.K(jnp.asarray(Xnew), jnp.asarray(Zc))
    mu_s = kxm @ jsl.cho_solve((L, True), jnp.asarray(mu))
    KiSKi = jsl.cho_solve((L, True), jsl.cho_solve((L, True), jnp.asarray(Sc_)).T)
    Kmmi = jsl.cho_solve((L, True), jnp.eye(Mc))
    var_s = kc.Kdiag(jnp.asarray(Xnew)) - jnp.einsum(
        "nm,mk,nk->n", kxm, Kmmi - KiSKi, kxm)
    np.testing.assert_allclose(np.asarray(pm[:, 0]), np.asarray(mu_s[:, 0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pv[:, 0]), np.asarray(var_s),
                               atol=1e-4)


def test_uncertain_rows_tiny_variance_match_certain():
    qXr_tiny = NormalPosterior(Xr4, np.full((D, Qr), 1e-10))
    args = (jnp.asarray(X), jnp.asarray(Zr4), jnp.asarray(Zc), NOISE,
            jnp.asarray(Yf), jnp.asarray(mu4), jnp.asarray(Sr4),
            jnp.asarray(Sc_))
    l_cert = float(svi_multiout_elbo(_kr4(), _kc(), jnp.asarray(Xr4), *args))
    l_unc = float(svi_multiout_elbo(_kr4(), _kc(), qXr_tiny, *args))
    assert abs(l_cert - l_unc) < 1e-5 * (1 + abs(l_cert))


def test_md_bound_equals_full_bound_on_full_stacking():
    Xs = np.repeat(X, D, axis=0)
    idx = np.tile(np.arange(D), N)
    Ys = Yf.reshape(-1, 1)
    qXr = NormalPosterior(Xr4, 0.1 + 0.2 * rng.random((D, Qr)))
    l_full = float(svi_multiout_elbo(
        _kr4(), _kc(), qXr, jnp.asarray(X), jnp.asarray(Zr4), jnp.asarray(Zc),
        NOISE, jnp.asarray(Yf), jnp.asarray(mu4), jnp.asarray(Sr4),
        jnp.asarray(Sc_)))
    l_md = float(svi_multiout_md_elbo(
        _kr4(), _kc(), qXr, jnp.asarray(Xs), jnp.asarray(Zr4), jnp.asarray(Zc),
        NOISE, jnp.asarray(Ys), jnp.asarray(idx), D, jnp.asarray(mu4),
        jnp.asarray(Sr4), jnp.asarray(Sc_)))
    np.testing.assert_allclose(l_md, l_full, rtol=1e-10)


def test_md_heteroscedastic_noise_decomposes():
    """Per-output beta: the MD bound with distinct noises must equal the sum
    of single-output MD bounds with each output's own noise (row-KL terms
    excluded by differencing against the zero-data bound)."""
    idx = rng.integers(0, 2, size=N)
    y = np.sin(X[:, :1]).ravel()
    noises = np.array([0.03, 0.2])
    qXr = NormalPosterior(Xr4[:2], 0.1 + 0.2 * rng.random((2, Qr)))
    kr = _kr4(); kc = _kc()
    common = (kr, kc, qXr, jnp.asarray(X), jnp.asarray(Zr4[:2]),
              jnp.asarray(Zc))
    tail = (jnp.asarray(mu4[:, :2]), jnp.asarray(Sr4[:2, :2]), jnp.asarray(Sc_))
    l_het = float(svi_multiout_md_elbo(*common, jnp.asarray(noises),
                                       jnp.asarray(y), jnp.asarray(idx), 2,
                                       *tail))
    # per-output homoscedastic bounds, keeping the OTHER output's rows out
    # via an index that points at an empty third class
    acc = 0.0
    for d in range(2):
        yd = y[idx == d]
        Xd = X[idx == d]
        ld = float(svi_multiout_md_elbo(
            kr, kc, qXr, jnp.asarray(Xd), jnp.asarray(Zr4[:2]),
            jnp.asarray(Zc), float(noises[d]),
            jnp.asarray(yd), jnp.asarray(np.full(yd.shape[0], d)), 2, *tail))
        acc += ld
    # each per-output call added the global -KL(qU) term once; remove the
    # duplicate copy directly
    from gpy_tpu.inference.svi_multiout import _common as _cmn, _kl_qU
    cm = _cmn(kr, kc, qXr, jnp.asarray(Zr4[:2]), jnp.asarray(Zc), *tail)
    klq = float(_kl_qU(cm, Mc, 2))
    np.testing.assert_allclose(l_het, acc - klq, rtol=1e-8)


def test_model_checkgrad_and_optimize():
    from gpy_tpu.models import GPMultioutRegression

    n, d = 20, 3
    Xs = np.linspace(0, 5, n).reshape(-1, 1)
    F = np.sin(Xs)
    Y = np.hstack([F, 0.7 * F, -0.5 * F]) + 0.05 * rng.standard_normal((n, d))
    m = GPMultioutRegression(Xs, Y, Xr_dim=2, num_inducing=(6, 2), init="rand")
    assert m.checkgrad()
    ll0 = float(m.log_likelihood())
    m.optimize(max_iters=50)
    assert float(m.log_likelihood()) > ll0


def test_model_md_checkgrad_heter():
    from gpy_tpu.models import GPMultioutRegressionMD

    n = 18
    Xs = np.linspace(0, 5, n).reshape(-1, 1)
    y = np.sin(Xs).ravel() + 0.05 * rng.standard_normal(n)
    idx = rng.integers(0, 3, size=n)
    m = GPMultioutRegressionMD(Xs, y, idx, Xr_dim=1, num_inducing=(5, 2),
                               init="rand", heter_noise=True)
    assert m.checkgrad()
    ll0 = float(m.log_likelihood())
    m.optimize(max_iters=50)
    assert float(m.log_likelihood()) > ll0


def test_model_init_gp_protocol():
    from gpy_tpu.models import GPMultioutRegression

    n, d = 20, 3
    Xs = np.linspace(0, 5, n).reshape(-1, 1)
    F = np.sin(Xs)
    Y = np.hstack([F, 0.7 * F, -0.5 * F]) + 0.05 * rng.standard_normal((n, d))
    m = GPMultioutRegression(Xs, Y, Xr_dim=2, num_inducing=(6, 2), init="GP")
    assert np.isfinite(float(m.log_likelihood()))
    mu, _ = m.predict(Xs)
    # the GP warm start should already track the data reasonably
    assert np.corrcoef(mu[:, 0], Y[:, 0])[0, 1] > 0.5


def test_sparse_gp_regression_md_matches_independent_vardtc():
    from gpy_tpu.models import SparseGPRegression, SparseGPRegressionMD

    n = 30
    Xs = np.linspace(0, 5, n).reshape(-1, 1)
    y = np.sin(Xs).ravel() + 0.05 * rng.standard_normal(n)
    idx = np.r_[np.zeros(18, dtype=int), np.ones(12, dtype=int)]
    Z = Xs[::4].copy()
    m = SparseGPRegressionMD(Xs, y, idx, Z=Z.copy(), name="md")
    m.likelihood.variance = 0.07
    m.kern.lengthscale = 1.2
    acc = 0.0
    for d in range(2):
        md = SparseGPRegression(Xs[idx == d], y[idx == d].reshape(-1, 1),
                                Z=Z.copy())
        md.likelihood.variance = 0.07
        md.kern.lengthscale = 1.2
        acc += float(md.log_likelihood())
    np.testing.assert_allclose(float(m.log_likelihood()), acc, rtol=1e-8)
    assert m.checkgrad()
    # individual noise variant trains
    m2 = SparseGPRegressionMD(Xs, y, idx, Z=Z.copy(), individual_Y_noise=True)
    assert np.asarray(m2.likelihood.variance).shape == (2,)
    assert m2.checkgrad()
    ll0 = float(m2.log_likelihood())
    m2.optimize(max_iters=40)
    assert float(m2.log_likelihood()) > ll0
    mu, var = m2.predict(Xs[:5])
    assert mu.shape == (5, 2) and np.all(np.isfinite(mu))
