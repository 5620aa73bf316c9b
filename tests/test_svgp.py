"""SVGP tests. Mirrors GPy/testing/test_svgp.py (grad checks for Gaussian /
classification / Poisson) plus: ELBO <= exact log-marginal, collapsed-bound
recovery at the optimum, natural-gradient one-step optimality for fixed
hypers (Gaussian case).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpy_tpu.core.svgp import SVGP
from gpy_tpu.models import GPRegression
from gpy_tpu.models.sparse_gp_regression import SparseGPRegression
from gpy_tpu.likelihoods import Gaussian, Bernoulli, Poisson
import gpy_tpu.kern as gk

rng = np.random.default_rng(11)


def _toy(n=30):
    X = np.linspace(0, 5, n).reshape(n, 1)
    Y = np.sin(X) + 0.2 * rng.standard_normal((n, 1))
    return X, Y


def test_elbo_is_lower_bound():
    X, Y = _toy(25)
    m = SVGP(X, Y, X[::3].copy(), gk.RBF(1), Gaussian(variance=0.1))
    exact = GPRegression(X, Y, noise_var=0.1)
    assert float(m.log_likelihood()) <= float(exact.log_likelihood()) + 1e-6


def test_checkgrad_gaussian():
    X, Y = _toy(15)
    m = SVGP(X, Y, X[::4].copy(), gk.RBF(1), Gaussian(variance=0.2))
    assert m.checkgrad()


def test_checkgrad_classification():
    X, Y = _toy(15)
    Yc = (Y > 0).astype(float)
    m = SVGP(X, Yc, X[::4].copy(), gk.RBF(1), Bernoulli())
    assert m.checkgrad()


def test_checkgrad_poisson():
    X, _ = _toy(15)
    Y = rng.poisson(np.exp(np.sin(X))).astype(float)
    m = SVGP(X, Y, X[::4].copy(), gk.RBF(1), Poisson())
    assert m.checkgrad()


def test_optimized_svgp_approaches_collapsed_bound():
    """At the optimum over (m, S), the uncollapsed ELBO equals the collapsed
    VarDTC bound (Titsias) for Gaussian likelihood — with matched Z/hypers."""
    X, Y = _toy(25)
    Z = X[::3].copy()
    collapsed = SparseGPRegression(X, Y, Z=Z.copy(), noise_var=0.1)
    collapsed.kern.lengthscale = 1.0

    m = SVGP(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.1))
    m.kern.lengthscale = 1.0
    # optimize only the variational params
    for path, mod, n in m.named_params():
        if n not in ("q_u_mean", "q_u_chol"):
            mod._specs[n].fixed = True
    m.optimize(max_iters=500)
    assert float(m.log_likelihood()) == pytest.approx(float(collapsed.log_likelihood()), abs=0.05)


def test_natgrad_single_step_optimal_gaussian():
    """For Gaussian likelihood and lr=1, one natural-gradient step lands on
    the exact optimal q(u) (conjugate case)."""
    X, Y = _toy(20)
    Z = X[::3].copy()
    m = SVGP(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.1))
    elbo_before = float(m.log_likelihood())
    m.fit(iters=1, batchsize=20, step_size=0.0, natgrad_step_size=1.0, seed=0)
    elbo_mid = float(m.log_likelihood())
    m.fit(iters=1, batchsize=20, step_size=0.0, natgrad_step_size=1.0, seed=1)
    elbo_after = float(m.log_likelihood())
    assert elbo_mid > elbo_before
    # second step barely moves (already at the conjugate optimum)
    assert abs(elbo_after - elbo_mid) < 1e-5 * max(1.0, abs(elbo_mid))
    # and matches collapsed bound
    collapsed = SparseGPRegression(X, Y, Z=Z.copy(), noise_var=0.1)
    assert elbo_after == pytest.approx(float(collapsed.log_likelihood()), abs=1e-4)


def test_fit_stochastic_improves():
    X, Y = _toy(60)
    m = SVGP(X, Y, X[::6].copy(), gk.RBF(1), Gaussian(variance=0.5), batchsize=15)
    e0 = float(m.log_likelihood())
    trace = m.fit(iters=200, batchsize=15, step_size=5e-2, natgrad_step_size=0.2)
    assert float(m.log_likelihood()) > e0
    # predictions sensible
    mu, _ = m.predict(X)
    assert np.sqrt(np.mean((mu - Y) ** 2)) < 0.4


def test_stochastic_grad_api():
    X, Y = _toy(30)
    m = SVGP(X, Y, X[::4].copy(), gk.RBF(1), Gaussian(), batchsize=10)
    g = m.stochastic_grad()
    assert g.shape == (m.num_free_params,)
    assert np.all(np.isfinite(g))


def test_elbo_parts_S_equals_parts_L():
    """The closed-form-in-S ELBO (natgrad hot path) must equal the chol-based
    one at S = L L', logdet S = 2 sum log diag L."""
    import jax.numpy as jnp
    from gpy_tpu.inference.svgp import svgp_elbo_parts_L, svgp_elbo_parts_S
    from gpy_tpu.likelihoods import Gaussian
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(5)
    N, M, D, Dy = 50, 12, 3, 2
    X = rng.standard_normal((N, D))
    Y = rng.standard_normal((N, Dy))
    Z = rng.standard_normal((M, D))
    q_mean = rng.standard_normal((M, Dy))
    A = rng.standard_normal((Dy, M, M)) * 0.2
    L = np.tril(A) + np.eye(M) * 1.2
    S = np.einsum("dij,dkj->dik", L, L)
    logdetS = 2.0 * np.sum(np.log(np.abs(np.diagonal(L, axis1=-2, axis2=-1))))
    k = gk.RBF(D, variance=0.7, lengthscale=1.3)
    lik = Gaussian(variance=0.2)
    dfL, klL = svgp_elbo_parts_L(k, jnp.asarray(X), jnp.asarray(Z), lik,
                                 jnp.asarray(Y), jnp.asarray(q_mean), jnp.asarray(L),
                                 None, 1.7, None)
    dfS, klS = svgp_elbo_parts_S(k, jnp.asarray(X), jnp.asarray(Z), lik,
                                 jnp.asarray(Y), jnp.asarray(q_mean), jnp.asarray(S),
                                 jnp.asarray(logdetS), None, 1.7, None)
    assert float(dfS) == pytest.approx(float(dfL), rel=1e-8)
    assert float(klS) == pytest.approx(float(klL), rel=1e-8)


def test_fit_natgrad_entropy_gradient_direction():
    """One natgrad step from a non-stationary point must increase the
    full-batch ELBO (exact total dS including the analytic entropy term)."""
    from gpy_tpu.core.svgp import SVGP
    from gpy_tpu.likelihoods import Gaussian
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(6)
    N, M = 80, 10
    X = rng.standard_normal((N, 2))
    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1)))
    Z = X[:M].copy()
    m = SVGP(X, Y, Z, gk.RBF(2), Gaussian(variance=0.5))
    e0 = float(m.log_likelihood())
    m.fit(iters=1, batchsize=N, use_natgrad=True, step_size=0.0, natgrad_step_size=0.05)
    e1 = float(m.log_likelihood())
    assert e1 > e0


def test_elbo_parts_S_white_equals_unwhitened():
    """Whitened ELBO at (v, S_w) = (Lmm^-1 m, Lmm^-1 S Lmm^-T) must equal the
    unwhitened one at (m, S) — value of both terms (SURVEY §7.6 whitened q(u))."""
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    from gpy_tpu.inference.svgp import (CONST_JITTER, svgp_elbo_parts_S,
                                        svgp_elbo_parts_S_white)
    from gpy_tpu.likelihoods import Gaussian
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(6)
    N, M, D, Dy = 40, 10, 2, 2
    X = rng.standard_normal((N, D))
    Y = rng.standard_normal((N, Dy))
    Z = rng.standard_normal((M, D))
    q_mean = rng.standard_normal((M, Dy))
    A = rng.standard_normal((Dy, M, M)) * 0.2
    L = np.tril(A) + np.eye(M) * 1.2
    S = np.einsum("dij,dkj->dik", L, L)
    logdetS = 2.0 * np.sum(np.log(np.abs(np.diagonal(L, axis1=-2, axis2=-1))))
    k = gk.RBF(D, variance=0.9, lengthscale=1.1)
    lik = Gaussian(variance=0.3)

    Kmm = k.K(jnp.asarray(Z)) + CONST_JITTER * jnp.eye(M)
    Lmm = jnp.linalg.cholesky(Kmm)
    Lmi = jsl.solve_triangular(Lmm, jnp.eye(M), lower=True)
    v = Lmi @ jnp.asarray(q_mean)
    S_w = jnp.einsum("ij,djk,lk->dil", Lmi, jnp.asarray(S), Lmi)
    logdetKmm = 2.0 * float(jnp.sum(jnp.log(jnp.diagonal(Lmm))))
    logdetSw = logdetS - Dy * logdetKmm

    dfU, klU = svgp_elbo_parts_S(k, jnp.asarray(X), jnp.asarray(Z), lik,
                                 jnp.asarray(Y), jnp.asarray(q_mean),
                                 jnp.asarray(S), jnp.asarray(logdetS), None, 1.3, None)
    dfW, klW = svgp_elbo_parts_S_white(k, jnp.asarray(X), jnp.asarray(Z), lik,
                                       jnp.asarray(Y), v, S_w,
                                       jnp.asarray(logdetSw), None, 1.3, None)
    assert float(dfW) == pytest.approx(float(dfU), rel=1e-7)
    assert float(klW) == pytest.approx(float(klU), rel=1e-6)


def test_fit_natgrad_reaches_collapsed_bound_both_parameterizations():
    """At FIXED hypers with a Gaussian likelihood the optimal q(u) is unique
    and the optimal ELBO equals the collapsed VarDTC bound — natgrad must
    recover it exactly in both whitened and unwhitened coordinates. This is
    the parameterization-invariance oracle (the joint stochastic trajectory
    is NOT invariant, so comparing joint-run endpoints is not a valid test)."""
    X, Y = _toy(120)
    Z = X[::6].copy()  # M=20 at 0.25 spacing: cond(Kmm) ~ 1e16, the hard case
    sp = SparseGPRegression(X, Y, kernel=gk.RBF(1), Z=Z.copy())
    sp.likelihood.variance.set_value(0.2)
    collapsed = float(sp.log_likelihood())
    for whiten in (False, True):
        m = SVGP(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.2))
        m.fit(iters=400, batchsize=120, step_size=0.0, use_natgrad=True,
              natgrad_step_size=0.5, whiten=whiten, seed=0)
        e = float(m.log_likelihood())
        assert e == pytest.approx(collapsed, abs=1e-5), whiten


def test_fit_plain_adam_whitened_conditioning():
    """Plain Adam on the whitened chol factor converges to the collapsed
    bound where the unwhitened factor stalls (the whole point of whitening:
    Kmm's conditioning is removed from the variational geometry). Also
    covers the plain path's PD-safety: Adam on the factor, never on S."""
    X, Y = _toy(120)
    Z = X[::6].copy()
    sp = SparseGPRegression(X, Y, kernel=gk.RBF(1), Z=Z.copy())
    sp.likelihood.variance.set_value(0.2)
    collapsed = float(sp.log_likelihood())
    elbos = {}
    for whiten in (False, True):
        m = SVGP(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.2))
        e0 = float(m.log_likelihood())
        for p in (m.kern.variance, m.kern.lengthscale, m.likelihood.variance, m.Z):
            p.fix()
        m.fit(iters=3000, batchsize=120, step_size=2e-2, use_natgrad=False,
              whiten=whiten, seed=0)
        e = float(m.log_likelihood())
        assert np.isfinite(e) and e > e0 - 1e-6, whiten
        assert e <= collapsed + 1e-6, whiten  # still a lower bound
        elbos[whiten] = e
    assert elbos[True] == pytest.approx(collapsed, abs=1e-3)
    assert elbos[True] >= elbos[False] - 1e-6


def test_fit_whitened_joint_run_improves_and_stores_unwhitened():
    """Joint (hypers + q) whitened fit improves the ELBO and writes back
    ordinary unwhitened (q_u_mean, q_u_chol): the public parameterization
    is unchanged and predictions come out of the standard posterior path."""
    X, Y = _toy(120)
    Z = X[::6].copy()
    m = SVGP(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.2))
    e0 = float(m.log_likelihood())
    m.fit(iters=400, batchsize=120, step_size=2e-2, use_natgrad=True,
          natgrad_step_size=0.3, whiten=True, seed=0)
    e1 = float(m.log_likelihood())
    assert e1 > e0
    mu, v = m.predict(X[:5])
    assert np.all(np.isfinite(mu)) and np.all(v > 0)
    # q_u params written back are the unwhitened ones: log_likelihood()
    # (which evaluates the UNwhitened ELBO from stored params) agrees with
    # the whitened objective's view — already asserted by e1 > e0 being
    # computed from stored params; also the factor must be lower-triangular
    from gpy_tpu.util.choleskies import flat_to_triang
    L = np.asarray(flat_to_triang(jnp.asarray(m.q_u_chol), Z.shape[0]))
    assert np.allclose(L, np.tril(L))
