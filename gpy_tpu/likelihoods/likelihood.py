"""Likelihood base: one quadrature engine replaces GPy's derivative towers.

Reference: GPy/likelihoods/likelihood.py (852 LoC): moments_match_ep:226-267,
variational_expectations:358-412 (GH quadrature of E_q[log p(y|f)] plus three
hand-derived gradient outputs), predictive_mean/variance:413-498,
predictive_values/quantiles:734-767.

TPU design: every non-analytic quantity is one vectorized Gauss-Hermite
quadrature over the latent marginal; *all* derivatives (dF/dmu, dF/dvar,
dF/dtheta, the EP dlogZ tower, Laplace's d3logpdf) come from autodiff through
`logpdf` — the single method a subclass must provide. This removes GPy's
biggest code-duplication axis (each likelihood hand-implements up to 15
derivative methods; see e.g. GPy/likelihoods/student_t.py).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.module import Module
from .link_functions import GPTransformation, Identity

__all__ = ["Likelihood"]

_GH_DEGREE = 20


def gh_points(degree: int = _GH_DEGREE, dtype=None):
    """Hermite-Gauss nodes/weights normalized for N(0,1) expectations."""
    x, w = np.polynomial.hermite.hermgauss(degree)
    x = x * np.sqrt(2.0)
    w = w / np.sqrt(np.pi)
    dt = dtype or jnp.result_type(float)
    return jnp.asarray(x, dtype=dt), jnp.asarray(w, dtype=dt)


class Likelihood(Module):
    """Base likelihood p(y | f). Subclasses implement `logpdf_link` (given
    transformed latent) and `conditional_mean/variance`."""

    # True on subclasses whose log p(y|f) is concave in f everywhere
    # (W = -d2 logpdf >= 0): lets Laplace route Newton solves through a
    # Cholesky of B = I + sqrtW K sqrtW instead of a general LU.
    # GPy parity: bernoulli.py:30 sets the same flag.
    log_concave = False

    def __init__(self, gp_link: Optional[GPTransformation] = None, name: str = "likelihood"):
        super().__init__(name=name)
        self.gp_link = gp_link or Identity()

    # --- core density -----------------------------------------------------
    def logpdf_link(self, link_f, y, Y_metadata=None):
        raise NotImplementedError

    def logpdf(self, f, y, Y_metadata=None):
        return self.logpdf_link(self.gp_link.transf(f), y, Y_metadata)

    def pdf(self, f, y, Y_metadata=None):
        return jnp.exp(self.logpdf(f, y, Y_metadata))

    # moments of y | f
    def conditional_mean(self, f):
        raise NotImplementedError

    def conditional_variance(self, f):
        raise NotImplementedError

    # --- Gauss-Hermite engine ---------------------------------------------
    def _quad_over_f(self, fn, mu, var, degree=_GH_DEGREE):
        """E_{N(f; mu, var)}[fn(f)] elementwise over mu/var arrays."""
        x, w = gh_points(degree, dtype=jnp.asarray(mu).dtype)
        mu = jnp.asarray(mu)
        sd = jnp.sqrt(jnp.maximum(jnp.asarray(var), 1e-15))
        f = mu[..., None] + sd[..., None] * x  # (..., P)
        return jnp.sum(w * fn(f), axis=-1)

    # --- variational expectations (SVGP / uncollapsed ELBO) ---------------
    def variational_expectations(self, Y, m, v, Y_metadata=None, gh_points_=_GH_DEGREE):
        """F_n = E_{N(f; m_n, v_n)}[log p(y_n | f)]. GPy: likelihood.py:358-412.

        Returns only F — gradients are autodiff's job.
        """
        Y = jnp.asarray(Y)
        return self._quad_over_f(
            lambda f: self.logpdf(f, Y[..., None], Y_metadata), m, v, gh_points_
        )

    # --- EP moment matching ------------------------------------------------
    def moments_match_ep(self, Y, tau, v, Y_metadata=None, degree=_GH_DEGREE):
        """Zeroth/first/second moments of p(y|f) N(f; v/tau, 1/tau).

        GPy: likelihood.py:226-267 (per-point, quadrature). Here fully
        vectorized over sites: returns (log Z_hat, mu_hat, sigma2_hat).
        """
        mu = v / tau
        sigma2 = 1.0 / tau
        x, w = gh_points(degree, dtype=jnp.asarray(mu).dtype)
        f = mu[..., None] + jnp.sqrt(sigma2)[..., None] * x
        logp = self.logpdf(f, jnp.asarray(Y)[..., None], Y_metadata)
        # log-sum-exp for Z to stay stable with extreme sites
        logw = jnp.log(w)
        logZ = jax.scipy.special.logsumexp(logp + logw, axis=-1)
        p = jnp.exp(logp + logw - logZ[..., None])
        Ef = jnp.sum(p * f, axis=-1)
        Ef2 = jnp.sum(p * f * f, axis=-1)
        return logZ, Ef, jnp.maximum(Ef2 - Ef**2, 1e-15)

    # --- predictive density -------------------------------------------------
    def predictive_values(self, mu, var, full_cov=False, Y_metadata=None):
        """Mean and variance of p(y* | x*). GPy: likelihood.py:734-757."""
        Ey = self._quad_over_f(lambda f: self.conditional_mean(f), mu, var)
        Ey2 = self._quad_over_f(
            lambda f: self.conditional_variance(f) + self.conditional_mean(f) ** 2, mu, var
        )
        return Ey, jnp.maximum(Ey2 - Ey**2, 1e-15)

    def predictive_mean(self, mu, var, Y_metadata=None):
        return self._quad_over_f(lambda f: self.conditional_mean(f), mu, var)

    def predictive_variance(self, mu, var, predictive_mean=None, Y_metadata=None):
        if predictive_mean is None:
            predictive_mean = self.predictive_mean(mu, var, Y_metadata)
        Ey2 = self._quad_over_f(
            lambda f: self.conditional_variance(f) + self.conditional_mean(f) ** 2, mu, var
        )
        return jnp.maximum(Ey2 - predictive_mean**2, 1e-15)

    def predictive_quantiles(self, mu, var, quantiles, Y_metadata=None, n_samples=2000, seed=0):
        """Quantiles of p(y*). Generic Monte-Carlo (GPy quadrature-searches).

        Gaussian overrides with the closed form.
        """
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        mu = jnp.asarray(mu)
        f = mu[..., None] + jnp.sqrt(jnp.asarray(var))[..., None] * jax.random.normal(
            k1, mu.shape + (n_samples,), dtype=mu.dtype
        )
        ys = self.samples_given_f(k2, f, Y_metadata)
        qs = jnp.percentile(ys, jnp.asarray(quantiles, dtype=mu.dtype), axis=-1)
        return [jnp.moveaxis(qs, 0, 0)[i] for i in range(len(quantiles))]

    def log_predictive_density(self, y_test, mu_star, var_star, Y_metadata=None):
        """log p(y* | x*) = log E_{N(f)}[p(y*|f)]. GPy: likelihood.py (via quad)."""
        x, w = gh_points(dtype=jnp.asarray(mu_star).dtype)
        f = jnp.asarray(mu_star)[..., None] + jnp.sqrt(jnp.asarray(var_star))[..., None] * x
        logp = self.logpdf(f, jnp.asarray(y_test)[..., None], Y_metadata)
        return jax.scipy.special.logsumexp(logp + jnp.log(w), axis=-1)

    # --- sampling ----------------------------------------------------------
    def samples_given_f(self, key, f, Y_metadata=None):
        raise NotImplementedError

    def samples(self, gp, Y_metadata=None, seed=0):
        """Sample y given latent sample(s) gp. GPy: likelihood.py:768."""
        return np.asarray(
            self.samples_given_f(jax.random.PRNGKey(seed), jnp.asarray(gp), Y_metadata)
        )

    def MCMC_pdf_samples(self, fNew, num_samples=1000, starting_loc=None,
                         stepsize=0.1, burn_in=1000, Y_metadata=None, seed=0):
        """Metropolis samples of y* | f* for likelihoods with no direct sampler.

        GPy: likelihood.py:780-852 — a Python loop of per-point random-walk
        Metropolis chains (one chain per row of fNew, shared stepsize), with
        the acceptance computed on pdf ratios. TPU design: all chains advance
        together inside ONE `lax.scan` (burn-in and kept phases are the same
        scan; kept samples are written into the output carrier), acceptance in
        the log domain (no overflow for peaked likelihoods).

        Returns an array of shape (n_chains, num_samples) like the reference.
        """
        fNew = jnp.asarray(fNew).reshape(-1, 1)
        if starting_loc is None:
            starting_loc = fNew
        y0 = jnp.asarray(starting_loc).reshape(-1)
        n = y0.shape[0]
        step = jnp.full((n,), stepsize, dtype=y0.dtype)
        total = int(burn_in) + int(num_samples)

        def logp(y):
            return self.logpdf(fNew, y[:, None], Y_metadata).reshape(-1)

        def mh_step(carry, key):
            y, lp = carry
            k1, k2 = jax.random.split(key)
            prop = y + step * jax.random.normal(k1, (n,), dtype=y.dtype)
            lp_prop = logp(prop)
            accept = jnp.log(jax.random.uniform(k2, (n,), dtype=y.dtype)) < (lp_prop - lp)
            y = jnp.where(accept, prop, y)
            lp = jnp.where(accept, lp_prop, lp)
            return (y, lp), (y, accept)

        keys = jax.random.split(jax.random.PRNGKey(seed), total)
        (_, _), (chain, accepted) = jax.lax.scan(mh_step, (y0, logp(y0)), keys)
        self.last_mcmc_accept_ratio = float(jnp.mean(accepted[burn_in:]))
        return np.asarray(chain[burn_in:].T)

    # EP/Laplace helpers -----------------------------------------------------
    def d_logpdf_df(self, f, y, Y_metadata=None):
        g = jax.grad(lambda ff: jnp.sum(self.logpdf(ff, y, Y_metadata)))
        return g(f)

    def d2_logpdf_df2(self, f, y, Y_metadata=None):
        """Diagonal of the Hessian of sum logpdf wrt f (likelihoods factorize)."""
        def d1(ff):
            return jax.grad(lambda x: jnp.sum(self.logpdf(x, y, Y_metadata)))(ff)

        # elementwise second derivative via jvp with ones tangent
        _, d2 = jax.jvp(d1, (f,), (jnp.ones_like(f),))
        return d2
