"""Bernoulli likelihood with analytic probit EP moments.

Reference: GPy/likelihoods/bernoulli.py (logpdf_link:159, moments_match_ep
analytic probit path, conditional mean/variance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import log_ndtr, ndtr
from jax.scipy.stats import norm

from .likelihood import Likelihood
from .link_functions import Probit, Heaviside

__all__ = ["Bernoulli"]


class Bernoulli(Likelihood):
    log_concave = True  # W >= 0 everywhere (Laplace chol path)

    def __init__(self, gp_link=None, name="Bernoulli"):
        super().__init__(gp_link or Probit(), name=name)

    def _is_probit(self):
        return isinstance(self.gp_link, Probit)

    def _is_heaviside(self):
        return isinstance(self.gp_link, Heaviside)

    def logpdf_link(self, link_f, y, Y_metadata=None):
        # y in {0,1}; p = link_f
        p = jnp.clip(link_f, 1e-12, 1 - 1e-12)
        return y * jnp.log(p) + (1 - y) * jnp.log1p(-p)

    def logpdf(self, f, y, Y_metadata=None):
        if self._is_probit():
            # stable: log Phi(sign * f), sign = 2y-1
            sign = 2.0 * y - 1.0
            return log_ndtr(sign * f)
        return super().logpdf(f, y, Y_metadata)

    def conditional_mean(self, f):
        return self.gp_link.transf(f)

    def conditional_variance(self, f):
        p = self.gp_link.transf(f)
        return p * (1.0 - p)

    def moments_match_ep(self, Y, tau, v, Y_metadata=None, degree=None):
        """Analytic probit moment matching (Rasmussen & Williams 3.58).

        GPy: bernoulli.py moments_match_ep.
        """
        if self._is_heaviside():
            # Heaviside link: tilt = step(s*f) -> truncated-Gaussian moments.
            # GPy bernoulli.py:80-85 attempts this but references an
            # undefined variable `a` (NameError at runtime); the correct
            # factor is z. Z = Phi(z), z = s*mu/sigma.
            mu = v / tau
            sigma2 = 1.0 / tau
            s = 2.0 * jnp.asarray(Y) - 1.0
            sigma = jnp.sqrt(sigma2)
            z = s * mu / sigma
            logZ = log_ndtr(z)
            ratio = jnp.exp(norm.logpdf(z) - logZ)
            mu_hat = mu + s * sigma * ratio
            sigma2_hat = sigma2 * (1.0 - ratio * (z + ratio))
            return logZ, mu_hat, jnp.maximum(sigma2_hat, 1e-15)
        if not self._is_probit():
            return super().moments_match_ep(Y, tau, v, Y_metadata)
        mu = v / tau
        sigma2 = 1.0 / tau
        s = 2.0 * jnp.asarray(Y) - 1.0  # {0,1} -> {-1,+1}
        denom = jnp.sqrt(1.0 + sigma2)
        z = s * mu / denom
        logZ = log_ndtr(z)
        # N(z)/Phi(z) computed in log space for stability
        ratio = jnp.exp(norm.logpdf(z) - logZ)
        mu_hat = mu + s * sigma2 * ratio / denom
        sigma2_hat = sigma2 - sigma2**2 * ratio / (1.0 + sigma2) * (z + ratio)
        return logZ, mu_hat, jnp.maximum(sigma2_hat, 1e-15)

    def predictive_mean(self, mu, var, Y_metadata=None):
        if self._is_probit():
            return ndtr(mu / jnp.sqrt(1.0 + var))
        if self._is_heaviside():
            # E[step(f)] under N(mu, var): Phi(mu/sqrt(var)) — no +1 term
            # (the Heaviside link has no latent noise of its own).
            return ndtr(mu / jnp.sqrt(jnp.maximum(var, 1e-15)))
        return super().predictive_mean(mu, var, Y_metadata)

    def predictive_values(self, mu, var, full_cov=False, Y_metadata=None):
        p = self.predictive_mean(mu, var, Y_metadata)
        return p, p * (1.0 - p)

    def predictive_variance(self, mu, var, predictive_mean=None, Y_metadata=None):
        p = predictive_mean if predictive_mean is not None else self.predictive_mean(mu, var)
        return p * (1.0 - p)

    def samples_given_f(self, key, f, Y_metadata=None):
        p = self.gp_link.transf(f)
        return jax.random.bernoulli(key, p).astype(jnp.asarray(f).dtype)
