"""Gaussian likelihoods (closed forms everywhere).

Reference: GPy/likelihoods/gaussian.py (Gaussian:21, HeteroscedasticGaussian:~300).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.transformations import Logexp
from .likelihood import Likelihood
from .link_functions import Identity

__all__ = ["Gaussian", "HeteroscedasticGaussian"]


class Gaussian(Likelihood):
    log_concave = True  # W >= 0 everywhere (Laplace chol path)

    def __init__(self, gp_link=None, variance=1.0, name="Gaussian_noise"):
        super().__init__(gp_link or Identity(), name=name)
        self._add_param("variance", variance, transform=Logexp())

    def gaussian_variance(self, Y_metadata=None):
        return jnp.asarray(self.variance)

    # --- closed forms ------------------------------------------------------
    def logpdf_link(self, link_f, y, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        return -0.5 * jnp.log(2 * jnp.pi * s2) - 0.5 * (y - link_f) ** 2 / s2

    def conditional_mean(self, f):
        return self.gp_link.transf(f)

    def conditional_variance(self, f):
        return jnp.broadcast_to(jnp.asarray(self.variance), jnp.shape(f))

    def variational_expectations(self, Y, m, v, Y_metadata=None, gh_points_=None):
        """Closed form E_q[log N(y; f, s2)]."""
        s2 = self.gaussian_variance(Y_metadata)
        Y = jnp.asarray(Y)
        return -0.5 * jnp.log(2 * jnp.pi * s2) - 0.5 * ((Y - m) ** 2 + v) / s2

    def moments_match_ep(self, Y, tau, v, Y_metadata=None, degree=None):
        """Analytic Gaussian site moments."""
        s2 = self.gaussian_variance(Y_metadata)
        sigma2 = 1.0 / tau
        mu = v / tau
        Y = jnp.asarray(Y)
        sum_var = s2 + sigma2
        logZ = -0.5 * jnp.log(2 * jnp.pi * sum_var) - 0.5 * (Y - mu) ** 2 / sum_var
        mu_hat = mu + sigma2 * (Y - mu) / sum_var
        sigma2_hat = sigma2 - sigma2**2 / sum_var
        return logZ, mu_hat, sigma2_hat

    def predictive_values(self, mu, var, full_cov=False, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        if full_cov:
            n = mu.shape[0]
            return mu, var + s2 * jnp.eye(n, dtype=mu.dtype)
        return mu, var + s2

    def predictive_mean(self, mu, var, Y_metadata=None):
        return mu

    def predictive_variance(self, mu, var, predictive_mean=None, Y_metadata=None):
        return var + self.gaussian_variance(Y_metadata)

    def predictive_quantiles(self, mu, var, quantiles, Y_metadata=None, **kw):
        from scipy.stats import norm

        s2 = self.gaussian_variance(Y_metadata)
        sd = jnp.sqrt(var + s2)
        return [mu + float(norm.ppf(q / 100.0)) * sd for q in quantiles]

    def log_predictive_density(self, y_test, mu_star, var_star, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        t = var_star + s2
        return -0.5 * jnp.log(2 * jnp.pi * t) - 0.5 * (jnp.asarray(y_test) - mu_star) ** 2 / t

    def samples_given_f(self, key, f, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        return f + jnp.sqrt(s2) * jax.random.normal(key, jnp.shape(f), dtype=jnp.asarray(f).dtype)

    # hook used by exact inference to add noise to the Gram diagonal
    def noise_diagonal(self, N, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        return jnp.broadcast_to(s2, (N,)) if jnp.ndim(s2) == 0 else s2.reshape(-1)


class HeteroscedasticGaussian(Gaussian):
    """Per-datapoint noise variance, indexed by Y_metadata['output_index'].

    GPy: gaussian.py HeteroscedasticGaussian.
    """

    def __init__(self, Y_metadata, gp_link=None, variance=1.0, name="het_Gauss"):
        num = int(np.asarray(Y_metadata["output_index"]).size)
        Likelihood.__init__(self, gp_link or Identity(), name=name)
        self._add_param("variance", np.full(num, float(variance)), transform=Logexp())

    def gaussian_variance(self, Y_metadata=None):
        v = jnp.asarray(self.variance)
        if Y_metadata is not None and "output_index" in Y_metadata:
            idx = jnp.asarray(Y_metadata["output_index"], dtype=jnp.int32).reshape(-1)
            return v[idx].reshape(np.asarray(Y_metadata["output_index"]).shape)
        return v

    def conditional_variance(self, f):
        return jnp.broadcast_to(jnp.mean(jnp.asarray(self.variance)), jnp.shape(f))

    def noise_diagonal(self, N, Y_metadata=None):
        return self.gaussian_variance(Y_metadata).reshape(-1)
