"""Variational posterior containers for uncertain inputs.

Reference: GPy/core/parameterization/variational.py (VariationalPrior:12,
NormalPrior:25, SpikeAndSlabPrior:39, VariationalPosterior:98,
NormalPosterior:147, SpikeAndSlabPosterior:175).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp, Logistic
from .module import Module

__all__ = ["NormalPosterior", "NormalPrior", "SpikeAndSlabPosterior", "SpikeAndSlabPrior"]


class NormalPosterior(Module):
    """q(X) = prod_n N(x_n | mean_n, diag(variance_n)). GPy: variational.py:147."""

    def __init__(self, means, variances, name="latent_space"):
        super().__init__(name=name)
        self._add_param("mean", np.asarray(means, dtype=float))
        self._add_param("variance", np.asarray(variances, dtype=float), transform=Logexp())

    @property
    def num_data(self):
        return self._raw["mean"].shape[0]

    @property
    def input_dim(self):
        return self._raw["mean"].shape[1]

    def KL(self):
        """KL(q(X) || N(0, I)). GPy: NormalPrior.KL_divergence."""
        mu = jnp.asarray(self.mean)
        S = jnp.asarray(self.variance)
        return 0.5 * jnp.sum(mu**2 + S - jnp.log(S) - 1.0)


class NormalPrior:
    """p(X) = N(0, I); the KL lives on the posterior object."""

    def KL_divergence(self, qX):
        return qX.KL()


class SpikeAndSlabPosterior(Module):
    """q(X) with per-point inclusion probabilities gamma (IBP-flavoured SS-GPLVM).

    GPy: variational.py:175. The effective q used in psi statistics is the
    mean-field product gamma * N(mu, S).
    """

    def __init__(self, means, variances, binary_prob, name="ss_latent"):
        super().__init__(name=name)
        self._add_param("mean", np.asarray(means, dtype=float))
        self._add_param("variance", np.asarray(variances, dtype=float), transform=Logexp())
        self._add_param("gamma", np.asarray(binary_prob, dtype=float), transform=Logistic(1e-10, 1 - 1e-10))

    def KL(self, pi=0.5):
        """KL vs spike-and-slab prior with inclusion prob pi."""
        mu = jnp.asarray(self.mean)
        S = jnp.asarray(self.variance)
        g = jnp.asarray(self.gamma)
        kl_gauss = 0.5 * jnp.sum(g * (mu**2 + S - jnp.log(S) - 1.0))
        pi = jnp.asarray(pi)
        kl_bern = jnp.sum(
            g * (jnp.log(g) - jnp.log(pi)) + (1 - g) * (jnp.log1p(-g) - jnp.log1p(-pi))
        )
        return kl_gauss + kl_bern


class SpikeAndSlabPrior:
    def __init__(self, pi=0.5):
        self.pi = pi

    def KL_divergence(self, qX):
        return qX.KL(self.pi)
