"""GPVariationalGaussianApproximation model.

Reference: GPy/models/gp_var_gauss.py:12 (+ var_gauss.py inference).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.gp import GP
from ..core.transformations import Logexp
from ..inference.var_gauss import VarGauss

__all__ = ["GPVariationalGaussianApproximation"]


class GPVariationalGaussianApproximation(GP):
    def __init__(self, X, Y, kernel, likelihood, Y_metadata=None, name="VarGP"):
        super().__init__(X, Y, kernel, likelihood, inference_method=VarGauss(),
                         Y_metadata=Y_metadata, name=name)
        N = self.num_data
        self._add_param("alpha", np.zeros((N, 1)))
        self._add_param("lam", np.ones((N, 1)), transform=Logexp())

    def log_likelihood(self):
        return self.inference_method.elbo(
            self.kern, self.X, self.likelihood, self.Y_normalized,
            jnp.asarray(self.alpha), jnp.asarray(self.lam), self.Y_metadata,
        )

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, self.X, self.likelihood, self.Y_normalized,
            jnp.asarray(self.alpha), jnp.asarray(self.lam), self.Y_metadata,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post
