"""SparseGP base: inducing-point GP with Z as a trainable parameter.

Reference: GPy/core/sparse_gp.py:42-142 (+ sparse_gp_mpi.py — the MPI
data-parallel path, replaced by mesh sharding in parallel/).

The `_update_gradients` psi-statistics routing (sparse_gp.py:85-120)
disappears: dF/dZ flows by autodiff because Z is just another raw leaf.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..inference.var_dtc import VarDTC
from .gp import GP

__all__ = ["SparseGP"]


class SparseGP(GP):
    def __init__(self, X, Y, Z, kernel, likelihood, inference_method=None,
                 mean_function=None, name="sparse_gp", Y_metadata=None, normalizer=None):
        super().__init__(
            X, Y, kernel, likelihood,
            inference_method=inference_method or VarDTC(),
            mean_function=mean_function, name=name, Y_metadata=Y_metadata,
            normalizer=normalizer,
        )
        self._add_param("Z", np.asarray(Z, dtype=float))
        self.num_inducing = np.asarray(Z).shape[0]

    @property
    def _predictive_variable(self):
        return jnp.asarray(self.Z)

    def log_likelihood(self):
        return self.inference_method.marginal_likelihood(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, self.mean_function, self.Y_metadata,
        )

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, self.mean_function, self.Y_metadata,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post
