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
        post = self._compute_posterior()
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    def _compute_posterior(self):
        """One cached jitted program for the plain-VarDTC posterior (see
        GP._compute_posterior: eager inference pays a per-op compile +
        ~24ms tunnel dispatch per operation on TPU). Z is a parameter, so
        it comes from the functional copy inside the trace."""
        from ..inference.var_dtc import VarDTC
        from ..inference.posterior import Posterior as _WPost

        if (type(self.inference_method) is VarDTC
                and not hasattr(self.X, "variance")):
            key = ("postexec", self.structure_version(), self._data_version(),
                   tuple(np.shape(self.X)))
            ecache = self.__dict__.setdefault("_posterior_exec_cache", {})
            fn = ecache.get(key)
            if fn is None:
                import jax

                def _fn(fl, X, Y):
                    mod = self.with_flat_raw(fl)
                    p, _ = self.inference_method.inference(
                        mod.kern, X, jnp.asarray(mod.Z), mod.likelihood, Y,
                        mod.mean_function, self.Y_metadata)
                    return p._woodbury_vector, p._woodbury_inv, p._K

                fn = jax.jit(_fn)
                ecache[key] = fn
            wv, wi, K = fn(jnp.asarray(self.get_flat_raw()),
                           jnp.asarray(self.X),
                           jnp.asarray(self.Y_normalized))
            return _WPost(woodbury_vector=wv, woodbury_inv=wi, K=K)
        post, _ = self.inference_method.inference(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, self.mean_function, self.Y_metadata,
        )
        return post
