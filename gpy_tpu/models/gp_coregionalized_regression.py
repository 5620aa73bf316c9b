"""Coregionalized (multi-output) regression models.

Reference: GPy/models/gp_coregionalized_regression.py:10,
GPy/models/sparse_gp_coregionalized_regression.py:11,
GPy/models/gp_heteroscedastic_regression.py:10,
GPy/models/gp_offset_regression.py:11.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.gp import GP
from ..core.sparse_gp import SparseGP
from ..inference.exact import ExactGaussianInference
from ..kern import RBF
from ..likelihoods import Gaussian, HeteroscedasticGaussian
from ..util import multioutput

__all__ = [
    "GPCoregionalizedRegression",
    "SparseGPCoregionalizedRegression",
    "GPHeteroscedasticRegression",
    "GPOffsetRegression",
]


class GPCoregionalizedRegression(GP):
    """ICM/LCM multi-output regression with MixedNoise likelihood."""

    def __init__(self, X_list, Y_list, kernel=None, likelihoods_list=None,
                 name="GPCR", W_rank=1, kernel_name="coreg"):
        X, Y, self.output_index = multioutput.build_XY(X_list, Y_list)
        if kernel is None:
            kernel = multioutput.ICM(X.shape[1] - 1, len(Y_list), RBF(X.shape[1] - 1),
                                     W_rank=W_rank, name=kernel_name)
        likelihood = multioutput.build_likelihood(Y_list, self.output_index, likelihoods_list)
        super().__init__(X, Y, kernel, likelihood, name=name,
                         Y_metadata={"output_index": self.output_index},
                         inference_method=ExactGaussianInference())


class SparseGPCoregionalizedRegression(SparseGP):
    """Sparse version (VarDTC with het noise via MixedNoise)."""

    def __init__(self, X_list, Y_list, Z_list=None, kernel=None, likelihoods_list=None,
                 num_inducing=10, name="sparse_GPCR", W_rank=1, kernel_name="coreg"):
        X, Y, self.output_index = multioutput.build_XY(X_list, Y_list)
        if kernel is None:
            kernel = multioutput.ICM(X.shape[1] - 1, len(Y_list), RBF(X.shape[1] - 1),
                                     W_rank=W_rank, name=kernel_name)
        likelihood = multioutput.build_likelihood(Y_list, self.output_index, likelihoods_list)
        if Z_list is None:
            rng = np.random.default_rng(0)
            idx = rng.permutation(X.shape[0])[:num_inducing]
            Z = X[idx].copy()
        else:
            Z, _, _ = multioutput.build_XY(Z_list)
        super().__init__(X, Y, Z, kernel, likelihood, name=name,
                         Y_metadata={"output_index": self.output_index})


class GPHeteroscedasticRegression(GP):
    """Per-datapoint noise regression. GPy: gp_heteroscedastic_regression.py:10."""

    def __init__(self, X, Y, kernel=None, Y_metadata=None, name="GPHR"):
        X = np.asarray(X, dtype=float)
        if Y_metadata is None:
            Y_metadata = {"output_index": np.arange(X.shape[0]).reshape(-1, 1)}
        if kernel is None:
            kernel = RBF(X.shape[1])
        likelihood = HeteroscedasticGaussian(Y_metadata)
        super().__init__(X, Y, kernel, likelihood, Y_metadata=Y_metadata, name=name,
                         inference_method=ExactGaussianInference())


class GPOffsetRegression(GP):
    """Learns per-cluster input offsets: rows of cluster c see X + delta_c.

    GPy: gp_offset_regression.py:11 (last X column = cluster index).
    """

    def __init__(self, X, Y, kernel=None, Y_metadata=None, normalizer=None,
                 noise_var=1.0, mean_function=None, name="GP offset regression"):
        X = np.asarray(X, dtype=float)
        assert X.shape[1] > 1, "last column must be the cluster index"
        if kernel is None:
            kernel = RBF(X.shape[1] - 1)
        super().__init__(X, Y, kernel, Gaussian(variance=noise_var),
                         inference_method=ExactGaussianInference(),
                         Y_metadata=Y_metadata, normalizer=normalizer,
                         mean_function=mean_function, name=name)
        self.selected = np.asarray(X[:, -1], dtype=int)
        maxcluster = int(self.selected.max())
        self._add_param("offset", np.zeros(maxcluster))

    def _shifted_X(self):
        offs = jnp.concatenate([jnp.zeros((1,), dtype=self.X.dtype), jnp.asarray(self.offset).reshape(-1)])
        shift = offs[jnp.asarray(self.selected)]
        return self.X[:, :-1] + shift[:, None]

    def log_likelihood(self):
        Xs = self._shifted_X()
        _, lml = self.inference_method.inference(
            self.kern, Xs, self.likelihood, self.Y_normalized, self.mean_function, self.Y_metadata
        )
        return lml

    @property
    def _predictive_variable(self):
        return self._shifted_X()

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, self._shifted_X(), self.likelihood, self.Y_normalized,
            self.mean_function, self.Y_metadata,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    def _raw_predict(self, Xnew, full_cov=False, kern=None):
        """Xnew with cluster column; offsets applied before prediction."""
        Xnew = np.asarray(Xnew, dtype=float)
        sel = Xnew[:, -1].astype(int)
        offs = np.concatenate([[0.0], np.asarray(self.offset).reshape(-1)])
        Xs = jnp.asarray(Xnew[:, :-1] + offs[sel][:, None], dtype=self.X.dtype)
        kern = kern or self.kern
        return self.posterior._raw_predict(kern, Xs, self._predictive_variable, full_cov)
