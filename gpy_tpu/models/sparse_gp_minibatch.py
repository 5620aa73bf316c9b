"""SparseGPMiniBatch + BayesianGPLVMMiniBatch: missing-data sparse models.

Reference: GPy/models/sparse_gp_minibatch.py:18 (missing-data + stochastic
dimension loops), GPy/models/bayesian_gplvm_minibatch.py:12,
GPy/inference/optimization/stochastics.py (dimension schedulers).

TPU design: the per-dimension missing-data "outer loop"
(sparse_gp_minibatch.py:228) is a vmap inside VarDTCMissingData; the
stochastic-dimension schedule is unnecessary for the collapsed bound (the
vmap evaluates all dimensions in parallel on-chip), so `missing_data=True`
gives exact full-batch treatment where GPy subsampled for speed.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.sparse_gp import SparseGP
from ..core.variational import NormalPosterior
from ..inference.var_dtc import VarDTC
from ..inference.var_dtc_missing import VarDTCMissingData
from ..kern import RBF
from ..likelihoods import Gaussian
from ..util.initialization import initialize_latent

__all__ = ["SparseGPMiniBatch", "BayesianGPLVMMiniBatch"]


class SparseGPMiniBatch(SparseGP):
    def __init__(self, X, Y, Z, kernel, likelihood, inference_method=None,
                 missing_data=False, stochastic=False, batchsize=1,
                 name="sparse gp minibatch", **kw):
        Ynp = np.asarray(Y, dtype=float)
        self.missing_data = bool(missing_data) or bool(np.isnan(Ynp).any())
        if inference_method is None:
            inference_method = VarDTCMissingData() if self.missing_data else VarDTC()
        super().__init__(X, Ynp, Z, kernel, likelihood,
                         inference_method=inference_method, name=name, **kw)

    def log_likelihood(self):
        return self.inference_method.marginal_likelihood(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, None, self.Y_metadata,
        )


class BayesianGPLVMMiniBatch(SparseGPMiniBatch):
    """Bayesian GPLVM with missing data (GPy: bayesian_gplvm_minibatch.py:12)."""

    def __init__(self, Y, input_dim, X=None, X_variance=None, init="PCA",
                 num_inducing=10, Z=None, kernel=None, missing_data=True,
                 stochastic=False, batchsize=1, name="bgplvm minibatch"):
        Ynp = np.asarray(Y, dtype=float)
        Yfill = np.where(np.isnan(Ynp), np.nanmean(Ynp, axis=0, keepdims=True), Ynp)
        if X is None:
            X, _ = initialize_latent(init, input_dim, Yfill)
        if X_variance is None:
            X_variance = 0.5 * np.ones_like(X)
        rng = np.random.default_rng(0)
        if Z is None:
            Z = X[rng.permutation(X.shape[0])[:num_inducing]].copy()
        if kernel is None:
            kernel = RBF(input_dim, ARD=True)
        super().__init__(X, Ynp, Z, kernel, Gaussian(variance=1.0),
                         missing_data=missing_data, name=name)
        self.qX = NormalPosterior(X, X_variance)

    def log_likelihood(self):
        bound = self.inference_method.marginal_likelihood(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, None, self.Y_metadata, qX=self.qX,
        )
        return bound - self.qX.KL()
