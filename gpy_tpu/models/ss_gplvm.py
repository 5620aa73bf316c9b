"""Spike-and-slab GPLVM / MRD.

Reference: GPy/models/ss_gplvm.py:177 (SSGPLVM) and GPy/models/ss_mrd.py:19
(SSMRD) — variational GPLVM with per-(point, dim) inclusion probabilities
gamma (IBP-flavoured latent selection), using the spike-and-slab psi
statistics (ssrbf_psi_comp.py).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.sparse_gp import SparseGP
from ..core.variational import SpikeAndSlabPosterior
from ..inference.var_dtc import VarDTC
from ..kern import RBF
from ..likelihoods import Gaussian
from ..util.initialization import initialize_latent

__all__ = ["SSGPLVM", "SSMRD"]


class SSGPLVM(SparseGP):
    def __init__(self, Y, input_dim, X=None, X_variance=None, Gamma=None,
                 init="PCA", num_inducing=10, Z=None, kernel=None, pi=0.5,
                 name="ss_gplvm"):
        Y = np.asarray(Y, dtype=float)
        if X is None:
            X, _ = initialize_latent(init, input_dim, Y)
        if X_variance is None:
            X_variance = 0.5 * np.ones_like(X)
        if Gamma is None:
            Gamma = 0.5 + 0.1 * (np.random.default_rng(0).random(X.shape) - 0.5)
        rng = np.random.default_rng(0)
        if Z is None:
            Z = X[rng.permutation(X.shape[0])[:num_inducing]].copy()
        if kernel is None:
            kernel = RBF(input_dim, ARD=True)
        noise0 = max(0.01 * float(np.var(Y)), 1e-4)  # avoid all-noise collapse
        super().__init__(X, Y, Z, kernel, Gaussian(variance=noise0),
                         inference_method=VarDTC(), name=name)
        self.pi = float(pi)
        self.qX = SpikeAndSlabPosterior(X, X_variance, Gamma)

    def log_likelihood(self):
        bound = self.inference_method.marginal_likelihood(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, None, self.Y_metadata, qX=self.qX,
        )
        return bound - self.qX.KL(self.pi)

    @property
    def latent_gamma(self):
        return np.asarray(self.qX.gamma)


class SSMRD:
    """Multi-view spike-and-slab MRD (GPy: ss_mrd.py:19): per-view SSGPLVMs
    coupled through a shared inclusion prior."""

    def __init__(self, Ylist, input_dim, num_inducing=10, pi=0.5, name="ss_mrd"):
        self.models = [
            SSGPLVM(Y, input_dim, num_inducing=num_inducing, pi=pi,
                    name=f"{name}_view{i}")
            for i, Y in enumerate(Ylist)
        ]

    def optimize(self, **kw):
        for m in self.models:
            m.optimize(**kw)

    def log_likelihood(self):
        return sum(float(m.log_likelihood()) for m in self.models)
