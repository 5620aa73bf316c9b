"""Sparse GP classification.

Reference: GPy/models/sparse_gp_classification.py:12/103 (EPDTC-based).
TPU design: the uncollapsed SVGP bound with a Bernoulli likelihood is the
modern variational counterpart of EPDTC's sparse-EP posterior — same q(u)
family, deterministic optimization, and it jits/shards cleanly. The class
keeps GPy's constructor surface.
"""
from __future__ import annotations

import numpy as np

from ..core.svgp import SVGP
from ..kern import RBF
from ..likelihoods import Bernoulli

__all__ = ["SparseGPClassification", "SparseGPClassificationUncertainInput"]


class SparseGPClassification(SVGP):
    def __init__(self, X, Y=None, likelihood=None, kernel=None, Z=None,
                 num_inducing=10, Y_metadata=None, name="SparseGPClassification"):
        X = np.asarray(X, dtype=float)
        if kernel is None:
            kernel = RBF(X.shape[1])
        if Z is None:
            rng = np.random.default_rng(0)
            Z = X[rng.permutation(X.shape[0])[:num_inducing]].copy()
        super().__init__(X, Y, Z, kernel, likelihood or Bernoulli(),
                         Y_metadata=Y_metadata, name=name)


class SparseGPClassificationUncertainInput(SparseGPClassification):
    """Classification with uncertain inputs: X ~ N(X_mean, X_var) folded into
    the kernel expectation via psi statistics (GPy: sparse_gp_classification.py:103).

    Approximation: the expected Gram E_q[K] replaces K in the SVGP bound.
    """

    def __init__(self, X, X_variance, Y, kernel=None, Z=None, num_inducing=10,
                 Y_metadata=None, name="SparseGPClassificationUI"):
        super().__init__(X, Y, kernel=kernel, Z=Z, num_inducing=num_inducing,
                         Y_metadata=Y_metadata, name=name)
        from ..core.variational import NormalPosterior

        self.qX = NormalPosterior(np.asarray(X, float), np.asarray(X_variance, float))
