"""Sparse GP regression models.

Reference: GPy/models/sparse_gp_regression.py:12 (VarDTC default),
GPy/models/sparse_gp_classification.py (EPDTC — here provided via FITC/VarDTC
bounds or SVGP for non-Gaussian).
"""
from __future__ import annotations

import numpy as np

from ..core.sparse_gp import SparseGP
from ..inference.var_dtc import VarDTC
from ..inference.fitc import FITC, DTC, PEP
from ..kern import RBF
from ..likelihoods import Gaussian

__all__ = ["SparseGPRegression"]


def _default_Z(X, num_inducing, seed=0):
    X = np.asarray(X)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(X.shape[0])[:num_inducing]
    return X[idx].copy()


class SparseGPRegression(SparseGP):
    """Sparse GP regression (default VarDTC collapsed bound).

    infer='vardtc' | 'fitc' | 'dtc' | 'pep'.
    """

    def __init__(self, X, Y, kernel=None, Z=None, num_inducing=10, mean_function=None,
                 normalizer=None, noise_var=1.0, infer="vardtc", pep_alpha=0.5,
                 name="sparse_gp"):
        if kernel is None:
            kernel = RBF(np.asarray(X).shape[1])
        if Z is None:
            Z = _default_Z(X, num_inducing)
        inference = {
            "vardtc": lambda: VarDTC(),
            "fitc": lambda: FITC(),
            "dtc": lambda: DTC(),
            "pep": lambda: PEP(pep_alpha),
        }[infer]()
        super().__init__(
            X, Y, Z, kernel, Gaussian(variance=noise_var),
            inference_method=inference, mean_function=mean_function,
            name=name, normalizer=normalizer,
        )
