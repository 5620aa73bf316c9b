"""Sparse GP regression models.

Reference: GPy/models/sparse_gp_regression.py:12 (VarDTC default),
GPy/models/sparse_gp_classification.py (EPDTC — here provided via FITC/VarDTC
bounds or SVGP for non-Gaussian).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.sparse_gp import SparseGP
from ..inference.var_dtc import VarDTC
from ..inference.fitc import FITC, DTC, PEP
from ..kern import RBF
from ..likelihoods import Gaussian

__all__ = ["SparseGPRegression", "SparseGPRegressionMD"]


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
                 X_variance=None, normalizer=None, noise_var=1.0, infer="vardtc",
                 pep_alpha=0.5, name="sparse_gp"):
        if kernel is None:
            kernel = RBF(np.asarray(X).shape[1])
        if Z is None:
            Z = _default_Z(X, num_inducing)
        if X_variance is not None and not (
                infer == "vardtc" or isinstance(infer, VarDTC)):
            raise ValueError("uncertain inputs need the VarDTC bound")
        if isinstance(infer, str):
            inference = {
                "vardtc": lambda: VarDTC(),
                "fitc": lambda: FITC(),
                "dtc": lambda: DTC(),
                "pep": lambda: PEP(pep_alpha),
            }[infer]()
        else:  # an inference instance, e.g. VarDTC_minibatch(batchsize=...)
            inference = infer
        super().__init__(
            X, Y, Z, kernel, Gaussian(variance=noise_var),
            inference_method=inference, mean_function=mean_function,
            name=name, normalizer=normalizer,
        )
        # Uncertain inputs (GPy sparse_gp_regression.py:12 X_variance path):
        # X ~ N(X, X_variance) is FIXED data — the VarDTC bound uses the
        # psi-statistic expectations instead of the plain Gram matrices.
        self._X_variance = None if X_variance is None else np.asarray(
            X_variance, dtype=float)

    def _qX(self):
        if self._X_variance is None:
            return None
        from ..core.variational import NormalPosterior
        return NormalPosterior(np.asarray(self.X), self._X_variance)

    def log_likelihood(self):
        qX = self._qX()
        if qX is None:
            return super().log_likelihood()
        return self.inference_method.marginal_likelihood(
            self.kern, None, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, self.mean_function, self.Y_metadata, qX=qX,
        )

    @property
    def posterior(self):
        qX = self._qX()
        if qX is None:
            return SparseGP.posterior.fget(self)
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, None, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, self.mean_function, self.Y_metadata, qX=qX,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post


class SparseGPRegressionMD(SparseGP):
    """Sparse GP regression with missing data (indexD API).

    Reference: GPy/models/sparse_gp_regression_md.py:12 — D independent
    output dimensions sharing one GP prior, each observed at its own subset
    of the stacked input rows; indexD[n] gives row n's output.

    TPU design: the stacked (X, Y, indexD) data is scattered into an
    (N, D) matrix with NaNs at unobserved entries and routed to
    VarDTCMissingData, whose W_nd = 0 masking vmaps the per-dimension
    collapsed bounds (reference VarDTC_MD's python loop over d,
    vardtc_md.py) into one program.
    """

    def __init__(self, X, Y, indexD, kernel=None, Z=None, num_inducing=10,
                 normalizer=None, individual_Y_noise=False, name="sparse_gp_md"):
        from ..inference.var_dtc_missing import VarDTCMissingData

        X = np.asarray(X, dtype=float)
        Y = np.asarray(Y, dtype=float).reshape(-1)
        indexD = np.asarray(indexD).astype(int).reshape(-1)
        assert X.shape[0] == Y.shape[0] == indexD.shape[0]
        D = int(indexD.max()) + 1
        N = X.shape[0]
        Yfull = np.full((N, D), np.nan)
        Yfull[np.arange(N), indexD] = Y

        if kernel is None:
            kernel = RBF(X.shape[1])
        if Z is None:
            Z = _default_Z(X, num_inducing)
        if individual_Y_noise:
            noise0 = np.array([np.var(Y[indexD == d]) * 0.01 + 1e-8
                               for d in range(D)])
        else:
            noise0 = float(np.var(Y)) * 0.01
        super().__init__(
            X, Yfull, Z, kernel, Gaussian(variance=noise0),
            inference_method=VarDTCMissingData(), name=name,
            normalizer=normalizer,
        )
        self.__dict__["output_dim"] = D
        self.__dict__["indexD"] = indexD
        self.individual_Y_noise = bool(individual_Y_noise)
