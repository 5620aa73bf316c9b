"""Y normalizers. Reference: GPy/util/normalizer.py (_Norm, Standardize, MeanNorm)."""
from __future__ import annotations

import numpy as np

__all__ = ["Standardize", "MeanNorm"]


class _Norm:
    def scale_by(self, Y):
        raise NotImplementedError

    def normalize(self, Y):
        raise NotImplementedError

    def inverse_mean(self, X):
        raise NotImplementedError

    def inverse_variance(self, var):
        return var

    def inverse_covariance(self, cov):
        return cov

    def scaled(self):
        return True

    def to_dict(self):
        return {"class": f"gpy_tpu.util.normalizer.{type(self).__name__}"}


class Standardize(_Norm):
    """(Y - mean) / std, per output column."""

    def __init__(self):
        self.mean = None
        self.std = None

    def scale_by(self, Y):
        Y = np.asarray(Y, dtype=float)
        self.mean = Y.mean(0, keepdims=True)
        self.std = Y.std(0, keepdims=True)
        self.std = np.where(self.std == 0, 1.0, self.std)

    def normalize(self, Y):
        return (Y - self.mean) / self.std

    def inverse_mean(self, X):
        return X * self.std + self.mean

    def inverse_variance(self, var):
        return var * self.std**2

    def inverse_covariance(self, cov):
        return cov * (self.std**2).reshape(-1)


class MeanNorm(_Norm):
    def __init__(self):
        self.mean = None

    def scale_by(self, Y):
        self.mean = np.asarray(Y, dtype=float).mean(0, keepdims=True)

    def normalize(self, Y):
        return Y - self.mean

    def inverse_mean(self, X):
        return X + self.mean
