"""Static kernels (no dependence on X values).

Reference: GPy/kern/src/static.py (White, Bias, Fixed, WhiteHeteroscedastic,
Precomputed).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["Static", "White", "Bias", "Fixed", "WhiteHeteroscedastic", "Precomputed"]


class Static(Kern):
    def __init__(self, input_dim, variance, active_dims, name):
        super().__init__(input_dim, active_dims, name)
        self._add_param("variance", variance, transform=Logexp())


class White(Static):
    """v * I (zero cross-covariance). GPy: static.py."""

    def __init__(self, input_dim=1, variance=1.0, active_dims=None, name="white"):
        super().__init__(input_dim, variance, active_dims, name)

    def K(self, X, X2=None):
        if X2 is None:
            return jnp.asarray(self.variance) * jnp.eye(X.shape[0], dtype=X.dtype)
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.asarray(self.variance) * jnp.ones(X.shape[0], dtype=X.dtype)

    def psi0(self, Z, qX):
        return jnp.asarray(self.variance) * jnp.ones(qX.mean.shape[0])

    def psi1(self, Z, qX):
        return jnp.zeros((qX.mean.shape[0], Z.shape[0]))

    def psi2n(self, Z, qX):
        return jnp.zeros((qX.mean.shape[0], Z.shape[0], Z.shape[0]))


class Bias(Static):
    """Constant covariance v. GPy: static.py."""

    def __init__(self, input_dim=1, variance=1.0, active_dims=None, name="bias"):
        super().__init__(input_dim, variance, active_dims, name)

    def K(self, X, X2=None):
        n2 = X.shape[0] if X2 is None else X2.shape[0]
        return jnp.asarray(self.variance) * jnp.ones((X.shape[0], n2), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.asarray(self.variance) * jnp.ones(X.shape[0], dtype=X.dtype)

    def psi0(self, Z, qX):
        return jnp.asarray(self.variance) * jnp.ones(qX.mean.shape[0])

    def psi1(self, Z, qX):
        return jnp.asarray(self.variance) * jnp.ones((qX.mean.shape[0], Z.shape[0]))

    def psi2n(self, Z, qX):
        v = jnp.asarray(self.variance)
        return v**2 * jnp.ones((qX.mean.shape[0], Z.shape[0], Z.shape[0]))


class Fixed(Static):
    """v * (fixed matrix). GPy: static.py Fixed."""

    def __init__(self, input_dim, covariance_matrix, variance=1.0, active_dims=None, name="fixed"):
        super().__init__(input_dim, variance, active_dims, name)
        self.fixed_K = jnp.asarray(covariance_matrix)

    def K(self, X, X2=None):
        if X2 is None:
            return jnp.asarray(self.variance) * self.fixed_K
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.asarray(self.variance) * jnp.diagonal(self.fixed_K)


class WhiteHeteroscedastic(Static):
    """Per-datapoint learned noise diag. GPy: static.py."""

    def __init__(self, input_dim=1, num_data=1, variance=1.0, active_dims=None, name="white_hetero"):
        Kern.__init__(self, input_dim, active_dims, name)
        self._add_param("variance", np.full(num_data, float(variance)), transform=Logexp())

    def K(self, X, X2=None):
        if X2 is None:
            return jnp.diag(jnp.asarray(self.variance))
        return jnp.zeros((X.shape[0], X2.shape[0]), dtype=X.dtype)

    def Kdiag(self, X):
        return jnp.asarray(self.variance)


class Precomputed(Fixed):
    """Precomputed covariance indexed by integer X. GPy: static.py Precomputed."""

    def __init__(self, input_dim, covariance_matrix, variance=1.0, active_dims=None, name="precomputed"):
        super().__init__(input_dim, covariance_matrix, variance, active_dims, name)

    def _index(self, X, X2):
        i1 = jnp.asarray(X[:, 0], dtype=jnp.int32)
        i2 = i1 if X2 is None else jnp.asarray(X2[:, 0], dtype=jnp.int32)
        return self.fixed_K[jnp.ix_(i1, i2)]

    def K(self, X, X2=None):
        return jnp.asarray(self.variance) * self._index(X, X2)

    def Kdiag(self, X):
        i1 = jnp.asarray(X[:, 0], dtype=jnp.int32)
        return jnp.asarray(self.variance) * self.fixed_K[i1, i1]
