"""Explicit basis-function kernels: K = v * phi(X) phi(X2)^T.

Reference: GPy/kern/src/basis_funcs.py (BasisFuncKernel:10,
PolynomialBasisFuncKernel:105, LinearSlopeBasisFuncKernel:126,
ChangePointBasisFuncKernel:148, DomainKernel:163, LogisticBasisFuncKernel:177).
The phi-products are single matmuls.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = [
    "BasisFuncKernel",
    "PolynomialBasisFuncKernel",
    "LinearSlopeBasisFuncKernel",
    "ChangePointBasisFuncKernel",
    "DomainKernel",
    "LogisticBasisFuncKernel",
]


class BasisFuncKernel(Kern):
    def __init__(self, input_dim, variance=1.0, active_dims=None, ARD=False, name="basis_func"):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        self._add_param("variance", variance, transform=Logexp())

    def _phi(self, X):
        raise NotImplementedError

    def phi(self, X):
        return self._phi(self._slice(jnp.asarray(X)))

    def K(self, X, X2=None):
        p1 = self._phi(self._slice(X))
        p2 = p1 if X2 is None else self._phi(self._slice(X2))
        v = jnp.asarray(self.variance)
        if self.ARD:
            return (p1 * v) @ p2.T
        return v * (p1 @ p2.T)

    def Kdiag(self, X):
        p = self._phi(self._slice(X))
        v = jnp.asarray(self.variance)
        if self.ARD:
            return jnp.sum(p * v * p, axis=1)
        return v * jnp.sum(p * p, axis=1)

    def posterior_inf(self, X, posterior):
        """Mean/cov of the basis-function weights given the GP posterior.

        GPy: basis_funcs.py:80-88."""
        p = self.phi(X)
        v = jnp.asarray(self.variance)
        phi_alpha = v * p
        mean = phi_alpha.T @ posterior.woodbury_vector
        cov = v * jnp.eye(p.shape[1]) - phi_alpha.T @ posterior.woodbury_inv @ phi_alpha
        return mean, cov


class PolynomialBasisFuncKernel(BasisFuncKernel):
    def __init__(self, input_dim, degree, variance=1.0, active_dims=None, ARD=True, name="polynomial_basis"):
        self.degree = int(degree)
        if ARD:
            variance = np.full((degree + 1,), float(variance))  # one per basis column
        super().__init__(input_dim, variance, active_dims, ARD, name)

    def _phi(self, X):
        return jnp.concatenate([X ** i for i in range(self.degree + 1)], axis=1)


class LinearSlopeBasisFuncKernel(BasisFuncKernel):
    """Slope active between start and stop. GPy: basis_funcs.py:126."""

    def __init__(self, input_dim, start, stop, variance=1.0, active_dims=None, ARD=False, name="linear_slope"):
        self.start = np.asarray(start, dtype=float)
        self.stop = np.asarray(stop, dtype=float)
        super().__init__(input_dim, variance, active_dims, ARD, name)

    def _phi(self, X):
        phi = jnp.clip(X, self.start, self.stop)
        return phi - (self.stop + self.start) / 2.0


class ChangePointBasisFuncKernel(BasisFuncKernel):
    def __init__(self, input_dim, changepoint, variance=1.0, active_dims=None, ARD=False, name="changepoint"):
        self.changepoint = np.asarray(changepoint, dtype=float)
        super().__init__(input_dim, variance, active_dims, ARD, name)

    def _phi(self, X):
        return jnp.where(X < self.changepoint, -1.0, 1.0)


class DomainKernel(LinearSlopeBasisFuncKernel):
    """Constant-in-domain indicator. GPy: basis_funcs.py:163."""

    def __init__(self, input_dim, start, stop, variance=1.0, active_dims=None, ARD=False, name="constant_domain"):
        super().__init__(input_dim, start, stop, variance, active_dims, ARD, name)

    def _phi(self, X):
        return jnp.where((X > self.start) & (X < self.stop), 1.0, 0.0)


class LogisticBasisFuncKernel(BasisFuncKernel):
    """Smooth changepoint(s) with learnable slope. GPy: basis_funcs.py:177."""

    def __init__(self, input_dim, centers, variance=1.0, slope=1.0, active_dims=None,
                 ARD=False, ARD_slope=True, name="logistic"):
        self.centers = np.asarray(centers, dtype=float).reshape(1, -1)
        super().__init__(input_dim, variance, active_dims, ARD, name)
        nslopes = self.centers.shape[1] if ARD_slope else 1
        self._add_param("slope", np.full((nslopes,), float(slope)))

    def _phi(self, X):
        s = jnp.asarray(self.slope)
        z = s * (X - self.centers)
        phi = 1.0 / (1.0 + jnp.exp(-jnp.clip(z, -30, 30)))
        return jnp.nan_to_num(phi)
