"""Symmetry-constrained and split-domain kernels.

Reference: GPy/kern/src/symmetric.py (Symmetric:6) and
GPy/kern/src/splitKern.py (DEtime:10, SplitKern:81) and grid_kerns.py
(GridRBF).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .kern import Kern
from .stationary import RBF

__all__ = ["Symmetric", "SplitKern", "DEtime", "GridRBF"]


class Symmetric(Kern):
    """k(x,x') ± cross terms through the reflection A (even/odd symmetry)."""

    def __init__(self, base_kernel, transform, symmetry_type="even", name="symmetric_kernel"):
        n_dims = int(max(base_kernel.active_dims) + 1)
        super().__init__(n_dims, list(range(n_dims)), name=name)
        assert symmetry_type in ("even", "odd")
        self.symmetry_sign = -1.0 if symmetry_type == "odd" else 1.0
        self.base_kernel = base_kernel
        self.A = jnp.asarray(np.asarray(transform, dtype=float))

    def K(self, X, X2=None):
        s = self.symmetry_sign
        XA = X @ self.A
        if X2 is None:
            k = self.base_kernel.K
            return k(X) + s * k(XA, X) + s * k(X, XA) + k(XA, XA)
        X2A = X2 @ self.A
        k = self.base_kernel.K
        return k(X, X2) + s * k(XA, X2) + s * k(X, X2A) + k(XA, X2A)

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))


class SplitKern(Kern):
    """Two domains (indexed by the last column) share kernel k within-domain;
    across domains the covariance is k_cross = k(x, xd)k(xd, x')/k(xd, xd)
    through a divergence point xd. GPy: splitKern.py:81 (DEtime use case)."""

    def __init__(self, kernel, Xd, index_dim=-1, name="SplitKern"):
        super().__init__(kernel.input_dim + 1, None, name)
        self.base_kern = kernel
        self.Xd = jnp.asarray(np.asarray(Xd, dtype=float).reshape(1, -1))
        self.index_dim = index_dim

    def _cross(self, X, X2):
        kd = self.base_kern.K(self.Xd, self.Xd)[0, 0]
        return (self.base_kern.K(X, self.Xd) @ self.base_kern.K(self.Xd, X2)) / kd

    def K(self, X, X2=None):
        idx1 = jnp.asarray(X[:, self.index_dim], dtype=jnp.int32)
        Xv = X[:, :-1]
        if X2 is None:
            idx2, X2v = idx1, Xv
        else:
            idx2 = jnp.asarray(X2[:, self.index_dim], dtype=jnp.int32)
            X2v = X2[:, :-1]
        same = idx1[:, None] == idx2[None, :]
        return jnp.where(same, self.base_kern.K(Xv, X2v), self._cross(Xv, X2v))

    def Kdiag(self, X):
        return self.base_kern.Kdiag(X[:, :-1])


class DEtime(SplitKern):
    """Differential-equation time-split kernel (GPy: splitKern.py:10) —
    SplitKern with an RBF base by default."""

    def __init__(self, kernel=None, Xd=0.0, index_dim=-1, name="DEtime"):
        kernel = kernel or RBF(1)
        super().__init__(kernel, np.atleast_1d(Xd), index_dim, name)


class GridRBF(RBF):
    """RBF restricted to grid-axis inputs (GPy: grid_kerns.py) — identical
    covariance; kept for API parity with GpGrid models (which here accept
    any kernel with a K method, so this is an alias with the GPy name)."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="gridRBF"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)
