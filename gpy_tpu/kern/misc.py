"""Miscellaneous kernels: MLP, Poly, Brownian, Spline.

Reference: GPy/kern/src/mlp.py:11, poly.py:10, brownian.py:9, spline.py:9.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["MLP", "Poly", "Brownian", "Spline"]

FOUR_OVER_TAU = 2.0 / np.pi


class MLP(Kern):
    """Arc-sine / neural-network kernel. GPy: mlp.py:11-62."""

    def __init__(self, input_dim, variance=1.0, weight_variance=1.0, bias_variance=1.0,
                 ARD=False, active_dims=None, name="mlp"):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        if ARD:
            weight_variance = np.broadcast_to(
                np.asarray(weight_variance, dtype=float).reshape(-1), (input_dim,)
            ).copy()
        self._add_param("variance", variance, transform=Logexp())
        self._add_param("weight_variance", weight_variance, transform=Logexp())
        self._add_param("bias_variance", bias_variance, transform=Logexp())

    def _comp_prod(self, X, X2=None):
        wv = jnp.asarray(self.weight_variance)
        bv = jnp.asarray(self.bias_variance)
        if X2 is None:
            return jnp.sum(jnp.square(X) * wv, axis=1) + bv
        return (X * wv) @ X2.T + bv

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        Xd = jnp.sqrt(self._comp_prod(X) + 1.0)
        X2d = Xd if X2 is None else jnp.sqrt(self._comp_prod(X2) + 1.0)
        XTX = self._comp_prod(X, X if X2 is None else X2) / Xd[:, None] / X2d[None, :]
        XTX = jnp.clip(XTX, -1.0, 1.0)
        return jnp.asarray(self.variance) * FOUR_OVER_TAU * jnp.arcsin(XTX)

    def Kdiag(self, X):
        X = self._slice(X)
        p = self._comp_prod(X)
        return jnp.asarray(self.variance) * FOUR_OVER_TAU * jnp.arcsin(p / (p + 1.0))


class Poly(Kern):
    """k = v * (scale * x.x' + bias)^order. GPy: poly.py:10."""

    def __init__(self, input_dim, variance=1.0, scale=1.0, bias=1.0, order=3.0,
                 active_dims=None, name="poly"):
        super().__init__(input_dim, active_dims, name)
        assert order >= 1
        self.order = float(order)
        self._add_param("variance", variance, transform=Logexp())
        self._add_param("scale", scale, transform=Logexp())
        self._add_param("bias", bias, transform=Logexp())

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        dp = X @ (X if X2 is None else X2).T
        A = jnp.asarray(self.scale) * dp + jnp.asarray(self.bias)
        return jnp.asarray(self.variance) * A**self.order

    def Kdiag(self, X):
        X = self._slice(X)
        dp = jnp.sum(X * X, axis=-1)
        A = jnp.asarray(self.scale) * dp + jnp.asarray(self.bias)
        return jnp.asarray(self.variance) * A**self.order


class Brownian(Kern):
    """Brownian motion: k = v * min(|x|,|x'|) for same-sign pairs. GPy: brownian.py:9."""

    def __init__(self, input_dim=1, variance=1.0, active_dims=None, name="Brownian"):
        assert input_dim == 1, "Brownian motion in 1D only"
        super().__init__(input_dim, active_dims, name)
        self._add_param("variance", variance, transform=Logexp())

    def K(self, X, X2=None):
        X = self._slice(X)
        X2 = X if X2 is None else self._slice(X2)
        same_sign = jnp.sign(X) == jnp.sign(X2.T)
        return jnp.asarray(self.variance) * jnp.where(
            same_sign, jnp.minimum(jnp.abs(X), jnp.abs(X2.T)), 0.0
        )

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.asarray(self.variance) * jnp.abs(X[:, 0])


class Spline(Kern):
    """Cubic-spline kernel. GPy: spline.py:9-36."""

    def __init__(self, input_dim=1, variance=1.0, c=1.0, active_dims=None, name="spline"):
        assert input_dim == 1
        super().__init__(input_dim, active_dims, name)
        self._add_param("variance", variance, transform=Logexp())
        self._add_param("c", c, transform=Logexp())

    def K(self, X, X2=None):
        X = self._slice(X)
        X2 = X if X2 is None else self._slice(X2)
        v = jnp.asarray(self.variance)
        c = jnp.asarray(self.c)
        t1 = (X + 8.0) * (X2.T + 8.0) / 16.0
        t2 = jnp.abs((X - X2.T) / 16.0) ** 3
        t3 = ((X + 8.0) / 16.0) ** 3 + ((X2.T + 8.0) / 16.0) ** 3
        return v**2 * (1.0 + (1.0 + c) * t1 + c / 3.0 * (t2 - t3))

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))
