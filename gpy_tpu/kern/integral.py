"""Integral kernels: model binned/histogram observations of a latent RBF GP.

Reference: GPy/kern/src/integral.py, integral_limits.py (Integral_Limits:11,
k_xx:55, k_ff:66, k_xf:70) and multidimensional_integral_limits.py.
Convention (as GPy): X has columns [t, s] = bin (end, start); K(X) is the
output-output covariance, K(X, X2) the output-latent cross covariance.
All double loops become broadcasted erf expressions.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import erf

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["Integral", "Integral_Limits", "Multidimensional_Integral_Limits"]

SQRT_PI = float(np.sqrt(np.pi))


class Integral_Limits(Kern):
    def __init__(self, input_dim, variances=1.0, lengthscale=1.0, ARD=False,
                 active_dims=None, name="integral"):
        super().__init__(input_dim, active_dims, name)
        self._add_param("variances", variances, transform=Logexp())
        self._add_param("lengthscale", lengthscale, transform=Logexp())

    @staticmethod
    def _g(z):
        return 1.0 * z * SQRT_PI * erf(z) + jnp.exp(-(z**2))

    def k_xx(self, t, tprime, s, sprime, l):
        return 0.5 * (l**2) * (
            self._g((t - sprime) / l)
            + self._g((tprime - s) / l)
            - self._g((t - tprime) / l)
            - self._g((s - sprime) / l)
        )

    def k_xf(self, t, tprime, s, l):
        return 0.5 * SQRT_PI * l * (erf((t - tprime) / l) + erf((tprime - s) / l))

    def K(self, X, X2=None):
        l = jnp.asarray(self.lengthscale).reshape(-1)[0]
        v = jnp.asarray(self.variances).reshape(-1)[0]
        t, s = X[:, 0], X[:, 1]
        if X2 is None:
            return v * self.k_xx(
                t[:, None], t[None, :], s[:, None], s[None, :], l
            )
        tp = X2[:, 0]
        return v * self.k_xf(t[:, None], tp[None, :], s[:, None], l)

    def Kdiag(self, X):
        l = jnp.asarray(self.lengthscale).reshape(-1)[0]
        v = jnp.asarray(self.variances).reshape(-1)[0]
        t, s = X[:, 0], X[:, 1]
        return v * self.k_xx(t, t, s, s, l)


class Integral(Integral_Limits):
    """Integral from 0 to x of an RBF latent (GPy: kern/src/integral.py) —
    the limits form with s = 0."""

    def K(self, X, X2=None):
        X0 = jnp.concatenate([X[:, :1], jnp.zeros_like(X[:, :1])], axis=1)
        X20 = None if X2 is None else jnp.concatenate([X2[:, :1], jnp.zeros_like(X2[:, :1])], axis=1)
        return super().K(X0, X2 if X2 is None else X2)


class Multidimensional_Integral_Limits(Kern):
    """Product of per-dimension integral kernels: X columns alternate
    (t_d, s_d) pairs. GPy: multidimensional_integral_limits.py."""

    def __init__(self, input_dim, variances=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="multi_integral"):
        super().__init__(input_dim, active_dims, name)
        ndims = input_dim // 2
        if lengthscale is None:
            lengthscale = np.ones(ndims)
        self._add_param("variances", variances, transform=Logexp())
        self._add_param("lengthscale", np.asarray(lengthscale, dtype=float), transform=Logexp())

    def K(self, X, X2=None):
        ls = jnp.asarray(self.lengthscale).reshape(-1)
        v = jnp.asarray(self.variances).reshape(-1)[0]
        ndims = X.shape[1] // 2
        out = v
        helper = Integral_Limits.__new__(Integral_Limits)
        for d in range(ndims):
            l = ls[d if ls.shape[0] > 1 else 0]
            t, s = X[:, 2 * d], X[:, 2 * d + 1]
            if X2 is None:
                Kd = Integral_Limits.k_xx(helper, t[:, None], t[None, :], s[:, None], s[None, :], l)
            else:
                tp = X2[:, 2 * d]
                Kd = Integral_Limits.k_xf(helper, t[:, None], tp[None, :], s[:, None], l)
            out = out * Kd
        return out

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))
