"""Periodic kernels.

Reference: GPy/kern/src/standard_periodic.py (StdPeriodic:21, K:125-133).
The PeriodicExponential / PeriodicMatern32/52 of GPy/kern/src/periodic.py are
finite-Fourier-basis approximations; here they are built exactly as warped
stationary kernels on the (cos, sin) embedding of each input dim — same
covariance family, TPU-simple form.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["StdPeriodic", "PeriodicExponential", "PeriodicMatern32", "PeriodicMatern52"]


class StdPeriodic(Kern):
    """k(x,x') = v * exp(-0.5 sum_d sin^2(pi (x_d - x'_d)/T_d)/l_d^2).

    GPy: standard_periodic.py:125-133.
    """

    def __init__(self, input_dim, variance=1.0, period=None, lengthscale=None,
                 ARD1=False, ARD2=False, active_dims=None, name="std_periodic"):
        super().__init__(input_dim, active_dims, name)
        self.ARD1, self.ARD2 = bool(ARD1), bool(ARD2)
        period = np.ones(input_dim) * (1.0 if period is None else period) if ARD1 else float(
            1.0 if period is None else np.asarray(period).reshape(-1)[0]
        )
        lengthscale = np.ones(input_dim) * (1.0 if lengthscale is None else lengthscale) if ARD2 else float(
            1.0 if lengthscale is None else np.asarray(lengthscale).reshape(-1)[0]
        )
        self._add_param("variance", variance, transform=Logexp())
        self._add_param("period", period, transform=Logexp())
        self._add_param("lengthscale", lengthscale, transform=Logexp())

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        if X2 is None:
            X2 = X
        T = jnp.asarray(self.period)
        ls = jnp.asarray(self.lengthscale)
        base = jnp.pi * (X[:, None, :] - X2[None, :, :]) / T
        expo = -0.5 * jnp.sum((jnp.sin(base) / ls) ** 2, axis=-1)
        return jnp.asarray(self.variance) * jnp.exp(expo)

    def Kdiag(self, X):
        return jnp.asarray(self.variance) * jnp.ones(X.shape[0], dtype=X.dtype)

    def input_sensitivity(self, summarize=True):
        v = float(np.asarray(self.variance))
        ls = np.broadcast_to(np.asarray(self.lengthscale).reshape(-1), (self.input_dim,))
        return v / ls**2


class _WarpedPeriodic(Kern):
    """Periodic kernel via the (cos, sin) circle embedding of each dim.

    k(x,x') = base_kernel(u(x), u(x')) with u(x) = (cos(2pi x/T), sin(2pi x/T)),
    giving an exactly periodic stationary covariance (MacKay's construction).
    Replaces GPy's Fourier-basis PeriodicExponential/Matern (periodic.py).
    """

    _base_cls = None

    def __init__(self, input_dim=1, variance=1.0, lengthscale=1.0, period=2 * np.pi,
                 active_dims=None, name="periodic"):
        super().__init__(input_dim, active_dims, name)
        self._add_param("variance", variance, transform=Logexp())
        self._add_param("lengthscale", lengthscale, transform=Logexp())
        self._add_param("period", period, transform=Logexp())

    def _embed(self, X):
        T = jnp.asarray(self.period)
        ang = 2 * jnp.pi * X / T
        return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)

    def _r(self, X, X2):
        U1 = self._embed(X)
        U2 = U1 if X2 is None else self._embed(X2)
        sq1 = jnp.sum(U1 * U1, axis=-1)
        sq2 = jnp.sum(U2 * U2, axis=-1)
        r2 = sq1[:, None] + sq2[None, :] - 2 * U1 @ U2.T
        r2 = jnp.where(r2 < 0.0, 0.0, r2)
        from ..util.linalg import safe_sqrt

        ls = jnp.asarray(self.lengthscale)
        return safe_sqrt(r2) / ls

    def _K_of_r(self, r):
        raise NotImplementedError

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        return self._K_of_r(self._r(X, X2))

    def Kdiag(self, X):
        return jnp.asarray(self.variance) * jnp.ones(X.shape[0], dtype=X.dtype)


class PeriodicExponential(_WarpedPeriodic):
    def __init__(self, input_dim=1, variance=1.0, lengthscale=1.0, period=2 * np.pi,
                 active_dims=None, name="periodic_exponential", **kw):
        super().__init__(input_dim, variance, lengthscale, period, active_dims, name)

    def _K_of_r(self, r):
        return jnp.asarray(self.variance) * jnp.exp(-r)


class PeriodicMatern32(_WarpedPeriodic):
    def __init__(self, input_dim=1, variance=1.0, lengthscale=1.0, period=2 * np.pi,
                 active_dims=None, name="periodic_Mat32", **kw):
        super().__init__(input_dim, variance, lengthscale, period, active_dims, name)

    def _K_of_r(self, r):
        s3 = np.sqrt(3.0)
        return jnp.asarray(self.variance) * (1 + s3 * r) * jnp.exp(-s3 * r)


class PeriodicMatern52(_WarpedPeriodic):
    def __init__(self, input_dim=1, variance=1.0, lengthscale=1.0, period=2 * np.pi,
                 active_dims=None, name="periodic_Mat52", **kw):
        super().__init__(input_dim, variance, lengthscale, period, active_dims, name)

    def _K_of_r(self, r):
        s5 = np.sqrt(5.0)
        return jnp.asarray(self.variance) * (1 + s5 * r + 5.0 / 3.0 * r**2) * jnp.exp(-s5 * r)
