"""Linear-family kernels.

Reference: GPy/kern/src/linear.py (Linear:21, LinearFull:183),
GPy/kern/src/trunclinear.py (TruncLinear:11, TruncLinear_inf:95).
All K's are single matmuls — pure MXU work.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["Linear", "LinearFull", "TruncLinear", "TruncLinear_inf"]


class Linear(Kern):
    """k(x, x') = sum_q v_q x_q x'_q. GPy: linear.py:21."""

    def __init__(self, input_dim, variances=None, ARD=False, active_dims=None, name="linear"):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        if variances is None:
            variances = np.ones(input_dim) if ARD else 1.0
        else:
            variances = np.asarray(variances, dtype=float)
            variances = (
                np.broadcast_to(variances.reshape(-1), (input_dim,)).copy()
                if ARD
                else float(variances.reshape(-1)[0])
            )
        self._add_param("variances", variances, transform=Logexp())
        from .psi_comp import PSICOMP_Linear

        self._psicomp = PSICOMP_Linear()

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        v = jnp.asarray(self.variances)
        Xv = X * v
        return Xv @ (X if X2 is None else X2).T

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.sum(jnp.asarray(self.variances) * X * X, axis=-1)

    # spike-and-slab variant dispatches on the posterior type, replacing
    # GPy's sslinear_psi_comp.py (same pattern as RBF -> PSICOMP_SSRBF)
    def _pc(self, qX):
        if hasattr(qX, "gamma"):
            from .psi_comp import PSICOMP_SSLinear

            return PSICOMP_SSLinear()
        return self._psicomp

    def psi0(self, Z, qX):
        from .psi_comp import slice_psi_inputs
        Z, qX = slice_psi_inputs(self, Z, qX)
        return self._pc(qX).psi0(self, Z, qX)

    def psi1(self, Z, qX):
        from .psi_comp import slice_psi_inputs
        Z, qX = slice_psi_inputs(self, Z, qX)
        return self._pc(qX).psi1(self, Z, qX)

    def psi2n(self, Z, qX):
        from .psi_comp import slice_psi_inputs
        Z, qX = slice_psi_inputs(self, Z, qX)
        return self._pc(qX).psi2n(self, Z, qX)

    def input_sensitivity(self, summarize=True):
        return np.broadcast_to(np.asarray(self.variances).reshape(-1), (self.input_dim,))


class LinearFull(Kern):
    """k(x, x') = x^T (W W^T + diag(kappa)) x'. GPy: linear.py:183."""

    def __init__(self, input_dim, rank=1, W=None, kappa=None, active_dims=None, name="linear_full"):
        super().__init__(input_dim, active_dims, name)
        self.rank = int(rank)
        if W is None:
            W = np.ones((input_dim, rank))
        if kappa is None:
            kappa = np.ones(input_dim)
        self._add_param("W", np.asarray(W, dtype=float))
        self._add_param("kappa", np.asarray(kappa, dtype=float), transform=Logexp())

    def _P(self):
        W = jnp.asarray(self.W)
        return W @ W.T + jnp.diag(jnp.asarray(self.kappa))

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        P = self._P()
        return X @ P @ (X if X2 is None else X2).T

    def Kdiag(self, X):
        X = self._slice(X)
        return jnp.sum((X @ self._P()) * X, axis=-1)


class TruncLinear(Kern):
    """k(x,x') = sum_q v_q relu-product((x_q-d_q)(x'_q-d_q)). GPy: trunclinear.py:11."""

    def __init__(self, input_dim, variances=None, delta=None, ARD=False, active_dims=None, name="trunclinear"):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        if variances is None:
            variances = np.ones(input_dim) if ARD else 1.0
        if delta is None:
            delta = np.zeros(input_dim) if ARD else 0.0
        self._add_param("variances", variances, transform=Logexp())
        self._add_param("delta", delta)

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        if X2 is None:
            X2 = X
        d = jnp.asarray(self.delta)
        v = jnp.asarray(self.variances)
        XX = (X - d)[:, None, :] * (X2 - d)[None, :, :]
        XX = jnp.maximum(XX, 0.0)
        return jnp.sum(v * XX, axis=-1)

    def Kdiag(self, X):
        X = self._slice(X)
        d = jnp.asarray(self.delta)
        v = jnp.asarray(self.variances)
        return jnp.sum(v * (X - d) ** 2, axis=-1)


class TruncLinear_inf(Kern):
    """Truncated-linear kernel integrated over a break-point interval.

    k(x,x') = sum_q v_q * int_{a}^{b} max(0, x_q-c) max(0, x'_q-c) dc with the
    closed form |x-x'|^3/6 + x x'(b-a) - (x+x')(b^2-a^2)/2 + (b^3-a^3)/3.
    GPy: trunclinear.py:110-199 (K:151-162, Kdiag:164-167).
    """

    def __init__(self, input_dim, interval, variances=None, ARD=False,
                 active_dims=None, name="trunclinear_inf"):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        self.interval = (float(interval[0]), float(interval[1]))
        if variances is None:
            variances = np.ones(input_dim) if ARD else 1.0
        self._add_param("variances", variances, transform=Logexp())

    def _product(self, X, X2):
        a, b = self.interval
        d = X[:, None, :] - X2[None, :, :]
        return (
            jnp.abs(d) ** 3 / 6.0
            + X[:, None, :] * X2[None, :, :] * (b - a)
            - (X[:, None, :] + X2[None, :, :]) * (b * b - a * a) / 2.0
            + (b**3 - a**3) / 3.0
        )

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        if X2 is None:
            X2 = X
        return jnp.sum(jnp.asarray(self.variances) * self._product(X, X2), axis=-1)

    def Kdiag(self, X):
        X = self._slice(X)
        a, b = self.interval
        tmp = (
            jnp.square(X) * (b - a)
            - X * (b * b - a * a)
            + (b**3 - a**3) / 3.0
        )
        return jnp.sum(jnp.asarray(self.variances) * tmp, axis=-1)
