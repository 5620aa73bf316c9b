"""EQ_ODE1 — first-order ODE latent force kernel.

Reference: GPy/kern/src/eq_ode1.py (731 LoC): outputs y_j follow
dy_j/dt = sum_i w_ji u_i(t) - d_j y_j with independent RBF latent forces
u_i. X = [t, index] where index < output_dim selects an output block and
index >= output_dim selects latent-force block (as the reference).

Supported blocks mirror the reference exactly: Kuu, Kfu/Kuf, Kdiag of the
output block (the ff cross block raises NotImplementedError in GPy too —
the latent-force models use the (f,u) joint representation). The ~400 lines
of hand-written gradient code disappear under autodiff.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from ..util.ln_diff_erfs import ln_diff_erf
from .kern import Kern

__all__ = ["EQ_ODE1"]

SQRT_PI = float(np.sqrt(np.pi))


class EQ_ODE1(Kern):
    def __init__(self, input_dim=2, output_dim=1, rank=1, W=None, lengthscale=None,
                 decay=None, active_dims=None, name="eq_ode1"):
        assert input_dim == 2, "only defined for 1 input dim + index column"
        super().__init__(input_dim, active_dims, name)
        self.rank = int(rank)
        self.output_dim = int(output_dim)
        rng = np.random.default_rng(0)
        if lengthscale is None:
            lengthscale = 0.5 + rng.random(self.rank)
        if W is None:
            W = 0.5 * rng.standard_normal((self.output_dim, self.rank)) / np.sqrt(self.rank)
        if decay is None:
            decay = np.ones(self.output_dim)
        self._add_param("lengthscale", np.asarray(lengthscale, float).reshape(-1), transform=Logexp())
        self._add_param("decay", np.asarray(decay, float).reshape(-1), transform=Logexp())
        self._add_param("W", np.asarray(W, float))

    # --- blocks (reference eq_ode1.py:339-431) -----------------------------
    def _Kuu(self, t, q_idx):
        lq = jnp.asarray(self.lengthscale)[q_idx]  # (N,)
        r = t[:, None] - t[None, :]
        same = q_idx[:, None] == q_idx[None, :]
        # reference: exp(-r^2 / lq^2)   (note: no factor 1/2 — eq_ode1.py:363)
        K = jnp.exp(-(r**2) / (lq[:, None] ** 2))
        return jnp.where(same, K, 0.0)

    def _Kfu(self, t, d_idx, z, q_idx):
        """Cross covariance outputs x latent forces (eq_ode1.py:392-431)."""
        B = jnp.asarray(self.decay)[d_idx][:, None]  # (N,1)
        lq = jnp.asarray(self.lengthscale)[q_idx][None, :]  # (1,M)
        Sdq = jnp.asarray(self.W)[d_idx][:, q_idx]  # (N,M)
        c0 = Sdq * (0.5 * SQRT_PI * lq)
        nu = B * (0.5 * lq)  # (N,M)
        z_lq = (z / jnp.asarray(self.lengthscale)[q_idx])[None, :]  # (1,M)
        tz = t[:, None] - z[None, :]
        tz_lq = tz / lq
        upsi = jnp.exp(nu**2 - B * tz + ln_diff_erf(-tz_lq + nu, z_lq + nu))
        upsi = jnp.where(t[:, None] == 0.0, 0.0, upsi)
        return c0 * upsi

    def _Kdiag_ff(self, t, d_idx):
        """Sum over latent forces of the output marginal variance
        (eq_ode1.py:158-214)."""
        B = jnp.asarray(self.decay)[d_idx][:, None]  # (N,1)
        S = jnp.asarray(self.W)[d_idx]  # (N,R)
        lq = jnp.asarray(self.lengthscale)[None, :]  # (1,R)
        c0 = (S**2 / B) * (0.5 * SQRT_PI * lq)
        nu = lq * (B * 0.5)
        gamt = -2.0 * B * t[:, None]
        t_lq = t[:, None] / lq
        upm = jnp.exp(nu**2 + ln_diff_erf(nu, t_lq + nu))
        upm = jnp.where(t[:, None] == 0.0, 0.0, upm)
        upv = jnp.exp(nu**2 + gamt + ln_diff_erf(-t_lq + nu, nu))
        upv = jnp.where(t[:, None] == 0.0, 0.0, upv)
        return jnp.sum(c0 * (upm - upv), axis=1)

    # --- dispatch (reference eq_ode1.py:98-156) ----------------------------
    def _split(self, X):
        t = jnp.asarray(X[:, 0])
        idx = np.int_(np.round(np.asarray(X[:, 1])))
        return t, idx

    def K(self, X, X2=None):
        t, idx = self._split(X)
        X_is_u = bool(idx[0] >= self.output_dim)
        if X2 is None:
            if X_is_u:
                return self._Kuu(t, jnp.asarray(idx - self.output_dim))
            raise NotImplementedError("ff block not defined (as in GPy eq_ode1)")
        t2, idx2 = self._split(X2)
        X2_is_u = bool(idx2[0] >= self.output_dim)
        if not X_is_u and X2_is_u:
            return self._Kfu(t, jnp.asarray(idx), t2, jnp.asarray(idx2 - self.output_dim))
        if X_is_u and not X2_is_u:
            return self._Kfu(t2, jnp.asarray(idx2), t, jnp.asarray(idx - self.output_dim)).T
        if X_is_u and X2_is_u:
            q1 = jnp.asarray(idx - self.output_dim)
            q2 = jnp.asarray(idx2 - self.output_dim)
            lq = jnp.asarray(self.lengthscale)
            r = t[:, None] / lq[q1][:, None] - t2[None, :] / lq[q2][None, :]
            same = q1[:, None] == q2[None, :]
            return jnp.where(same, jnp.exp(-(r**2)), 0.0)
        raise NotImplementedError("ff block not defined (as in GPy eq_ode1)")

    def Kdiag(self, X):
        t, idx = self._split(X)
        if bool(idx[0] >= self.output_dim):
            return jnp.ones_like(t)
        return self._Kdiag_ff(t, jnp.asarray(idx))
