"""Stationary kernels: K = f(r), r = scaled distance.

Reference: GPy/kern/src/stationary.py (Stationary base:23, _unscaled_dist
:130-148, _scaled_dist:150-168, Exponential:378, OU:420, Matern32:457,
Matern52:556, ExpQuad:623, Cosine:664, ExpQuadCosine:682, Sinc:717,
RatQuad:739) and GPy/kern/src/rbf.py (RBF:16, K_of_r:51, psi-stats:342-356).

TPU design: the pairwise squared distance is computed in the matmul form
r2 = |x|^2 + |x'|^2 - 2 x.x' so the O(N^2 D) hot loop runs on the MXU; the
elementwise K_of_r is fused onto it by XLA. The Cython/OpenMP gradient
kernels (stationary_cython.pyx:20-63, stationary_utils.c) are replaced by
autodiff through this same matmul-shaped graph — dK/dlengthscale contractions
come out as matmuls, which is exactly what the hand-written C loops computed.
`safe_sqrt` gives the correct zero gradient on the r=0 diagonal. ARD is just
broadcasting. A Pallas blocked-Gram kernel (ops/pallas_gram.py) is used for
large N on TPU.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from ..util.linalg import safe_sqrt
from .kern import Kern

__all__ = [
    "Stationary",
    "RBF",
    "ExpQuad",
    "Exponential",
    "OU",
    "Matern32",
    "Matern52",
    "Cosine",
    "ExpQuadCosine",
    "Sinc",
    "RatQuad",
]


class Stationary(Kern):
    def __init__(
        self,
        input_dim,
        variance=1.0,
        lengthscale=None,
        ARD=False,
        active_dims=None,
        name="stationary",
    ):
        super().__init__(input_dim, active_dims, name)
        self.ARD = bool(ARD)
        if lengthscale is None:
            lengthscale = np.ones(input_dim) if ARD else 1.0
        else:
            lengthscale = np.asarray(lengthscale, dtype=float)
            if ARD:
                lengthscale = np.broadcast_to(lengthscale.reshape(-1), (input_dim,)).copy()
            else:
                lengthscale = float(lengthscale.reshape(-1)[0])
        self._add_param("variance", variance, transform=Logexp())
        self._add_param("lengthscale", lengthscale, transform=Logexp())

    # --- distances --------------------------------------------------------
    def _scaled_dist2(self, X, X2=None):
        """Squared scaled distance in matmul (MXU) form, clipped at 0.

        GPy: stationary.py:130-168 (_unscaled_dist via tdot + _scaled_dist).
        """
        ls = jnp.asarray(self.lengthscale)
        Xs = X / ls
        if (Xs.shape[-1] <= 8 and Xs.ndim == 2
                and (X2 is None
                     or (X2.ndim == 2 and min(Xs.shape[0], X2.shape[0]) >= 1024))):
            # Grams at shallow D with both sides large: direct per-dim
            # squared differences — exact f32 (no expansion cancellation, no
            # clamp, exact-zero diagonal when square) and FASTER than the
            # 6-pass MXU expansion (square: 0.33 vs 0.69 ms at N=8192 D=8;
            # rectangular 2048x50k blocks: the gram_materialize build went
            # 54 -> ~40 ms at N=50k D=4). NARROW rectangular (Knm) grams
            # keep the MXU expansion: the SVGP step (M=512) measured faster
            # with the matmul form (narrow-M VPU broadcasts plus their VJPs
            # cost more than the cross dot) — hence the min-dim >= 1024 gate.
            X2s = Xs if X2 is None else X2 / ls
            r2 = (Xs[:, 0:1] - X2s[None, :, 0]) ** 2
            for d in range(1, Xs.shape[-1]):
                r2 = r2 + (Xs[:, d:d + 1] - X2s[None, :, d]) ** 2
            return r2
        if X2 is None:
            sq = jnp.sum(Xs * Xs, axis=-1)
            r2 = sq[:, None] + sq[None, :] - 2.0 * (Xs @ Xs.T)
            # exact zero diagonal (GPy fills it explicitly)
            r2 = r2 - jnp.diag(jnp.diagonal(r2))
        else:
            X2s = X2 / ls
            sq1 = jnp.sum(Xs * Xs, axis=-1)
            sq2 = jnp.sum(X2s * X2s, axis=-1)
            r2 = sq1[:, None] + sq2[None, :] - 2.0 * (Xs @ X2s.T)
        # NOTE: not jnp.maximum(r2, 0) — its gradient at the tie r2==0 is 1/2,
        # which halves derivative covariances (DiffKern) at coincident points.
        return jnp.where(r2 < 0.0, 0.0, r2)

    def _scaled_dist(self, X, X2=None):
        return safe_sqrt(self._scaled_dist2(X, X2))

    # --- API --------------------------------------------------------------
    def K_of_r(self, r):
        raise NotImplementedError

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        return self.K_of_r(self._scaled_dist(X, X2))

    def Kdiag(self, X):
        n = X.shape[0]
        return jnp.asarray(self.variance) * jnp.ones(n, dtype=X.dtype)

    def input_sensitivity(self, summarize=True):
        v = float(np.asarray(self.variance))
        ls = np.broadcast_to(np.asarray(self.lengthscale).reshape(-1), (self.input_dim,))
        return v / ls**2


class RBF(Stationary):
    """Radial basis / squared-exponential. GPy: kern/src/rbf.py:16."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="rbf"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)
        from .psi_comp import PSICOMP_RBF

        self._psicomp = PSICOMP_RBF()

    def K_of_r(self, r):
        return jnp.asarray(self.variance) * jnp.exp(-0.5 * r**2)

    def K(self, X, X2=None):
        # avoid the sqrt entirely: K = v exp(-r2/2)
        X, X2 = self._slice(X), self._slice(X2)
        # large Grams route through the blocked custom-VJP kernel
        # (ops/pallas_gram.py — the stationary_cython/CUDA replacement)
        from ..ops.pallas_gram import rbf_gram, use_pallas_for

        n = X.shape[0]
        m = n if X2 is None else X2.shape[0]
        if use_pallas_for(n, m, X.shape[1]):
            v = jnp.asarray(self.variance)
            K = rbf_gram(X, X if X2 is None else X2, v, jnp.asarray(self.lengthscale))
            if X2 is None:  # exact unit diagonal (GPy fills it explicitly)
                K = K - jnp.diag(jnp.diagonal(K)) + v * jnp.eye(n, dtype=K.dtype)
            return K
        r2 = self._scaled_dist2(X, X2)
        return jnp.asarray(self.variance) * jnp.exp(-0.5 * r2)

    # closed-form psi statistics (GPy: kern/src/psi_comp/rbf_psi_comp.py;
    # spike-and-slab variants dispatch on the posterior type, replacing
    # GPy's ssrbf_psi_comp.py)
    def _pc(self, qX):
        if hasattr(qX, "gamma"):
            from .psi_comp import PSICOMP_SSRBF

            return PSICOMP_SSRBF()
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

    def spectrum(self, omega):
        """Power spectrum (GPy: rbf.py:325), isotropic 1-D case."""
        v = jnp.asarray(self.variance)
        ls = jnp.asarray(self.lengthscale)
        return v * jnp.sqrt(2 * jnp.pi) * ls * jnp.exp(-(ls**2) * omega**2 / 2)


class ExpQuad(RBF):
    """Alias family: identical covariance, GPy keeps both (stationary.py:623)."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="ExpQuad"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)


class Exponential(Stationary):
    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="Exponential"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)

    def K_of_r(self, r):
        return jnp.asarray(self.variance) * jnp.exp(-r)

    def sde(self):
        """Matern-1/2 state space form (GPy: sde_matern.py Matern12)."""
        v = jnp.asarray(self.variance)
        ls = jnp.asarray(self.lengthscale).reshape(-1)[0]
        F = (-1.0 / ls).reshape(1, 1)
        L = jnp.ones((1, 1))
        Qc = (2.0 * v / ls).reshape(1, 1)
        H = jnp.ones((1, 1))
        Pinf = v.reshape(1, 1)
        return F, L, Qc, H, Pinf


class OU(Exponential):
    """Ornstein-Uhlenbeck == Matern 1/2 (GPy: stationary.py:420)."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="OU"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)


class Matern32(Stationary):
    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="Mat32"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)

    def K_of_r(self, r):
        s3 = np.sqrt(3.0)
        return jnp.asarray(self.variance) * (1.0 + s3 * r) * jnp.exp(-s3 * r)

    def sde(self):
        """State-space form (F, L, Qc, H, Pinf), traceable for autodiff
        through the Kalman recursion. GPy: stationary.py:520-554."""
        v = jnp.asarray(self.variance)
        ls = jnp.asarray(self.lengthscale).reshape(-1)[0]
        lam = np.sqrt(3.0) / ls
        z = jnp.zeros(())
        F = jnp.stack([jnp.stack([z, z + 1.0]), jnp.stack([-(lam**2), -2 * lam])])
        L = jnp.asarray([[0.0], [1.0]])
        Qc = (12.0 * np.sqrt(3.0) * v / ls**3).reshape(1, 1)
        H = jnp.asarray([[1.0, 0.0]])
        Pinf = jnp.stack([jnp.stack([v, z]), jnp.stack([z, 3.0 * v / ls**2])])
        return F, L, Qc, H, Pinf


class Matern52(Stationary):
    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="Mat52"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)

    def K_of_r(self, r):
        s5 = np.sqrt(5.0)
        return (
            jnp.asarray(self.variance)
            * (1.0 + s5 * r + 5.0 / 3.0 * r**2)
            * jnp.exp(-s5 * r)
        )

    def sde(self):
        v = jnp.asarray(self.variance)
        ls = jnp.asarray(self.lengthscale).reshape(-1)[0]
        lam = np.sqrt(5.0) / ls
        z = jnp.zeros(())
        o = jnp.ones(())
        F = jnp.stack([
            jnp.stack([z, o, z]),
            jnp.stack([z, z, o]),
            jnp.stack([-(lam**3), -3 * lam**2, -3 * lam]),
        ])
        L = jnp.asarray([[0.0], [0.0], [1.0]])
        Qc = (v * 400.0 * np.sqrt(5.0) / 3.0 / ls**5).reshape(1, 1)
        H = jnp.asarray([[1.0, 0.0, 0.0]])
        kappa = 5.0 / 3.0 * v / ls**2
        Pinf = jnp.stack([
            jnp.stack([v, z, -kappa]),
            jnp.stack([z, kappa, z]),
            jnp.stack([-kappa, z, 25.0 * v / ls**4]),
        ])
        return F, L, Qc, H, Pinf


class Cosine(Stationary):
    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="Cosine"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)

    def K_of_r(self, r):
        return jnp.asarray(self.variance) * jnp.cos(r)


class ExpQuadCosine(Stationary):
    """Damped cosine. GPy: stationary.py:682-698."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, period=1.0,
                 ARD=False, active_dims=None, name="ExpQuadCosine"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)
        self._add_param("period", period, transform=Logexp())

    def K_of_r(self, r):
        v = jnp.asarray(self.variance)
        T = jnp.asarray(self.period)
        return v * jnp.exp(-2 * jnp.pi**2 * r**2) * jnp.cos(2 * jnp.pi * r / T)


class Sinc(Stationary):
    """GPy: stationary.py:717-731 — K = v sinc(2r) (numpy normalized sinc)."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, ARD=False,
                 active_dims=None, name="Sinc"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)

    def K_of_r(self, r):
        return jnp.asarray(self.variance) * jnp.sinc(2 * r)


class RatQuad(Stationary):
    """Rational quadratic. GPy: stationary.py:739-776."""

    def __init__(self, input_dim, variance=1.0, lengthscale=None, power=2.0,
                 ARD=False, active_dims=None, name="RatQuad"):
        super().__init__(input_dim, variance, lengthscale, ARD, active_dims, name)
        self._add_param("power", power, transform=Logexp())

    def K(self, X, X2=None):
        X, X2 = self._slice(X), self._slice(X2)
        r2 = self._scaled_dist2(X, X2)
        v = jnp.asarray(self.variance)
        p = jnp.asarray(self.power)
        return v * jnp.exp(-p * jnp.log1p(r2 / 2.0))

    def K_of_r(self, r):
        v = jnp.asarray(self.variance)
        p = jnp.asarray(self.power)
        return v * jnp.exp(-p * jnp.log1p(r**2 / 2.0))
