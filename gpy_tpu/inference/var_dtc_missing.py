"""VarDTC with missing data: per-output-dimension row masks.

Reference: GPy/models/sparse_gp_minibatch.py (SparseGPMiniBatch:18,
_outer_loop_for_missing_data:228) + GPy/inference/latent_function_inference/
var_dtc_parallel.py (VarDTC_minibatch: two-phase psi-stat accumulation) +
vardtc_md.py.

TPU design: a missing (n, d) entry simply gets noise precision W_nd = 0 in
the collapsed bound — the per-dimension bounds then differ only in their
weight vectors, so the whole missing-data loop is ONE vmap over output
dimensions (GPy runs a python loop per dimension with cached matrices).
Minibatch accumulation of psi statistics is unnecessary on TPU for the
collapsed bound (it exists in GPy to bound peak memory); the streaming
analogue here is SVGP (core/svgp.py) or sharding (parallel/).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.linalg import jitchol, jitchol_and_inv
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["VarDTCMissingData"]

LOG_2_PI = float(np.log(2 * np.pi))
CONST_JITTER = 1e-6


class VarDTCMissingData(LatentFunctionInference):
    def _common(self, kern, X, Z, qX):
        M = Z.shape[0]
        Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
        L, Li = jitchol_and_inv(Kmm)  # matmul-only VJP (util.linalg)
        if qX is None:
            Kmn = kern.K(Z, X)  # (M, N)
            psi0 = kern.Kdiag(X)
            psi2n = None
        else:
            Kmn = kern.psi1(Z, qX).T
            psi0 = kern.psi0(Z, qX)
            psi2n = kern.psi2n(Z, qX)
        return Kmm, L, Li, Kmn, psi0, psi2n

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None,
                            Y_metadata=None, qX=None):
        assert mean_function is None
        N, D = Y.shape
        M = Z.shape[0]
        mask = jnp.asarray(~jnp.isnan(Y), dtype=Z.dtype)  # (N, D)
        Y0 = jnp.nan_to_num(Y)
        sigma2 = likelihood.gaussian_variance(Y_metadata)
        Wfull = mask / sigma2  # (N, D) per-entry precision
        Kmm, L, Li, Kmn, psi0, psi2n = self._common(kern, X, Z, qX)
        eyeM = jnp.eye(M, dtype=Z.dtype)
        # the shared M x M inverse makes every output's vmapped (M, N)
        # projection a matmul (no batched trsm)

        def bound_d(W, y):
            # W, y: (N,)
            if psi2n is None:
                obs = (W > 0).astype(W.dtype)
                sqrtW = jnp.sqrt(jnp.where(W > 0, W, 1.0)) * obs  # no NaN grad at W=0
                A = Li @ (Kmn * sqrtW[None, :])  # matmul, not trsm
                AAT = A @ A.T
            else:
                Psi2W = jnp.einsum("n,nmk->mk", W, psi2n)
                AAT = Li @ Psi2W @ Li.T
                AAT = 0.5 * (AAT + AAT.T)
            B = eyeM + AAT
            LB = jitchol(B)
            psi1Wy = Kmn @ (W * y)[:, None]
            c = jsl.solve_triangular(LB, jsl.solve_triangular(L, psi1Wy, lower=True), lower=True)
            n_obs = jnp.sum(W > 0)
            # double-where so the log branch has no NaN gradient at W == 0
            W_safe = jnp.where(W > 0, W, 1.0)
            logW = jnp.sum(jnp.where(W > 0, jnp.log(W_safe), 0.0))
            return (
                -0.5 * n_obs * LOG_2_PI
                + 0.5 * logW
                - jnp.sum(jnp.log(jnp.diagonal(LB)))
                - 0.5 * jnp.sum(W * y * y)
                + 0.5 * jnp.sum(c * c)
                - 0.5 * (jnp.sum(W * psi0) - jnp.trace(AAT))
            )

        bounds = jax.vmap(bound_d, in_axes=(1, 1))(Wfull, Y0)
        return jnp.sum(bounds)

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None,
                  Y_metadata=None, qX=None):
        """Posterior per output dim collapsed onto shared woodbury (uses the
        observed-union weights for the predictive covariance)."""
        lm = self.marginal_likelihood(kern, X, Z, likelihood, Y, mean_function, Y_metadata, qX)
        N, D = Y.shape
        M = Z.shape[0]
        mask = jnp.asarray(~jnp.isnan(Y), dtype=Z.dtype)
        Y0 = jnp.nan_to_num(Y)
        sigma2 = likelihood.gaussian_variance(Y_metadata)
        Kmm, L, Li, Kmn, psi0, psi2n = self._common(kern, X, Z, qX)
        eyeM = jnp.eye(M, dtype=Z.dtype)

        def post_d(W, y):
            if psi2n is None:
                obs = (W > 0).astype(W.dtype)
                sqrtW = jnp.sqrt(jnp.where(W > 0, W, 1.0)) * obs  # no NaN grad at W=0
                A = Li @ (Kmn * sqrtW[None, :])  # matmul, not trsm
                AAT = A @ A.T
            else:
                Psi2W = jnp.einsum("n,nmk->mk", W, psi2n)
                AAT = Li @ Psi2W @ Li.T
            B = eyeM + AAT
            LB = jitchol(B)
            psi1Wy = Kmn @ (W * y)[:, None]
            c = jsl.solve_triangular(LB, jsl.solve_triangular(L, psi1Wy, lower=True), lower=True)
            wv = jsl.solve_triangular(
                L, jsl.solve_triangular(LB, c, lower=True, trans=1), lower=True, trans=1
            )
            Bi = jsl.cho_solve((LB, True), eyeM)
            tmp2 = jsl.solve_triangular(L, eyeM - Bi, lower=True, trans=1)
            wi = jsl.solve_triangular(L, tmp2.T, lower=True, trans=1).T
            return wv[:, 0], 0.5 * (wi + wi.T)

        Wfull = mask / sigma2
        wvs, wis = jax.vmap(post_d, in_axes=(1, 1))(Wfull, Y0)
        # shared covariance approximation: mean of per-dim woodbury_invs
        posterior = Posterior(
            woodbury_vector=wvs.T, woodbury_inv=jnp.mean(wis, axis=0), K=Kmm
        )
        return posterior, lm
