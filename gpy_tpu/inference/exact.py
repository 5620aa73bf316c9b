"""Exact Gaussian inference (GP regression) and exact Student-t inference.

Reference: GPy/inference/latent_function_inference/exact_gaussian_inference.py
:37-88 and exact_studentt_inference.py.

TPU design: one Cholesky of K + diag(noise) on the MXU-fed solver; the
reference's hand-assembled dL_dK = 0.5(alpha alpha^T - D*K^-1) and the
explicit gradient routing disappear — `jax.grad` through this function *is*
that formula (the cholesky VJP computes it without ever materializing K^-1).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..util.linalg import dpotrs, jitchol, jitchol_and_inv, logdet_from_chol
from .posterior import Posterior

__all__ = ["ExactGaussianInference", "ExactStudentTInference"]

LOG_2_PI = float(np.log(2 * np.pi))


def _symz(x):
    from jax.custom_derivatives import SymbolicZero

    return isinstance(x, SymbolicZero)


@jax.custom_vjp
def _exact_inv_terms(Ky, YY):
    """(quad, logdet, L, alpha) for the explicit-inverse exact-GP path.

    Custom VJP at the NLML level: the reverse pass applies GPy's closed form
    dL/dK = 0.5 (alpha alpha' - c K^-1) (exact_gaussian_inference.py:64-66)
    directly — ONE matmul (K^-1 = Li' Li) instead of the five the generic
    chol_and_inv pullback chains. This is the path every vmapped HMC
    leapfrog gradient takes (N <= 1024), so the backward matmul count is
    the per-chain cost. With symbolic-zero cotangents the L/alpha branches
    compile away unless something actually differentiates through the
    posterior byproducts.
    """
    L, Li = jitchol_and_inv(Ky)
    LiT = jnp.swapaxes(Li, -1, -2)
    t = Li @ YY
    alpha = LiT @ t
    quad = jnp.sum(t * t)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
    return quad, logdet, L, alpha


def _exact_inv_terms_fwd(Ky_p, YY_p):
    Ky, YY = Ky_p.value, YY_p.value
    L, Li = jitchol_and_inv(Ky)
    LiT = jnp.swapaxes(Li, -1, -2)
    t = Li @ YY
    alpha = LiT @ t
    quad = jnp.sum(t * t)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)))
    # Li is saved rather than recomputed: a solve_triangular in the bwd
    # would re-serialize under vmap (the exact failure mode this VJP exists
    # to avoid)
    return (quad, logdet, L, alpha), (L, Li, alpha)


def _exact_inv_terms_bwd(res, cts):
    L, Li, alpha = res
    g_quad, g_logdet, g_L, g_alpha = cts
    T = lambda X: jnp.swapaxes(X, -1, -2)  # noqa: E731
    LiT = T(Li)
    Ky_bar = None
    YY_bar = None
    # K^-1 = Li'Li is the one O(n^3) matmul of the NLML backward (2n^3 per
    # batch element). The 'high' (3-pass bf16, ~1e-7 relative) chol-update
    # policy halves its MXU time vs ambient HIGHEST — same error class as
    # the blocked-chol trailing updates, invisible at gradient tolerances.
    from ..ops.blocked_linalg import CHOL_UPDATE_PREC as _PREC

    def acc(a, b):
        return b if a is None else a + b
    sym = True  # every accumulated contribution so far is symmetric
    if not _symz(g_quad):
        Ky_bar = acc(Ky_bar, -g_quad * (alpha @ T(alpha)))
        YY_bar = acc(YY_bar, 2.0 * g_quad * alpha)
    if not _symz(g_logdet):
        Ky_bar = acc(Ky_bar, g_logdet * jnp.matmul(LiT, Li, precision=_PREC))
    if not _symz(g_alpha):
        w = LiT @ (Li @ g_alpha)  # K^-1 g_alpha
        Ky_bar = acc(Ky_bar, -(w @ T(alpha)))
        YY_bar = acc(YY_bar, w)
        sym = False
    if not _symz(g_L):
        # cholesky pullback in matmul form (see util/linalg._chol_and_inv_bwd)
        P = jnp.tril(T(L) @ g_L)
        P = P - 0.5 * P * jnp.eye(L.shape[-1], dtype=L.dtype)
        Ky_bar = acc(Ky_bar, LiT @ P @ Li)
        sym = False
    if Ky_bar is None:
        Ky_bar = jnp.zeros_like(L)
    if YY_bar is None:
        YY_bar = jnp.zeros_like(alpha)
    if not sym:
        # canonical symmetric cotangent (Ky is built symmetric). Skipped on
        # the NLML-only path where both contributions are already symmetric
        # — the 0.5(K+K') transpose is a full (C, n, n) relayout on TPU.
        Ky_bar = 0.5 * (Ky_bar + T(Ky_bar))
    return Ky_bar, YY_bar


_exact_inv_terms.defvjp(_exact_inv_terms_fwd, _exact_inv_terms_bwd,
                        symbolic_zeros=True)

# Below this N the NLML+grad is latency-bound on sequential triangular ops
# and the explicit-inverse formulation (jitchol_and_inv: matmul-only VJP)
# wins; above it the extra O(N^3) inversion flops dominate. Measured on
# v5e-1 f32: N=1024 -13%, N=2048 +36%, N=4096 +38% — crossover ~1.5k.
# This is the regime HMC leapfrog steps live in (BASELINE HMC config N=1000).
EXPLICIT_INV_MAX_N = 1024


class LatentFunctionInference:
    def inference(self, kern, X, likelihood, Y, mean_function=None, Y_metadata=None):
        raise NotImplementedError

    def marginal_likelihood(self, kern, X, likelihood, Y, mean_function=None, Y_metadata=None):
        return self.inference(kern, X, likelihood, Y, mean_function, Y_metadata)[1]

    def on_optimization_start(self):
        pass

    def on_optimization_end(self):
        pass

    def to_dict(self):
        return {"class": f"gpy_tpu.inference.{type(self).__name__}"}


class ExactGaussianInference(LatentFunctionInference):
    """Closed-form GP regression posterior + marginal likelihood."""

    def inference(self, kern, X, likelihood, Y, mean_function=None, Y_metadata=None):
        N = X.shape[0]
        D = Y.shape[1]
        m = mean_function.f(X) if mean_function is not None else 0.0
        YY = Y - m
        K = kern.K(X)
        noise = likelihood.noise_diagonal(N, Y_metadata) + 1e-8
        Ky = K + jnp.diag(noise)
        if N <= EXPLICIT_INV_MAX_N:
            quad, logdet, L, alpha = _exact_inv_terms(Ky, YY)
        else:
            L = jitchol(Ky)
            alpha = dpotrs(L, YY)
            quad = jnp.sum(alpha * YY)
            logdet = logdet_from_chol(L)
        log_marginal = -0.5 * (
            D * N * LOG_2_PI + D * logdet + quad
        )
        posterior = Posterior(woodbury_chol=L, woodbury_vector=alpha, K=K)
        return posterior, log_marginal

    def LOO(self, kern, X, likelihood, Y, mean_function=None, Y_metadata=None):
        """Leave-one-out predictive log densities. GPy: exact_gaussian_inference.py:76-88."""
        from ..util.linalg import dpotri

        N = X.shape[0]
        m = mean_function.f(X) if mean_function is not None else 0.0
        YY = Y - m
        K = kern.K(X)
        noise = likelihood.noise_diagonal(N, Y_metadata) + 1e-8
        L = jitchol(K + jnp.diag(noise))
        Ki = dpotri(L)
        alpha = dpotrs(L, YY)
        diag_Ki = jnp.diagonal(Ki)[:, None]
        mu_loo = Y - alpha / diag_Ki
        var_loo = 1.0 / diag_Ki
        return -0.5 * jnp.log(2 * jnp.pi * var_loo) - 0.5 * (Y - mu_loo) ** 2 / var_loo


class ExactStudentTInference(LatentFunctionInference):
    """Exact inference with multivariate Student-t marginal (TP regression).

    Reference: GPy/inference/latent_function_inference/exact_studentt_inference.py
    and models/tp_regression.py. nu = degrees of freedom.
    """

    def inference(self, kern, X, Y, nu, mean_function=None):
        from jax.scipy.special import gammaln

        N = X.shape[0]
        D = Y.shape[1]
        m = mean_function.f(X) if mean_function is not None else 0.0
        YY = Y - m
        K = kern.K(X)
        L = jitchol(K + 1e-8 * jnp.eye(N, dtype=K.dtype))
        alpha = dpotrs(L, YY)
        beta = jnp.sum(alpha * YY)
        logdet = logdet_from_chol(L)
        log_marginal = (
            D * (gammaln((nu + N) / 2.0) - gammaln(nu / 2.0) - 0.5 * N * jnp.log(jnp.pi * nu))
            - 0.5 * D * logdet
            - 0.5 * (nu + N) * jnp.log1p(beta / nu)
        )
        # predictive scaling factor (nu + beta - 2)/(nu + N - 2) applied by model
        posterior = Posterior(woodbury_chol=L, woodbury_vector=alpha, K=K)
        return posterior, log_marginal, beta
