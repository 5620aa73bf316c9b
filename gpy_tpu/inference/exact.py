"""Exact Gaussian inference (GP regression) and exact Student-t inference.

Reference: GPy/inference/latent_function_inference/exact_gaussian_inference.py
:37-88 and exact_studentt_inference.py.

TPU design: one Cholesky of K + diag(noise) on the MXU-fed solver; the
reference's hand-assembled dL_dK = 0.5(alpha alpha^T - D*K^-1) and the
explicit gradient routing disappear — `jax.grad` through this function *is*
that formula (the cholesky VJP computes it without ever materializing K^-1).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..util.linalg import dpotrs, jitchol, jitchol_and_inv, logdet_from_chol
from .posterior import Posterior

__all__ = ["ExactGaussianInference", "ExactStudentTInference"]

LOG_2_PI = float(np.log(2 * np.pi))

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
            L, Li = jitchol_and_inv(Ky)
            t = Li @ YY  # whitened targets: quad form = |t|^2, alpha = Li' t
            alpha = jnp.swapaxes(Li, -1, -2) @ t
            quad = jnp.sum(t * t)
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
