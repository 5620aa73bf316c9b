"""Opper-Archambeau variational Gaussian approximation.

Reference: GPy/inference/latent_function_inference/var_gauss.py:9-69.
q(f) = N(K alpha, (K^{-1} + diag(lambda))^{-1}) with per-point variational
parameters (alpha, lambda); works with any likelihood via GH quadrature.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.linalg import jitchol
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["VarGauss"]


class VarGauss(LatentFunctionInference):
    def elbo(self, kern, X, likelihood, Y, alpha, lam, Y_metadata=None):
        """alpha (N,1), lam (N,1) positive."""
        N = X.shape[0]
        K = kern.K(X) + 1e-8 * jnp.eye(N, dtype=X.dtype)
        m = K @ alpha
        sl = jnp.sqrt(lam)
        A = jnp.eye(N, dtype=X.dtype) + (sl * K) * sl.T
        LA = jitchol(A)
        # Sigma = K - K sl A^-1 sl K ; need only its diagonal
        V = jsl.solve_triangular(LA, sl * K, lower=True)
        diag_Sigma = jnp.diagonal(K) - jnp.sum(V * V, axis=0)
        diag_Sigma = jnp.maximum(diag_Sigma, 1e-12)
        F = likelihood.variational_expectations(Y, m, diag_Sigma[:, None], Y_metadata)
        # KL(q||p) = 1/2 (alpha' K alpha + logdet(A) - tr(Lam Sigma))
        kl = 0.5 * (
            jnp.sum(alpha * m)
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(LA)))
            - jnp.sum(lam[:, 0] * diag_Sigma)
        )
        return jnp.sum(F) - kl

    def inference(self, kern, X, likelihood, Y, alpha, lam, Y_metadata=None):
        N = X.shape[0]
        K = kern.K(X) + 1e-8 * jnp.eye(N, dtype=X.dtype)
        sl = jnp.sqrt(lam)
        A = jnp.eye(N, dtype=X.dtype) + (sl * K) * sl.T
        LA = jitchol(A)
        Ai = jsl.cho_solve((LA, True), jnp.eye(N, dtype=X.dtype))
        woodbury_inv = (sl * Ai) * sl.T
        post = Posterior(woodbury_vector=alpha, woodbury_inv=woodbury_inv, K=K)
        return post, self.elbo(kern, X, likelihood, Y, alpha, lam, Y_metadata)
