"""FITC, DTC and PEP sparse inference.

Reference: GPy/inference/latent_function_inference/fitc.py:21-86, dtc.py,
pep.py:8-93 (Bui/Yan/Turner power-EP: alpha->0 gives VarDTC, alpha=1 FITC).

One shared stable factorization (the reference's beta_star pattern,
pep.py:42-60); the three methods differ only in the effective per-point
noise and constant terms. All gradients via autodiff.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.linalg import jitchol, jitchol_and_inv
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["FITC", "DTC", "PEP"]

LOG_2_PI = float(np.log(2 * np.pi))
CONST_JITTER = 1e-6


def _pep_core(kern, X, Z, likelihood, Y, Y_metadata, alpha):
    """Shared PEP-family computation (GPy pep.py:28-95 structure).

    Returns (log_marginal, posterior).
    """
    M = Z.shape[0]
    N, D = Y.shape
    sigma_n = likelihood.gaussian_variance(Y_metadata)
    Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
    Knn = kern.Kdiag(X)
    U = kern.K(X, Z)  # (N, M)
    # fused factor+inverse with matmul-only VJP (util.linalg); the (M, N)
    # projection is then a matmul on the MXU instead of a sequential-blocked
    # trsm with N RHS
    L, Li = jitchol_and_inv(Kmm)
    LiUT = Li @ U.T  # (M, N)
    Qnn = jnp.sum(LiUT**2, axis=0)
    sigma_star = sigma_n + alpha * (Knn - Qnn)
    beta = 1.0 / sigma_star
    A = (LiUT * beta[None, :]) @ LiUT.T + jnp.eye(M, dtype=Z.dtype)
    LA = jitchol(A)
    URiy = U.T @ (beta[:, None] * Y)  # (M, D)
    tmp = jsl.solve_triangular(L, URiy, lower=True)
    b = jsl.solve_triangular(LA, tmp, lower=True)
    tmp2 = jsl.solve_triangular(LA, b, lower=True, trans=1)
    v = jsl.solve_triangular(L, tmp2, lower=True, trans=1)  # woodbury_vector
    tmp3 = jsl.solve_triangular(LA, Li, lower=True)
    P = tmp3.T @ tmp3  # (Kmm + U'RU)^{-1}-ish
    ac = (1.0 - alpha) / alpha if alpha < 1.0 else 0.0
    log_marginal = (
        -0.5 * N * D * LOG_2_PI
        - D * jnp.sum(jnp.log(jnp.diagonal(LA)))
        + 0.5 * D * (1.0 + ac) * jnp.sum(jnp.log(beta))
        - 0.5 * jnp.sum(beta[:, None] * Y * Y)
        + 0.5 * jnp.sum(b * b)
        + 0.5 * ac * N * jnp.log(sigma_n)
    )
    Kmmi = Li.T @ Li
    posterior = Posterior(woodbury_vector=v, woodbury_inv=Kmmi - P, K=Kmm)
    return log_marginal, posterior


class FITC(LatentFunctionInference):
    """Fully independent training conditional (GPy fitc.py:21-86) == PEP(alpha=1)."""

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None, Y_metadata=None, qX=None):
        assert mean_function is None
        lm, post = _pep_core(kern, X, Z, likelihood, Y, Y_metadata, alpha=1.0)
        return post, lm

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None, Y_metadata=None, qX=None):
        return self.inference(kern, X, Z, likelihood, Y, mean_function, Y_metadata)[1]


class DTC(LatentFunctionInference):
    """Deterministic training conditional (GPy dtc.py): projected process,
    no trace correction, no diag correction."""

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None, Y_metadata=None, qX=None):
        assert mean_function is None
        M = Z.shape[0]
        N, D = Y.shape
        sigma_n = likelihood.gaussian_variance(Y_metadata)
        beta = jnp.broadcast_to(1.0 / sigma_n, (N,))
        Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
        U = kern.K(X, Z)
        L, Li = jitchol_and_inv(Kmm)
        LiUT = Li @ U.T
        A = (LiUT * beta[None, :]) @ LiUT.T + jnp.eye(M, dtype=Z.dtype)
        LA = jitchol(A)
        URiy = U.T @ (beta[:, None] * Y)
        tmp = jsl.solve_triangular(L, URiy, lower=True)
        b = jsl.solve_triangular(LA, tmp, lower=True)
        log_marginal = (
            -0.5 * N * D * LOG_2_PI
            - D * jnp.sum(jnp.log(jnp.diagonal(LA)))
            + 0.5 * D * jnp.sum(jnp.log(beta))
            - 0.5 * jnp.sum(beta[:, None] * Y * Y)
            + 0.5 * jnp.sum(b * b)
        )
        tmp2 = jsl.solve_triangular(LA, b, lower=True, trans=1)
        v = jsl.solve_triangular(L, tmp2, lower=True, trans=1)
        tmp3 = jsl.solve_triangular(LA, Li, lower=True)
        P = tmp3.T @ tmp3
        Kmmi = Li.T @ Li
        posterior = Posterior(woodbury_vector=v, woodbury_inv=Kmmi - P, K=Kmm)
        return posterior, log_marginal

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None, Y_metadata=None, qX=None):
        return self.inference(kern, X, Z, likelihood, Y, mean_function, Y_metadata)[1]


class PEP(LatentFunctionInference):
    """Power-EP sparse regression (GPy pep.py). alpha in (0, 1]."""

    def __init__(self, alpha: float = 0.5):
        assert 0.0 < alpha <= 1.0
        self.alpha = float(alpha)

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None, Y_metadata=None, qX=None):
        assert mean_function is None
        lm, post = _pep_core(kern, X, Z, likelihood, Y, Y_metadata, alpha=self.alpha)
        return post, lm

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None, Y_metadata=None, qX=None):
        return self.inference(kern, X, Z, likelihood, Y, mean_function, Y_metadata)[1]
