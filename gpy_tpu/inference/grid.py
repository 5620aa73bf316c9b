"""Kronecker/grid Gaussian inference (Saatci 2011).

Reference: GPy/inference/latent_function_inference/gaussian_grid_inference.py
(+ grid_posterior.py, core/gp_grid.py kron_mmprod:64-95). The reference
hand-derives dL_dKd per axis via Kronecker matrix-vector products; here the
whole thing is per-axis `eigh` + tensor rotations (dense matmuls on the MXU)
and gradients come from autodiff through the eigendecomposition.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["GaussianGridInference", "GridPosterior"]

LOG_2_PI = float(np.log(2 * np.pi))


def rotate_all(T, Qs, transpose=True):
    """Apply Q_d (or Q_d^T) along each axis d of the grid tensor."""
    for d, Q in enumerate(Qs):
        M = Q.T if transpose else Q
        T = jnp.moveaxis(jnp.tensordot(M, jnp.moveaxis(T, d, 0), axes=1), 0, d)
    return T


class GridPosterior:
    """Eigen-factors of the grid posterior (GPy: grid_posterior.py:1-62)."""

    def __init__(self, eigs, S, alpha):
        self.eigs = eigs          # [(S_d, Q_d)] per axis
        self.S = S                # kron eigenvalue grid + sigma2
        self.alpha = alpha        # (K + sigma2 I)^-1 y as a grid tensor


class GaussianGridInference:
    """Exact Gaussian inference when K = kron_d K_d over a tensor grid."""

    def inference(self, kernels, Xs_list, noise_var, Y):
        """Y is the grid tensor with shape (n_1, ..., n_D).

        Returns (GridPosterior, log_marginal)."""
        eigs = [tuple(jnp.linalg.eigh(k.K(X))) for k, X in zip(kernels, Xs_list)]
        Qs = [Q for _, Q in eigs]
        Ss = [S for S, _ in eigs]
        sigma2 = jnp.asarray(noise_var)
        Ytil = rotate_all(jnp.asarray(Y), Qs, transpose=True)
        S = Ss[0]
        for Sd in Ss[1:]:
            S = S[..., None] * Sd
        S = S + sigma2
        N = int(np.prod(Y.shape))
        log_marginal = -0.5 * (
            N * LOG_2_PI
            + jnp.sum(jnp.log(jnp.maximum(S, 1e-300)))
            + jnp.sum(Ytil**2 / S)
        )
        alpha = rotate_all(Ytil / S, Qs, transpose=False)
        return GridPosterior(eigs, S, alpha), log_marginal
