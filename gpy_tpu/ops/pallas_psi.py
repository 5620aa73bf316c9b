"""Fused psi2 contraction: sum_n W_n psi2_n(Z, qX) without the N x M x M tensor.

TPU-native replacement of the reference's CUDA psi-statistics reductions
(GPy/kern/src/psi_comp/rbf_psi_gpucomp.py:9-431 — custom block reductions
for psi2 and its gradients on GPU), and the memory hot spot called out in
SURVEY.md §7 (d): the (N, M, M) psi2 tensor must never be materialized.

Strategy: tile over blocks of n; each block computes its (BN, M, M)
contribution in VMEM/registers and accumulates into the (M, M) output.
Gradients flow by autodiff over the blocked lax.scan formulation (the
default path) — a jax.checkpoint on the block function keeps backward
memory at O(M^2 + BN*M).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["rbf_psi2_weighted"]


def _block_psi2(v, l2, mu_b, S_b, w_b, Z):
    """sum over the block of w_n psi2_n — (M, M)."""
    denom = 2.0 * S_b + l2  # (BN, Q)
    Zbar = 0.5 * (Z[:, None, :] + Z[None, :, :])  # (M, M, Q)
    dZ2 = (Z[:, None, :] - Z[None, :, :]) ** 2 / l2  # (M, M, Q)
    diff2 = (mu_b[:, None, None, :] - Zbar[None, :, :, :]) ** 2 / denom[:, None, None, :]
    lognorm = 0.5 * jnp.sum(jnp.log(l2)[None, :] - jnp.log(denom), axis=-1)  # (BN,)
    expo = (
        lognorm[:, None, None]
        - 0.25 * jnp.sum(dZ2, axis=-1)[None, :, :]
        - jnp.sum(diff2, axis=-1)
    )
    return v**2 * jnp.einsum("n,nmk->mk", w_b, jnp.exp(expo))


def rbf_psi2_weighted(variance, lengthscale, Z, mu, S, weights, block: int = 256):
    """sum_n weights_n <K(x_n,Z) K(x_n,Z)'>_{q(x_n)} for the RBF kernel.

    Streams over n in blocks of `block` with rematerialized backward —
    peak memory O(block * M^2) instead of O(N * M^2).
    """
    v = jnp.asarray(variance)
    l2 = jnp.broadcast_to(jnp.asarray(lengthscale) ** 2, (mu.shape[1],))
    N, Q = mu.shape
    M = Z.shape[0]
    n_pad = (-N) % block
    if n_pad:
        mu = jnp.concatenate([mu, jnp.zeros((n_pad, Q), mu.dtype)], 0)
        S = jnp.concatenate([S, jnp.ones((n_pad, Q), S.dtype)], 0)
        weights = jnp.concatenate([weights, jnp.zeros((n_pad,), weights.dtype)], 0)
    nb = (N + n_pad) // block
    mu_b = mu.reshape(nb, block, Q)
    S_b = S.reshape(nb, block, Q)
    w_b = weights.reshape(nb, block)

    blk = jax.checkpoint(partial(_block_psi2))

    def body(acc, inp):
        m_, s_, w_ = inp
        return acc + blk(v, l2, m_, s_, w_, Z), None

    out, _ = jax.lax.scan(body, jnp.zeros((M, M), mu.dtype), (mu_b, S_b, w_b))
    return out
