"""Packed-triangular utilities for flat Cholesky parameterizations.

Reference: GPy/util/choleskies.py + choleskies_cython.pyx:14-82
(flat_to_triang/triang_to_flat and the hand-written Cholesky backprop).
Here: pure index ops; Cholesky gradients are JAX built-ins.

Packing order matches GPy: column-major over the lower triangle
(indices from np.tril_indices).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["flat_to_triang", "triang_to_flat", "num_flat", "indices"]


def num_flat(M: int) -> int:
    return M * (M + 1) // 2


def indices(M: int):
    return np.tril_indices(M)


def flat_to_triang(flat, M: int):
    """(num_flat, D) -> (D, M, M) lower triangular."""
    flat = jnp.asarray(flat)
    D = flat.shape[1]
    rows, cols = np.tril_indices(M)
    out = jnp.zeros((D, M, M), dtype=flat.dtype)
    return out.at[:, rows, cols].set(flat.T)


def triang_to_flat(L):
    """(D, M, M) -> (num_flat, D)."""
    L = jnp.asarray(L)
    M = L.shape[-1]
    rows, cols = np.tril_indices(M)
    return L[:, rows, cols].T
