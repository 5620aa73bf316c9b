"""Matrix-free Gram matvec: (K(X, X) + diag(noise)) @ V in row blocks.

The kernel matrix is never materialized — each lax.map step builds one
(block, N) tile of K, multiplies into V, and discards it: O(block * N)
transient memory instead of O(N^2). This is the blockwise-pairwise tiling
SURVEY.md §5 calls for (structurally the ring-attention tiling of the N x N
Gram), and the engine under iterative exact-GP inference
(gpy_tpu/inference/iterative.py) at N far beyond dense-Cholesky memory.

The reference has no analogue: GPy materializes dense K
(exact_gaussian_inference.py:53) and is memory-bound at ~N=20k.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["gram_matvec", "make_gram_matvec", "gram_materialize"]


def _pad_rows(X, block):
    n = X.shape[0]
    n_pad = (-n) % block
    if n_pad:
        X = jnp.concatenate([X, jnp.zeros((n_pad, X.shape[1]), X.dtype)], 0)
    return X, n + n_pad


def gram_matvec(kern, X, V, noise=None, block=2048):
    """(K + diag(noise)) @ V for any kernel with a .K(X, X2) method.

    V: (N, R). Per-block work is rematerialized in reverse mode
    (jax.checkpoint) so gradients also run in O(block * N) memory.
    """
    N = X.shape[0]
    V2 = V if V.ndim == 2 else V[:, None]
    Xp, n_tot = _pad_rows(X, block)
    blocks = n_tot // block
    Xb = Xp.reshape(blocks, block, X.shape[1])

    @jax.checkpoint
    def one_block(xb):
        Kb = kern.K(xb, X)  # (block, N)
        return Kb @ V2

    out = lax.map(one_block, Xb)  # (blocks, block, R)
    out = out.reshape(n_tot, -1)[:N]
    if noise is not None:
        out = out + noise[:, None] * V2
    return out if V.ndim == 2 else out[:, 0]


def make_gram_matvec(kern, X, noise, block=2048):
    """Closure form used by the CG loop."""

    def mv(V):
        return gram_matvec(kern, X, V, noise=noise, block=block)

    return mv


def gram_materialize(kern, X, noise=None, block=2048, out_dtype=None):
    """Materialize K(X, X) + diag(noise) in row blocks -> (N, N).

    For stop-gradient CG loops that do MANY K-products (iterative exact-GP
    inference runs max_cg of them), recomputing the Gram every iteration is
    exp/VPU-bound (~2.5G transcendentals per matvec at N=50k). Building K
    once turns every subsequent matvec into a pure HBM-bandwidth matmul —
    measured ~3x on the N=50k NLML+grad. Peak transient memory stays
    O(block * N) on top of the (N, N) result (f32 at N=50k: 10GB, which a
    16GB v5e chip holds).

    Returns the padded (P, P) matrix and row count P (P = ceil(N/block) *
    block); padded rows/cols are zero so a zero-padded RHS is safe.
    """
    N = X.shape[0]
    Xp, n_tot = _pad_rows(X, block)
    blocks = n_tot // block
    Xb = Xp.reshape(blocks, block, X.shape[1])
    row_ok = (jnp.arange(n_tot) < N).astype(X.dtype)
    col_ids = jnp.arange(n_tot)

    if noise is not None:
        noise_p = jnp.concatenate(
            [jnp.asarray(noise, X.dtype),
             jnp.zeros((n_tot - N,), X.dtype)]) if n_tot != N else (
            jnp.asarray(noise, X.dtype))
        noise_b = noise_p.reshape(blocks, block)
    else:
        noise_b = jnp.zeros((blocks, block), X.dtype)
    offs = jnp.arange(blocks, dtype=jnp.int32) * block

    def one_block(args):
        xb, rb, nz, off = args
        Kb = kern.K(xb, Xp)  # (block, P)
        Kb = Kb * rb[:, None] * row_ok[None, :]
        # diagonal noise fused into the producing block (elementwise mask,
        # no extra HBM pass): a post-hoc K.at[idx, idx].add on the full
        # (P, P) result is a 10GB-array scatter that costs a full copy
        row_ids = off + jnp.arange(block, dtype=jnp.int32)
        m = (col_ids[None, :] == row_ids[:, None]).astype(Kb.dtype)
        Kb = Kb + m * nz[:, None]
        # cast fused into the producing block: a post-hoc astype on the
        # full (P, P) result reads 10GB f32 + writes 5GB bf16 (~30 ms at
        # N=50k) that never needs to exist
        return Kb if out_dtype is None else Kb.astype(out_dtype)

    K = lax.map(one_block, (Xb, rows_ok_b := row_ok.reshape(blocks, block),
                            noise_b, offs)).reshape(n_tot, n_tot)
    return K, n_tot
