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


def gram_materialize(kern, X, noise=None, block=2048, out_dtype=None,
                     symmetric=False):
    """Materialize K(X, X) + diag(noise) in row blocks -> (N, N).

    For stop-gradient CG loops that do MANY K-products (iterative exact-GP
    inference runs max_cg of them), recomputing the Gram every iteration is
    exp/VPU-bound (~2.5G transcendentals per matvec at N=50k). Building K
    once turns every subsequent matvec into a pure HBM-bandwidth matmul —
    measured ~3x on the N=50k NLML+grad. Peak transient memory stays
    O(block * N) on top of the (N, N) result (f32 at N=50k: 10GB, which a
    16GB v5e chip holds).

    symmetric=True: only the lower-triangle block tiles are computed, each
    written twice (tile + transpose), halving the exp count. MEASURED
    SLOWER on v5e (N=50k bf16 NLML+grad 425 -> 489 ms): the (block, block)
    tile scan with two dynamic_update_slice writes per step loses more to
    per-tile overhead and broken producer fusion than the halved
    transcendentals save over the fused (block, N) row-strip lax.map.
    Kept off by default as a documented negative result; exact parity with
    the row-strip build is pinned by tests.

    Returns the padded (P, P) matrix and row count P (P = ceil(N/block) *
    block); padded rows/cols are zero so a zero-padded RHS is safe.
    """
    import numpy as _np

    N = X.shape[0]
    Xp, n_tot = _pad_rows(X, block)
    blocks = n_tot // block

    if symmetric and blocks > 1:
        row_ok_v = (jnp.arange(n_tot) < N).astype(X.dtype)
        if noise is not None:
            noise_p = jnp.concatenate(
                [jnp.asarray(noise, X.dtype),
                 jnp.zeros((n_tot - N,), X.dtype)]) if n_tot != N else (
                jnp.asarray(noise, X.dtype))
        else:
            noise_p = jnp.zeros((n_tot,), X.dtype)
        ii, jj = _np.tril_indices(blocks)
        offs_i = jnp.asarray(ii * block, jnp.int32)
        offs_j = jnp.asarray(jj * block, jnp.int32)
        dt = jnp.dtype(out_dtype) if out_dtype is not None else Xp.dtype
        ar = jnp.arange(block, dtype=jnp.int32)
        Dx = X.shape[1]

        z32 = jnp.int32(0)  # python 0 would promote the index pair to i64
        # under x64 mode and dynamic_slice requires uniform index dtypes

        def body(K, offs):
            oi, oj = offs
            xi = lax.dynamic_slice(Xp, (oi, z32), (block, Dx))
            xj = lax.dynamic_slice(Xp, (oj, z32), (block, Dx))
            Kb = kern.K(xi, xj)
            ri = lax.dynamic_slice(row_ok_v, (oi,), (block,))
            rj = lax.dynamic_slice(row_ok_v, (oj,), (block,))
            Kb = Kb * ri[:, None] * rj[None, :]
            # diagonal noise: nonzero only on diagonal tiles (uniform mask,
            # no branch — off-diagonal tiles get an all-zero mask)
            m = ((oi + ar)[:, None] == (oj + ar)[None, :]).astype(Kb.dtype)
            nz = lax.dynamic_slice(noise_p, (oi,), (block,))
            Kb = Kb + m * nz[:, None]
            Kb = Kb.astype(dt)
            K = lax.dynamic_update_slice(K, Kb, (oi, oj))
            # mirror (diagonal tiles: rewrite with the transpose — symmetric,
            # harmless; keeps the body branch-free)
            K = lax.dynamic_update_slice(K, Kb.T, (oj, oi))
            return K, ()

        K0 = jnp.zeros((n_tot, n_tot), dt)
        K, _ = lax.scan(body, K0, (offs_i, offs_j))
        return K, n_tot
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
