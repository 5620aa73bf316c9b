"""Batch-vectorized Cholesky + triangular inverse for TPU.

Why this exists: XLA's native cholesky/triangular_solve SERIALIZE over batch
elements on TPU (measured on v5e-1: chol of (8, 1000, 1000) costs ~8x one
(1000, 1000) — a While loop per element, ~0.2us per column each). Every
vmapped-chain HMC leapfrog gradient and every parallel restart pays that.
The blocked recursion in ops/blocked_linalg.rec_chol_inv moves the GLUE onto
batched MXU matmuls but still bottoms out in serialized native leaves
(~25-60us per element per leaf).

Here the 128x128 diagonal-block factorization itself is ONE Pallas program
processing the whole batch: the column loop's rank-1 update is a (C, 128,
128) VPU op, so the C batch elements ride the 8x128 vector lanes together
instead of queueing. The outer blocked loop (panels + trailing updates) and
the factor-inverse assembly are batched matmuls XLA already runs at MXU
speed.

Replaces the role of LAPACK potrf/trtri batching that the reference gets
from numpy on CPU (GPy/util/linalg.py jitchol:56, dtrtri:217) — GPy has no
batched path at all (one model, one chol).

Forward-only by design: gradients flow through the custom VJPs in
util/linalg (chol_and_inv) and inference/exact (_exact_inv_terms), which are
matmul-only, so this kernel is never differentiated.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pallas_block_chol_inv", "pallas_batched_chol_inv",
           "pallas_chol_available"]

_B = 128  # diagonal block size (MXU/VPU native tile width)


def pallas_chol_available(K=None, backend=None) -> bool:
    back = backend or jax.default_backend()
    if back != "tpu":
        return False
    if K is not None and K.dtype != jnp.float32:
        return False
    return True


def _block_kernel(a_ref, l_ref, li_ref):
    """chol + inverse of (C, 128, 128) PSD blocks, all C at once.

    Layout notes: the input is symmetric, so "column k of A" is read as ROW
    k (a cheap sublane slice); the factor is accumulated transposed (LT) and
    transposed once at the end. Rows above k are masked (they hold stale
    rank-1 residue by construction). A non-PSD block produces sqrt(<0) =
    NaN, which poisons the output — exactly what the jitter ladder detects.
    """
    C, n, _ = a_ref.shape
    AT0 = a_ref[:]
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    def chol_body(k, carry):
        AT, LT = carry
        row = lax.dynamic_slice(AT, (0, k, 0), (C, 1, n))        # col k of A
        d = lax.dynamic_slice(row, (0, 0, k), (C, 1, 1))
        lrow = jnp.where(lane >= k, row, 0.0) / jnp.sqrt(d)      # (C,1,n)
        LT = lax.dynamic_update_slice(LT, lrow, (0, k, 0))
        lcol = jnp.transpose(lrow, (0, 2, 1))                    # (C,n,1)
        AT = AT - lcol * lrow                                    # rank-1
        return AT, LT

    _, LT = lax.fori_loop(0, n, chol_body, (AT0, jnp.zeros_like(AT0)))
    L = jnp.transpose(LT, (0, 2, 1))
    l_ref[:] = L

    def inv_body(k, X):
        # X[k, :] = (e_k - L[k, :k] @ X[:k, :]) / L[k, k]
        lrow = lax.dynamic_slice(L, (0, k, 0), (C, 1, n))        # row k of L
        d = lax.dynamic_slice(lrow, (0, 0, k), (C, 1, 1))
        coeff = jnp.where(lane < k, lrow, 0.0)                   # strict lower
        s = jnp.sum(jnp.transpose(coeff, (0, 2, 1)) * X, axis=1,
                    keepdims=True)                               # (C,1,n)
        ek = (lane == k).astype(X.dtype)
        newrow = (ek - s) / d
        return lax.dynamic_update_slice(X, newrow, (0, k, 0))

    li_ref[:] = lax.fori_loop(0, n, inv_body, jnp.zeros_like(AT0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_chol_inv(A, interpret=False):
    """(L, L^-1) of a (C, 128, 128) batch of PSD blocks — one program."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, n, _ = A.shape
    out = pl.pallas_call(
        _block_kernel,
        out_shape=[jax.ShapeDtypeStruct((C, n, n), jnp.float32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        interpret=interpret,
    )(A.astype(jnp.float32))
    return out[0], out[1]


def pallas_batched_chol_inv(K, interpret=False):
    """(L, L^-1) for PSD K of shape (..., n, n), any leading batch dims.

    Right-looking blocked factorization: each 128-diagonal-block is
    factored+inverted by the batch-vectorized Pallas program; panel solves
    are matmuls against the block inverse (trsm-free); the factor inverse is
    assembled from the per-block inverses by pairwise doubling
    ( [[A,0],[B,C]]^-1 lower block = -C^-1 B A^-1 ), log2(n/128) levels of
    batched matmuls. n is padded to a multiple of 128 with an identity
    block (exact: the padded rows factor to I and never couple back).
    """
    orig_shape = K.shape
    n = orig_shape[-1]
    batch = orig_shape[:-2]
    C = 1
    for b in batch:
        C *= b
    K = K.reshape((C, n, n))
    nb = -(-n // _B)
    npad = nb * _B
    if npad != n:
        pad = npad - n
        eye_pad = jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype), (C, pad, pad))
        K = jnp.concatenate([
            jnp.concatenate([K, jnp.zeros((C, n, pad), K.dtype)], -1),
            jnp.concatenate([jnp.zeros((C, pad, n), K.dtype), eye_pad], -1),
        ], -2)

    T = lambda X: jnp.swapaxes(X, -1, -2)  # noqa: E731
    A = K
    col_blocks = []
    dinvs = []
    for j in range(nb):
        Ablk = A[:, :_B, :_B]
        Ljj, Dinv = pallas_block_chol_inv(Ablk, interpret=interpret)
        dinvs.append(Dinv)
        below = A[:, _B:, :_B]                    # (C, rem, B)
        P = below @ T(Dinv)                       # panel: L[i>j, j]
        col = jnp.concatenate(
            [jnp.zeros((C, j * _B, _B), K.dtype), Ljj, P], 1)
        col_blocks.append(col)
        rem = A.shape[1] - _B
        if rem:
            A = A[:, _B:, _B:] - P @ T(P)
        else:
            A = A[:, _B:, _B:]
    L = jnp.concatenate(col_blocks, -1)

    # factor inverse by pairwise doubling over adjacent diagonal ranges:
    # [[A,0],[B,C]]^-1 = [[Ai,0],[-Ci B Ai, Ci]] — two batched matmuls per
    # pair, log2(nb) levels (any nb: odd tails carry to the next level)
    items = [(dinv, _B, j * _B) for j, dinv in enumerate(dinvs)]
    while len(items) > 1:
        nxt = []
        for p in range(0, len(items) - 1, 2):
            Ai, sa, oa = items[p]
            Ci, sc, oc = items[p + 1]
            Bblk = L[:, oc:oc + sc, oa:oa + sa]
            low = -Ci @ (Bblk @ Ai)
            comb = jnp.concatenate([
                jnp.concatenate([Ai, jnp.zeros((C, sa, sc), K.dtype)], -1),
                jnp.concatenate([low, Ci], -1)], -2)
            nxt.append((comb, sa + sc, oa))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    Li = items[0][0]

    L = L[:, :n, :n].reshape(orig_shape)
    Li = Li[:, :n, :n].reshape(orig_shape)
    return L, Li
