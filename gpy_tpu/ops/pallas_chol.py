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
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from .blocked_linalg import CHOL_UPDATE_PREC

__all__ = ["pallas_block_chol_inv", "pallas_block_chol",
           "pallas_batched_chol_inv", "rec_pallas_chol_inv",
           "pallas_chol_available"]

_B = 128  # diagonal block size (MXU/VPU native tile width)


def _mm(a, b):
    """Glue matmul at the chol-update precision policy ('high' = 3-pass
    bf16 ~ f32 accuracy by default; GPY_TPU_CHOL_UPDATE_PRECISION=highest
    opts out). These are the same Schur/panel/inverse-assembly update
    class as blocked_linalg's trailing updates (measured 2.5e-7 error =
    pure reordering); at HIGHEST they were the largest cost of the batched
    path (0.22 ms of 1.2 ms at C=8, n=1000)."""
    return jnp.matmul(a, b, precision=CHOL_UPDATE_PREC)


def pallas_chol_available(K=None, backend=None) -> bool:
    back = backend or jax.default_backend()
    if back != "tpu":
        return False
    if K is not None and K.dtype != jnp.float32:
        return False
    return True


def _block_kernel(a_ref, lt_ref, li_ref, at_ref):
    """chol + inverse of (C, 128, 128) PSD blocks, all C at once.

    Every per-column step is a whole-batch VPU op: the C elements ride the
    8x128 vector lanes together instead of queueing through XLA's
    one-element-at-a-time native chol. Mosaic constraints shape the code:
    no dynamic_slice on values and no in-loop transposes, so "column k"
    vectors are extracted by mask+reduce (the input is symmetric, and the
    rank-1 updates keep the trailing block symmetric, so row k == column k
    of A), and the factor is written TRANSPOSED (lt_ref; the caller
    transposes in XLA). A non-PSD block produces sqrt(<0) = NaN which
    poisons the whole output — exactly what the jitter ladder detects.
    """
    C, n, _ = a_ref.shape
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    subl = lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    f0 = jnp.float32(0.0)  # explicit f32: weak-typed 0.0 becomes f64 under
    # x64 mode and Mosaic's convert lowering recurses on f64/i64 scalars
    at_ref[:] = a_ref[:]

    def chol_body(k, _):
        row = at_ref[:, pl.ds(k, 1), :]                          # (C,1,n)
        d = jnp.sum(jnp.where(lane == k, row, f0), axis=2, keepdims=True)
        inv_sd = jnp.float32(1.0) / jnp.sqrt(d)
        lrow = jnp.where(lane >= k, row, f0) * inv_sd            # (C,1,n)
        lt_ref[:, pl.ds(k, 1), :] = lrow
        # column k of (symmetric) A via mask+reduce over lanes
        col = jnp.sum(jnp.where(lane == k, at_ref[:], f0), axis=2,
                      keepdims=True)                             # (C,n,1)
        lcol = jnp.where(subl >= k, col, f0) * inv_sd
        at_ref[:] = at_ref[:] - lcol * lrow                      # rank-1
        return jnp.int32(0)

    # i32 bounds keep the induction variable i32 under x64 (Mosaic's
    # i64->i32 convert helper recurses)
    lax.fori_loop(jnp.int32(0), jnp.int32(n), chol_body, jnp.int32(0),
                  unroll=False)

    li_ref[:] = jnp.zeros_like(a_ref)

    def inv_body(k, _):
        # X[k, :] = (e_k - L[k, :k] @ X[:k, :]) / L[k, k]; row k of L is
        # lane column k of LT, extracted by mask+reduce
        lcolT = jnp.sum(jnp.where(lane == k, lt_ref[:], f0), axis=2,
                        keepdims=True)                           # (C,n,1)
        d = jnp.sum(jnp.where(subl == k, lcolT, f0), axis=1, keepdims=True)
        coeff = jnp.where(subl < k, lcolT, f0)                   # strict lower
        s = jnp.sum(coeff * li_ref[:], axis=1, keepdims=True)    # (C,1,n)
        ek = (lane == k).astype(jnp.float32)
        li_ref[:, pl.ds(k, 1), :] = (ek - s) / d
        return jnp.int32(0)

    lax.fori_loop(jnp.int32(0), jnp.int32(n), inv_body, jnp.int32(0),
                  unroll=False)


_PW = 8  # panel width (sublane-native)


def _block_kernel_v2(a_ref, lt_ref, at_ref):
    """Panelized chol of (C, 128, 128) blocks (factor only, transposed).

    v2 of _block_kernel: the column loop's full-matrix rank-1 updates (the
    v1 bottleneck: 2 x 128 iterations x (C,128,128) VPU traffic, measured
    ~0.2 ms at C=8) become 16 unrolled panels — 8 micro-steps each touching
    only the (C,8,128) panel rows, then ONE rank-8 trailing update per panel
    done as per-element MXU dots contracting the 8-axis. Row t of the panel
    after factoring holds L's column k_t over ALL lanes (the within-panel
    rank-1s update the full row), so the trailing L entries come free, and
    the trailing update needs no masks: rows at/above the panel are dead
    (already copied to lt_ref) and already-factored lanes are never read
    again. No inverse here — the caller inverts the 8x8 diagonal blocks via
    the exact nilpotent Neumann series and assembles L^-1 by pairwise
    doubling, all as batched XLA matmuls (see _tri_inv_from_blocks).
    """
    C, n, _ = a_ref.shape
    npan = n // _PW
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    subl8 = lax.broadcasted_iota(jnp.int32, (1, _PW, 1), 1)
    f0 = jnp.float32(0.0)
    at_ref[:] = a_ref[:]

    for p in range(npan):
        base = p * _PW
        R = at_ref[:, base:base + _PW, :]                        # (C,8,128)
        for t in range(_PW):
            k = base + t
            row = R[:, t:t + 1, :]
            d = jnp.sum(jnp.where(lane == k, row, f0), axis=2, keepdims=True)
            inv_sd = jnp.float32(1.0) / jnp.sqrt(d)
            lrow = jnp.where(lane >= k, row, f0) * inv_sd
            # panel-local column k (symmetric region, identically updated)
            lcol = jnp.sum(jnp.where(lane == k, R, f0), axis=2,
                           keepdims=True) * inv_sd               # (C,8,1)
            upd = jnp.where(subl8 > t, lcol, f0) * lrow
            R = jnp.where(subl8 == t, lrow, R - upd)
        lt_ref[:, base:base + _PW, :] = R
        # rank-8 trailing update, no masks (dead rows/lanes never read).
        # ONE batched MXU dot over the whole C batch: Mosaic lowers
        # dot_general with leading batch dims at full HIGHEST precision
        # (verified vs f64 to 2e-6) — the per-element python loop this
        # replaces serialized C tiny dots per panel and made v2 lose to
        # v1 at C>=16 (the round-3 wiring's crossover).
        if p + 1 < npan:
            upd = lax.dot_general(
                R, R, (((1,), (1,)), ((0,), (0,))),
                precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)              # (C,128,128)
            at_ref[:] = at_ref[:] - upd


def _block_kernel_v2_multi(a_ref, lt_ref, at_ref, *, n_slabs):
    """Panelized chol of (8*n_slabs, 128, 128) blocks with the slabs'
    independent dependency chains INTERLEAVED in one straight-line program.

    The r5 component breakdown showed the batched path is KERNEL-dominated
    and superlinear in slabs when the slabs run as separate grid steps
    (C=8 kernels 0.40 ms -> C=16 1.12 ms: each grid step's column loop is a
    serial dependency chain of small VPU ops, so two steps pay the latency
    twice with no overlap). Here each micro-step issues the same op for
    every slab back to back — the chains are independent, so the in-order
    VLIW scheduler fills one slab's stalls with the other's work. Same math
    per slab as _block_kernel_v2.
    """
    C, n, _ = a_ref.shape
    npan = n // _PW
    lane = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)
    subl8 = lax.broadcasted_iota(jnp.int32, (1, _PW, 1), 1)
    f0 = jnp.float32(0.0)
    at_ref[:] = a_ref[:]

    for p in range(npan):
        base = p * _PW
        Rs = [at_ref[s * 8:(s + 1) * 8, base:base + _PW, :]
              for s in range(n_slabs)]
        for t in range(_PW):
            k = base + t
            rows = [R[:, t:t + 1, :] for R in Rs]
            ds = [jnp.sum(jnp.where(lane == k, r, f0), axis=2, keepdims=True)
                  for r in rows]
            invs = [jnp.float32(1.0) / jnp.sqrt(d) for d in ds]
            lrows = [jnp.where(lane >= k, r, f0) * iv
                     for r, iv in zip(rows, invs)]
            lcols = [jnp.sum(jnp.where(lane == k, R, f0), axis=2,
                             keepdims=True) * iv
                     for R, iv in zip(Rs, invs)]
            Rs = [jnp.where(subl8 == t, lr, R - jnp.where(subl8 > t, lc, f0) * lr)
                  for R, lr, lc in zip(Rs, lrows, lcols)]
        for s in range(n_slabs):
            lt_ref[s * 8:(s + 1) * 8, base:base + _PW, :] = Rs[s]
        if p + 1 < npan:
            for s in range(n_slabs):
                upd = lax.dot_general(
                    Rs[s], Rs[s], (((1,), (1,)), ((0,), (0,))),
                    precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                at_ref[s * 8:(s + 1) * 8] = at_ref[s * 8:(s + 1) * 8] - upd


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_chol_inv(A, interpret=False):
    """(L, L^-1) of a (C, 128, 128) batch of PSD blocks — one program (v1)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, n, _ = A.shape
    out = pl.pallas_call(
        _block_kernel,
        out_shape=[jax.ShapeDtypeStruct((C, n, n), jnp.float32)] * 2,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[pltpu.VMEM((C, n, n), jnp.float32)],
        interpret=interpret,
    )(A.astype(jnp.float32))
    return jnp.swapaxes(out[0], -1, -2), out[1]


_KSTYLE = os.environ.get("GPY_TPU_CHOL_KERNEL_STYLE", "outbuf")
# slab-interleaved kernel for 8 < C <= 32 (GPY_TPU_CHOL_INTERLEAVE=0 reverts
# to sequential 8-slab grid steps); VMEM at C=32: 3 x 2 MB buffers, fine
_INTERLEAVE = os.environ.get("GPY_TPU_CHOL_INTERLEAVE", "1") != "0"
_MAX_INTERLEAVE = 32


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_block_chol(A, interpret=False):
    """L = chol(A) for a (C, 128, 128) batch — panelized v2 kernel.

    The working buffer is an OUTPUT, not scratch (default style 'outbuf'):
    Mosaic cannot double-buffer scratch across grid steps and allocates it
    more conservatively; writing the trailing matrix to a second (dead)
    output measured consistently faster at C<=8 (5.8-15 vs 21-50 us per
    call) and never slower. Batches larger than 8 that divide evenly run
    as a grid over 8-element slabs, keeping each step's VPU ops one
    sublane group wide. GPY_TPU_CHOL_KERNEL_STYLE=scratch reverts."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, n, _ = A.shape
    if 8 < C <= _MAX_INTERLEAVE and C % 8 == 0 and _INTERLEAVE:
        # slab-interleaved kernel: one program, independent chains overlap
        out = pl.pallas_call(
            functools.partial(_block_kernel_v2_multi, n_slabs=C // 8),
            out_shape=[jax.ShapeDtypeStruct((C, n, n), jnp.float32)] * 2,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            interpret=interpret,
        )(A.astype(jnp.float32))
        return jnp.swapaxes(out[0], -1, -2)
    if C > 8 and C % 8 == 0:
        g, cb = C // 8, 8
    else:
        g, cb = 1, C
    if _KSTYLE == "outbuf":
        out = pl.pallas_call(
            _block_kernel_v2,
            grid=(g,),
            out_shape=[jax.ShapeDtypeStruct((C, n, n), jnp.float32)] * 2,
            in_specs=[pl.BlockSpec((cb, n, n), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((cb, n, n), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * 2,
            interpret=interpret,
        )(A.astype(jnp.float32))
        return jnp.swapaxes(out[0], -1, -2)
    out = pl.pallas_call(
        _block_kernel_v2,
        grid=(g,),
        out_shape=jax.ShapeDtypeStruct((C, n, n), jnp.float32),
        in_specs=[pl.BlockSpec((cb, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((cb, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((cb, n, n), jnp.float32)],
        interpret=interpret,
    )(A.astype(jnp.float32))
    return jnp.swapaxes(out, -1, -2)


# tri-inverse primitives now live in blocked_linalg (shared with the
# inverse-leaf trsm forms); keep the local names for existing callers
from .blocked_linalg import tri8_inv_batched as _tri8_inv_batched  # noqa: E402
from .blocked_linalg import tri_inv_doubling as _tri_inv_128  # noqa: E402


def _next_pow2_128(n):
    p = 128
    while p < n:
        p *= 2
    return p


def rec_pallas_chol_inv(A, leaf=_B, interpret=False):
    """(L, L^-1) via 2x2 recursion with Pallas v1 (chol+inverse) leaves.

    Carries the factor inverse up the recursion (rec_chol_inv's trsm-free
    assembly) so the per-block-column tri_inv_doubling of the right-looking
    path — 8 sequential ~14-op latency stacks at n=1024 — disappears.
    Measured at (C, 1000, 1000): WINS at C=16 (1.92 vs 2.14 ms) where the
    bigger combine matmuls amortize across the batch; loses slightly at
    C<=8 (0.98 vs 0.89) — pallas_batched_chol_inv routes by batch count.
    Requires n padded to 128*2^k (identity-padded: exact).
    """
    nn = A.shape[-1]
    if nn <= leaf:
        return pallas_block_chol_inv(A, interpret=interpret)
    m = nn // 2
    T = lambda X: jnp.swapaxes(X, -1, -2)  # noqa: E731
    L11, L11i = rec_pallas_chol_inv(A[..., :m, :m], leaf, interpret)
    L21 = _mm(A[..., m:, :m], T(L11i))
    L22, L22i = rec_pallas_chol_inv(A[..., m:, m:] - _mm(L21, T(L21)), leaf,
                                    interpret)
    Li21 = -_mm(L22i, _mm(L21, L11i))
    z = jnp.zeros((*A.shape[:-2], m, nn - m), A.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([L11, z], -1), jnp.concatenate([L21, L22], -1)], -2)
    Li = jnp.concatenate(
        [jnp.concatenate([L11i, z], -1), jnp.concatenate([Li21, L22i], -1)], -2)
    return L, Li


def pallas_batched_chol_inv_ll(K, interpret=False, block=None):
    """Left-looking variant of pallas_batched_chol_inv (same contract).

    The right-looking form rematerializes the shrinking (C, rem, rem)
    trailing matrix in HBM every block column — at (16, 1024, 1024) that is
    ~440 MB of reads+writes (measured as the dominant 'glue' share of the
    r4 breakdown: 0.75 ms of 2.14). Left-looking computes each block
    column's Schur correction lazily as ONE batched matmul against the
    already-factored panels (re-READS of L, ~88 MB total, no big writes),
    so the glue drops to near the HBM floor of L itself. Identical math —
    the same update terms are summed in a different order; matmuls run at
    the CHOL_UPDATE_PREC policy like the right-looking form.
    """
    orig_shape = K.shape
    n = orig_shape[-1]
    batch = orig_shape[:-2]
    C = 1
    for b in batch:
        C *= b
    K = K.reshape((C, n, n))
    _Bv = _B if block is None else int(block)
    nb = -(-n // _Bv)
    npad = nb * _Bv
    if npad != n:
        pad = npad - n
        eye_pad = jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype), (C, pad, pad))
        K = jnp.concatenate([
            jnp.concatenate([K, jnp.zeros((C, n, pad), K.dtype)], -1),
            jnp.concatenate([jnp.zeros((C, pad, n), K.dtype), eye_pad], -1),
        ], -2)

    T = lambda X: jnp.swapaxes(X, -1, -2)  # noqa: E731
    col_blocks = []   # each (C, npad - j*B, B): rows j*B.. of block column j
    dinvs = []
    for j in range(nb):
        o = j * _Bv
        Acol = K[:, o:, o:o + _Bv]                  # (C, rem, B)
        if j:
            # lazy Schur correction: rows >= o of sum_{k<j} L[:,k] L[j,k]'
            Lrows = jnp.concatenate(
                [cb[:, (o - (k * _Bv)):, :] for k, cb in enumerate(col_blocks)],
                -1)                                  # (C, rem, j*B)
            Lj = Lrows[:, :_Bv, :]                   # (C, B, j*B): L[j, :j]
            Acol = Acol - _mm(Lrows, T(Lj))
        Ablk = Acol[:, :_Bv, :]
        Ljj = pallas_block_chol(Ablk, interpret=interpret)
        Dinv = _tri_inv_128(Ljj)
        dinvs.append(Dinv)
        P = _mm(Acol[:, _Bv:, :], T(Dinv))           # panel below diagonal
        col_blocks.append(jnp.concatenate([Ljj, P], 1))
    L = jnp.concatenate(
        [jnp.concatenate([jnp.zeros((C, j * _Bv, _Bv), K.dtype), cb], 1)
         for j, cb in enumerate(col_blocks)], -1)

    items = [(dinv, _Bv, j * _Bv) for j, dinv in enumerate(dinvs)]
    while len(items) > 1:
        nxt = []
        for p in range(0, len(items) - 1, 2):
            Ai, sa, oa = items[p]
            Ci, sc, oc = items[p + 1]
            Bblk = L[:, oc:oc + sc, oa:oa + sa]
            low = -_mm(Ci, _mm(Bblk, Ai))
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


def pallas_batched_chol_inv(K, interpret=False, version=2, block=None):
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
    _Bv = _B if block is None else int(block)
    nb = -(-n // _Bv)
    npad = nb * _Bv
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
        Ablk = A[:, :_Bv, :_Bv]
        if version == 2:
            Ljj = pallas_block_chol(Ablk, interpret=interpret)
            Dinv = _tri_inv_128(Ljj)
        else:
            Ljj, Dinv = pallas_block_chol_inv(Ablk, interpret=interpret)
        dinvs.append(Dinv)
        below = A[:, _Bv:, :_Bv]                    # (C, rem, B)
        P = _mm(below, T(Dinv))                   # panel: L[i>j, j]
        col = jnp.concatenate(
            [jnp.zeros((C, j * _Bv, _Bv), K.dtype), Ljj, P], 1)
        col_blocks.append(col)
        rem = A.shape[1] - _Bv
        if rem:
            A = A[:, _Bv:, _Bv:] - _mm(P, T(P))
        else:
            A = A[:, _Bv:, _Bv:]
    L = jnp.concatenate(col_blocks, -1)

    # factor inverse by pairwise doubling over adjacent diagonal ranges:
    # [[A,0],[B,C]]^-1 = [[Ai,0],[-Ci B Ai, Ci]] — two batched matmuls per
    # pair, log2(nb) levels (any nb: odd tails carry to the next level)
    items = [(dinv, _Bv, j * _Bv) for j, dinv in enumerate(dinvs)]
    while len(items) > 1:
        nxt = []
        for p in range(0, len(items) - 1, 2):
            Ai, sa, oa = items[p]
            Ci, sc, oc = items[p + 1]
            Bblk = L[:, oc:oc + sc, oa:oa + sa]
            low = -_mm(Ci, _mm(Bblk, Ai))
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
