"""Divide-and-conquer Cholesky / triangular solves built from matmuls.

Why: XLA's native `cholesky` and `triangular_solve` on TPU run far below
MXU speed for large N (measured on v5e-1 at N=8192 f32: chol ~14.6 TF/s,
trsm(I) ~8 TF/s). Recasting both as recursive 2x2 block algorithms turns
almost all FLOPs into plain `dot_general`s the MXU runs near peak, with the
sequential part confined to `leaf`-sized XLA ops (measured: chol ~23 TF/s,
trsm 2-4x faster). Because the recursion is ordinary traced JAX, reverse-mode
AD walks the same matmul structure — the expensive cholesky VJP (two full
N x N triangular solves in XLA's rule) also becomes MXU work.

This replaces the role of GPy's LAPACK bindings (GPy/util/linalg.py:56-130:
jitchol/dtrtrs/dpotrs/dpotri) on the large-N path; the reference has no
analogue of the blocking itself (LAPACK does it internally on CPU).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

__all__ = [
    "rec_cholesky",
    "rec_solve_lower",
    "rec_solve_lower_t",
    "rec_rsolve_lower_t",
    "rec_chol_inv",
    "rec_solve_lower_invleaf",
    "rec_solve_lower_t_invleaf",
    "rec_rsolve_lower_t_invleaf",
    "tri_inv_doubling",
    "tri8_inv_batched",
    "solve_lower_auto",
    "cholesky_auto",
    "REC_CHOL_MIN_N",
    "BATCHED_REC_MIN_N",
    "BATCHED_REC_LEAF",
]

# Below this size the XLA native ops win (no recursion overhead). Measured
# crossover on v5e-1 (round 4, NLML+grad chain protocol): n=2048 native
# 2.78 vs blocked 2.43 ms; n=4000 native 19.8 vs blocked 7.5 ms (native
# chol/trsm degrade sharply past ~2k, especially at non-128-multiple
# shapes). Threshold applies on TPU ONLY — on CPU the native ops are
# LAPACK-class and always win, so the auto dispatchers pin them there
# (CPU tests exercise the recursive forms explicitly).
REC_CHOL_MIN_N = 2047
_LEAF = 512  # leaf sweep 2026-08-21: 512 beats 1024/2048 at n=8192

# Precision of the Schur/trailing-update matmuls inside the blocked chol
# recursion. Measured on v5e-1 at n=8192 f32 (chain protocol):
#   leaf512 HIGHEST: 12.16 ms / 15.8 TF/s
#   leaf512 HIGH:     8.08 ms / 23.7 TF/s  (72% of the f32-effective peak)
# with max relative factor error 2.5e-7 vs the HIGHEST baseline — the SAME
# level as changing the leaf size alone (pure f32 reordering), far below
# the 2.5e-4 gram-entry error that keeps 'high' off globally (config.py):
# the Schur updates subtract like-magnitude quantities whose bf16x3
# residual is tiny against the PSD diagonal. 'high' is therefore the
# default here; set GPY_TPU_CHOL_UPDATE_PRECISION=highest to disable, and
# the jitchol ladder remains the safety net for marginal matrices.
_CHOL_UPDATE_PREC = os.environ.get("GPY_TPU_CHOL_UPDATE_PRECISION", "high")
CHOL_UPDATE_PREC = (None if _CHOL_UPDATE_PREC in ("", "highest", "default")
                    else _CHOL_UPDATE_PREC)


def rec_cholesky(A, leaf=_LEAF, prec=None):
    """Lower Cholesky factor of A via recursive 2x2 blocking.

    [[A11, .  ],     [[L11,  0 ],
     [A21, A22]]  =   [L21, L22]]  with  L11 = chol(A11),
    L21 = A21 L11^-T,  L22 = chol(A22 - L21 L21^T).

    prec: matmul precision for the Schur/trailing updates. The DEFAULT
    (via CHOL_UPDATE_PREC) is 'high' (3 bf16 passes) — it halves the MXU
    time of the dominant matmuls at ~1.5e-5-relative update error, which
    iterates to a 2.5e-7 factor error (pure reordering class). Set
    GPY_TPU_CHOL_UPDATE_PRECISION=highest to opt out (None = ambient
    6-pass HIGHEST).
    """
    n = A.shape[0]
    if n <= leaf:
        return jnp.linalg.cholesky(A)
    m = n // 2
    L11 = rec_cholesky(A[:m, :m], leaf, prec)
    # panel solve stays on trsm leaves: the inverse-leaf form measured
    # SLOWER inside this recursion (10.0-10.3 vs 8.1 ms at n=8192 —
    # tri_inv_doubling re-runs per panel at every level, and the leaf
    # trsms here carry thousands of RHS rows, which amortizes the native
    # column loop). Standalone big solves (solve_lower_auto) DO win with
    # inverse leaves — the 2.6x number is real there.
    L21 = rec_rsolve_lower_t(A[m:, :m], L11, leaf, prec)
    L22 = rec_cholesky(
        A[m:, m:] - jnp.matmul(L21, L21.T, precision=prec), leaf, prec)
    top = jnp.concatenate([L11, jnp.zeros((m, n - m), A.dtype)], 1)
    return jnp.concatenate([top, jnp.concatenate([L21, L22], 1)], 0)


def rec_rsolve_lower_t(B, L, leaf=_LEAF, prec=None):
    """X = B L^-T for lower-triangular L (right-side transposed solve)."""
    n = L.shape[0]
    if n <= leaf:
        return jax.scipy.linalg.solve_triangular(L, B.T, lower=True).T
    m = n // 2
    X1 = rec_rsolve_lower_t(B[:, :m], L[:m, :m], leaf, prec)
    X2 = rec_rsolve_lower_t(
        B[:, m:] - jnp.matmul(X1, L[m:, :m].T, precision=prec),
        L[m:, m:], leaf, prec)
    return jnp.concatenate([X1, X2], 1)


def rec_solve_lower(L, B, leaf=_LEAF):
    """X = L^-1 B for lower-triangular L (left solve)."""
    n = L.shape[0]
    if n <= leaf:
        return jax.scipy.linalg.solve_triangular(L, B, lower=True)
    m = n // 2
    X1 = rec_solve_lower(L[:m, :m], B[:m], leaf)
    X2 = rec_solve_lower(L[m:, m:], B[m:] - L[m:, :m] @ X1, leaf)
    return jnp.concatenate([X1, X2], 0)


# --- triangular inverse by nilpotent 8x8 leaves + pairwise doubling ---------
_PW = 8


def tri8_inv_batched(Ld):
    """Exact inverse of lower-triangular (..., 8, 8) blocks, vectorized.

    Lp = diag(d)(I + N~) with N~ strictly lower => N~^8 = 0, so
    (I + N~)^-1 = (I - N~)(I + N~^2)(I + N~^4) EXACTLY — three batched
    matmuls, no per-element native trsm (which serializes on TPU)."""
    d = jnp.diagonal(Ld, axis1=-2, axis2=-1)
    A1 = Ld / d[..., :, None]
    eye = jnp.eye(_PW, dtype=Ld.dtype)
    N = A1 - eye
    prec = CHOL_UPDATE_PREC
    N2 = jnp.matmul(N, N, precision=prec)
    Minv = jnp.matmul(jnp.matmul(eye - N, eye + N2, precision=prec),
                      eye + jnp.matmul(N2, N2, precision=prec), precision=prec)
    return Minv / d[..., None, :]


def tri_inv_doubling(Lb):
    """Inverse of lower-triangular (..., n, n) blocks (n = 8 * 2^k) via 8x8
    nilpotent leaf inverses + stacked pairwise doubling — batched matmuls
    only, no native trsm anywhere."""
    *batch, n, _ = Lb.shape
    nb = n // _PW
    prec = CHOL_UPDATE_PREC
    V = Lb.reshape(*batch, nb, _PW, nb, _PW)
    D8 = jnp.moveaxis(jnp.diagonal(V, axis1=-4, axis2=-2), -1, -3)
    inv = tri8_inv_batched(D8)
    s = _PW
    while nb > 1:
        V = Lb.reshape(*batch, nb // 2, 2 * s, nb // 2, 2 * s)
        d2 = jnp.moveaxis(jnp.diagonal(V, axis1=-4, axis2=-2), -1, -3)
        Bblk = d2[..., s:, :s]
        Ai = inv[..., 0::2, :, :]
        Ci = inv[..., 1::2, :, :]
        low = -jnp.matmul(Ci, jnp.matmul(Bblk, Ai, precision=prec),
                          precision=prec)
        z = jnp.zeros_like(low)
        inv = jnp.concatenate([
            jnp.concatenate([Ai, z], -1),
            jnp.concatenate([low, Ci], -1)], -2)
        nb //= 2
        s *= 2
    return inv[..., 0, :, :]


def _diag_leaves(L, leaf):
    k = L.shape[0] // leaf
    V = L.reshape(k, leaf, k, leaf)
    return jnp.moveaxis(jnp.diagonal(V, axis1=0, axis2=2), -1, 0)


def _invleaf_ok(n, leaf):
    k, r = divmod(n, leaf)
    return r == 0 and k >= 2 and (k & (k - 1)) == 0 and leaf % _PW == 0


def rec_solve_lower_invleaf(L, B, leaf=_LEAF, prec=None):
    """X = L^-1 B with the serial leaf trsms replaced by matmuls against
    batched leaf inverses (tri_inv_doubling of ALL diagonal leaves in one
    batched pass up front). XLA's native triangular_solve runs its column
    loop even at leaf size; at n=8192, 512 RHS this form measured ~2x the
    trsm-leaf recursion. Explicit leaf inverses cost eps*cond(leaf-block)
    accuracy — acceptable for chol factors of jittered PSD systems (same
    class as the fused chol_and_inv path)."""
    n = L.shape[0]
    if not _invleaf_ok(n, leaf):
        return rec_solve_lower(L, B, leaf)
    Dinv = tri_inv_doubling(_diag_leaves(L, leaf))

    def go(off, nn, Bc):
        if nn == leaf:
            return jnp.matmul(Dinv[off // leaf], Bc, precision=prec)
        m = nn // 2
        X1 = go(off, m, Bc[:m])
        X2 = go(off + m, m,
                Bc[m:] - jnp.matmul(L[off + m:off + nn, off:off + m], X1,
                                    precision=prec))
        return jnp.concatenate([X1, X2], 0)

    return go(0, n, B)


def rec_solve_lower_t_invleaf(L, B, leaf=_LEAF, prec=None):
    """X = L^-T B, inverse-leaf form (see rec_solve_lower_invleaf)."""
    n = L.shape[0]
    if not _invleaf_ok(n, leaf):
        return rec_solve_lower_t(L, B, leaf)
    Dinv = tri_inv_doubling(_diag_leaves(L, leaf))

    def go(off, nn, Bc):
        if nn == leaf:
            return jnp.matmul(Dinv[off // leaf].T, Bc, precision=prec)
        m = nn // 2
        X2 = go(off + m, m, Bc[m:])
        X1 = go(off, m,
                Bc[:m] - jnp.matmul(L[off + m:off + nn, off:off + m].T, X2,
                                    precision=prec))
        return jnp.concatenate([X1, X2], 0)

    return go(0, n, B)


def rec_rsolve_lower_t_invleaf(L, B, leaf=_LEAF, prec=None):
    """X = B L^-T (right-side transposed solve), inverse-leaf form."""
    n = L.shape[0]
    if not _invleaf_ok(n, leaf):
        return rec_rsolve_lower_t(B, L, leaf, prec)
    Dinv = tri_inv_doubling(_diag_leaves(L, leaf))

    def go(off, nn, Bc):
        if nn == leaf:
            return jnp.matmul(Bc, Dinv[off // leaf].T, precision=prec)
        m = nn // 2
        X1 = go(off, m, Bc[:, :m])
        X2 = go(off + m, m,
                Bc[:, m:] - jnp.matmul(
                    X1, L[off + m:off + nn, off:off + m].T, precision=prec))
        return jnp.concatenate([X1, X2], 1)

    return go(0, n, B)


# Inverse-leaf triangular solves replace the serial native leaf trsms with
# matmuls against batched leaf inverses on TPU. Measured n=8192 f32 (chain
# protocol): 512 RHS 3.07 (native) / 2.01 (trsm-leaf rec) / 0.78 ms
# (invleaf 'high', 44 TF/s); 8192 RHS 33.4 / 20.3 / 10.8 ms (51 TF/s).
# Accuracy 2.2e-6 vs the native 1.3e-8 (eps*cond(leaf) from the explicit
# leaf inverse) — the chol_and_inv error class, fine for factors of
# jittered PSD systems. GPY_TPU_TRSM_INVLEAF=0 reverts to trsm leaves.
TRSM_INVLEAF = os.environ.get("GPY_TPU_TRSM_INVLEAF", "1") != "0"


def _use_invleaf(n, leaf):
    return (TRSM_INVLEAF and _invleaf_ok(n, leaf)
            and jax.default_backend() == "tpu")


def rec_solve_lower_t(L, B, leaf=_LEAF):
    """X = L^-T B for lower-triangular L (transposed left solve)."""
    n = L.shape[0]
    if n <= leaf:
        return jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1)
    m = n // 2
    X2 = rec_solve_lower_t(L[m:, m:], B[m:], leaf)
    X1 = rec_solve_lower_t(L[:m, :m], B[:m] - L[m:, :m].T @ X2, leaf)
    return jnp.concatenate([X1, X2], 0)


# --- batched (leading-dims) blocked chol + inverse --------------------------
# XLA's native cholesky/triangular_solve SERIALIZE over batch elements on
# TPU (measured: vmapped chol(1000) over 8 chains costs ~8x one chain — the
# round-2 HMC curve was flat 1..16 chains because of exactly this). The
# recursion below keeps native ops only at `leaf` size and does ALL glue as
# batched matmuls the MXU parallelizes across the batch. Carrying the factor
# inverse through the recursion makes the glue trsm-free:
#   Li = [[L11i, 0], [-L22i L21 L11i, L22i]].
BATCHED_REC_MIN_N = 256
BATCHED_REC_LEAF = 256


def rec_chol_inv(A, leaf=BATCHED_REC_LEAF):
    """(L, L^-1) for PSD `A` with arbitrary leading batch dims.

    Native cholesky / triangular_solve only ever see (..., leaf, leaf)
    problems; every combine step is a batched `dot_general`. Used by the
    custom-vmap rule of util.linalg.chol_and_inv (HMC vmapped chains,
    optimize_restarts(parallel=True)) and for explicitly batched inputs.
    """
    n = A.shape[-1]
    if n <= leaf:
        L = jnp.linalg.cholesky(A)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return L, Li
    m = n // 2
    T = lambda X: jnp.swapaxes(X, -1, -2)  # noqa: E731
    L11, L11i = rec_chol_inv(A[..., :m, :m], leaf)
    L21 = A[..., m:, :m] @ T(L11i)
    L22, L22i = rec_chol_inv(A[..., m:, m:] - L21 @ T(L21), leaf)
    Li21 = -L22i @ (L21 @ L11i)
    z = jnp.zeros((*A.shape[:-2], m, n - m), A.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([L11, z], -1), jnp.concatenate([L21, L22], -1)], -2)
    Li = jnp.concatenate(
        [jnp.concatenate([L11i, z], -1), jnp.concatenate([Li21, L22i], -1)], -2)
    return L, Li


def _auto_min_n(min_n):
    if min_n is not None:
        return min_n
    return REC_CHOL_MIN_N if jax.default_backend() == "tpu" else (1 << 30)


def solve_lower_auto(L, B, trans=False, leaf=_LEAF, min_n=None, min_rhs=512):
    """Triangular solve that switches to the recursive blocked form when both
    the system and the right-hand side are large enough for matmuls to pay."""
    min_n = _auto_min_n(min_n)
    big = (
        L.ndim == 2
        and B.ndim == 2
        and L.shape[0] > min_n
        and B.shape[-1] >= min_rhs
    )
    if big:
        if _use_invleaf(L.shape[0], leaf):
            f = rec_solve_lower_t_invleaf if trans else rec_solve_lower_invleaf
            return f(L, B, leaf, prec=CHOL_UPDATE_PREC)
        return (rec_solve_lower_t if trans else rec_solve_lower)(L, B, leaf)
    return jax.scipy.linalg.solve_triangular(L, B, lower=True, trans=1 if trans else 0)


def cholesky_auto(A, leaf=_LEAF, min_n=None):
    """XLA cholesky for small matrices, recursive blocking for large.

    Only square 2-D inputs take the blocked path (batched cholesky stays
    on the native op).
    """
    min_n = _auto_min_n(min_n)
    if A.ndim == 2 and A.shape[0] > min_n:
        return rec_cholesky(A, leaf, prec=CHOL_UPDATE_PREC)
    return jnp.linalg.cholesky(A)
