"""Numerics core: PSD linear algebra on TPU.

TPU-native replacement of GPy's LAPACK binding layer (reference:
GPy/util/linalg.py — jitchol:56, dtrtrs:95, dpotrs:116, dpotri:127, pdinv:193,
tdot_blas:299, symmetrify:356, backsub_both_sides:381). Everything here is a
pure jittable function; gradients come from JAX's built-in cholesky /
triangular-solve VJPs, which replaces GPy's Cython cholesky backprop
(GPy/util/choleskies_cython.pyx:43-82).

Design notes (TPU):
  * `jitchol` cannot "retry on exception" under jit. We use a fixed jitter
    ladder evaluated with `lax.while_loop`: try chol, check for NaNs (XLA
    cholesky returns NaN rows instead of raising), escalate jitter 10x.
    This reproduces GPy's semantics (1e-6*mean(diag) start, 10x escalation,
    maxtries) as a compiled program.
  * `tdot(A) = A @ A.T` maps straight onto the MXU; no dsyrk needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from ..ops.blocked_linalg import cholesky_auto, solve_lower_auto
from jax import lax

from ..config import config

__all__ = [
    "jitchol",
    "chol_jitter_used",
    "dtrtrs",
    "dpotrs",
    "dpotri",
    "pdinv",
    "tdot",
    "trace_dot",
    "symmetrify",
    "backsub_both_sides",
    "diag_add",
    "logdet_from_chol",
    "safe_sqrt",
    "cho_solve",
    "chol_and_inv",
    "jitchol_and_inv",
    "solve_lu_safe",
    "slogdet_lu_safe",
    "expm_safe",
]


def _tpu_backend() -> bool:
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend probing never fails in tests
        return False
    return backend in ("tpu", "axon") or "tpu" in backend.lower()


def _lu_dtype(dtype):
    """TPU implements LuDecomposition only for f32/c64 (the r5 on-chip zoo
    sweep caught f64 state-space/Laplace/DGPLVM programs failing to
    compile). Its f64 is silently ~f32 precision anyway, so casting for
    the LU loses nothing real."""
    if not _tpu_backend():
        return dtype
    if dtype == jnp.float64:
        return jnp.float32
    if dtype == jnp.complex128:
        return jnp.complex64
    return dtype


def solve_lu_safe(A: jax.Array, b: jax.Array) -> jax.Array:
    """jnp.linalg.solve (general LU solve) with the TPU-f64 guard."""
    dt = jnp.result_type(A.dtype, b.dtype)
    ldt = _lu_dtype(dt)
    if ldt == dt:
        return jnp.linalg.solve(A, b)
    return jnp.linalg.solve(A.astype(ldt), b.astype(ldt)).astype(dt)


def slogdet_lu_safe(A: jax.Array):
    """jnp.linalg.slogdet with the TPU-f64 guard."""
    ldt = _lu_dtype(A.dtype)
    if ldt == A.dtype:
        return jnp.linalg.slogdet(A)
    sign, ld = jnp.linalg.slogdet(A.astype(ldt))
    return sign.astype(A.dtype), ld.astype(A.dtype)


def expm_safe(M: jax.Array) -> jax.Array:
    """jax.scipy.linalg.expm with the TPU-f64 guard (its Padé denominator
    is an internal LU solve)."""
    ldt = _lu_dtype(M.dtype)
    if ldt == M.dtype:
        return jax.scipy.linalg.expm(M)
    return jax.scipy.linalg.expm(M.astype(ldt)).astype(M.dtype)


def chol_and_inv(K: jax.Array):
    """L = chol(K) (lower) and Li = L^-1, with a matmul-only backward pass.

    Hot loops that are latency-bound on small-matrix linalg (the SVGP step at
    M=512) pay for every sequential triangular op: JAX's stock VJPs emit two
    triangular solves for chol and one more for the explicit-inverse trsm.
    Since the forward already materializes Li, the exact same pullback can be
    written as five matmuls: fold the inverse cotangent into L's
    (dLi = -Li dL Li  =>  L_bar += -Li' Li_bar Li'), then the standard
    Cholesky pullback K_bar = Li' phi(L' L_bar) Li with phi = tril, diagonal
    halved (the adjoint of JAX's cholesky JVP L_dot = L phi(Li dK Li'), so
    gradients match the native ops exactly).

    Reference equivalents: GPy util/linalg.py jitchol:56 + dtrtri:217; the
    hand-written gradient plumbing this replaces is
    GPy/util/choleskies_cython.pyx backprop_gradient:43-82.

    Supports leading batch dimensions.
    """
    return _chol_and_inv(K, False)


def jitchol_and_inv(K: jax.Array):
    """`jitchol` + explicit factor inverse with the same matmul-only VJP.

    The jitter-ladder escalation is a data-independent diagonal perturbation:
    the pullback formula is exact for the factored matrix (K + jitter*I), so
    the custom backward is unchanged.
    """
    return _chol_and_inv(K, True)


from functools import partial as _partial  # noqa: E402

from jax.custom_batching import custom_vmap as _custom_vmap  # noqa: E402
from ..ops.blocked_linalg import (  # noqa: E402
    BATCHED_REC_MIN_N,
    rec_chol_inv,
)


def _batched_chol_inv(K):
    """Batched (L, L^-1): Pallas block kernel / blocked matmul recursion
    above the threshold.

    XLA's native cholesky/triangular_solve serialize over batch elements on
    TPU (measured: the round-2 HMC chain-scaling curve was FLAT 1..16 chains
    because each vmapped chain re-ran chol(1000)+trsm sequentially). On TPU
    f32 the batch-vectorized Pallas block factorization wins (1.48 vs 2.11
    rec vs 2.77 native ms at (8,1000,1000)); elsewhere the blocked recursion
    keeps native ops at leaf size only with batched-matmul glue.
    """
    n = K.shape[-1]
    if n > BATCHED_REC_MIN_N:
        from ..ops.pallas_chol import (pallas_batched_chol_inv,
                                       pallas_chol_available)

        n_batch = 1
        for b in K.shape[:-2]:
            n_batch *= b
        if (config.use_pallas and n_batch <= 64
                and pallas_chol_available(K)):
            # left-looking blocked form (r5): each block column's Schur
            # correction is ONE batched matmul against the already-factored
            # panels, instead of rematerializing the shrinking (C, rem, rem)
            # trailing matrix in HBM every column (the dominant glue cost of
            # the r4 right-looking/recursive paths). Measured n=1000:
            # C=8 0.71 vs 0.99 (v2), C=16 1.25 vs 1.83 (rec) ms — wins at
            # every batch count, identical math (same updates, new order).
            from ..ops.pallas_chol import pallas_batched_chol_inv_ll

            return pallas_batched_chol_inv_ll(K)
        return rec_chol_inv(K)
    L = jnp.linalg.cholesky(K)
    eye = jnp.broadcast_to(jnp.eye(K.shape[-1], dtype=K.dtype), K.shape)
    return L, jax.scipy.linalg.solve_triangular(L, eye, lower=True)


def _batched_jitchol_inv(K):
    """Batched jitchol + inverse with a scalar-predicate ladder.

    Vmapping the unbatched `jitchol` would turn its lax.cond into a select
    that executes BOTH branches — two full batched chols every call. Inside
    the custom-vmap rule the predicate is a scalar (any element failed), so
    the clean path costs exactly one factorization; the ladder escalates
    jitter PER batch element (finer than vmapped jitchol, which would share
    one global diag-mean scale).
    """
    L0, Li0 = _batched_chol_inv(K)
    ok0 = jnp.all(jnp.isfinite(lax.stop_gradient(L0)))

    def clean():
        return L0, Li0

    def ladder():
        A_sg = lax.stop_gradient(K)
        n = K.shape[-1]
        eye = jnp.eye(n, dtype=K.dtype)
        diag_mean_sg = jnp.abs(
            jnp.mean(jnp.diagonal(A_sg, axis1=-2, axis2=-1), axis=-1))
        ok_e0 = jnp.all(jnp.isfinite(lax.stop_gradient(L0)), axis=(-2, -1))
        j0 = diag_mean_sg * jnp.asarray(config.jitter, dtype=K.dtype)

        def cond(s):
            ok, _, tries = s
            return jnp.any(~ok) & (tries <= config.max_jitter_tries)

        def body(s):
            ok, jit_amt, tries = s
            # probe with the SAME batched factorization the final call runs
            # (Pallas/blocked) — the native chol can accept a jitter the
            # blocked path still NaNs on (see _find_jitter)
            Lt = _batched_chol_inv(A_sg + jit_amt[..., None, None] * eye)[0]
            ok_new = jnp.all(jnp.isfinite(Lt), axis=(-2, -1))
            jit_next = jnp.where(ok | ok_new, jit_amt, jit_amt * 10.0)
            return ok | ok_new, jit_next, tries + 1

        _, jit_used, _ = lax.while_loop(cond, body, (ok_e0, j0, jnp.array(0)))
        jit_used = jnp.where(ok_e0, jnp.zeros_like(jit_used), jit_used)
        # gradient-consistent jitter (see jitchol): stop-gradient *level*,
        # differentiable scale with the matrix magnitude
        diag_mean = jnp.abs(
            jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1))
        mult = jit_used / jnp.maximum(diag_mean_sg, 1e-300)
        Kj = K + (mult * diag_mean)[..., None, None] * eye
        return _batched_chol_inv(Kj)

    return lax.cond(ok0, clean, ladder)


@_custom_vmap
def _chol_inv_plain(K):
    L = cholesky_auto(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    return L, solve_lower_auto(L, eye)


@_chol_inv_plain.def_vmap
def _chol_inv_plain_vmap(axis_size, in_batched, K):
    if not in_batched[0]:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    return _batched_chol_inv(K), (True, True)


@_custom_vmap
def _chol_inv_ladder(K):
    L = jitchol(K)
    eye = jnp.eye(K.shape[-1], dtype=K.dtype)
    return L, solve_lower_auto(L, eye)


@_chol_inv_ladder.def_vmap
def _chol_inv_ladder_vmap(axis_size, in_batched, K):
    if not in_batched[0]:
        K = jnp.broadcast_to(K, (axis_size,) + K.shape)
    return _batched_jitchol_inv(K), (True, True)


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _chol_and_inv(K, use_ladder):
    if K.ndim == 2:
        # custom-vmap switch: under vmap (HMC chains, parallel restarts) the
        # batched blocked recursion replaces the serialized native ops
        return (_chol_inv_ladder if use_ladder else _chol_inv_plain)(K)
    # explicitly batched call
    return (_batched_jitchol_inv if use_ladder else _batched_chol_inv)(K)


def _chol_and_inv_fwd(K, use_ladder):
    out = _chol_and_inv(K, use_ladder)
    return out, out


def _chol_and_inv_bwd(use_ladder, res, cot):
    L, Li = res
    L_bar, Li_bar = cot
    LiT = jnp.swapaxes(Li, -1, -2)
    Lb = L_bar - LiT @ Li_bar @ LiT
    P = jnp.tril(jnp.swapaxes(L, -1, -2) @ Lb)
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    P = P - 0.5 * P * eye  # halve the diagonal (phi)
    Kb = LiT @ P @ Li
    # K is symmetric: only the symmetric part of the cotangent is
    # well-defined (it matches JAX's native chol+trsm pullback to machine
    # precision; the antisymmetric split is arbitrary and unobservable
    # through any symmetric K-builder). Return the canonical symmetric form.
    return (0.5 * (Kb + jnp.swapaxes(Kb, -1, -2)),)


_chol_and_inv.defvjp(_chol_and_inv_fwd, _chol_and_inv_bwd)


def tdot(A: jax.Array) -> jax.Array:
    """A @ A.T (MXU-friendly). GPy: util/linalg.py:299 (dsyrk)."""
    return A @ A.T


def trace_dot(A: jax.Array, B: jax.Array) -> jax.Array:
    """tr(A @ B) without forming the product."""
    return jnp.sum(A * B.T)


def symmetrify(A: jax.Array) -> jax.Array:
    """(A + A.T)/2. GPy: util/linalg.py:356 (in-place Cython); here a fused op."""
    return 0.5 * (A + A.T)


def diag_add(A: jax.Array, d) -> jax.Array:
    """A + diag(d) for scalar or vector d. GPy: util/diag.py add views."""
    n = A.shape[-1]
    d = jnp.asarray(d)
    if d.ndim == 0:
        return A + d * jnp.eye(n, dtype=A.dtype)
    return A + jnp.diag(d)


def _chol_ok(L: jax.Array) -> jax.Array:
    # XLA cholesky signals failure with NaNs; also guard nonfinite input.
    return jnp.all(jnp.isfinite(L))


def _find_jitter(ok0, A_sg: jax.Array, jitter0: jax.Array, maxtries: int):
    """Smallest jitter from the escalation ladder making chol(A + jI) succeed.

    Runs on a stop_gradient'd copy (while_loop is not reverse-differentiable).
    Returns 0 when no jitter is needed (ok0 True: loop body never executes).

    The probe MUST be the same factorization the caller will run on the
    selected jitter (cholesky_auto: blocked recursion above the TPU
    threshold). Probing with the native chol let the ladder accept a jitter
    the blocked 'high'-trailing-update chol still NaNs on — at n=2048 a
    marginal classification Gram passed the native probe at 1e-6*diag and
    the final blocked factorization silently returned NaNs (r5 bug: the
    Laplace mode finder then 'converged' to f=0 in one iteration on TPU).
    """
    n = A_sg.shape[-1]
    eye = jnp.eye(n, dtype=A_sg.dtype)

    def cond(state):
        ok, jit_amount, tries = state
        return (~ok) & (tries <= maxtries)

    def body(state):
        _, jit_amount, tries = state
        ok = _chol_ok(cholesky_auto(A_sg + jit_amount * eye))
        return ok, jnp.where(ok, jit_amount, jit_amount * 10.0), tries + 1

    _, jit_used, _ = lax.while_loop(cond, body, (ok0, jitter0, jnp.array(0)))
    return jnp.where(ok0, jnp.zeros_like(jit_used), jit_used)


def jitchol(A: jax.Array, maxtries: int | None = None):
    """Cholesky with escalating-jitter retry ladder, reverse-mode safe.

    GPy: util/linalg.py:56-82 (jitchol). One differentiable cholesky probes
    the matrix; when it succeeds (the common case) it IS the result — no
    second factorization. Only on failure does the stop-gradient while_loop
    ladder run (1e-6*mean(diag) start, 10x escalation, maxtries) followed by
    one differentiable re-factorization with the selected jitter.
    """
    if maxtries is None:
        maxtries = config.max_jitter_tries
    n = A.shape[-1]
    diag_mean = jnp.abs(jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1)))
    L0 = cholesky_auto(A)  # differentiable probe == result when clean
    # (blocked recursive chol for large N: pure-matmul MXU path, see ops/blocked_linalg.py)
    ok0 = _chol_ok(lax.stop_gradient(L0))
    jitter0 = lax.stop_gradient(diag_mean) * jnp.asarray(config.jitter, dtype=A.dtype)
    jit_used = _find_jitter(ok0, lax.stop_gradient(A), jitter0, maxtries)
    # gradient-consistent jitter: the ladder picks a stop-gradient *level*,
    # but the applied jitter scales differentiably with the matrix magnitude
    # (so e.g. d/d(kern.variance) sees jitter ∝ variance, matching the value).
    mult = jit_used / jnp.maximum(lax.stop_gradient(diag_mean), 1e-300)
    return lax.cond(
        ok0,
        lambda: L0,
        lambda: cholesky_auto(A + mult * diag_mean * jnp.eye(n, dtype=A.dtype)),
    )


def chol_jitter_used(A: jax.Array, maxtries: int | None = None):
    """Like jitchol but also returns the jitter actually applied."""
    if maxtries is None:
        maxtries = config.max_jitter_tries
    diag_mean = jnp.abs(jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1)))
    L0 = cholesky_auto(A)
    ok0 = _chol_ok(lax.stop_gradient(L0))
    jitter0 = lax.stop_gradient(diag_mean) * jnp.asarray(config.jitter, dtype=A.dtype)
    jit_used = _find_jitter(ok0, lax.stop_gradient(A), jitter0, maxtries)
    n = A.shape[-1]
    L = lax.cond(
        ok0,
        lambda: L0,
        lambda: cholesky_auto(A + jit_used * jnp.eye(n, dtype=A.dtype)),
    )
    return L, jit_used


def dtrtrs(L: jax.Array, B: jax.Array, lower: bool = True, trans: bool = False):
    """Solve triangular L x = B (GPy: util/linalg.py:95). Large lower-tri
    systems with wide RHS take the recursive matmul path."""
    if lower:
        return solve_lower_auto(L, B, trans=trans)
    return jax.scipy.linalg.solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def dpotrs(L: jax.Array, B: jax.Array):
    """Solve A x = B given chol factor L (GPy: util/linalg.py:116)."""
    if L.ndim == 2 and B.ndim == 2 and L.shape[0] >= 4096 and B.shape[-1] >= 512:
        return solve_lower_auto(L, solve_lower_auto(L, B), trans=True)
    return jax.scipy.linalg.cho_solve((L, True), B)


cho_solve = dpotrs


def dpotri(L: jax.Array):
    """A^{-1} from chol factor L (GPy: util/linalg.py:127)."""
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    Li = solve_lower_auto(L, eye)
    return Li.T @ Li


def pdinv(A: jax.Array):
    """(Ai, L, Li, logdet) for PSD A. GPy: util/linalg.py:193.

    Returns: inverse, lower chol of A, inverse of chol, log|A|.
    """
    L = jitchol(A)
    n = A.shape[-1]
    Li = solve_lower_auto(L, jnp.eye(n, dtype=A.dtype))
    Ai = Li.T @ Li
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return Ai, L, Li, logdet


def logdet_from_chol(L: jax.Array) -> jax.Array:
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)


def backsub_both_sides(L: jax.Array, X: jax.Array, transpose: str = "left"):
    """GPy: util/linalg.py:381.

    transpose='left':  L^{-T} X L^{-1}
    transpose='right': L^{-1} X L^{-T}
    """
    if transpose == "left":
        tmp = jax.scipy.linalg.solve_triangular(L, X.T, lower=True, trans=1)
        return jax.scipy.linalg.solve_triangular(L, tmp.T, lower=True, trans=1)
    tmp = jax.scipy.linalg.solve_triangular(L, X.T, lower=True)
    return jax.scipy.linalg.solve_triangular(L, tmp.T, lower=True)


def safe_sqrt(x: jax.Array, eps: float = 0.0) -> jax.Array:
    """sqrt with a well-defined (zero) gradient at x<=0.

    Uses the double-where trick so autodiff through r = sqrt(r2) at r2=0
    (the Gram diagonal) yields 0, not NaN — the autodiff-era equivalent of
    GPy's explicit dK_dr handling of the r=0 diagonal (kern/src/stationary.py).
    """
    safe = jnp.where(x > eps, x, 1.0)
    return jnp.where(x > eps, jnp.sqrt(safe), 0.0)
