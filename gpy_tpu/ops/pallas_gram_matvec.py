"""Fused Pallas gram-matvec: (v * exp(-0.5 d^2(X)) + diag(noise)) @ V with
the Gram tile never leaving VMEM.

Motivation (iterative exact GP, inference/iterative.py): the CG loop needs
~max_cg products K @ V. The two existing strategies both move O(N^2) floats
through HBM per sweep:

  * blockwise XLA (ops/gram_matvec.py): each (block, N) K-tile is written to
    HBM by the producer fusion and read back by the dot — 2x N^2 traffic;
  * materialize-once: K built once (10GB f32 at N=50k), each matvec reads
    the full N^2 — HBM-bandwidth bound, and caps N at ~50k per 16GB chip.

Here each (BN, BM) tile of K is computed in VMEM (distance cross-term on the
MXU, exp on the VPU) and immediately contracted with the matching V rows on
the MXU; HBM traffic is O(N*D + N*R) per sweep and peak memory O(N*R).
Single-chip exact-GP N is then bounded by time, not by the Gram footprint.

MXU economics: the systolic array processes 128 output lanes regardless of R,
so padding V from R (typically D + n_probes ~ 9) up to 128 columns is free —
the CG/SLQ probe count can be raised to ~100 at zero marginal cost, cutting
the stochastic logdet variance (cf. Gardner et al. 2018 BBMM, which the
reference has no analogue of; GPy materializes K at
exact_gaussian_inference.py:53).

Both in-kernel dots run at precision HIGHEST: the distance cross-term loses
O(|x|^2 * 8e-3) absolute under one-pass bf16 (config.py policy note), and the
accumulate dot feeds CG where matvec error caps the attainable residual.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["rbf_gram_matvec_fused", "stationary_gram_matvec_fused",
           "kern_gram_matvec_fused", "fused_available",
           "stationary_gram_matvec_fused_diff", "kern_gram_matvec_fused_diff"]

_BN = 512
_BM = 512
_LANE = 128  # MXU output width: V is padded to a multiple of this for free

# stationary families sharing the fused tile structure; the elementwise
# K_of_r2 map is selected statically at trace time (no in-kernel branching)
_FAMILIES = {"RBF": 0, "ExpQuad": 0, "Matern32": 1, "Matern52": 2,
             "Exponential": 3, "OU": 3}


def fused_available(kern, backend=None) -> bool:
    """True if the fused path supports this kernel on this backend."""
    back = backend or jax.default_backend()
    return type(kern).__name__ in _FAMILIES and back == "tpu"


def _k_of_r2(family, r2, v):
    """Elementwise stationary form on the VPU, from squared scaled distance."""
    if family == 0:  # RBF / ExpQuad
        return v * jnp.exp(-0.5 * r2)
    r = jnp.sqrt(r2 + 1e-30)
    if family == 1:  # Matern32
        s = jnp.sqrt(jnp.float32(3.0)) * r
        return v * (1.0 + s) * jnp.exp(-s)
    if family == 2:  # Matern52
        s = jnp.sqrt(jnp.float32(5.0)) * r
        return v * (1.0 + s + s * s / 3.0) * jnp.exp(-s)
    return v * jnp.exp(-r)  # Exponential / OU


@functools.partial(jax.jit, static_argnames=("interpret", "family", "accum"))
def _pallas_call(Xrow, Xcol, Vp, v, interpret=False, family=0, accum="exact"):
    if accum not in ("exact", "f32x3", "fast"):
        # an unknown string must not silently fall through to the lowest
        # precision path (whose SLQ bias makes training silently wrong)
        raise ValueError(f"accum must be exact|f32x3|fast, got {accum!r}")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Pr, D = Xrow.shape
    Pc = Xcol.shape[0]
    R = Vp.shape[1]
    grid = (Pr // _BN, Pc // _BM)

    def kernel(x_ref, xj_ref, vj_ref, scal_ref, out_ref):
        j = pl.program_id(1)
        xi = x_ref[:]            # (BN, D) scaled rows
        xj = xj_ref[:]           # (BM, D)
        vj = vj_ref[:]           # (BM, R)
        if D <= 8:
            # direct per-dimension squared differences on the VPU: exact f32
            # (no expansion cancellation, no clamp), cheaper than a 6-pass
            # MXU dot at shallow contraction depth, and overlaps with the
            # accumulate matmul below
            r2 = jnp.zeros((xi.shape[0], xj.shape[0]), jnp.float32)
            for d in range(D):
                diff = xi[:, d][:, None] - xj[:, d][None, :]
                r2 = r2 + diff * diff
        else:
            cross = jax.lax.dot_general(
                xi, xj, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            sq_i = jnp.sum(xi * xi, axis=1)[:, None]
            sq_j = jnp.sum(xj * xj, axis=1)[None, :]
            r2 = sq_i + sq_j - 2.0 * cross
            r2 = jnp.where(r2 < 0.0, 0.0, r2)
        kt = _k_of_r2(family, r2, scal_ref[0, 0])
        dims = (((1,), (0,)), ((), ()))
        if accum == "exact":
            # 6 bf16 passes — f32-exact accumulate (the default)
            acc = jax.lax.dot_general(
                kt, vj, dims, precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
        elif accum == "f32x3":
            # manual mantissa split: hi*hi + hi*lo + lo*hi one-pass dots
            # (~1.5e-5 relative — f32-class at half the 6-pass cost;
            # Mosaic cannot lower Precision.HIGH, so the 3-pass form is
            # hand-written)
            # explicit DEFAULT precision: the ambient 'highest' config would
            # stamp contract_precision=fp32 onto bf16 operands, which Mosaic
            # rejects ("Bad lhs type")
            kt_hi = kt.astype(jnp.bfloat16)
            kt_lo = (kt - kt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            vj_hi = vj.astype(jnp.bfloat16)
            vj_lo = (vj - vj_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            dot = lambda a, b: jax.lax.dot_general(
                a, b, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)
            acc = dot(kt_hi, vj_hi) + dot(kt_hi, vj_lo) + dot(kt_lo, vj_hi)
        else:  # "fast": one bf16 pass — entry rounding ~4e-3, the same
            # accuracy class as the documented gram_dtype="bfloat16" option
            acc = jax.lax.dot_general(
                kt, vj, dims, precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)

        @pl.when(j == 0)
        def _init():
            out_ref[:] = acc

        @pl.when(j > 0)
        def _acc():
            out_ref[:] = out_ref[:] + acc

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Pr, R), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BN, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BM, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BM, R), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((_BN, R), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Xrow, Xcol, Vp, v)


def stationary_gram_matvec_fused(X, V, variance, lengthscale, family=0,
                                 noise=None, interpret=None, X2=None,
                                 accum="exact"):
    """(K_family(scaled dist) + diag(noise)) @ V, fused (family: _FAMILIES).

    X: (N, D) rows of the product; X2: (M, D) columns (default X — square
    Gram); V: (M, R) or (M,); lengthscale scalar or (D,). With X2 given the
    product is the rectangular slab K(X, X2) @ V (the per-device shard of
    the row-sharded multi-chip matvec) — `noise` is only valid in the square
    case.

    NOT differentiable — intended for the stop-gradient CG sweeps; the one
    differentiable surrogate sweep keeps the blockwise ops/gram_matvec.py
    path. Zero-padding rows of X and V is exact: padded V rows are zero, so
    spurious K entries contribute nothing, and padded out rows are sliced.

    Known parity deviation vs the dense Stationary path: for D > 8 the
    squared distance comes from the expansion |xi|^2 + |xj|^2 - 2 xi.xj
    clamped at 0, so the i==j diagonal of a square Gram carries an ~eps-level
    cancellation residual instead of exactly 0 (K_ii = v*(1-O(1e-6)) rather
    than v); the dense path subtracts the diagonal explicitly and the D <= 8
    direct-difference path here is exact. The deviation is masked by the
    noise diagonal in every CG use.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    V2 = V if V.ndim == 2 else V[:, None]
    N, D = X.shape
    R = V2.shape[1]
    ls = jnp.asarray(lengthscale, X.dtype)
    Xs = (X / ls).astype(jnp.float32)
    if X2 is None:
        Xc, M = Xs, N
    else:
        assert noise is None, "noise diagonal undefined for rectangular slabs"
        Xc = (X2 / ls).astype(jnp.float32)
        M = X2.shape[0]

    Pr = ((N + _BN - 1) // _BN) * _BN
    Pc = ((M + _BM - 1) // _BM) * _BM
    Rp = ((R + _LANE - 1) // _LANE) * _LANE
    Xrp = jnp.zeros((Pr, D), jnp.float32).at[:N].set(Xs)
    Xcp = Xrp if (X2 is None and Pr == Pc) else (
        jnp.zeros((Pc, D), jnp.float32).at[:M].set(Xc))
    Vp = jnp.zeros((Pc, Rp), jnp.float32).at[:M, :R].set(V2.astype(jnp.float32))
    v = jnp.reshape(jnp.asarray(variance, jnp.float32), (1, 1))

    out = _pallas_call(Xrp, Xcp, Vp, v, interpret=bool(interpret),
                       family=int(family), accum=accum)[:N, :R]
    if noise is not None:
        out = out + noise[:, None] * V2
    out = out.astype(V2.dtype)
    return out if V.ndim == 2 else out[:, 0]


def rbf_gram_matvec_fused(X, V, variance, lengthscale, noise=None,
                          interpret=None, accum="exact"):
    """RBF specialization of stationary_gram_matvec_fused."""
    return stationary_gram_matvec_fused(X, V, variance, lengthscale, family=0,
                                        noise=noise, interpret=interpret,
                                        accum=accum)


def kern_gram_matvec_fused(kern, X, V, noise=None, interpret=None, X2=None,
                           accum="exact"):
    """Dispatch on a kernel object (must satisfy fused_available)."""
    fam = _FAMILIES[type(kern).__name__]
    return stationary_gram_matvec_fused(
        kern._slice(X), V, jnp.asarray(kern.variance),
        jnp.asarray(kern.lengthscale), family=fam, noise=noise,
        interpret=interpret, X2=None if X2 is None else kern._slice(X2),
        accum=accum)


# ---------------------------------------------------------------------------
# Differentiable fused gram-matvec (VERDICT r2 item 7)
#
# The forward above is stop-gradient-only; this wrapper gives (K + noise) @ V
# a custom VJP so the fused path is a first-class citizen in traced losses:
#   dV        = (K + noise) @ G            (one more fused matvec — symmetric)
#   dvariance = sum_ij W_ij K_ij / v       (W = G V^T, formed per tile)
#   dlengthscale_d = (2/l_d) sum_ij W_ij (-dK/dr2)_ij (dx_d/l_d)^2
#   dnoise_i  = sum_r G_ir V_ir
# The theta-moments are ONE extra Pallas reduction over the same tiles
# (the Gram never leaves VMEM), fusing the role of the reference's
# lengthscale-gradient Cython kernel (GPy stationary_cython.pyx:20-63,
# lengthscale_grads) into the matvec path. X is treated as DATA: its
# cotangent is returned as zeros (exact-GP training differentiates
# hyperparameters, not inputs; do not use this under a latent-X model).
# ---------------------------------------------------------------------------

def _dk_dr2(family, r2, v):
    """dK/d(r^2) per stationary family (r2 = scaled squared distance)."""
    if family == 0:
        return -0.5 * v * jnp.exp(-0.5 * r2)
    r = jnp.sqrt(r2 + 1e-30)
    if family == 1:  # Matern32: -(3v/2) exp(-sqrt(3) r)
        return -1.5 * v * jnp.exp(-jnp.sqrt(jnp.float32(3.0)) * r)
    if family == 2:  # Matern52: -(5v/6)(1 + sqrt(5) r) exp(-sqrt(5) r)
        s = jnp.sqrt(jnp.float32(5.0)) * r
        return -(5.0 / 6.0) * v * (1.0 + s) * jnp.exp(-s)
    # Exponential: -v exp(-r)/(2r); the diagonal (dx == 0) contributes an
    # exact-zero numerator so the guarded r is safe
    return -0.5 * v * jnp.exp(-r) / r


@functools.partial(jax.jit, static_argnames=("interpret", "family", "ndim"))
def _pallas_gram_moments(Xp, Gp, Vp, v, interpret=False, family=0, ndim=1):
    """(D+1,) tile-accumulated moments: [sum W K / v, m_1..m_D] with
    m_d = sum_ij W_ij (-dK/dr2)_ij (dx_d scaled)^2, W = G V^T per tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, D = Xp.shape
    R = Gp.shape[1]
    grid = (P // _BN, P // _BM)

    def kernel(x_ref, xj_ref, g_ref, vj_ref, scal_ref, out_ref):
        i, j = pl.program_id(0), pl.program_id(1)
        xi = x_ref[:]
        xj = xj_ref[:]
        W = jax.lax.dot_general(
            g_ref[:], vj_ref[:], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)          # (BN, BM)
        diffs = []
        r2 = jnp.zeros((xi.shape[0], xj.shape[0]), jnp.float32)
        for d in range(D):
            diff = xi[:, d][:, None] - xj[:, d][None, :]
            d2 = diff * diff
            diffs.append(d2)
            r2 = r2 + d2
        vv = scal_ref[0, 0]
        kt = _k_of_r2(family, r2, vv)
        kp = _dk_dr2(family, r2, vv)
        s_v = jnp.sum(W * kt) / vv
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        vec = s_v * (lane == 0).astype(jnp.float32)
        for d in range(D):
            m_d = jnp.sum(W * (-kp) * diffs[d])
            vec = vec + m_d * (lane == d + 1).astype(jnp.float32)

        @pl.when((i == 0) & (j == 0))
        def _init():
            out_ref[:] = vec

        @pl.when((i > 0) | (j > 0))
        def _acc():
            out_ref[:] = out_ref[:] + vec

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_BN, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BM, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BN, R), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_BM, R), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 128), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Xp, Xp, Gp, Vp, v)
    return out[0, :ndim + 1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def stationary_gram_matvec_fused_diff(X, V, variance, lengthscale, noise,
                                      family=0, accum="f32x3"):
    """Differentiable (K_family + diag(noise)) @ V via the fused kernels.

    Square Gram only; gradients flow to V, variance, lengthscale and noise.
    X is data (zero cotangent). `noise` must be an (N,) array.
    """
    return stationary_gram_matvec_fused(X, V, variance, lengthscale,
                                        family=family, noise=noise,
                                        accum=accum)


def _fused_diff_fwd(X, V, variance, lengthscale, noise, family, accum):
    y = stationary_gram_matvec_fused(X, V, variance, lengthscale,
                                     family=family, noise=noise, accum=accum)
    return y, (X, V, variance, lengthscale, noise)


def _fused_diff_bwd(family, accum, res, G):
    X, V, variance, lengthscale, noise = res
    G2 = G if G.ndim == 2 else G[:, None]
    V2 = V if V.ndim == 2 else V[:, None]
    # dV: K is symmetric -> one more fused matvec
    dV = stationary_gram_matvec_fused(X, G2, variance, lengthscale,
                                      family=family, noise=noise, accum=accum)
    dV = dV if V.ndim == 2 else dV[:, 0]
    # theta-moments over the same tiles
    N, D = X.shape
    ls = jnp.asarray(lengthscale, X.dtype)
    Xs = (X / ls).astype(jnp.float32)
    P = ((N + _BN - 1) // _BN) * _BN
    Rp = ((G2.shape[1] + _LANE - 1) // _LANE) * _LANE
    Xp = jnp.zeros((P, D), jnp.float32).at[:N].set(Xs)
    Gp = jnp.zeros((P, Rp), jnp.float32).at[:N, :G2.shape[1]].set(
        G2.astype(jnp.float32))
    Vp = jnp.zeros((P, Rp), jnp.float32).at[:N, :V2.shape[1]].set(
        V2.astype(jnp.float32))
    vv = jnp.reshape(jnp.asarray(variance, jnp.float32), (1, 1))
    interp = jax.default_backend() != "tpu"
    mom = _pallas_gram_moments(Xp, Gp, Vp, vv, interpret=interp,
                               family=int(family), ndim=D)
    dvar = mom[0].astype(jnp.result_type(variance))
    ls_b = jnp.broadcast_to(ls, (D,))
    dl_full = (2.0 / ls_b) * mom[1:1 + D].astype(ls_b.dtype)
    lsa = jnp.asarray(lengthscale)
    dls = jnp.sum(dl_full) if lsa.ndim == 0 else dl_full.astype(lsa.dtype)
    dnoise = jnp.sum(G2 * V2, axis=1).astype(jnp.asarray(noise).dtype)
    dvar = jnp.reshape(dvar, jnp.asarray(variance).shape)
    return (jnp.zeros_like(X), dV.astype(V.dtype), dvar, dls, dnoise)


stationary_gram_matvec_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def kern_gram_matvec_fused_diff(kern, X, V, noise, accum="f32x3"):
    """Differentiable dispatch on a kernel object (square Gram + noise)."""
    fam = _FAMILIES[type(kern).__name__]
    return stationary_gram_matvec_fused_diff(
        kern._slice(X), V, jnp.asarray(kern.variance),
        jnp.asarray(kern.lengthscale), noise, fam, accum)
