"""Kronecker-factored SVI bound for multi-output GPs (LVMOGP).

Reference: GPy/inference/latent_function_inference/vardtc_svi_multiout.py:13
(VarDTC_SVI_Multiout.inference:42-206) and vardtc_svi_multiout_miss.py:14
(per-output missing-data variant, inference_d:60-181) — Dai, Alvarez &
Lawrence, "Efficient Modeling of Latent Information in Supervised Learning
using Gaussian Processes", NIPS 2017.

Model: F is an (N, D) matrix-variate GP, cov = K_r(Xr) (x) K_c(Xc), with the
D outputs embedded at latent rows Xr (a variational q(Xr) with uncertainty).
Inducing variables U live on a two-set grid (Zc: Mc column inducing inputs,
Zr: Mr row inducing embeddings) with a matrix-normal variational posterior
q(vec U) = N(vec mu, Sr (x) Sc) — the Kronecker factorization is what makes
the output dimension scale (Mr << D).

TPU design: the reference's 576 LoC are ~80% hand-derived gradients
(dL_dKuu/dL_dpsi/dL_dqU); here the bound is ONE pure jnp function and
jax.grad supplies every derivative. The missing-data variant's python loop
over outputs (inference_d, with boolean-mask fancy indexing per d) is
replaced by one-hot batched einsums — static shapes, no gathers whose VJPs
scatter (the Coregionalize lesson), one XLA program for all D outputs.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.linalg import jitchol
from .exact import LatentFunctionInference

__all__ = ["VarDTC_SVI_Multiout", "VarDTC_SVI_Multiout_Miss",
           "PosteriorMultioutput", "svi_multiout_elbo", "svi_multiout_md_elbo"]

LOG_2_PI = float(np.log(2 * np.pi))
CONST_JITTER = 1e-6


def _is_variational(X):
    return hasattr(X, "mean") and hasattr(X, "variance") and not isinstance(X, jnp.ndarray)


def _gather_psi(kern, X, Z, with_psi2n=True):
    """(psi0 (N,), psi1 (N, M), psi2n (N, M, M) | None) for certain or
    variational X.

    Certain inputs: psi2n_n = psi1_n psi1_n' exactly (reference
    vardtc_svi_multiout_miss.py:39) — only materialized when asked for
    (the full bound needs only the SUM, an (M, M) matmul)."""
    if _is_variational(X):
        psi0 = kern.psi0(Z, X)
        psi1 = kern.psi1(Z, X)
        psi2n = kern.psi2n(Z, X) if with_psi2n else None
    else:
        X = jnp.asarray(X)
        psi0 = kern.Kdiag(X)
        psi1 = kern.K(X, Z)
        psi2n = psi1[:, :, None] * psi1[:, None, :] if with_psi2n else None
    return psi0, psi1, psi2n


def _common(kern_r, kern_c, Xr, Zr, Zc, qU_mean, Sr, Sc):
    """Whitened shared quantities.

    Mt   = Lc^-1 mu Lr^-T                 (Mc, Mr)
    Ar   = Lr^-1 psi1_r'                  (Mr, D)  row-side projections
    P2r  = Lr^-1 psi2n_r[d] Lr^-T          (D, Mr, Mr)
    St_c = Lc^-1 Sc Lc^-T, St_r likewise  (whitened q(U) covariances)
    """
    Mc, Mr = Zc.shape[0], Zr.shape[0]
    dt = jnp.asarray(qU_mean).dtype
    Lc = jitchol(kern_c.K(jnp.asarray(Zc)) + CONST_JITTER * jnp.eye(Mc, dtype=dt))
    Lr = jitchol(kern_r.K(jnp.asarray(Zr)) + CONST_JITTER * jnp.eye(Mr, dtype=dt))
    LSc = jitchol(Sc)
    LSr = jitchol(Sr)

    Mt = jsl.solve_triangular(
        Lc, jsl.solve_triangular(Lr, jnp.asarray(qU_mean).T, lower=True).T, lower=True)
    LciLSc = jsl.solve_triangular(Lc, LSc, lower=True)
    LriLSr = jsl.solve_triangular(Lr, LSr, lower=True)
    St_c = LciLSc @ LciLSc.T
    St_r = LriLSr @ LriLSr.T

    psi0_r, psi1_r, psi2n_r = _gather_psi(kern_r, Xr, jnp.asarray(Zr))
    Ar = jsl.solve_triangular(Lr, psi1_r.T, lower=True)  # (Mr, D)
    # batched both-side whitening of the per-output row psi2
    tmp = jsl.solve_triangular(Lr, psi2n_r.reshape(-1, Mr).T, lower=True)
    tmp = jnp.swapaxes(tmp.T.reshape(-1, Mr, Mr), 1, 2).reshape(-1, Mr)
    P2r = jsl.solve_triangular(Lr, tmp.T, lower=True).T.reshape(-1, Mr, Mr)

    return dict(Lc=Lc, Lr=Lr, LSc=LSc, LSr=LSr, Mt=Mt, St_c=St_c, St_r=St_r,
                psi0_r=psi0_r, Ar=Ar, P2r=P2r,
                tr_St_c=jnp.sum(LciLSc**2), tr_St_r=jnp.sum(LriLSr**2))


def _kl_qU(cm, Mc, Mr):
    """-KL(q(U) || p(U)) terms of the bound (matrix-normal vs Kronecker
    prior; reference vardtc_svi_multiout.py:102-103)."""
    return (
        -Mc * (jnp.sum(jnp.log(jnp.diagonal(cm["Lr"])))
               - jnp.sum(jnp.log(jnp.diagonal(cm["LSr"]))))
        - Mr * (jnp.sum(jnp.log(jnp.diagonal(cm["Lc"])))
                - jnp.sum(jnp.log(jnp.diagonal(cm["LSc"]))))
        - 0.5 * jnp.sum(cm["Mt"] ** 2)
        - 0.5 * cm["tr_St_r"] * cm["tr_St_c"]
        + 0.5 * Mr * Mc
    )


def _full_row_stats(cm, kern_c, Xc, Zc, Y, weights=None):
    """Row-sum statistics of the full bound over (this shard of) the data
    axis: everything in the bound that sums over N. `weights` is an optional
    0/1 row mask (padding rows for SPMD sharding).

    Returns (N_eff, YY, Pc, psi0_c_sum, cross)."""
    Y = jnp.asarray(Y)
    uc = _is_variational(Xc)
    psi0_c, psi1_c, psi2n_c = _gather_psi(kern_c, Xc, jnp.asarray(Zc), with_psi2n=uc)
    Ac = jsl.solve_triangular(cm["Lc"], psi1_c.T, lower=True)  # (Mc, N)
    w = jnp.ones(Y.shape[0], Y.dtype) if weights is None else jnp.asarray(weights)
    if uc:
        p2sum = jnp.einsum("n,nmk->mk", w, psi2n_c)
        t = jsl.solve_triangular(cm["Lc"], p2sum, lower=True)
        Pc = jsl.solve_triangular(cm["Lc"], t.T, lower=True).T
    else:
        Pc = (Ac * w[None, :]) @ Ac.T
    return (jnp.sum(w),
            jnp.sum(w[:, None] * Y**2),
            Pc,
            jnp.sum(w * psi0_c),
            jnp.sum(w[:, None] * Y * (Ac.T @ cm["Mt"] @ cm["Ar"])))


def _elbo_from_stats(cm, Mc, Mr, D, beta, N_eff, YY, Pc, psi0_c_sum, cross):
    """Replicated combine of the full bound from reduced row statistics
    (reference vardtc_svi_multiout.py:95-103)."""
    Mt, St_c, St_r, P2r = cm["Mt"], cm["St_c"], cm["St_r"], cm["P2r"]
    Pr = jnp.sum(P2r, axis=0)  # (Mr, Mr): summed row psi2 whitened
    logL_A = (
        -YY
        - jnp.sum((Mt.T @ Pc @ Mt) * Pr)
        - jnp.sum(Pr * St_r) * jnp.sum(Pc * St_c)
        + 2.0 * cross
        - psi0_c_sum * jnp.sum(cm["psi0_r"])
        + jnp.trace(Pr) * jnp.trace(Pc)
    )
    return (-N_eff * D / 2.0 * (LOG_2_PI - jnp.log(beta)) + beta / 2.0 * logL_A
            + _kl_qU(cm, Mc, Mr))


def svi_multiout_elbo(kern_r, kern_c, Xr, Xc, Zr, Zc, noise_var, Y,
                      qU_mean, Sr, Sc):
    """Full-data LVMOGP evidence lower bound (Y: (N, D), no missing).

    Matches reference vardtc_svi_multiout.py:95-103 term for term (verified
    by the D=1 SVGP-reduction and tiny-variance oracles in
    tests/test_svi_multiout.py). Does NOT include KL(q(Xr)) — the model
    adds it, like the reference adds variational_prior_row.KL_divergence.

    Factored as row-stat collection (_full_row_stats, everything that sums
    over the data axis) + replicated combine (_elbo_from_stats) so
    parallel.sharded_svi_multiout_elbo_and_grad can psum the stats and reuse
    the combine — serial/sharded parity holds by construction."""
    Y = jnp.asarray(Y)
    D = Y.shape[1]
    Mc, Mr = Zc.shape[0], Zr.shape[0]
    beta = 1.0 / noise_var
    cm = _common(kern_r, kern_c, Xr, Zr, Zc, qU_mean, Sr, Sc)
    stats = _full_row_stats(cm, kern_c, Xc, Zc, Y)
    return _elbo_from_stats(cm, Mc, Mr, D, beta, *stats)


def _md_row_stats(cm, kern_c, Xc, Zc, Y, indexD, output_dim, weights=None):
    """Per-output row-sum statistics of the missing-data bound over (this
    shard of) the stacked data axis. `weights` is an optional 0/1 row mask.

    Returns (Nd, Yd2, psi0_c_d, Pc_d, term4) — each a (D,)- or
    (D, Mc, Mc)-shaped row sum."""
    Y = jnp.asarray(Y).reshape(-1)
    D = int(output_dim)
    Mc = Zc.shape[0]
    # one-hot over outputs: every per-d masked sum in the reference is a
    # matmul against Woh (no boolean fancy-indexing => no dynamic shapes)
    Woh = jnp.asarray(jnp.arange(D)[None, :] == jnp.asarray(indexD).reshape(-1, 1),
                      dtype=Y.dtype)  # (N, D)
    if weights is not None:
        Woh = Woh * jnp.asarray(weights)[:, None]

    uc = _is_variational(Xc)
    psi0_c, psi1_c, psi2n_c = _gather_psi(kern_c, Xc, jnp.asarray(Zc), with_psi2n=uc)
    Ac = jsl.solve_triangular(cm["Lc"], psi1_c.T, lower=True)  # (Mc, N)
    if uc:
        t = jsl.solve_triangular(cm["Lc"], psi2n_c.reshape(-1, Mc).T, lower=True)
        t = jnp.swapaxes(t.T.reshape(-1, Mc, Mc), 1, 2).reshape(-1, Mc)
        P2c = jsl.solve_triangular(cm["Lc"], t.T, lower=True).T.reshape(-1, Mc, Mc)
        Pc_d = jnp.einsum("nd,nmk->dmk", Woh, P2c)
    else:
        Pc_d = jnp.einsum("nd,mn,kn->dmk", Woh, Ac, Ac)  # (D, Mc, Mc)

    Nd = jnp.sum(Woh, axis=0)                      # (D,)
    Yd2 = Woh.T @ (Y**2)                           # (D,)
    psi0_c_d = Woh.T @ psi0_c                      # (D,)

    # 2 sum_{n in d} y_n (Ac_n' Mt Ar_d)
    v = (Ac.T @ cm["Mt"]) @ cm["Ar"]               # (N, D)
    term4 = 2.0 * jnp.einsum("n,nd,nd->d", Y, Woh, v)
    return Nd, Yd2, psi0_c_d, Pc_d, term4


def _md_elbo_from_stats(cm, Mc, Mr, beta, Nd, Yd2, psi0_c_d, Pc_d, term4):
    """Replicated combine of the missing-data bound from reduced per-output
    row statistics (reference vardtc_svi_multiout_miss.py inference_d:60-95
    summed over d)."""
    Mt, St_c, St_r, P2r = cm["Mt"], cm["St_c"], cm["St_r"], cm["P2r"]
    tr_Pc_d = jnp.trace(Pc_d, axis1=1, axis2=2)
    tr_P2r_d = jnp.trace(P2r, axis1=1, axis2=2)
    tr_Pc_d_Sc = jnp.einsum("dmk,mk->d", Pc_d, St_c)
    tr_P2r_d_Sr = jnp.einsum("dmk,mk->d", P2r, St_r)

    # (Mt' Pc_d Mt * P2r_d).sum per output
    MtPcMt = jnp.einsum("ma,dmk,kb->dab", Mt, Pc_d, Mt)  # (D, Mr, Mr)
    term2 = jnp.einsum("dab,dab->d", MtPcMt, P2r)

    logL_A_d = (-Yd2 - term2 - tr_P2r_d_Sr * tr_Pc_d_Sc + term4
                - psi0_c_d * cm["psi0_r"] + tr_P2r_d * tr_Pc_d)
    logL = jnp.sum(-Nd / 2.0 * (LOG_2_PI - jnp.log(beta))
                   + beta / 2.0 * logL_A_d)
    return logL + _kl_qU(cm, Mc, Mr)


def svi_multiout_md_elbo(kern_r, kern_c, Xr, Xc, Zr, Zc, noise_var, Y,
                         indexD, output_dim, qU_mean, Sr, Sc):
    """Missing-data LVMOGP bound: Y (N, 1) stacked, indexD[n] = output of
    row n, noise_var scalar or (D,) (heteroscedastic per output).

    Reference: vardtc_svi_multiout_miss.py inference_d:60-95 summed over d —
    the python mask loop becomes one-hot batched einsums (static shapes; the
    full-vs-MD parity oracle pins the algebra). Factored as row-stat
    collection + replicated combine for the sharded variant, like
    svi_multiout_elbo."""
    D = int(output_dim)
    Mc, Mr = Zc.shape[0], Zr.shape[0]
    beta = jnp.broadcast_to(1.0 / jnp.atleast_1d(jnp.asarray(noise_var)), (D,))
    cm = _common(kern_r, kern_c, Xr, Zr, Zc, qU_mean, Sr, Sc)
    stats = _md_row_stats(cm, kern_c, Xc, Zc, Y, indexD, output_dim)
    return _md_elbo_from_stats(cm, Mc, Mr, beta, *stats)


class PosteriorMultioutput:
    """Predictive posterior for the LVMOGP bound.

    Reference: vardtc_svi_multiout.py PosteriorMultioutput._raw_predict:
    237-267. Returns per-output mean/variance at new column inputs, with the
    q(Xr) uncertainty of the row embeddings integrated via psi statistics."""

    def __init__(self, cm, kern_c, Zc):
        self._cm = cm
        self._kern_c = kern_c
        self._Zc = jnp.asarray(Zc)

    def _raw_predict(self, Xnew):
        cm = self._cm
        Mt, St_c, St_r, Ar, P2r = (cm["Mt"], cm["St_c"], cm["St_r"],
                                   cm["Ar"], cm["P2r"])
        Xnew = jnp.asarray(Xnew)
        K_nc = self._kern_c.K(Xnew, self._Zc)         # (N*, Mc)
        psi0_new = self._kern_c.Kdiag(Xnew)           # (N*,)
        Acn = jsl.solve_triangular(cm["Lc"], K_nc.T, lower=True)  # (Mc, N*)

        wv = Mt @ Ar                                  # (Mc, D)
        mu = Acn.T @ wv                               # (N*, D)

        # tmp_d = Mt (P2r_d - ar_d ar_d') Mt'   (D, Mc, Mc)
        centered = P2r - Ar.T[:, :, None] * Ar.T[:, None, :]
        tmp = jnp.einsum("ma,dab,kb->dmk", Mt, centered, Mt)
        var1 = jnp.einsum("mn,dmk,kn->nd", Acn, tmp, Acn)
        var2 = psi0_new[:, None] * cm["psi0_r"][None, :]
        var3 = jnp.trace(P2r, axis1=1, axis2=2)[None, :] * jnp.sum(Acn**2, axis=0)[:, None]
        var4 = (jnp.einsum("dmk,mk->d", P2r, St_r)[None, :]
                * jnp.einsum("mn,mk,kn->n", Acn, St_c, Acn)[:, None])
        var = var1 + var2 - var3 + var4
        return mu, var


class VarDTC_SVI_Multiout(LatentFunctionInference):
    """Inference wrapper: bound + posterior in one pass (autodiff supplies
    every gradient the reference hand-derives)."""

    def inference(self, kern_r, kern_c, Xr, Xc, Zr, Zc, likelihood, Y,
                  qU_mean, qU_var_r, qU_var_c):
        logL = svi_multiout_elbo(kern_r, kern_c, Xr, Xc, Zr, Zc,
                                 likelihood.gaussian_variance(None), Y,
                                 qU_mean, qU_var_r, qU_var_c)
        cm = _common(kern_r, kern_c, Xr, jnp.asarray(Zr), jnp.asarray(Zc),
                     qU_mean, qU_var_r, qU_var_c)
        return PosteriorMultioutput(cm, kern_c, Zc), logL


class VarDTC_SVI_Multiout_Miss(LatentFunctionInference):
    """Missing-data (indexD) variant."""

    def inference(self, kern_r, kern_c, Xr, Xc, Zr, Zc, likelihood, Y,
                  indexD, output_dim, qU_mean, qU_var_r, qU_var_c):
        logL = svi_multiout_md_elbo(kern_r, kern_c, Xr, Xc, Zr, Zc,
                                    likelihood.gaussian_variance(None), Y,
                                    indexD, output_dim, qU_mean, qU_var_r,
                                    qU_var_c)
        cm = _common(kern_r, kern_c, Xr, jnp.asarray(Zr), jnp.asarray(Zc),
                     qU_mean, qU_var_r, qU_var_c)
        return PosteriorMultioutput(cm, kern_c, Zc), logL
