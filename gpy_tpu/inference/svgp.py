"""SVGP — uncollapsed stochastic variational ELBO (Hensman et al. 2013/15).

Reference: GPy/inference/latent_function_inference/svgp.py:10-121 (q(f)
marginals, GH-quadrature variational expectations, KL, and ~70 lines of
hand-written gradients wrt m, chol(S), Kmm, Kmn) and GPy/core/svgp.py.

TPU design: the ELBO is one pure jittable function of
(q_u_mean, q_u_chol_flat, Z, kern, likelihood); batch_scale rescales the
data term for minibatching; `jax.grad` supplies every gradient including
through the flat-chol packing (replacing choleskies_cython backprop). This
function is the unit that gets `shard_map`'d over the data axis with psum
in parallel/sharded.py — the TPU replacement of GPy's MPI Allreduce.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.choleskies import flat_to_triang
from ..util.linalg import jitchol, chol_and_inv
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["SVGPInference", "svgp_elbo_parts", "svgp_elbo_parts_L",
           "svgp_elbo_parts_S", "svgp_elbo_parts_S_white",
           "q_f_marginals_white", "kl_qu_pu_white"]

LOG_2_PI = float(np.log(2 * np.pi))
CONST_JITTER = 1e-6


def q_f_marginals(kern, X, Z, q_u_mean, L_u):
    """Marginals of q(f) = int p(f|u) q(u) du.

    q_u_mean: (M, D); L_u: (D, M, M) lower chol of S.
    Returns (mu (N,D), var (N,D), Lmm, Kmm).
    """
    M = Z.shape[0]
    Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
    # explicit jitter already added: plain cholesky (no ladder probe) keeps
    # the training hot path at one factorization
    # chol_and_inv: fused (Lmm, Lmm^-1) whose VJP is pure matmuls reusing
    # Lmi — removes the 3 sequential trsm ops JAX's stock chol/trsm pullbacks
    # emit (the step is latency-bound on 512-size triangular ops)
    Lmm, Lmi = chol_and_inv(Kmm)
    Kmn = kern.K(Z, X)  # (M, N)
    C = Lmi @ Kmn  # Lmm^-1 Kmn, (M, N)
    A = Lmi.T @ C  # Kmm^-1 Kmn, (M, N)
    mu = A.T @ q_u_mean  # (N, D)
    Kdiag = kern.Kdiag(X)  # (N,)
    # var_nd = Kdiag_n - sum_m A_mn Kmn_mn + sum (A' S A)_nn per output d
    AKmn = jnp.sum(C * C, axis=0)  # diag(Knm Kmm^-1 Kmn)
    SA = jnp.einsum("dij,jn->din", L_u.transpose(0, 2, 1), A)  # L' A  (D, M, N)
    ASA = jnp.sum(SA**2, axis=1).T  # (N, D)
    var = (Kdiag - AKmn)[:, None] + ASA
    return mu, jnp.maximum(var, 1e-12), Lmm, Kmm


def kl_qu_pu(q_u_mean, L_u, Lmm):
    """KL(q(u) || p(u)) summed over output dims.

    q(u)=N(m, LL'), p(u)=N(0, Kmm) with chol Lmm.
    """
    M = L_u.shape[-1]
    D = q_u_mean.shape[1]
    import jax

    Li_m = jsl.solve_triangular(Lmm, q_u_mean, lower=True)  # (M, D)
    mahal = jnp.sum(Li_m**2)

    def tr_term(Ld):
        V = jsl.solve_triangular(Lmm, Ld, lower=True)
        return jnp.sum(V * V)

    trace = jnp.sum(jax.vmap(tr_term)(L_u))
    logdet_K = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lmm)))
    logdet_S = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L_u, axis1=-2, axis2=-1))))
    return 0.5 * (trace + mahal - M * D + D * logdet_K - logdet_S)


def q_f_marginals_white(kern, X, Z, v_m, L_w):
    """Marginals of q(f) for the whitened q(u) = N(Lmm v, Lmm S_w Lmm').

    v_m: (M, D) whitened mean; L_w: (D, M, M) lower chol of S_w.
    Returns (mu (N,D), var (N,D), Lmm, Kmm). The Kmm^-1 sandwich cancels:
    mu = C' v and var = Kdiag - diag(C'C) + diag(C' S_w C) with C = Lmm^-1 Kmn.
    """
    M = Z.shape[0]
    Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
    Lmm, Lmi = chol_and_inv(Kmm)
    Kmn = kern.K(Z, X)
    C = Lmi @ Kmn  # (M, N)
    mu = C.T @ v_m
    Kdiag = kern.Kdiag(X)
    CKC = jnp.sum(C * C, axis=0)
    LC = jnp.einsum("dji,jn->din", L_w, C)  # L_w' C, (D, M, N)
    CSC = jnp.sum(LC**2, axis=1).T  # (N, D)
    var = (Kdiag - CKC)[:, None] + CSC
    return mu, jnp.maximum(var, 1e-12), Lmm, Kmm


def kl_qu_pu_white(v_m, L_w):
    """KL(N(v, L_w L_w') || N(0, I)) summed over outputs — solve-free."""
    M = L_w.shape[-1]
    D = v_m.shape[1]
    logdet_S = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L_w, axis1=-2, axis2=-1))))
    return 0.5 * (jnp.sum(L_w**2) + jnp.sum(v_m**2) - M * D - logdet_S)


def svgp_elbo_parts_L(kern, X, Z, likelihood, Y, q_u_mean, L_u,
                      Y_metadata=None, batch_scale=1.0, mean_function=None):
    """ELBO parts taking the (D, M, M) lower-chol of S directly.

    The training hot loop (core/svgp.py fit) carries S and owns its own
    Cholesky; going through the flat packing would add a 131k-element
    scatter + gather (and their VJPs) per step for nothing.
    """
    mu, var, Lmm, _ = q_f_marginals(kern, X, Z, q_u_mean, L_u)
    if mean_function is not None:
        mu = mu + mean_function.f(X)
    F = likelihood.variational_expectations(Y, mu, var, Y_metadata)
    kl = kl_qu_pu(q_u_mean, L_u, Lmm)
    return jnp.sum(F) * batch_scale, kl


def svgp_elbo_parts(kern, X, Z, likelihood, Y, q_u_mean, q_u_chol_flat,
                    Y_metadata=None, batch_scale=1.0, mean_function=None):
    """Returns (datafit_sum, KL). ELBO = batch_scale * datafit - KL."""
    M = Z.shape[0]
    L_u = flat_to_triang(q_u_chol_flat, M)  # (D, M, M)
    return svgp_elbo_parts_L(kern, X, Z, likelihood, Y, q_u_mean, L_u,
                             Y_metadata, batch_scale, mean_function)


def svgp_elbo_parts_S(kern, X, Z, likelihood, Y, q_u_mean, S, logdet_S,
                      Y_metadata=None, batch_scale=1.0, mean_function=None):
    """ELBO parts written closed-form in the covariance S (no Cholesky of S).

    S enters the ELBO only through diag(A' S A), tr(Kmm^-1 S) and logdet S —
    all matmul-shaped except the logdet, which the natural-gradient training
    loop carries exactly (it falls out of the precision Cholesky of the
    natgrad update). This removes chol(S) AND its VJP from the hot step;
    the entropy part of dELBO/dS (+0.5 S^-1, from the logdet term that is
    passed in as a constant here) must be added analytically by the caller.

    TPU solve strategy: a triangular solve against the (M, B) cross-gram is a
    sequential blocked op the MXU can't saturate. Instead invert the M x M
    Cholesky factor ONCE (the only trsm left, eye RHS) and hit everything
    else with plain matmuls: C = Lmm^-1 Kmn, W = Lmm^-1 S Lmm^-T. All VJPs
    become matmuls too.

    S: (D, M, M) symmetric PD; logdet_S: scalar, sum over outputs.
    """
    M = Z.shape[0]
    D = Y.shape[1]
    Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
    Lmm, Lmi = chol_and_inv(Kmm)  # matmul-only VJP (see util.linalg)
    Kmn = kern.K(Z, X)
    C = Lmi @ Kmn  # whitened cross-cov (M, N) — pure matmul
    Li_m = Lmi @ q_u_mean  # (M, D)
    mu = C.T @ Li_m
    if mean_function is not None:
        mu = mu + mean_function.f(X)
    Kdiag = kern.Kdiag(X)
    CKC = jnp.sum(C * C, axis=0)  # diag(Knm Kmm^-1 Kmn)
    # W = Lmm^-1 S Lmm^-T per output: diag(A'SA) = diag(C' W C)
    W = jnp.einsum("ij,djk,lk->dil", Lmi, S, Lmi)  # (D, M, M)
    WC = jnp.einsum("dij,jn->din", W, C)  # (D, M, N)
    CWC = jnp.sum(C[None] * WC, axis=1).T  # (N, D)
    var = jnp.maximum((Kdiag - CKC)[:, None] + CWC, 1e-12)
    F = likelihood.variational_expectations(Y, mu, var, Y_metadata)
    # KL(q||p): 0.5 (tr(Kmm^-1 S) + m' Kmm^-1 m - MD + D logdet K - logdet S)
    mahal = jnp.sum(Li_m**2)
    trace = jnp.sum(jnp.diagonal(W, axis1=-2, axis2=-1))
    logdet_K = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lmm)))
    kl = 0.5 * (trace + mahal - M * D + D * logdet_K - logdet_S)
    return jnp.sum(F) * batch_scale, kl


def svgp_elbo_parts_S_white(kern, X, Z, likelihood, Y, v_m, S_w, logdet_Sw,
                            Y_metadata=None, batch_scale=1.0, mean_function=None):
    """Whitened ELBO parts: q(u) = N(Lmm v_m, Lmm S_w Lmm') (SURVEY §7.6).

    With the whitened parameterization the prior over the whitened variable
    is N(0, I): the KL is closed form with NO Kmm solves, and S_w is used
    directly as the middle factor (no Lmm^-1 S Lmm^-T sandwich) — two M^3
    matmuls plus their VJPs cheaper per step than the unwhitened parts_S.
    Same logdet-carried natural-gradient contract: the +0.5 S_w^-1 entropy
    gradient is added analytically by the caller.

    v_m: (M, D); S_w: (D, M, M) symmetric PD; logdet_Sw: scalar (sum over D).
    """
    M = Z.shape[0]
    D = Y.shape[1]
    Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
    Lmm, Lmi = chol_and_inv(Kmm)
    Kmn = kern.K(Z, X)
    C = Lmi @ Kmn  # (M, N)
    mu = C.T @ v_m
    if mean_function is not None:
        mu = mu + mean_function.f(X)
    Kdiag = kern.Kdiag(X)
    CKC = jnp.sum(C * C, axis=0)
    SC = jnp.einsum("dij,jn->din", S_w, C)  # (D, M, N)
    CSC = jnp.sum(C[None] * SC, axis=1).T  # (N, D)
    var = jnp.maximum((Kdiag - CKC)[:, None] + CSC, 1e-12)
    F = likelihood.variational_expectations(Y, mu, var, Y_metadata)
    # KL(N(v, S_w) || N(0, I)) = 0.5 (tr S_w + |v|^2 - MD - logdet S_w)
    kl = 0.5 * (jnp.sum(jnp.diagonal(S_w, axis1=-2, axis2=-1)) +
                jnp.sum(v_m**2) - M * D - logdet_Sw)
    return jnp.sum(F) * batch_scale, kl


class SVGPInference(LatentFunctionInference):
    """ELBO evaluation + posterior container for the SVGP model."""

    def inference(self, kern, X, Z, likelihood, Y, q_u_mean, q_u_chol_flat,
                  Y_metadata=None, batch_scale=1.0, mean_function=None):
        datafit, kl = svgp_elbo_parts(
            kern, X, Z, likelihood, Y, q_u_mean, q_u_chol_flat, Y_metadata, batch_scale, mean_function
        )
        log_marginal = datafit - kl
        M = Z.shape[0]
        L_u = flat_to_triang(q_u_chol_flat, M)
        Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
        Lmm = jitchol(Kmm)
        # woodbury form: mean = Kxm Kmm^-1 m  => wv = Kmm^-1 m
        wv = jsl.cho_solve((Lmm, True), q_u_mean)
        # cov = Kxx - Kxm [Kmm^-1 - Kmm^-1 S Kmm^-1] Kmx  (per output; use d=0)
        S = L_u[0] @ L_u[0].T
        KiSKi = jsl.cho_solve((Lmm, True), jsl.cho_solve((Lmm, True), S).T)
        Kmmi = jsl.cho_solve((Lmm, True), jnp.eye(M, dtype=Z.dtype))
        wi = Kmmi - KiSKi
        posterior = Posterior(woodbury_vector=wv, woodbury_inv=0.5 * (wi + wi.T), K=Kmm)
        return posterior, log_marginal
