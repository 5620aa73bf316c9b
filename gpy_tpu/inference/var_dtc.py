"""VarDTC — Titsias collapsed variational sparse bound.

Reference: GPy/inference/latent_function_inference/var_dtc.py:66-276 (certain
and uncertain inputs, heteroscedastic noise, Cacher'd Y factors) and the
distributed psi-stat accumulation of var_dtc_parallel.py (replaced here by
sharded einsums + psum in parallel/).

TPU design: the bound is one pure function — Kmn/psi-stat contractions are
matmuls on the MXU; every dL_dpsi/dL_dKmm/dL_dR hand-derivation in the
reference (var_dtc.py:219-262) is replaced by jax.grad, which also gives
dF/dZ and dF/d(qX mean,var) for free (BGPLVM path).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.linalg import jitchol, jitchol_and_inv
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["VarDTC", "VarDTC_minibatch"]

LOG_2_PI = float(np.log(2 * np.pi))
CONST_JITTER = 1e-6


def _sparse_terms(kern, X, Z, W, Y, qX=None):
    """Shared quantities for collapsed sparse bounds.

    Returns (L, LB, A_trace, c, psi0_weighted_sum, M).
      L  = chol(Kmm + jitter)
      LB = chol(I + L^-1 [sum_n W_n psi2_n] L^-T)
      c  = LB^-1 L^-1 (Psi1' W Y)
    """
    M = Z.shape[0]
    Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
    # fused factor+inverse: matmul-only VJP reusing Li (util.linalg); the
    # O(N M^2) work then stays on the MXU as plain matmuls instead of a
    # sequential-blocked trsm with N RHS
    L, Li = jitchol_and_inv(Kmm)
    if qX is None:
        Kmn = kern.K(Z, X)  # (M, N)
        # A = Li @ KW (matmul, not trsm) BEFORE squaring: sandwiching the
        # N-summed Gram KW KW' between Li's loses gradient precision when
        # Kmm is ill-conditioned (cancellation after squaring)
        A = Li @ (Kmn * jnp.sqrt(W)[None, :])
        AAT = A @ A.T
        psi1WY = Kmn @ (W[:, None] * Y)
        psi0_sum = jnp.sum(W * kern.Kdiag(X))
    else:
        psi1 = kern.psi1(Z, qX)  # (N, M)
        N = psi1.shape[0]
        from ..kern.psi_comp import PSICOMP_RBF

        if N >= 512 and isinstance(getattr(kern, "_psicomp", None), PSICOMP_RBF):
            # streamed contraction — never materializes (N, M, M); inputs
            # sliced to the kernel's active_dims like the closed forms
            from ..kern.psi_comp import slice_psi_inputs
            from ..ops.pallas_psi import rbf_psi2_weighted

            Zs, qXs = slice_psi_inputs(kern, Z, qX)
            Psi2W = rbf_psi2_weighted(
                kern.variance, kern.lengthscale, Zs,
                jnp.asarray(qXs.mean), jnp.asarray(qXs.variance), W,
            )
        else:
            psi2n = kern.psi2n(Z, qX)  # (N, M, M)
            Psi2W = jnp.einsum("n,nmk->mk", W, psi2n)
        AAT = Li @ Psi2W @ Li.T
        AAT = 0.5 * (AAT + AAT.T)
        psi1WY = psi1.T @ (W[:, None] * Y)
        psi0_sum = jnp.sum(W * kern.psi0(Z, qX))
    B = jnp.eye(M, dtype=Z.dtype) + AAT
    LB = jitchol(B)
    c = jsl.solve_triangular(LB, jsl.solve_triangular(L, psi1WY, lower=True), lower=True)
    return L, LB, AAT, c, psi0_sum


class VarDTC(LatentFunctionInference):
    """Collapsed variational bound (Titsias 2009), Gaussian likelihood."""

    def __init__(self, limit: int = 1):
        pass

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None,
                  Y_metadata=None, qX=None):
        assert mean_function is None, "VarDTC with mean function: subtract externally"
        N = Y.shape[0]
        D = Y.shape[1]
        M = Z.shape[0]
        W = 1.0 / (likelihood.noise_diagonal(N, Y_metadata))  # per-point precision
        L, LB, AAT, c, psi0_sum = _sparse_terms(kern, X, Z, W, Y, qX)
        log_marginal = (
            -0.5 * N * D * LOG_2_PI
            + 0.5 * D * jnp.sum(jnp.log(W))
            - D * jnp.sum(jnp.log(jnp.diagonal(LB)))
            - 0.5 * jnp.sum(W[:, None] * Y * Y)
            + 0.5 * jnp.sum(c * c)
            - 0.5 * D * (psi0_sum - jnp.trace(AAT))
        )
        posterior = self._posterior(kern, Z, L, LB, c)
        return posterior, log_marginal

    def _posterior(self, kern, Z, L, LB, c):
        M = Z.shape[0]
        # woodbury_vector = L^-T LB^-T c
        wv = jsl.solve_triangular(
            L, jsl.solve_triangular(LB, c, lower=True, trans=1), lower=True, trans=1
        )
        # woodbury_inv = L^-T (I - B^-1) L^-1
        Bi = jsl.cho_solve((LB, True), jnp.eye(M, dtype=Z.dtype))
        tmp = jsl.solve_triangular(L, jnp.eye(M, dtype=Z.dtype) - Bi, lower=True, trans=1)
        wi = jsl.solve_triangular(L, tmp.T, lower=True, trans=1).T
        wi = 0.5 * (wi + wi.T)
        return Posterior(woodbury_vector=wv, woodbury_inv=wi, K=kern.K(Z))

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None,
                            Y_metadata=None, qX=None):
        return self.inference(kern, X, Z, likelihood, Y, mean_function, Y_metadata, qX)[1]


class VarDTC_minibatch(VarDTC):
    """Collapsed bound with the row dimension streamed in chunks.

    Reference: var_dtc_parallel.py:72-133 (gatherPsiStat — two-phase
    minibatch accumulation of {psi0, psi1'Y, Psi2, YRY} with an MPI
    Allreduce) + inference_likelihood :135-230. Here the accumulation is a
    `lax.scan` over row chunks, so peak memory is O(batchsize*M + M^2)
    instead of O(N*M): the bound's sufficient statistics are plain sums over
    rows. The multi-chip analogue (chunks -> shards, scan -> psum) lives in
    parallel/ (data-parallel collapsed bound). Unlike VarDTC's unsquared
    A = Li@Kw form, streaming forces accumulating the squared Gram
    sum_n W_n k_n k_n' — the same quantity the reference Allreduces.
    """

    def __init__(self, batchsize: int = 2048, limit: int = 1):
        self.batchsize = int(batchsize)

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None,
                  Y_metadata=None, qX=None):
        assert mean_function is None, "VarDTC with mean function: subtract externally"
        import jax
        from types import SimpleNamespace

        N, D = Y.shape
        M = Z.shape[0]
        dt = Z.dtype
        W_full = jnp.broadcast_to(
            jnp.asarray(likelihood.noise_diagonal(N, Y_metadata)), (N,)
        )
        W_full = 1.0 / W_full
        B = min(self.batchsize, N)
        n_chunks = -(-N // B)
        pad = n_chunks * B - N
        # zero-weight padding rows contribute nothing to any accumulated sum
        Wp = jnp.concatenate([W_full, jnp.zeros((pad,), dtype=W_full.dtype)])
        Yp = jnp.concatenate([jnp.asarray(Y), jnp.zeros((pad, D), dtype=dt)])
        if qX is None:
            Xp = jnp.concatenate([jnp.asarray(X), jnp.zeros((pad, X.shape[1]), dtype=dt)])
            chunks = (Xp.reshape(n_chunks, B, -1),)
        else:
            mu = jnp.asarray(qX.mean)
            Sv = jnp.asarray(qX.variance)
            mup = jnp.concatenate([mu, jnp.zeros((pad, mu.shape[1]), dtype=dt)])
            Svp = jnp.concatenate([Sv, jnp.ones((pad, Sv.shape[1]), dtype=dt)])
            chunks = (mup.reshape(n_chunks, B, -1), Svp.reshape(n_chunks, B, -1))
        Wc = Wp.reshape(n_chunks, B)
        Yc = Yp.reshape(n_chunks, B, D)

        def acc(carry, chunk):
            psi0_s, psi1WY, Psi2W, yry = carry
            w, y = chunk[0], chunk[1]
            if qX is None:
                xb = chunk[2]
                kmn = kern.K(Z, xb)  # (M, B)
                psi0_s = psi0_s + jnp.sum(w * kern.Kdiag(xb))
                psi1WY = psi1WY + kmn @ (w[:, None] * y)
                Psi2W = Psi2W + (kmn * w[None, :]) @ kmn.T
            else:
                qb = SimpleNamespace(mean=chunk[2], variance=chunk[3])
                psi0_s = psi0_s + jnp.sum(w * kern.psi0(Z, qb))
                p1 = kern.psi1(Z, qb)  # (B, M)
                psi1WY = psi1WY + p1.T @ (w[:, None] * y)
                Psi2W = Psi2W + jnp.einsum("n,nmk->mk", w, kern.psi2n(Z, qb))
            yry = yry + jnp.sum(w[:, None] * y * y)
            return (psi0_s, psi1WY, Psi2W, yry), None

        init = (jnp.zeros((), dtype=dt), jnp.zeros((M, D), dtype=dt),
                jnp.zeros((M, M), dtype=dt), jnp.zeros((), dtype=dt))
        (psi0_sum, psi1WY, Psi2W, YRY), _ = jax.lax.scan(
            acc, init, (Wc, Yc) + chunks)

        Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=dt)
        L, Li = jitchol_and_inv(Kmm)
        AAT = Li @ Psi2W @ Li.T
        AAT = 0.5 * (AAT + AAT.T)
        LB = jitchol(jnp.eye(M, dtype=dt) + AAT)
        c = jsl.solve_triangular(LB, Li @ psi1WY, lower=True)
        log_marginal = (
            -0.5 * N * D * LOG_2_PI
            + 0.5 * D * jnp.sum(jnp.log(W_full))
            - D * jnp.sum(jnp.log(jnp.diagonal(LB)))
            - 0.5 * YRY
            + 0.5 * jnp.sum(c * c)
            - 0.5 * D * (psi0_sum - jnp.trace(AAT))
        )
        posterior = self._posterior(kern, Z, L, LB, c)
        return posterior, log_marginal
