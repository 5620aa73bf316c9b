"""Pivoted (partial) Cholesky preconditioner for iterative exact-GP inference.

Follows the BBMM recipe (Gardner et al. 2018, GPyTorch): a rank-k pivoted
Cholesky L_k of the *noise-free* kernel matrix gives the preconditioner
P = L_k L_k' + diag(noise), whose inverse applies in O(Nk) via Woodbury and
whose logdet is exact via the k x k capacitance matrix. Preconditioned CG
(a) converges in far fewer iterations on the noise-regularized spectrum and
(b) with probes drawn from N(0, P), the PCG Lanczos tridiagonals estimate
logdet(P^{-1/2} K P^{-1/2}) with sharply reduced variance; logdet K =
logdet P + that estimate.

The reference has no analogue (GPy is dense-Cholesky only). TPU design:
the rank-k loop is a `lax.scan` of k steps — each step is one kernel column
(a (N, 1) Gram slice) plus an (N, k) matmul, so the whole factorization is
O(Nk^2 + Nk D) with no data-dependent shapes (the pivot argmax is a traced
index into static-shape gathers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pivoted_cholesky", "woodbury_inverse_apply", "woodbury_logdet"]


def pivoted_cholesky(kern, X, rank: int, jitter: float = 1e-8):
    """Rank-`rank` pivoted Cholesky of K(X, X) -> L (N, rank).

    Greedy diagonal pivoting: at step i pick p = argmax residual diagonal,
    append column (K[:, p] - L L[p]') / sqrt(d[p]). Works entirely with
    static shapes; L columns beyond the current step are zero so the full
    (N, rank) matmul per step is exact.
    """
    N = X.shape[0]
    dt = X.dtype
    d0 = kern.Kdiag(X) + jitter

    tol = 1e-12 * jnp.max(d0)  # rank-exhaustion guard (relative)

    def step(carry, i):
        L, d = carry
        p = jnp.argmax(d)
        col = kern.K(X, X[p][None, :])[:, 0]  # (N,)
        Lp = L[p]  # (rank,)
        resid = col - L @ Lp
        dp = d[p]
        # once the residual diagonal is numerically exhausted, further
        # columns would be roundoff / sqrt(~0) garbage — emit zeros instead
        # (the factorization is already exact at that point)
        ok = dp > tol
        l = jnp.where(ok, resid / jnp.sqrt(jnp.where(ok, dp, 1.0)), 0.0)
        L = L.at[:, i].set(l)
        d = jnp.maximum(d - l * l, 0.0)
        d = d.at[p].set(0.0)
        return (L, d), None

    L0 = jnp.zeros((N, rank), dtype=dt)
    (L, _), _ = lax.scan(step, (L0, d0), jnp.arange(rank))
    return L


def _capacitance_chol(L, noise):
    """chol(I_k + L' D^{-1} L) for P = L L' + D, D = diag(noise)."""
    k = L.shape[1]
    Ln = L / noise[:, None]
    C = jnp.eye(k, dtype=L.dtype) + L.T @ Ln
    return jnp.linalg.cholesky(C), Ln


def woodbury_inverse_apply(L, noise, capacitance=None):
    """Returns apply(V) = P^{-1} V for P = L L' + diag(noise); O(Nk) each."""
    Lc, Ln = capacitance if capacitance is not None else _capacitance_chol(L, noise)

    def apply(V):
        Vn = V / noise[:, None]
        t = Ln.T @ V  # (k, R)
        s = jax.scipy.linalg.cho_solve((Lc, True), t)
        return Vn - Ln @ s

    return apply


def woodbury_logdet(L, noise, capacitance=None):
    """Exact logdet(L L' + diag(noise))."""
    Lc, _ = capacitance if capacitance is not None else _capacitance_chol(L, noise)
    return jnp.sum(jnp.log(noise)) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lc)))
