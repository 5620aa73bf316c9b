"""Laplace approximation for non-Gaussian likelihoods.

Reference: GPy/inference/latent_function_inference/laplace.py (Laplace:24,
rasm_mode:148-231 Rasmussen-stable Newton with Brent line search,
mode_computations:233-307, _compute_B_statistics:308-354, and the bespoke
explicit+implicit dL_dthetaL algebra).

TPU design:
  * Mode finding = damped Newton under `lax.while_loop` with a *vectorized*
    backtracking line search (all candidate step sizes evaluated in one shot
    and argmax'd — the parallel replacement for GPy's sequential Brent
    search). Runs on stop_gradient'd inputs.
  * Hyperparameter gradients come from ONE differentiable Newton step taken
    from the converged mode: the Newton map N(f, theta) has dN/df = 0 at its
    root, so d/dtheta N(stop_grad(f*), theta) is the exact implicit-function
    derivative df*/dtheta. This single step replaces GPy's ~300 lines of
    explicit/implicit gradient algebra.
  * Non-log-concave likelihoods (StudentT): W may be negative, so the
    B = I + sqrt(W) K sqrt(W) trick is invalid; we use the general
    (I + W K) LU factorization (K^-1 + W is still PD at a mode), with
    slogdet for the evidence — all differentiable under JAX.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..util.linalg import jitchol, slogdet_lu_safe, solve_lu_safe
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["Laplace", "LaplaceBlock"]


def _W_grad(f, likelihood, Y, Y_metadata, m):
    W = -likelihood.d2_logpdf_df2(f + m, Y, Y_metadata)
    grad = likelihood.d_logpdf_df(f + m, Y, Y_metadata)
    return W, grad


def _newton_direction(f, K, likelihood, Y, Y_metadata, m, psd_W=False):
    """Full Newton target: f_nt = K (I + W K)^{-1} (W f + grad).

    psd_W=False: general LU solve, valid for any sign of W (StudentT).
    psd_W=True (log-concave likelihoods, W >= 0): GPML algorithm 3.1 —
    a = b - sqrtW B^-1 sqrtW K b with B = I + sqrtW K sqrtW, one blocked
    CHOLESKY instead of an LU (half the flops, and jitchol routes to the
    fast recursive kernel; measured 2.43 -> see bench ms/Newton).
    Returns (f_nt, a) with f_nt = K @ a exactly.
    """
    W, grad = _W_grad(f, likelihood, Y, Y_metadata, m)
    N = K.shape[0]
    b = W * f + grad  # (N,1)
    if psd_W:
        sW = jnp.sqrt(jnp.maximum(W, 0.0))
        B = jnp.eye(N, dtype=K.dtype) + (sW * K) * sW[:, 0][None, :]
        LB = jitchol(B)
        Kb = K @ b
        a = b - sW * jax.scipy.linalg.cho_solve((LB, True), sW * Kb)
        return K @ a, a
    A = jnp.eye(N, dtype=K.dtype) + W * K  # (I + diag(W) K)
    a = solve_lu_safe(A, b)
    return K @ a, a


class Laplace(LatentFunctionInference):
    def __init__(self, max_iters: int = 100, tol: float = 1e-10, n_linesearch: int = 12,
                 psd_W=None):
        """psd_W: True routes Newton solves through the Cholesky of
        B = I + sqrtW K sqrtW (valid when the likelihood is log-concave so
        W >= 0 everywhere); None auto-detects via likelihood.log_concave;
        False forces the general LU path (StudentT & other non-log-concave)."""
        self.max_iters = max_iters
        self.tol = tol
        self.n_linesearch = n_linesearch
        self.psd_W = psd_W

    def _psd(self, likelihood):
        if self.psd_W is not None:
            return bool(self.psd_W)
        return bool(getattr(likelihood, "log_concave", False))

    def _find_mode(self, K, likelihood, Y, Y_metadata, m):
        """Damped Newton to convergence; no gradients flow."""
        K = lax.stop_gradient(K)
        lik = likelihood.stop_gradient()
        Ysg = lax.stop_gradient(Y)
        msg = lax.stop_gradient(m)
        dt = K.dtype
        L_K = jitchol(K)
        steps = jnp.asarray(2.0 ** -np.arange(self.n_linesearch), dtype=dt)  # 1, 1/2, ...

        def psi(f):
            Kinv_f = jax.scipy.linalg.cho_solve((L_K, True), f)
            return jnp.sum(lik.logpdf(f + msg, Ysg, Y_metadata)) - 0.5 * jnp.sum(f * Kinv_f)

        psd = self._psd(lik)

        def body(state):
            f, prev_psi, _, it = state
            f_nt, _ = _newton_direction(f, K, lik, Ysg, Y_metadata, msg, psd)
            d = f_nt - f
            # quadratic form in closed form over the step size: psi(f + s d)
            # = sum logpdf - (qff + 2 s qfd + s^2 qdd)/2 from TWO solves
            # (one 2-RHS trsm) — vmapping psi over candidates ran 12
            # single-RHS cho_solves, a serialized batched trsm on TPU
            sol = jax.scipy.linalg.cho_solve(
                (L_K, True), jnp.concatenate([f, d], axis=1))  # (N, 2)
            qff = jnp.sum(f[:, 0] * sol[:, 0])
            qfd = jnp.sum(d[:, 0] * sol[:, 0])
            qdd = jnp.sum(d[:, 0] * sol[:, 1])
            cand = f[None, :, :] + steps[:, None, None] * d[None, :, :]
            lp = jnp.sum(lik.logpdf(cand + msg[None], Ysg[None], Y_metadata),
                         axis=(1, 2))
            vals = lp - 0.5 * (qff + 2.0 * steps * qfd + steps**2 * qdd)
            best = jnp.argmax(vals)
            f_new = cand[best]
            new_psi = vals[best]
            # keep old point if no candidate improves (safeguard)
            improved = new_psi > prev_psi
            f_new = jnp.where(improved, f_new, f)
            new_psi = jnp.where(improved, new_psi, prev_psi)
            return f_new, new_psi, jnp.abs(new_psi - prev_psi), it + 1

        def cond(state):
            _, _, delta, it = state
            return (delta > self.tol) & (it < self.max_iters)

        f0 = jnp.zeros_like(Y)
        state0 = (f0, psi(f0), jnp.asarray(jnp.inf, dtype=dt), 0)
        f, _, _, it = lax.while_loop(cond, body, state0)
        return lax.stop_gradient(f), it

    def inference(self, kern, X, likelihood, Y, mean_function=None, Y_metadata=None):
        N, D = Y.shape
        assert D == 1, "Laplace inference supports single-output models (as GPy)"
        m = mean_function.f(X) if mean_function is not None else jnp.zeros_like(Y)
        K = kern.K(X) + 1e-8 * jnp.eye(N, dtype=X.dtype)
        psd = self._psd(likelihood)
        f_star, _ = self._find_mode(K, likelihood, Y, Y_metadata, m)
        # one differentiable Newton step from the converged mode
        f_hat, a = _newton_direction(lax.stop_gradient(f_star), K, likelihood,
                                     Y, Y_metadata, m, psd)
        # evidence at the (differentiable) mode
        W, _ = _W_grad(f_hat, likelihood, Y, Y_metadata, m)
        if psd:
            # log-concave: |I + WK| = |B|, (I+WK)^-1 W = sqrtW B^-1 sqrtW
            # — one blocked chol, no LU/slogdet (GPML 3.4.3)
            sW = jnp.sqrt(jnp.maximum(W, 0.0))
            B = jnp.eye(N, dtype=K.dtype) + (sW * K) * sW[:, 0][None, :]
            LB = jitchol(B)
            logdetA = 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB)))
            U = jax.scipy.linalg.solve_triangular(
                LB, jnp.diag(sW[:, 0]), lower=True)
            woodbury_inv = U.T @ U
        else:
            A = jnp.eye(N, dtype=K.dtype) + W * K  # I + diag(W) K
            sign, logdetA = slogdet_lu_safe(A)
            # (K + W^{-1})^{-1} = (I + W K)^{-1} W   (no 1/W — safe for W<=0)
            Ai_W = solve_lu_safe(A, jnp.diag(W[:, 0]))
            woodbury_inv = 0.5 * (Ai_W + Ai_W.T)
        log_marginal = (
            jnp.sum(likelihood.logpdf(f_hat + m, Y, Y_metadata))
            - 0.5 * jnp.sum(a * f_hat)
            - 0.5 * logdetA
        )
        posterior = Posterior(woodbury_vector=a, woodbury_inv=woodbury_inv, K=K)
        return posterior, log_marginal


# ---------------------------------------------------------------------------
# Block (non-diagonal Hessian) Laplace
# ---------------------------------------------------------------------------
def _W_block(f, likelihood, Y, Y_metadata, m):
    """Negative Hessian of sum log p(y|f) as a full (N, N) matrix.

    Likelihoods whose log-density couples latent values (so that
    d2 logpdf / df_i df_j is non-diagonal) expose `d2_logpdf_df2_block`;
    everything else falls back to embedding the diagonal tower — in that
    case LaplaceBlock agrees with Laplace exactly.

    The reference clips the diagonal of W to [1e-6, 1e30]
    (laplace.py:375, 424); we match that for the same PD safety.
    """
    if hasattr(likelihood, "d2_logpdf_df2_block"):
        W = -likelihood.d2_logpdf_df2_block(f + m, Y, Y_metadata)
    else:
        W = jnp.diagflat(-likelihood.d2_logpdf_df2(f + m, Y, Y_metadata))
    d = jnp.clip(jnp.diagonal(W), 1e-6, 1e30)
    W = W - jnp.diagflat(jnp.diagonal(W)) + jnp.diagflat(d)
    grad = likelihood.d_logpdf_df(f + m, Y, Y_metadata)
    return W, grad


def _newton_direction_block(f, K, likelihood, Y, Y_metadata, m):
    """f_nt = K (I + W K)^{-1} (W f + grad) with full-matrix W."""
    W, grad = _W_block(f, likelihood, Y, Y_metadata, m)
    N = K.shape[0]
    b = W @ f + grad
    A = jnp.eye(N, dtype=K.dtype) + W @ K
    a = solve_lu_safe(A, b)
    return K @ a, a


class LaplaceBlock(Laplace):
    """Laplace approximation with a full (non-diagonal) likelihood Hessian.

    Reference: GPy/inference/latent_function_inference/laplace.py:355-502
    (LaplaceBlock.rasm_mode / mode_computations / _compute_B_statistics with
    matrix W, general B = I + K W, slogdet evidence).

    TPU design: identical architecture to `Laplace` — damped Newton under
    `lax.while_loop` with a vectorized line search on stop-gradded inputs,
    then ONE differentiable Newton step from the mode (the implicit-function
    derivative), replacing the reference's explicit/implicit dL_dK algebra
    (laplace.py:443-460). The only change is that every `diag(W) @ .`
    contraction becomes a dense matmul (MXU-friendly for coupled
    likelihoods).
    """

    def _find_mode(self, K, likelihood, Y, Y_metadata, m):
        K = lax.stop_gradient(K)
        lik = likelihood.stop_gradient()
        Ysg = lax.stop_gradient(Y)
        msg = lax.stop_gradient(m)
        dt = K.dtype
        L_K = jitchol(K)
        steps = jnp.asarray(2.0 ** -np.arange(self.n_linesearch), dtype=dt)

        def psi(f):
            Kinv_f = jax.scipy.linalg.cho_solve((L_K, True), f)
            return jnp.sum(lik.logpdf(f + msg, Ysg, Y_metadata)) - 0.5 * jnp.sum(f * Kinv_f)

        def body(state):
            f, prev_psi, _, it = state
            f_nt, _ = _newton_direction_block(f, K, lik, Ysg, Y_metadata, msg)
            d = f_nt - f
            # closed-form quadratic over the step size (see Laplace.body)
            sol = jax.scipy.linalg.cho_solve(
                (L_K, True), jnp.concatenate([f, d], axis=1))  # (N, 2)
            qff = jnp.sum(f[:, 0] * sol[:, 0])
            qfd = jnp.sum(d[:, 0] * sol[:, 0])
            qdd = jnp.sum(d[:, 0] * sol[:, 1])
            cand = f[None, :, :] + steps[:, None, None] * d[None, :, :]
            lp = jax.vmap(lambda ff: jnp.sum(lik.logpdf(ff + msg, Ysg, Y_metadata)))(cand)
            vals = lp - 0.5 * (qff + 2.0 * steps * qfd + steps**2 * qdd)
            best = jnp.argmax(vals)
            improved = vals[best] > prev_psi
            f_new = jnp.where(improved, cand[best], f)
            new_psi = jnp.where(improved, vals[best], prev_psi)
            return f_new, new_psi, jnp.abs(new_psi - prev_psi), it + 1

        def cond(state):
            _, _, delta, it = state
            return (delta > self.tol) & (it < self.max_iters)

        f0 = jnp.zeros_like(Y)
        state0 = (f0, psi(f0), jnp.asarray(jnp.inf, dtype=dt), 0)
        f, _, _, it = lax.while_loop(cond, body, state0)
        return lax.stop_gradient(f), it

    def inference(self, kern, X, likelihood, Y, mean_function=None, Y_metadata=None):
        N, D = Y.shape
        assert D == 1, "LaplaceBlock inference supports single-output models (as GPy)"
        m = mean_function.f(X) if mean_function is not None else jnp.zeros_like(Y)
        K = kern.K(X) + 1e-8 * jnp.eye(N, dtype=X.dtype)
        f_star, _ = self._find_mode(K, likelihood, Y, Y_metadata, m)
        f_hat, a = _newton_direction_block(
            lax.stop_gradient(f_star), K, likelihood, Y, Y_metadata, m)
        W, _ = _W_block(f_hat, likelihood, Y, Y_metadata, m)
        A = jnp.eye(N, dtype=K.dtype) + W @ K
        sign, logdetA = slogdet_lu_safe(A)
        log_marginal = (
            jnp.sum(likelihood.logpdf(f_hat + m, Y, Y_metadata))
            - 0.5 * jnp.sum(a * f_hat)
            - 0.5 * logdetA
        )
        Ai_W = solve_lu_safe(A, W)
        woodbury_inv = 0.5 * (Ai_W + Ai_W.T)
        posterior = Posterior(woodbury_vector=a, woodbury_inv=woodbury_inv, K=K)
        return posterior, log_marginal
