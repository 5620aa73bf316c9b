"""EPDTC: expectation propagation for sparse (DTC) GPs.

Reference: GPy/inference/latent_function_inference/expectation_propagation.py
EPDTC:443-622 (sequential site sweeps with LLT rank-1 updates).

TPU design: like dense EP (ep.py) the site updates run in *parallel* with
damping; all solves live in the whitened inducing subspace — R = Lm^-1 Kmn,
B = I_M + R T~ R^T is (M, M), so each sweep is O(N M^2 + M^3) MXU work
instead of the reference's sequential rank-1 updates.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax import lax

from ..util.linalg import jitchol, jitchol_and_inv
from .exact import LatentFunctionInference
from .posterior import Posterior

__all__ = ["EPDTC"]

CONST_JITTER = 1e-6


def _posterior_w(R, tau, v):
    """Posterior over whitened u given sites on f ~ R^T w.

    Returns (mu_f (N,), sig2_f (N,), m_w, S_w, LB)."""
    M = R.shape[0]
    B = jnp.eye(M, dtype=R.dtype) + (R * tau[None, :]) @ R.T
    LB = jitchol(B)
    S_w = jsl.cho_solve((LB, True), jnp.eye(M, dtype=R.dtype))
    m_w = S_w @ (R @ v)
    mu_f = R.T @ m_w
    V = jsl.solve_triangular(LB, R, lower=True)
    sig2_f = jnp.sum(V * V, axis=0)  # diag(R' S_w R)
    return mu_f, sig2_f, m_w, S_w, LB


class EPDTC(LatentFunctionInference):
    def __init__(self, epsilon=1e-6, eta=1.0, delta=0.8, max_iters=60,
                 ep_mode="nested"):
        """ep_mode as in EP (GPy: expectation_propagation.py:188-213):
        "alternated" freezes converged sites while optimize() moves the
        hyperparameters; "nested" (our default) re-converges every
        evaluation."""
        assert ep_mode in ("nested", "alternated")
        self.epsilon = epsilon
        self.eta = eta
        self.delta = delta
        self.max_iters = max_iters
        self.ep_mode = ep_mode
        self._frozen = False
        self._site_cache = None
        self._loading = False

    def _rebuild_after_load(self):
        # resume parity: reuse stored converged sites after deserialization
        # (same semantics as EP._rebuild_after_load / GPy's `loading` flag)
        self._loading = self._site_cache is not None

    def on_optimization_start(self):
        self.__dict__["_site_cache"] = None
        self._loading = False
        self._frozen = self.ep_mode == "alternated"

    def on_optimization_end(self):
        self._frozen = False

    def _converge_sites(self, R, likelihood, Y, Y_metadata):
        R = lax.stop_gradient(R)
        lik = likelihood.stop_gradient()
        Ysg = lax.stop_gradient(Y)[:, 0]
        N = R.shape[1]
        dt = R.dtype
        eta, delta = self.eta, self.delta

        def sweep(carry):
            tau, v, diff_prev, dlt, it = carry
            mu, sig2, *_ = _posterior_w(R, tau, v)
            sig2 = jnp.clip(sig2, 1e-12, 1e12)
            tau_c = jnp.maximum(1.0 / sig2 - eta * tau, 1e-12)
            v_c = mu / sig2 - eta * v
            logZ, mu_hat, s2_hat = lik.moments_match_ep(Ysg, tau_c, v_c, Y_metadata)
            s2_hat = jnp.clip(s2_hat, 1e-12, 1e12)
            tau_new = jnp.maximum((1.0 / s2_hat - tau_c) / eta, 0.0)
            v_new = (mu_hat / s2_hat - v_c) / eta
            tau2 = (1 - dlt) * tau + dlt * tau_new
            v2 = (1 - dlt) * v + dlt * v_new
            diff = jnp.max(jnp.abs(tau2 - tau)) + jnp.max(jnp.abs(v2 - v))
            # same oscillation back-off as EP (ep.py): growing sweep-to-sweep
            # change halves the damping (floor 0.05)
            dlt_next = jnp.where(diff > diff_prev, jnp.maximum(0.5 * dlt, 0.05), dlt)
            return tau2, v2, diff, dlt_next, it + 1

        def cond(carry):
            _, _, diff, _, it = carry
            return (diff > self.epsilon) & (it < self.max_iters)

        tau, v, _, _, it = lax.while_loop(
            cond, sweep,
            (jnp.zeros(N, dtype=dt), jnp.zeros(N, dtype=dt),
             jnp.asarray(jnp.inf, dtype=dt), jnp.asarray(delta, dtype=dt), 0),
        )
        return lax.stop_gradient(tau), lax.stop_gradient(v), it

    def _log_marginal(self, R, likelihood, Y, Y_metadata, tau, v):
        mu, sig2, m_w, S_w, LB = _posterior_w(R, tau, v)
        sig2 = jnp.clip(sig2, 1e-12, 1e12)
        eta = self.eta
        tau_c = jnp.maximum(1.0 / sig2 - eta * tau, 1e-12)
        v_c = mu / sig2 - eta * v
        logZ_hat, _, _ = likelihood.moments_match_ep(Y[:, 0], tau_c, v_c, Y_metadata)
        mu_c = v_c / tau_c
        term_det = -jnp.sum(jnp.log(jnp.diagonal(LB)))
        term_quad = 0.5 * jnp.sum(v * mu)  # v' Sigma v with Sigma = R' S_w R
        term_cavity = 0.5 * jnp.sum(jnp.log1p(tau / tau_c)) + 0.5 * jnp.sum(
            (mu_c**2 * tau_c * tau - 2 * mu_c * tau_c * v - v**2) / (tau_c + tau)
        )
        return jnp.sum(logZ_hat) + term_det + term_quad + term_cavity

    def inference(self, kern, X, Z, likelihood, Y, mean_function=None,
                  Y_metadata=None, qX=None):
        assert mean_function is None
        M = Z.shape[0]
        Kmm = kern.K(Z) + CONST_JITTER * jnp.eye(M, dtype=Z.dtype)
        # fused factor+inverse with matmul-only VJP (util.linalg); the
        # (M, N) whitening is a matmul on the MXU instead of a
        # sequential-blocked N-RHS trsm
        Lm, Lmi = jitchol_and_inv(Kmm)
        Kmn = kern.K(Z, X)
        R = Lmi @ Kmn  # (M, N)
        N = R.shape[1]
        cache = self._site_cache
        if (self._frozen or getattr(self, "_loading", False)) and cache is not None and cache[0] == N:
            tau = jnp.asarray(cache[1], dtype=R.dtype)
            v = jnp.asarray(cache[2], dtype=R.dtype)
        else:
            tau, v, _ = self._converge_sites(R, likelihood, Y, Y_metadata)
            import jax.core as _jcore
            import numpy as _onp

            if not isinstance(tau, _jcore.Tracer):
                self.__dict__["_site_cache"] = (N, _onp.asarray(tau), _onp.asarray(v))
        log_marginal = self._log_marginal(R, likelihood, Y, Y_metadata, tau, v)
        # posterior container over Z
        _, _, m_w, S_w, _ = _posterior_w(R, tau, v)
        wv = jsl.solve_triangular(Lm, m_w[:, None], lower=True, trans=1)
        tmp = jsl.solve_triangular(Lm, jnp.eye(M, dtype=Z.dtype) - S_w, lower=True, trans=1)
        wi = jsl.solve_triangular(Lm, tmp.T, lower=True, trans=1).T
        posterior = Posterior(woodbury_vector=wv, woodbury_inv=0.5 * (wi + wi.T), K=Kmm)
        return posterior, log_marginal

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None,
                            Y_metadata=None, qX=None):
        return self.inference(kern, X, Z, likelihood, Y, mean_function, Y_metadata)[1]
