"""IBPLFM — Indian Buffet Process latent force model.

Reference: GPy/models/ibp_lfm.py (IBPLFM:467, IBPPosterior:378, IBPPrior:418,
VarDTC_minibatch_IBPLFM:19): outputs driven by latent forces through the
second-order LFM kernel (EQ_ODE2), with a spike-and-slab variational
posterior gamma_{dq} over which force q drives which output d, under an
IBP(alpha) prior.

Exact spike-and-slab expectations matching the reference's
VarDTC_minibatch_IBPLFM.gatherPsiStat (ibp_lfm.py:28-100):
  * psi0 = sum_nq gamma_{d_n q} Kdiag^{(q)}(t_n) — per-force diagonal from
    EQ_ODE2.Kdiag_per_force;
  * psi1 = E[Kfu] = gamma-gated Kfu (linear in the Bernoulli gates);
  * psi2 = sum_d Kfu_d' W_d Kfu_d  ∘  Zp2_d with the exact Bernoulli second
    moment Zp2 = g g' - diag(g^2) + diag(g) (reference ibp_lfm.py:73-78).
The IBP prior uses the reference's finite Beta-Bernoulli approximation
(pi_q ~ Beta(alpha/R, 1)) with a variational Beta posterior
q(pi_q) = Beta(tau_1q, tau_2q); the added ELBO term is E_q[log p(Z|pi)] +
E_q[log p(pi)] + H[q(Z)] + H[q(pi)] (reference IBPPrior.KL_divergence,
ibp_lfm.py:426-449). Gradients of everything (gamma, tau, EQ_ODE2
hyperparameters, Z) are autodiff.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.sparse_gp import SparseGP
from ..core.transformations import Logistic
from ..inference.var_dtc import VarDTC
from ..kern.eq_ode2 import EQ_ODE2
from ..likelihoods import Gaussian

__all__ = ["IBPLFM"]


class IBPLFM(SparseGP):
    def __init__(self, X, Y, input_dim=2, output_dim=1, rank=1, Gamma=None,
                 num_inducing=10, Z=None, kernel=None, likelihood=None,
                 alpha=2.0, name="IBP for LFM"):
        X = np.asarray(X, dtype=float)
        Y = np.asarray(Y, dtype=float)
        if kernel is None:
            kernel = EQ_ODE2(input_dim, output_dim, rank)
        self.rank = int(rank)
        self.output_dim_lfm = int(output_dim)
        self.alpha = float(alpha)
        if Gamma is None:
            rng = np.random.default_rng(0)
            Gamma = np.clip(0.5 + 0.1 * rng.standard_normal((output_dim, rank)), 1e-6, 1 - 1e-6)
        if Z is None:
            # inducing inputs live on the latent-force side: times spanning the
            # data with force indices >= output_dim (EQ_ODE2 convention)
            rng = np.random.default_rng(1)
            tmin, tmax = X[:, 0].min(), X[:, 0].max()
            tz = np.linspace(tmin, tmax, num_inducing)
            qz = rng.integers(0, rank, num_inducing)
            Z = np.stack([tz, output_dim + qz.astype(float)], axis=1)
        likelihood = likelihood or Gaussian(variance=0.1 * float(np.var(Y)))
        super().__init__(X, Y, Z, kernel, likelihood,
                         inference_method=_GatedVarDTC(), name=name)
        # static index structure (the index columns are discrete; only the
        # inducing *times* are continuous — as in the reference, Z indices
        # are never optimized)
        self._Z_qidx = np.int_(np.round(np.asarray(Z)[:, 1])) - output_dim
        self._X_didx = np.int_(np.round(np.asarray(X)[:, 1]))
        self._add_param("gamma", np.asarray(Gamma, dtype=float),
                        transform=Logistic(1e-9, 1 - 1e-9))
        from ..core.transformations import Logexp

        # variational Beta posterior over inclusion probabilities pi_q
        # (GPy: IBPPosterior.tau, ibp_lfm.py:389-394)
        self._add_param("tau", np.ones((2, rank)), transform=Logexp())

    def _ibp_elbo_term(self):
        """E_q[log p(Z|pi) + log p(pi)] + H[q(Z)] + H[q(pi)] under the finite
        Beta-Bernoulli IBP approximation pi_q ~ Beta(alpha/R, 1).

        Term-for-term the reference's IBPPrior.KL_divergence
        (ibp_lfm.py:426-449); added to the collapsed bound."""
        from jax.scipy.special import digamma, gammaln

        g = jnp.asarray(self.gamma)
        tau = jnp.asarray(self.tau)
        D, R = g.shape
        ad = self.alpha / R
        sum_g = jnp.sum(g, axis=0)
        psi1 = digamma(tau[0])
        psi2 = digamma(tau[1])
        sumtau = tau[0] + tau[1]
        psit = digamma(sumtau)
        # E[log p(Z | pi)] + E[log p(pi)]
        part1 = jnp.sum(sum_g * psi1 + (D - sum_g) * psi2 - D * psit)
        part1 += (ad - 1.0) * jnp.sum(psi1 - psit) + R * jnp.log(ad)
        # H[q(Z)] + H[q(pi)]
        part2 = jnp.sum(-(1.0 - g) * jnp.log1p(-g) - g * jnp.log(g))
        part2 += jnp.sum(
            gammaln(tau[0]) + gammaln(tau[1]) - gammaln(sumtau)
            - (tau[0] - 1.0) * psi1 - (tau[1] - 1.0) * psi2
            + (sumtau - 2.0) * psit
        )
        return part1 + part2

    def log_likelihood(self):
        bound = self.inference_method.marginal_likelihood(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, None, self.Y_metadata, gates=jnp.asarray(self.gamma),
            output_dim=self.output_dim_lfm, d_idx=self._X_didx, q_idx=self._Z_qidx,
        )
        return bound + self._ibp_elbo_term()

    @property
    def gates(self):
        """Posterior inclusion probabilities (D, R). GPy: m.Zp.gamma."""
        return np.asarray(self.gamma)


class _GatedVarDTC(VarDTC):
    """Collapsed VarDTC over expected (gated) LFM kernel matrices."""

    def marginal_likelihood(self, kern, X, Z, likelihood, Y, mean_function=None,
                            Y_metadata=None, qX=None, gates=None, output_dim=None,
                            d_idx=None, q_idx=None):
        import jax.scipy.linalg as jsl
        from ..util.linalg import jitchol

        assert gates is not None
        N, D_out = Y.shape
        M = Z.shape[0]
        t = jnp.asarray(X[:, 0])
        tz = jnp.asarray(Z[:, 0])
        W = 1.0 / likelihood.noise_diagonal(N, Y_metadata)

        Kuu = kern._Kuu(tz, jnp.asarray(q_idx)) + 1e-6 * jnp.eye(M)
        Kfu_raw = kern._Kfu(t, jnp.asarray(d_idx), tz, jnp.asarray(q_idx))
        G = gates[jnp.asarray(d_idx)][:, jnp.asarray(q_idx)]  # (N, M)
        Kfu = G * Kfu_raw  # psi1 = E[Kfu] (linear in the gates)

        # exact psi0: per-force diagonal gated by E[z] = gamma
        # (reference gatherPsiStat: psi0_full += sum(psi0 * Zp[indX]) * b)
        kdiag_pf = kern.Kdiag_per_force(t, jnp.asarray(d_idx))  # (N, R)
        psi0_w = jnp.sum(W * jnp.sum(gates[jnp.asarray(d_idx)] * kdiag_pf, axis=1))

        # exact psi2 with the Bernoulli second moment
        # Zp2 = g g' - diag(g^2) + diag(g), applied per output block
        # (reference gatherPsiStat: psi2_full += (psi1d' psi1d) * Zp2 * b)
        D_lfm = int(gates.shape[0])
        q_idx_j = jnp.asarray(q_idx)
        psi2_w = jnp.zeros((M, M), dtype=Kfu_raw.dtype)
        for d in range(D_lfm):
            wd = W * (jnp.asarray(d_idx) == d)
            P = Kfu_raw.T @ (wd[:, None] * Kfu_raw)
            gd = gates[d]
            Zp2 = jnp.outer(gd, gd) - jnp.diag(gd**2) + jnp.diag(gd)
            psi2_w = psi2_w + P * Zp2[q_idx_j][:, q_idx_j]

        L = jitchol(Kuu)
        # A2 = L^-1 psi2_w L^-T
        half = jsl.solve_triangular(L, psi2_w, lower=True)
        A2 = jsl.solve_triangular(L, half.T, lower=True).T
        A2 = 0.5 * (A2 + A2.T)
        B = jnp.eye(M) + A2
        LB = jitchol(B)
        psi1WY = Kfu.T @ (W[:, None] * Y)
        c = jsl.solve_triangular(LB, jsl.solve_triangular(L, psi1WY, lower=True), lower=True)
        LOG_2_PI = float(np.log(2 * np.pi))
        return (
            -0.5 * N * LOG_2_PI
            + 0.5 * jnp.sum(jnp.log(W))
            - jnp.sum(jnp.log(jnp.diagonal(LB)))
            - 0.5 * jnp.sum(W[:, None] * Y * Y)
            + 0.5 * jnp.sum(c * c)
            - 0.5 * (psi0_w - jnp.trace(A2))
        )
