"""State-space (SDE) forms for kernels without exact finite-dimensional ones.

Reference: GPy/kern/src/sde_stationary.py (sde_RBF — Taylor/spectral
factorization approximation), sde_standard_periodic.py (harmonic oscillator
expansion, Solin & Sarkka 2014), sde_static.py (sde_Bias).

TPU design: the spectral factorization of the RBF approximation is done ONCE
at import on a *universal* (lengthscale-free) polynomial — its roots scale
as 1/lengthscale, so the companion-form coefficients are differentiable
closed forms in the hyperparameters; Pinf comes from a tiny differentiable
Lyapunov solve. No numpy root-finding appears inside traced code.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "rbf_sde",
    "std_periodic_sde",
    "bias_sde",
    "linear_sde",
    "brownian_sde",
    "ratquad_sde",
    "attach_sde",
]

_RBF_ORDER = 6

# --- universal RBF factorization (computed once, lengthscale-free) ---------
# 1/S(omega) ~ sum_k (l^2 omega^2 / 2)^k / k!; with z = l*omega/sqrt(2) the
# polynomial P(z) = sum_k z^{2k}/k! is universal. Roots scale as sqrt(2)/l.


def _universal_rbf_coeffs(K=_RBF_ORDER):
    # polynomial in y = s*l/sqrt(2): sum_k (-1)^k y^{2k} / k!   (s = i*omega
    # flips the sign of omega^2 terms alternately)
    coeffs = np.zeros(2 * K + 1)
    for k in range(K + 1):
        coeffs[2 * k] = (-1.0) ** k / math.factorial(k)
    # polynomial in z, ascending -> np.roots wants descending
    roots = np.roots(coeffs[::-1])
    lhp = roots[roots.real < 0]
    assert len(lhp) == K
    # monic polynomial coefficients with these roots (real by conjugacy)
    mono = np.poly(lhp)  # descending, length K+1, complex -> real
    return np.real(mono[::-1])  # ascending: u_0 ... u_K (u_K = 1)


_RBF_U = _universal_rbf_coeffs()


def rbf_sde(variance, lengthscale, K=_RBF_ORDER):
    """(F, L, Qc, H, Pinf) for the order-K RBF approximation.

    GPy: sde_stationary.py sde_RBF (order-10 Taylor). Differentiable in
    (variance, lengthscale)."""
    v = jnp.asarray(variance)
    l = jnp.asarray(lengthscale).reshape(-1)[0]
    alpha = jnp.sqrt(2.0) / l
    # Balanced realization: the raw companion form has entries ~alpha^K
    # (overflows expm for small lengthscales, e.g. RatQuad mixture tails).
    # With z_i = x_i / alpha^i the dynamics become F = alpha * C where C is
    # the CONSTANT companion matrix of the universal polynomial, L = e_{K-1},
    # and the diffusion picks up alpha^{-2(K-1)}; H and Pinf[0,0] = v are
    # unchanged. max|F| ~ alpha instead of alpha^K.
    u = jnp.asarray(_RBF_U)
    C = jnp.zeros((K, K)).at[:-1, 1:].set(jnp.eye(K - 1)).at[-1, :].set(-u[:K])
    F = alpha * C
    L = jnp.zeros((K, 1)).at[-1, 0].set(1.0)
    H = jnp.zeros((1, K)).at[0, 0].set(1.0)
    q = v * l * jnp.sqrt(2 * jnp.pi) * float(math.factorial(K)) * (2.0 / l**2) ** K
    Qc = (q / alpha ** (2 * (K - 1))).reshape(1, 1)
    # Pinf: solve F P + P F' + L q L' = 0  (Lyapunov, differentiable)
    eyeK = jnp.eye(K)
    A = jnp.kron(eyeK, F) + jnp.kron(F, eyeK)
    b = -(L @ Qc @ L.T).reshape(-1)
    from ..util.linalg import solve_lu_safe
    Pinf = solve_lu_safe(A, b).reshape(K, K)
    Pinf = 0.5 * (Pinf + Pinf.T)
    return F, L, Qc, H, Pinf


def _bessel_i(j, x, terms=30):
    """Modified Bessel I_j(x) by series (small orders, moderate x)."""
    m = jnp.arange(terms)
    log_terms = (2 * m + j) * jnp.log(x / 2.0) - jax.scipy.special.gammaln(m + 1.0) \
        - jax.scipy.special.gammaln(m + j + 1.0)
    return jnp.sum(jnp.exp(log_terms))


def std_periodic_sde(variance, period, lengthscale, n_harmonics=7):
    """(F, L, Qc, H, Pinf) for StdPeriodic via the harmonic expansion
    (Solin & Sarkka 2014; GPy: sde_standard_periodic.py).

    StdPeriodic's exponent -0.5 sin^2(pi tau/T)/l^2 equals
    (cos(w0 tau) - 1) * a with a = 1/(4 l^2), so the harmonic weights are
    q_j = eps_j I_j(a) e^{-a} (eps_0 = 1, eps_j = 2)."""
    v = jnp.asarray(variance)
    T = jnp.asarray(period).reshape(-1)[0]
    l = jnp.asarray(lengthscale).reshape(-1)[0]
    x = 1.0 / (4.0 * l**2)
    w0 = 2.0 * jnp.pi / T
    Fs, Ps = [], []
    for j in range(n_harmonics):
        qj = (1.0 if j == 0 else 2.0) * _bessel_i(j, x) * jnp.exp(-x) * v
        Fj = jnp.asarray([[0.0, -1.0], [1.0, 0.0]]) * (w0 * j)
        Fs.append(Fj)
        Ps.append(qj * jnp.eye(2))
    F = jax.scipy.linalg.block_diag(*Fs)
    Pinf = jax.scipy.linalg.block_diag(*Ps)
    s = 2 * n_harmonics
    L = jnp.eye(s)
    Qc = jnp.zeros((s, s))
    H = jnp.zeros((1, s)).at[0, ::2].set(1.0)
    return F, L, Qc, H, Pinf


def bias_sde(variance):
    """Constant-offset kernel: one static state. GPy: sde_static.py."""
    v = jnp.asarray(variance)
    return (
        jnp.zeros((1, 1)),
        jnp.ones((1, 1)),
        jnp.zeros((1, 1)),
        jnp.ones((1, 1)),
        v.reshape(1, 1),
    )


def linear_sde(variances, t0=0.0):
    """Linear kernel k(s,t)=v*s*t as an SDE: f(t)=f0+(t-t0)*b with
    [f0, b] ~ N(0, v*[[t0^2, t0],[t0, 1]]).

    Nonstationary: returns the 6-tuple (F, L, Qc, H, Pinf, P0) with
    Pinf = 0 (no stationary distribution) and the exact initial P0 at the
    first filter time t0. cov(f(s), f(t)) = v*s*t exactly for all s,t.
    GPy: sde_linear.py:44-66 (which requires X at kernel construction to
    fix t0; here t0 flows in from the filter so prediction at times before
    min(X) stays exact).
    """
    v = jnp.asarray(variances).reshape(-1)[0]
    t0 = jnp.asarray(t0)
    F = jnp.asarray([[0.0, 1.0], [0.0, 0.0]])
    L = jnp.asarray([[0.0], [1.0]])
    Qc = jnp.zeros((1, 1))
    H = jnp.asarray([[1.0, 0.0]])
    Pinf = jnp.zeros((2, 2))
    P0 = v * jnp.stack([jnp.stack([t0 * t0, t0]), jnp.stack([t0, jnp.ones_like(t0)])])
    return F, L, Qc, H, Pinf, P0


def brownian_sde(variance, t0=0.0):
    """Brownian motion k(s,t)=v*min(s,t) (t >= 0): df = dW, one state.

    Exact 1-state form (the reference uses a 2-state workaround so that its
    Q = Pinf - A Pinf A' discretization produces Q = v*dt; with Van Loan
    discretization the direct form works: GPy sde_brownian.py:35-59).
    P0 = v*max(t0, 0) makes the filter exact when the first time is > 0
    (the reference hard-codes P0 = 0, i.e. assumes t0 = 0).

    Limitation (shared with the reference): only valid for times >= 0.
    The dense Brownian kernel k = v*min(|x|,|x'|)*[sign match] reflects
    around 0; the forward-time SDE cannot represent that, so StateSpace
    with negative inputs will disagree with the dense GP.
    """
    v = jnp.asarray(variance)
    t0 = jnp.asarray(t0)
    t0p = jnp.where(t0 < 0, 0.0, t0)  # where: clean gradient at the 0 tie
    F = jnp.zeros((1, 1))
    L = jnp.ones((1, 1))
    Qc = v.reshape(1, 1)
    H = jnp.ones((1, 1))
    Pinf = jnp.zeros((1, 1))
    P0 = (v * t0p).reshape(1, 1)
    return F, L, Qc, H, Pinf, P0


def ratquad_sde(variance, lengthscale, power, n_nodes=12, scale=1.3,
                rbf_order=_RBF_ORDER):
    """(F, L, Qc, H, Pinf) for RatQuad as a Gamma scale mixture of RBF SDEs.

    k(r) = v (1 + r^2/2)^-p is exactly E_{u~Gamma(p,1)}[v e^{-u r^2/2}], i.e.
    an inverse-squared-lengthscale mixture of RBFs with lengthscale l/sqrt(u).
    Substituting u = e^s makes the mixing weight e^{p s - e^s} log-concave
    with mode ln p and curvature p; Gauss-Hermite nodes placed at
    s_j = ln p + scale * h_j / sqrt(p) then sample the lengthscale mixture
    evenly across DECADES, which is what the power-law tail needs (plain
    Gauss-Laguerre puts no nodes at small u and loses the tail: rel. error
    ~0.5 at tau = 4l vs ~2e-3 here at n_nodes=12). Node positions are
    closed-form differentiable in the (trainable) power p. Each node becomes
    an order-`rbf_order` balanced RBF SDE block, stacked block-diagonally.

    The reference declares this unimplemented (GPy sde_stationary.py:236-241
    `assert False, 'Not Implemented'`) — this is a capability beyond parity.
    """
    v = jnp.asarray(variance)
    l = jnp.asarray(lengthscale).reshape(-1)[0]
    p = jnp.asarray(power).reshape(-1)[0]
    h, om = np.polynomial.hermite_e.hermegauss(n_nodes)  # weight e^{-h^2/2}
    h, om = jnp.asarray(h), jnp.asarray(om)
    s = jnp.log(p) + scale * h / jnp.sqrt(p)
    u = jnp.exp(s)
    # log-domain weights, max-shifted before exp: the raw magnitude is
    # ~e^{p ln p - p} (e.g. e^393 at p=107), which normalizes fine in value
    # but destroys the autodiff VJP's precision (measured: dNLML/dp wrong by
    # 100x at p~100). The shift is a stop_gradient constant, so the
    # normalized weights' derivative is unchanged.
    lw = jnp.log(om) + p * s - u + h**2 / 2.0
    w = jnp.exp(lw - jax.lax.stop_gradient(jnp.max(lw)))
    w = w / jnp.sum(w)  # normalized: k(0) = v exactly
    Fs, Ls, Qs, Ps, Hs = [], [], [], [], []
    for j in range(n_nodes):
        Fj, Lj, Qj, Hj, Pj = rbf_sde(v * w[j], l / jnp.sqrt(u[j]), K=rbf_order)
        Fs.append(Fj), Ls.append(Lj), Qs.append(Qj), Ps.append(Pj), Hs.append(Hj)
    F = jax.scipy.linalg.block_diag(*Fs)
    L = jax.scipy.linalg.block_diag(*Ls)
    Qc = jax.scipy.linalg.block_diag(*Qs)
    Pinf = jax.scipy.linalg.block_diag(*Ps)
    H = jnp.concatenate(Hs, axis=1)
    return F, L, Qc, H, Pinf


def attach_sde():
    """Attach sde() methods to RBF / StdPeriodic / Bias / Linear / Brownian /
    RatQuad."""
    from .stationary import RBF, RatQuad
    from .periodic import StdPeriodic
    from .static import Bias
    from .linear import Linear
    from .misc import Brownian

    RBF.sde = lambda self: rbf_sde(self.variance, self.lengthscale)
    RatQuad.sde = lambda self: ratquad_sde(self.variance, self.lengthscale,
                                           self.power)
    StdPeriodic.sde = lambda self: std_periodic_sde(
        self.variance, self.period, self.lengthscale
    )
    Bias.sde = lambda self: bias_sde(self.variance)
    Linear.sde = lambda self, t0=0.0: linear_sde(self.variances, t0)
    Brownian.sde = lambda self, t0=0.0: brownian_sde(self.variance, t0)


attach_sde()
