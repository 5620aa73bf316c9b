"""Priors attachable to parameters (MAP term in the objective).

Reference: GPy/core/parameterization/priors.py (Gaussian:41, Uniform:98,
LogGaussian:148, MultivariateGaussian:199, Gamma:291, InverseGamma:382,
HalfT:1260, Exponential:1340, StudentT:1388). In GPy each prior also carries
hand-written `lnpdf_grad`; here only `lnpdf` is needed — autodiff supplies
the gradient through the constraint bijector.

The DGPLVM discriminative priors (priors.py:416-1258) are matrix-valued MAP
terms over the GPLVM latent X; see the bottom of this file (scatter matrices
as one-hot einsums, gradients by autodiff).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = [
    "Prior",
    "Gaussian",
    "Uniform",
    "LogGaussian",
    "MultivariateGaussian",
    "Gamma",
    "InverseGamma",
    "Exponential",
    "StudentT",
    "HalfT",
    "DGPLVM",
    "DGPLVM_Lamda",
    "DGPLVM_T",
    "DGPLVM_KFDA",
]


class Prior:
    domain = "real"

    def lnpdf(self, x):
        raise NotImplementedError

    def pdf(self, x):
        return jnp.exp(self.lnpdf(x))

    def rvs(self, n, rng=None):
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__


class Gaussian(Prior):
    def __init__(self, mu=0.0, sigma=1.0):
        self.mu, self.sigma = float(mu), float(sigma)

    def lnpdf(self, x):
        return -0.5 * jnp.log(2 * jnp.pi * self.sigma**2) - 0.5 * ((x - self.mu) / self.sigma) ** 2

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return rng.normal(self.mu, self.sigma, n)

    def __repr__(self):
        return f"N({self.mu}, {self.sigma**2})"


class Uniform(Prior):
    def __init__(self, lower=0.0, upper=1.0):
        self.lower, self.upper = float(lower), float(upper)

    def lnpdf(self, x):
        inside = (x >= self.lower) & (x <= self.upper)
        return jnp.where(inside, -jnp.log(self.upper - self.lower), -jnp.inf)

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return rng.uniform(self.lower, self.upper, n)


class LogGaussian(Prior):
    domain = "positive"

    def __init__(self, mu=0.0, sigma=1.0):
        self.mu, self.sigma = float(mu), float(sigma)

    def lnpdf(self, x):
        lx = jnp.log(x)
        return (
            -0.5 * jnp.log(2 * jnp.pi * self.sigma**2)
            - lx
            - 0.5 * ((lx - self.mu) / self.sigma) ** 2
        )

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return np.exp(rng.normal(self.mu, self.sigma, n))


class MultivariateGaussian(Prior):
    def __init__(self, mu, var):
        self.mu = jnp.asarray(mu)
        self.var = jnp.asarray(var)
        self._L = jnp.linalg.cholesky(self.var)
        self._logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(self._L)))

    def lnpdf(self, x):
        d = jnp.reshape(x, (-1,)) - self.mu
        import jax.scipy.linalg as jsl

        a = jsl.solve_triangular(self._L, d, lower=True)
        k = self.mu.shape[0]
        return -0.5 * (k * jnp.log(2 * jnp.pi) + self._logdet + jnp.sum(a**2))


class Gamma(Prior):
    """Shape/rate parameterization (GPy: priors.py:291 — a=shape, b=rate)."""

    domain = "positive"

    def __init__(self, a=1.0, b=0.5):
        self.a, self.b = float(a), float(b)

    @staticmethod
    def from_EV(E, V):
        """GPy: Gamma.from_EV — construct from mean and variance."""
        a = E**2 / V
        b = E / V
        return Gamma(a, b)

    def lnpdf(self, x):
        return self.a * jnp.log(self.b) - gammaln(self.a) + (self.a - 1) * jnp.log(x) - self.b * x

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return rng.gamma(self.a, 1.0 / self.b, n)

    def __repr__(self):
        return f"Ga({self.a}, {self.b})"


class InverseGamma(Prior):
    domain = "positive"

    def __init__(self, a=1.0, b=0.5):
        self.a, self.b = float(a), float(b)

    def lnpdf(self, x):
        return self.a * jnp.log(self.b) - gammaln(self.a) - (self.a + 1) * jnp.log(x) - self.b / x


class Exponential(Prior):
    domain = "positive"

    def __init__(self, l=1.0):
        self.l = float(l)

    def lnpdf(self, x):
        return jnp.log(self.l) - self.l * x

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return rng.exponential(1.0 / self.l, n)


class StudentT(Prior):
    def __init__(self, mu=0.0, sigma=1.0, nu=4.0):
        self.mu, self.sigma, self.nu = float(mu), float(sigma), float(nu)

    def lnpdf(self, x):
        z = (x - self.mu) / self.sigma
        return (
            gammaln((self.nu + 1) / 2.0)
            - gammaln(self.nu / 2.0)
            - 0.5 * jnp.log(self.nu * jnp.pi * self.sigma**2)
            - (self.nu + 1) / 2.0 * jnp.log1p(z**2 / self.nu)
        )


class HalfT(Prior):
    domain = "positive"

    def __init__(self, A=1.0, nu=4.0):
        self.A, self.nu = float(A), float(nu)

    def lnpdf(self, x):
        base = (
            gammaln((self.nu + 1) / 2.0)
            - gammaln(self.nu / 2.0)
            - 0.5 * jnp.log(self.nu * jnp.pi * self.A**2)
            + jnp.log(2.0)
            - (self.nu + 1) / 2.0 * jnp.log1p((x / self.A) ** 2 / self.nu)
        )
        return jnp.where(x > 0, base, -jnp.inf)


# --- Discriminative GPLVM priors over whole latent matrices -----------------
# Reference: GPy/core/parameterization/priors.py DGPLVM_KFDA:416, DGPLVM:570,
# DGPLVM_Lamda:786, DGPLVM_T:1033. These are matrix-valued MAP terms attached
# to the latent X of a GPLVM: lnpdf(x) reshapes the (possibly flat) latent to
# x_shape and returns a scalar. Gradients come from autodiff (the reference
# hand-codes ~200 lines of lnpdf_grad per class); the scatter matrices are
# one-hot einsums instead of per-point python loops, so the whole term jits.


def _class_scatter(x, onehot):
    """Between/within-class scatter (Sb, Sw) weighted as the reference does.

    onehot: (N, C) one-hot labels. Sb = sum_c (N_c/N) (M_c-M0)(M_c-M0)^T,
    Sw = (1/N) sum_k (x_k - M_{c(k)})(x_k - M_{c(k)})^T.
    """
    onehot = jnp.asarray(onehot, dtype=x.dtype)
    N = x.shape[0]
    n_c = jnp.sum(onehot, axis=0)  # (C,)
    M = (onehot.T @ x) / n_c[:, None]  # class means (C, Q)
    M0 = jnp.mean(x, axis=0)
    dB = M - M0[None, :]
    Sb = (dB * (n_c / N)[:, None]).T @ dB
    xc = x - onehot @ M  # per-point deviation from its class mean
    Sw = (xc.T @ xc) / N
    return Sb, Sw


class DGPLVM(Prior):
    """Discriminative GPLVM prior (Urtasun & Darrell): lnpdf =
    -(1/sigma2) tr((Sb + 0.1 I)^-1 Sw). Reference: priors.py:570-788."""

    domain = "real"

    def __init__(self, sigma2, lbl, x_shape):
        self.sigma2 = float(sigma2)
        self.lbl = np.asarray(lbl)
        self.x_shape = tuple(x_shape)
        self.ridge = 0.1

    def _xprime(self, x):
        return x

    def lnpdf(self, x):
        x = jnp.asarray(x).reshape(self.x_shape)
        x = self._xprime(x)
        Sb, Sw = _class_scatter(x, self.lbl)
        Q = Sb.shape[0]
        # SPD solve via Cholesky (reference uses pdinv, priors.py:734);
        # generic LU lowers to LuDecomposition which TPU only implements
        # for f32/c64 — found by the r5 on-chip zoo sweep
        from jax.scipy.linalg import cho_factor, cho_solve
        sol = cho_solve(cho_factor(Sb + self.ridge * jnp.eye(Q, dtype=x.dtype),
                                   lower=True), Sw)
        return (-1.0 / self.sigma2) * jnp.trace(sol)

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return rng.random(n)

    def __repr__(self):
        return "DGPLVM_prior_Raq"


class DGPLVM_Lamda(DGPLVM):
    """DGPLVM with a per-dimension scaling x' = x diag(lamda) and ridge 0.9.
    Reference: priors.py:786-1030. The reference trains `lamda` as a Param;
    here it is a (differentiable) attribute — update it manually or link it
    as a model parameter to optimize it."""

    def __init__(self, sigma2, lbl, x_shape, lamda, name="DP_prior"):
        super().__init__(sigma2, lbl, x_shape)
        self.lamda = jnp.asarray(np.diag(np.atleast_2d(lamda))
                                 if np.ndim(lamda) == 2 else lamda)
        self.ridge = 0.9
        self.name = name

    def _xprime(self, x):
        return x * self.lamda[None, :]

    def __repr__(self):
        return "DGPLVM_prior_Raq_Lamda"


class DGPLVM_T(DGPLVM):
    """DGPLVM on a fixed projection x' = x @ vec. Reference: priors.py:1033-1258."""

    def __init__(self, sigma2, lbl, x_shape, vec):
        super().__init__(sigma2, lbl, x_shape)
        self.vec = jnp.asarray(vec)

    def _xprime(self, x):
        return x @ self.vec

    def __repr__(self):
        return "DGPLVM_prior_Raq_TTT"


class DGPLVM_KFDA(Prior):
    """Kernel Fisher discriminant DGPLVM prior (binary labels):
    J* = (1/lambda) (a^T K a - a^T K A (lambda I + A K A)^-1 A K a),
    lnpdf = -(1/sigma2) J*. Reference: priors.py:416-568.

    The reference builds `a`/`A` positionally assuming rows sorted by class
    (wrong for interleaved labels); here they are built per-index so the
    prior is order-independent (identical when sorted).
    """

    domain = "real"

    def __init__(self, lambdaa, sigma2, lbl, kern, x_shape):
        lbl = np.asarray(lbl)
        self.datanum, self.classnum = lbl.shape
        if self.classnum < 2:
            raise ValueError("DGPLVM_KFDA needs two label columns")
        self.lambdaa = float(lambdaa)
        self.sigma2 = float(sigma2)
        self.lbl = lbl
        self.kern = kern
        self.x_shape = tuple(x_shape)
        c0 = lbl[:, 0] == 1
        c1 = lbl[:, 1] == 1
        n0, n1 = float(c0.sum()), float(c1.sum())
        self.a = jnp.asarray(np.where(c0, 1.0 / n0, np.where(c1, -1.0 / n1, 0.0))[:, None])
        A = np.zeros((self.datanum, self.datanum))
        for mask, n in ((c0, n0), (c1, n1)):
            idx = np.where(mask)[0]
            A[np.ix_(idx, idx)] = (np.eye(len(idx)) - 1.0 / n) / np.sqrt(n)
        self.A = jnp.asarray(A)

    def lnpdf(self, x):
        x = jnp.asarray(x).reshape(self.x_shape)
        K = self.kern.K(x)
        AK = self.A @ K
        AKa = AK @ self.a
        P = self.lambdaa * jnp.eye(self.datanum, dtype=K.dtype) + AK @ self.A
        # SPD solve via Cholesky (reference: pdinv, priors.py:527)
        from jax.scipy.linalg import cho_factor, cho_solve
        J = self.a.T @ K @ self.a - AKa.T @ cho_solve(cho_factor(P, lower=True), AKa)
        return jnp.squeeze((-1.0 / self.sigma2) * J / self.lambdaa)

    def rvs(self, n, rng=None):
        rng = rng or np.random.default_rng()
        return rng.random(n)

    def __repr__(self):
        return "DGPLVM_prior"
