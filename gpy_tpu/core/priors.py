"""Priors attachable to parameters (MAP term in the objective).

Reference: GPy/core/parameterization/priors.py (Gaussian:41, Uniform:98,
LogGaussian:148, MultivariateGaussian:199, Gamma:291, InverseGamma:382,
HalfT:1260, Exponential:1340, StudentT:1388). In GPy each prior also carries
hand-written `lnpdf_grad`; here only `lnpdf` is needed — autodiff supplies
the gradient through the constraint bijector.

The DGPLVM discriminative priors (priors.py:416-1258) are specialist research
code operating on whole latent matrices; `MultivariateGaussian` below covers
the mechanism (matrix-valued prior) — the KFDA variants are out of scope.
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
