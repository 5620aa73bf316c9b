"""Non-Gaussian likelihood families.

Reference: GPy/likelihoods/{poisson,binomial,exponential,gamma,student_t,
weibull,loglogistic,loggaussian}.py. Each reference file hand-implements a
tower of up to 15 derivative methods (dlogpdf_dlink ... d3logpdf_dlink3 and
the dtheta variants); here each family is just `logpdf_link` +
conditional moments — everything else is autodiff + the base quadrature.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, log_ndtr

from ..core.transformations import Logexp
from .likelihood import Likelihood
from .link_functions import Log, Probit, Identity

__all__ = [
    "Poisson",
    "Binomial",
    "Exponential",
    "Gamma",
    "StudentT",
    "Weibull",
    "LogLogistic",
    "LogGaussian",
]


def _censoring(y, Y_metadata):
    if Y_metadata is not None and "censored" in Y_metadata:
        return jnp.asarray(Y_metadata["censored"])
    return jnp.zeros_like(jnp.asarray(y))


class Poisson(Likelihood):
    """GPy: poisson.py. Default Log link; rate = link_f."""

    log_concave = True  # W >= 0 everywhere (Laplace chol path)

    def __init__(self, gp_link=None, name="Poisson"):
        super().__init__(gp_link or Log(), name=name)

    def logpdf_link(self, link_f, y, Y_metadata=None):
        lam = jnp.maximum(link_f, 1e-15)
        return y * jnp.log(lam) - lam - gammaln(y + 1.0)

    def conditional_mean(self, f):
        return self.gp_link.transf(f)

    def conditional_variance(self, f):
        return self.gp_link.transf(f)

    def samples_given_f(self, key, f, Y_metadata=None):
        lam = self.gp_link.transf(f)
        return jax.random.poisson(key, lam).astype(jnp.asarray(f).dtype)


class Binomial(Likelihood):
    """GPy: binomial.py. trials in Y_metadata['trials']; p = link_f (Probit)."""

    def __init__(self, gp_link=None, name="Binomial"):
        super().__init__(gp_link or Probit(), name=name)

    def _trials(self, y, Y_metadata):
        assert Y_metadata is not None and "trials" in Y_metadata, "Binomial needs Y_metadata['trials']"
        return jnp.asarray(Y_metadata["trials"])

    def logpdf_link(self, link_f, y, Y_metadata=None):
        N = self._trials(y, Y_metadata)
        p = jnp.clip(link_f, 1e-12, 1 - 1e-12)
        return (
            gammaln(N + 1)
            - gammaln(y + 1)
            - gammaln(N - y + 1)
            + y * jnp.log(p)
            + (N - y) * jnp.log1p(-p)
        )

    def conditional_mean(self, f):
        # per-unit-trial mean; predictive_values are per metadata at call site
        return self.gp_link.transf(f)

    def conditional_variance(self, f):
        p = self.gp_link.transf(f)
        return p * (1 - p)

    def samples_given_f(self, key, f, Y_metadata=None):
        N = jnp.asarray(Y_metadata["trials"])
        p = self.gp_link.transf(f)
        return jax.random.binomial(key, N, p).astype(jnp.asarray(f).dtype)


class Exponential(Likelihood):
    """GPy: exponential.py:44-61 — rate = link_f: ln p = ln(lam) - y lam."""

    def __init__(self, gp_link=None, name="Exponential"):
        super().__init__(gp_link or Log(), name=name)

    def logpdf_link(self, link_f, y, Y_metadata=None):
        lam = jnp.maximum(link_f, 1e-15)
        return jnp.log(lam) - y * lam

    def conditional_mean(self, f):
        return 1.0 / jnp.maximum(self.gp_link.transf(f), 1e-15)

    def conditional_variance(self, f):
        return 1.0 / jnp.maximum(self.gp_link.transf(f), 1e-15) ** 2

    def samples_given_f(self, key, f, Y_metadata=None):
        lam = self.gp_link.transf(f)
        return jax.random.exponential(key, jnp.shape(f), dtype=jnp.asarray(f).dtype) / lam


class Gamma(Likelihood):
    """GPy: gamma.py:52-74 — alpha = link_f * beta, fixed rate beta."""

    def __init__(self, gp_link=None, beta=1.0, name="Gamma"):
        super().__init__(gp_link or Log(), name=name)
        self._add_param("beta", beta, transform=Logexp(), fixed=True)

    def logpdf_link(self, link_f, y, Y_metadata=None):
        beta = jnp.asarray(self.beta)
        alpha = jnp.maximum(link_f, 1e-15) * beta
        return alpha * jnp.log(beta) - gammaln(alpha) + (alpha - 1) * jnp.log(y) - beta * y

    def conditional_mean(self, f):
        return self.gp_link.transf(f)  # alpha/beta

    def conditional_variance(self, f):
        return self.gp_link.transf(f) / jnp.asarray(self.beta)

    def samples_given_f(self, key, f, Y_metadata=None):
        beta = jnp.asarray(self.beta)
        alpha = self.gp_link.transf(f) * beta
        return jax.random.gamma(key, alpha, dtype=jnp.asarray(f).dtype) / beta


class StudentT(Likelihood):
    """GPy: student_t.py:27 — params t_scale2 (linked) and deg_free (fixed)."""

    def __init__(self, gp_link=None, deg_free=5.0, sigma2=2.0, name="Student_T"):
        super().__init__(gp_link or Identity(), name=name)
        self._add_param("t_scale2", sigma2, transform=Logexp())
        self._add_param("deg_free", float(deg_free), transform=Logexp(), fixed=True)

    @property
    def sigma2(self):
        return jnp.asarray(self.t_scale2)

    def logpdf_link(self, link_f, y, Y_metadata=None):
        s2 = jnp.asarray(self.t_scale2)
        v = jnp.asarray(self.deg_free)
        e = y - link_f
        return (
            gammaln((v + 1) / 2.0)
            - gammaln(v / 2.0)
            - 0.5 * jnp.log(v * jnp.pi * s2)
            - (v + 1) / 2.0 * jnp.log1p(e**2 / (v * s2))
        )

    def conditional_mean(self, f):
        return self.gp_link.transf(f)

    def conditional_variance(self, f):
        v = jnp.asarray(self.deg_free)
        return jnp.broadcast_to(jnp.asarray(self.t_scale2) * v / (v - 2.0), jnp.shape(f))

    def samples_given_f(self, key, f, Y_metadata=None):
        v = jnp.asarray(self.deg_free)
        t = jax.random.t(key, v, jnp.shape(f), dtype=jnp.asarray(f).dtype)
        return self.gp_link.transf(f) + jnp.sqrt(jnp.asarray(self.t_scale2)) * t


class Weibull(Likelihood):
    """GPy: weibull.py — shape r (linked), scale lambda = link_f; censoring
    via Y_metadata['censored'] (1 = right-censored)."""

    def __init__(self, gp_link=None, beta=1.0, name="Weibull"):
        super().__init__(gp_link or Log(), name=name)
        self._add_param("r_shape", beta, transform=Logexp())

    def logpdf_link(self, link_f, y, Y_metadata=None):
        r = jnp.asarray(self.r_shape)
        c = _censoring(y, Y_metadata)
        lam = jnp.maximum(link_f, 1e-15)
        yr = jnp.maximum(y, 1e-15) ** r
        uncens = jnp.log(r) - jnp.log(lam) + (r - 1) * jnp.log(jnp.maximum(y, 1e-15)) - yr / lam
        cens = -yr / lam
        return (1 - c) * uncens + c * cens

    def conditional_mean(self, f):
        r = jnp.asarray(self.r_shape)
        lam = self.gp_link.transf(f)
        return lam ** (1.0 / r) * jnp.exp(gammaln(1 + 1.0 / r))

    def conditional_variance(self, f):
        r = jnp.asarray(self.r_shape)
        lam = self.gp_link.transf(f)
        g1 = jnp.exp(gammaln(1 + 1.0 / r))
        g2 = jnp.exp(gammaln(1 + 2.0 / r))
        return lam ** (2.0 / r) * (g2 - g1**2)

    def samples_given_f(self, key, f, Y_metadata=None):
        r = jnp.asarray(self.r_shape)
        lam = self.gp_link.transf(f)
        u = jax.random.uniform(key, jnp.shape(f), dtype=jnp.asarray(f).dtype)
        return (-lam * jnp.log1p(-u)) ** (1.0 / r)


class LogLogistic(Likelihood):
    """GPy: loglogistic.py:52-88 — shape r (linked), median lambda = link_f."""

    def __init__(self, gp_link=None, r=1.0, name="LogLogistic"):
        super().__init__(gp_link or Log(), name=name)
        self._add_param("r_log_shape", r, transform=Logexp())

    def logpdf_link(self, link_f, y, Y_metadata=None):
        r = jnp.asarray(self.r_log_shape)
        c = _censoring(y, Y_metadata)
        lam = jnp.clip(link_f, 1e-100, 1e100)
        ylam_r = jnp.exp(r * (jnp.log(jnp.maximum(y, 1e-100)) - jnp.log(lam)))
        uncens = (
            jnp.log(r)
            + (r - 1) * jnp.log(jnp.maximum(y, 1e-100))
            - r * jnp.log(lam)
            - 2 * jnp.log1p(ylam_r)
        )
        cens = -jnp.log1p(ylam_r)
        return (1 - c) * uncens + c * cens

    def conditional_mean(self, f):
        r = jnp.asarray(self.r_log_shape)
        lam = self.gp_link.transf(f)
        b = jnp.pi / r
        return lam * b / jnp.sin(b)  # valid for r > 1

    def conditional_variance(self, f):
        r = jnp.asarray(self.r_log_shape)
        lam = self.gp_link.transf(f)
        b = jnp.pi / r
        m = b / jnp.sin(b)
        return lam**2 * (2 * b / jnp.sin(2 * b) - m**2)  # valid for r > 2

    def samples_given_f(self, key, f, Y_metadata=None):
        r = jnp.asarray(self.r_log_shape)
        lam = self.gp_link.transf(f)
        u = jax.random.uniform(key, jnp.shape(f), dtype=jnp.asarray(f).dtype)
        return lam * (u / (1 - u)) ** (1.0 / r)


class LogGaussian(Likelihood):
    """GPy: loggaussian.py:47-65 — log y ~ N(f, sigma2), censoring supported."""

    def __init__(self, gp_link=None, sigma=1.0, name="LogGaussian"):
        super().__init__(gp_link or Identity(), name=name)
        self._add_param("variance", float(sigma) ** 2, transform=Logexp())

    def logpdf_link(self, link_f, y, Y_metadata=None):
        s2 = jnp.asarray(self.variance)
        c = _censoring(y, Y_metadata)
        ly = jnp.log(jnp.maximum(y, 1e-100))
        uncens = -0.5 * jnp.log(2 * jnp.pi * s2) - ly - (ly - link_f) ** 2 / (2 * s2)
        cens = log_ndtr(-(ly - link_f) / jnp.sqrt(s2))
        return (1 - c) * uncens + c * cens

    def conditional_mean(self, f):
        s2 = jnp.asarray(self.variance)
        return jnp.exp(self.gp_link.transf(f) + s2 / 2.0)

    def conditional_variance(self, f):
        s2 = jnp.asarray(self.variance)
        m = self.gp_link.transf(f)
        return (jnp.exp(s2) - 1) * jnp.exp(2 * m + s2)

    def samples_given_f(self, key, f, Y_metadata=None):
        s2 = jnp.asarray(self.variance)
        z = jax.random.normal(key, jnp.shape(f), dtype=jnp.asarray(f).dtype)
        return jnp.exp(self.gp_link.transf(f) + jnp.sqrt(s2) * z)
