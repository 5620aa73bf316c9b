"""Link functions (latent f -> mean-parameter space).

Reference: GPy/likelihoods/link_functions.py (GPTransformation:10,
Identity:77, Probit:109, ScaledProbit:141, Cloglog:174, Log:205,
Log_ex_1:224, Reciprocal:249, Heaviside:265).

Only `transf` is needed — GPy's dtransf_df/d2/d3 towers are autodiff'd away.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import ndtr
from jax.nn import softplus

__all__ = [
    "GPTransformation",
    "Identity",
    "Probit",
    "ScaledProbit",
    "Cloglog",
    "Log",
    "Log_ex_1",
    "Reciprocal",
    "Heaviside",
]


class GPTransformation:
    def transf(self, f):
        raise NotImplementedError

    def __repr__(self):
        return self.__class__.__name__


class Identity(GPTransformation):
    def transf(self, f):
        return f


class Probit(GPTransformation):
    def transf(self, f):
        return ndtr(f)


class ScaledProbit(Probit):
    def __init__(self, nu=1.0):
        self.nu = float(nu)

    def transf(self, f):
        return ndtr(f * self.nu)


class Cloglog(GPTransformation):
    """p = 1 - exp(-exp(f))."""

    def transf(self, f):
        return 1.0 - jnp.exp(-jnp.exp(f))


class Log(GPTransformation):
    def transf(self, f):
        return jnp.exp(f)


class Log_ex_1(GPTransformation):
    """softplus link: log(1+exp(f))."""

    def transf(self, f):
        return softplus(f)


class Reciprocal(GPTransformation):
    def transf(self, f):
        return 1.0 / f


class Heaviside(GPTransformation):
    def transf(self, f):
        return jnp.where(f > 0, 1.0, 0.0)
