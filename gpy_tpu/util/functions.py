"""Small special-function helpers. Reference: GPy/util/functions.py:10-33.

jnp implementations so they are usable inside traced losses.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import erf, log_ndtr, ndtr

__all__ = ["logistic", "logisticln", "normcdf", "normcdfln", "clip_exp", "differfln"]


def logistic(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def logisticln(x):
    """log(logistic(x)) — stable for very negative x."""
    return -jnp.logaddexp(0.0, -x)


def normcdf(x):
    return ndtr(x)


def normcdfln(x):
    """log Phi(x) — stable in the deep tail (log_ndtr)."""
    return log_ndtr(x)


def clip_exp(x, lower=-250.0, upper=250.0):
    return jnp.exp(jnp.clip(x, lower, upper))


def differfln(x0, x1):
    """log(erf(x0) - erf(x1)) for x0 > x1 (stable form in ln_diff_erfs)."""
    from .ln_diff_erfs import ln_diff_erfs

    return ln_diff_erfs(x0, x1)
