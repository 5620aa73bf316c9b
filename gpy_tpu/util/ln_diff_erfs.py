"""Stable log-of-difference-of-erfs (+ erfcx) in jnp.

Reference: GPy/util/ln_diff_erfs.py and the lnDifErf helper in
GPy/kern/src/eq_ode1.py:715. Needed by the latent-force (ODE) kernels.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax.scipy.special import erf, erfc

__all__ = ["erfcx", "ln_diff_erf"]


def erfcx(x):
    """Scaled complementary error function exp(x^2) erfc(x), stable for all x.

    Direct product for |x| <= 25 (both factors representable in f64 there);
    asymptotic series 1/(x sqrt(pi)) * (1 - 1/(2x^2) + 3/(4x^4) - 15/(8x^6))
    beyond.
    """
    x = jnp.asarray(x)
    small = jnp.abs(x) <= 25.0
    xs = jnp.where(small, x, 1.0)
    direct = jnp.exp(xs**2) * erfc(xs)
    xl = jnp.where(small, 26.0, x)
    inv2 = 1.0 / (xl * xl)
    asym = (1.0 + inv2 * (-0.5 + inv2 * (0.75 - 1.875 * inv2))) / (
        xl * np.sqrt(np.pi)
    )
    # large negative x: erfcx = 2 exp(x^2) - erfcx(-x) ~ 2 exp(x^2) (overflow
    # territory; the callers below never hit it because they pass z1 > 0)
    return jnp.where(small, direct, asym)


def ln_diff_erf(z1, z2):
    """log(erf(z2) - erf(z1))-style stable difference used by EQ_ODE kernels.

    Mirrors GPy eq_ode1.lnDifErf(z1, z2): assumes erf(z2) > erf(z1) in the
    call pattern (z2 >= z1 where it matters); for z1 > 0 the difference is
    computed through erfcx to avoid catastrophic cancellation in the tail.
    """
    z1 = jnp.asarray(z1)
    z2 = jnp.asarray(z2)
    pos = z1 > 0.0
    z1p = jnp.where(pos, z1, 1.0)
    z2p = jnp.where(pos, z2, 2.0)
    arg = erfcx(z1p) - erfcx(z2p) * jnp.exp(z1p**2 - z2p**2)
    branch_pos = -(z1p**2) + jnp.log(jnp.maximum(arg, 1e-300))
    branch_neg = jnp.log(jnp.maximum(erf(z2) - erf(z1), 1e-300))
    return jnp.where(pos, branch_pos, branch_neg)
