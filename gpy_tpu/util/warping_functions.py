"""Output warping functions for WarpedGP.

Reference: GPy/util/warping_functions.py (WarpingFunction:10, TanhFunction:71,
LogFunction, IdentityFunction). fgrad_y towers are autodiff'd away; f_inv is
a compiled Newton iteration.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.module import Module
from ..core.transformations import Logexp

__all__ = ["WarpingFunction", "TanhFunction", "LogFunction", "IdentityFunction"]


class WarpingFunction(Module):
    def f(self, y):
        raise NotImplementedError

    def fgrad_y(self, y):
        g = jax.vmap(jax.vmap(jax.grad(lambda s: jnp.sum(self.f(s[None, None])))))
        return g(jnp.asarray(y))

    def f_inv(self, z, max_iterations: int = 100, y=None):
        """Invert f by Newton iteration (monotone f). GPy: warping_functions.py:34."""
        z = jnp.asarray(z)
        y0 = jnp.asarray(y) if y is not None else z

        def body(i, yy):
            fy = self.f(yy)
            dy = self.fgrad_y(yy)
            return yy - (fy - z) / jnp.maximum(dy, 1e-12)

        return lax.fori_loop(0, max_iterations, body, y0)


class TanhFunction(WarpingFunction):
    """f(y) = d*y + sum_i a_i tanh(b_i (y + c_i)) (Snelson et al. 2004).

    GPy: warping_functions.py:71-120 — psi (n_terms, 3) with a,b positive.
    """

    def __init__(self, n_terms: int = 3, initial_y=None, name="warp_tanh"):
        super().__init__(name=name)
        self.n_terms = n_terms
        self._add_param("psi_ab", np.ones((n_terms, 2)), transform=Logexp())
        self._add_param("psi_c", np.ones((n_terms, 1)))
        self._add_param("d", 1.0, transform=Logexp())
        self.initial_y = initial_y

    def f(self, y):
        y = jnp.asarray(y)
        ab = jnp.asarray(self.psi_ab)
        c = jnp.asarray(self.psi_c)
        d = jnp.asarray(self.d)
        a, b = ab[:, 0], ab[:, 1]
        z = d * y
        t = jnp.tanh(b[None, None, :] * (y[..., None] + c[:, 0][None, None, :]))
        return z + jnp.sum(a[None, None, :] * t, axis=-1)

    def fgrad_y(self, y):
        y = jnp.asarray(y)
        ab = jnp.asarray(self.psi_ab)
        c = jnp.asarray(self.psi_c)
        d = jnp.asarray(self.d)
        a, b = ab[:, 0], ab[:, 1]
        t = jnp.tanh(b[None, None, :] * (y[..., None] + c[:, 0][None, None, :]))
        return d + jnp.sum(a[None, None, :] * b[None, None, :] * (1 - t**2), axis=-1)


class LogFunction(WarpingFunction):
    """f(y) = log(y). GPy: warping_functions.py LogFunction."""

    def __init__(self, name="warp_log"):
        super().__init__(name=name)

    def f(self, y):
        return jnp.log(jnp.asarray(y))

    def fgrad_y(self, y):
        return 1.0 / jnp.asarray(y)

    def f_inv(self, z, **kw):
        return jnp.exp(jnp.asarray(z))


class IdentityFunction(WarpingFunction):
    def __init__(self, name="warp_identity"):
        super().__init__(name=name)

    def f(self, y):
        return jnp.asarray(y)

    def fgrad_y(self, y):
        return jnp.ones_like(jnp.asarray(y))

    def f_inv(self, z, **kw):
        return jnp.asarray(z)
