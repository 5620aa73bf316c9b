"""Real-pair complex arithmetic as a JAX pytree.

The axon TPU runtime implements NO complex element types (not even c64,
not even as jit-internal values — verified 2026-08-22: `jit(exp(c64))`
and `jit(real(exp(complex(x, 2x))))` both fail UNIMPLEMENTED at runtime).
The LFM kernels (EQ_ODE2 / IBPLFM) need complex Green's-function algebra,
so this module provides a `Cplx` value type holding (re, im) real arrays
with overloaded operators; everything lowers to real adds/muls/exps that
every backend implements. On CPU the results are bit-identical to native
complex (which is stored as real pairs anyway).

Reference context: GPy's eq_ode2.py leans on scipy.special.wofz
(GPy/kern/src/eq_ode2.py:10); our Weideman-series wofz (util/wofz.py) is
built on this class so the whole LFM family traces to real XLA ops.

Usage: arithmetic mixes freely with real jnp arrays / python scalars.
`cexp`, `csqrt`, `cwhere`, `cabs` are the function forms; `.real`/`.imag`
are plain jnp arrays.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["Cplx", "cplx", "cexp", "csqrt", "cwhere", "cabs", "as_cplx"]


class Cplx:
    """A complex value as a (re, im) pair of real jnp arrays."""

    __slots__ = ("re", "im")
    # win binary-op dispatch against numpy/jnp arrays on the left
    __array_priority__ = 2000

    def __init__(self, re, im=None):
        self.re = jnp.asarray(re)
        self.im = jnp.zeros_like(self.re) if im is None else jnp.asarray(im)

    # --- pytree -------------------------------------------------------------
    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.re, obj.im = children
        return obj

    # --- views --------------------------------------------------------------
    @property
    def real(self):
        return self.re

    @property
    def imag(self):
        return self.im

    @property
    def shape(self):
        return jnp.broadcast_shapes(jnp.shape(self.re), jnp.shape(self.im))

    @property
    def dtype(self):
        return jnp.result_type(self.re, self.im)

    def conj(self):
        return Cplx(self.re, -self.im)

    def __getitem__(self, key):
        return Cplx(self.re[key], self.im[key])

    def reshape(self, *shape):
        return Cplx(self.re.reshape(*shape),
                    jnp.broadcast_to(self.im, jnp.shape(self.re)).reshape(*shape)
                    if jnp.shape(self.im) != jnp.shape(self.re) else self.im.reshape(*shape))

    def __repr__(self):
        return f"Cplx(re={self.re!r}, im={self.im!r})"

    def __complex__(self):
        return complex(float(self.re), float(self.im))

    def __array__(self, dtype=None, copy=None):
        # host conversion (CPU callers / tests): materialize as native
        # complex ndarray
        import numpy as _np

        out = _np.asarray(_np.asarray(self.re) + 1j * _np.asarray(self.im))
        return out.astype(dtype) if dtype is not None else out

    # --- arithmetic ---------------------------------------------------------
    def __add__(self, o):
        o = as_cplx(o)
        return Cplx(self.re + o.re, self.im + o.im)

    __radd__ = __add__

    def __sub__(self, o):
        o = as_cplx(o)
        return Cplx(self.re - o.re, self.im - o.im)

    def __rsub__(self, o):
        o = as_cplx(o)
        return Cplx(o.re - self.re, o.im - self.im)

    def __neg__(self):
        return Cplx(-self.re, -self.im)

    def __mul__(self, o):
        o = as_cplx(o)
        return Cplx(self.re * o.re - self.im * o.im,
                    self.re * o.im + self.im * o.re)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = as_cplx(o)
        d = o.re * o.re + o.im * o.im
        return Cplx((self.re * o.re + self.im * o.im) / d,
                    (self.im * o.re - self.re * o.im) / d)

    def __rtruediv__(self, o):
        return as_cplx(o).__truediv__(self)

    def __pow__(self, n):
        if n == 2:
            return self * self
        raise NotImplementedError("Cplx ** only supports 2")


jax.tree_util.register_pytree_node(
    Cplx, lambda c: c.tree_flatten(), Cplx.tree_unflatten)


def as_cplx(x):
    """Coerce scalars / real arrays / python complex to Cplx."""
    if isinstance(x, Cplx):
        return x
    if isinstance(x, complex):
        return Cplx(jnp.asarray(x.real), jnp.asarray(x.imag))
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return Cplx(jnp.real(x), jnp.imag(x))
    return Cplx(x, jnp.zeros_like(x))


def cplx(re, im=None):
    return Cplx(re, im)


def cexp(z):
    """exp(re) * (cos(im) + i sin(im))."""
    z = as_cplx(z)
    m = jnp.exp(z.re)
    return Cplx(m * jnp.cos(z.im), m * jnp.sin(z.im))


def csqrt(z):
    """Principal square root, stable for all quadrants (handles the
    negative-real axis: sign(im)=0 there must still give +i sqrt(-re)).

    Double-where on each half: for a real-axis input one of the two halves
    is exactly sqrt(0), whose jax gradient is inf — but that half is
    identically zero in a neighbourhood, so its true derivative is 0. The
    unselected branch must see a benign argument (see CLAUDE.md NaN-grad
    rule)."""
    z = as_cplx(z)
    r = jnp.hypot(z.re, z.im)
    arg_re = jnp.maximum((r + z.re) / 2.0, 0.0)
    arg_im = jnp.maximum((r - z.re) / 2.0, 0.0)
    pos_re = arg_re > 0
    pos_im = arg_im > 0
    re_s = jnp.where(pos_re, jnp.sqrt(jnp.where(pos_re, arg_re, 1.0)), 0.0)
    im_s = jnp.where(pos_im, jnp.sqrt(jnp.where(pos_im, arg_im, 1.0)), 0.0)
    sign = jnp.where(z.im < 0, -1.0, 1.0)
    return Cplx(re_s, sign * im_s)


def cwhere(cond, a, b):
    a = as_cplx(a)
    b = as_cplx(b)
    return Cplx(jnp.where(cond, a.re, b.re), jnp.where(cond, a.im, b.im))


def cabs(z):
    z = as_cplx(z)
    return jnp.hypot(z.re, z.im)
