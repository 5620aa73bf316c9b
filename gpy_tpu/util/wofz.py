"""Complex Faddeeva function w(z) = exp(-z^2) erfc(-iz) in jnp.

Needed by the second-order latent-force kernel (reference:
GPy/kern/src/eq_ode2.py imports scipy.special.wofz). JAX has no wofz; this
implements Weideman's (1994) rational series — coefficients computed once
with numpy at import; evaluation is a polynomial in the Möbius-transformed
variable, valid for Im(z) >= 0 and extended below the axis via
w(z) = 2 exp(-z^2) - w(-z). Accuracy ~1e-13, fully differentiable.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["wofz", "erf_complex"]

_N = 64


def _weideman_coeffs(N=_N):
    """Weideman (1994) 'cef' coefficients (transcription of cef.m)."""
    M = 2 * N
    M2 = 2 * M
    k = np.arange(-M + 1, M)  # M2 - 1 points
    L = np.sqrt(N / np.sqrt(2.0))
    theta = k * np.pi / M
    t = L * np.tan(theta / 2.0)
    f = np.exp(-t * t) * (L * L + t * t)
    f = np.concatenate([[0.0], f])
    a = np.real(np.fft.fft(np.fft.fftshift(f))) / M2
    a = np.flipud(a[1 : N + 1])  # descending-power coefficients
    return L, a


_L, _A = _weideman_coeffs()


def _wofz_upper(z):
    """Weideman evaluation for Im(z) >= 0."""
    L = _L
    iz = 1j * z
    Z = (L + iz) / (L - iz)
    # polyval with descending coefficients _A (Horner)
    p = jnp.zeros_like(Z)
    for c in _A:
        p = p * Z + c
    return 2.0 * p / (L - iz) ** 2 + (1.0 / np.sqrt(np.pi)) / (L - iz)


def wofz(z):
    z = jnp.asarray(z, dtype=jnp.complex128)
    upper = z.imag >= 0
    zu = jnp.where(upper, z, -z)
    w_up = _wofz_upper(zu)
    # for Im z < 0: w(z) = 2 exp(-z^2) - w(-z)
    w_low = 2.0 * jnp.exp(-(z * z)) - w_up
    return jnp.where(upper, w_up, w_low)


def erf_complex(z):
    """erf for complex arguments via wofz: erf(z) = 1 - exp(-z^2) w(iz)."""
    z = jnp.asarray(z, dtype=jnp.complex128)
    flip = z.real < 0
    zp = jnp.where(flip, -z, z)
    val = 1.0 - jnp.exp(-(zp * zp)) * wofz(1j * zp)
    return jnp.where(flip, -val, val)
