"""Complex Faddeeva function w(z) = exp(-z^2) erfc(-iz) in jnp.

Needed by the second-order latent-force kernel (reference:
GPy/kern/src/eq_ode2.py imports scipy.special.wofz). JAX has no wofz; this
implements Weideman's (1994) rational series — coefficients computed once
with numpy at import; evaluation is a polynomial in the Möbius-transformed
variable, valid for Im(z) >= 0 and extended below the axis via
w(z) = 2 exp(-z^2) - w(-z). Accuracy ~1e-13, fully differentiable.

The core (`wofz_c`, `erf_complex_c`) runs on `util.cplx.Cplx` real pairs:
the axon TPU runtime implements NO complex element types (c64 ops fail
UNIMPLEMENTED even inside jit — r5 on-chip zoo sweep via IBPLFM), so the
whole evaluation lowers to real adds/muls/exps. The native-complex
`wofz`/`erf_complex` wrappers remain for CPU callers and tests.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .cplx import Cplx, as_cplx, cexp, cwhere


def _cdt():
    from ..config import complex_dtype

    return complex_dtype()

__all__ = ["wofz", "erf_complex", "wofz_c", "erf_complex_c"]

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


# Python floats, not np.float64 scalars: numpy scalars are strong-typed in
# JAX and would silently promote reduced-precision arrays back to f64
_L, _A = _weideman_coeffs()
_L = float(_L)
_A = [float(c) for c in _A]


def _i_times(z: Cplx) -> Cplx:
    """1j * z without a complex literal."""
    return Cplx(-z.im, z.re)


def _wofz_upper(z: Cplx) -> Cplx:
    """Weideman evaluation for Im(z) >= 0."""
    from jax import lax

    L = _L
    iz = _i_times(z)
    Z = (L + iz) / (L - iz)
    # polyval with descending coefficients _A — rolled as a scan: the
    # unrolled 64-step pair-arithmetic Horner chain made XLA CPU's
    # compile of downstream losses pathologically slow (>9 min for the
    # IBPLFM gradient; 'Very slow compile' alarm)
    coeffs = jnp.asarray(_A, dtype=Z.re.dtype)

    def step(p, c):
        return p * Z + c, None

    p0 = Cplx(jnp.zeros_like(Z.re), jnp.zeros_like(Z.re))
    p, _ = lax.scan(step, p0, coeffs)
    Lmiz = L - iz
    return 2.0 * p / (Lmiz * Lmiz) + float(1.0 / np.sqrt(np.pi)) / Lmiz


def wofz_c(z: Cplx) -> Cplx:
    """Faddeeva function on real-pair complex values."""
    z = as_cplx(z)
    upper = z.im >= 0
    zu = cwhere(upper, z, -z)
    w_up = _wofz_upper(zu)
    # for Im z < 0: w(z) = 2 exp(-z^2) - w(-z)
    w_low = 2.0 * cexp(-(z * z)) - w_up
    return cwhere(upper, w_up, w_low)


def erf_complex_c(z: Cplx) -> Cplx:
    """erf for Cplx arguments via wofz: erf(z) = 1 - exp(-z^2) w(iz)."""
    z = as_cplx(z)
    flip = z.re < 0
    zp = cwhere(flip, -z, z)
    val = 1.0 - cexp(-(zp * zp)) * wofz_c(_i_times(zp))
    return cwhere(flip, -val, val)


def _pack(w: Cplx, dtype):
    out = jnp.asarray(w.re, dtype=dtype)
    return out + jnp.asarray(1j, dtype=dtype) * jnp.asarray(w.im, dtype=dtype)


def wofz(z):
    """Native-complex wrapper (CPU / tests; TPU has no complex runtime)."""
    dt = _cdt()
    w = wofz_c(as_cplx(jnp.asarray(z, dtype=dt)))
    return _pack(w, dt)


def erf_complex(z):
    dt = _cdt()
    w = erf_complex_c(as_cplx(jnp.asarray(z, dtype=dt)))
    return _pack(w, dt)
