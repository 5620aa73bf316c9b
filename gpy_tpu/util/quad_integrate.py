"""Gauss-Kronrod quadrature on [a, b] / (-inf, inf).

Reference: GPy/util/quad_integrate.py (quadgk rules used by
likelihood.py:312-357 for non-GH integrals).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["quadgk", "quadgk_int", "gk_nodes"]

# 15-point Gauss-Kronrod nodes/weights on [-1, 1] (standard table)
_XGK = np.array([
    -0.991455371120813, -0.949107912342759, -0.864864423359769,
    -0.741531185599394, -0.586087235467691, -0.405845151377397,
    -0.207784955007898, 0.0, 0.207784955007898, 0.405845151377397,
    0.586087235467691, 0.741531185599394, 0.864864423359769,
    0.949107912342759, 0.991455371120813,
])
_WGK = np.array([
    0.022935322010529, 0.063092092629979, 0.104790010322250,
    0.140653259715525, 0.169004726639267, 0.190350578064785,
    0.204432940075298, 0.209482141084728, 0.204432940075298,
    0.190350578064785, 0.169004726639267, 0.140653259715525,
    0.104790010322250, 0.063092092629979, 0.022935322010529,
])


def gk_nodes(a: float, b: float, levels: int = 4):
    """Composite GK nodes/weights on [a,b] split into 2^levels panels."""
    panels = 2 ** levels
    edges = np.linspace(a, b, panels + 1)
    xs, ws = [], []
    for i in range(panels):
        lo, hi = edges[i], edges[i + 1]
        h = 0.5 * (hi - lo)
        xs.append(h * _XGK + 0.5 * (lo + hi))
        ws.append(h * _WGK)
    return jnp.asarray(np.concatenate(xs)), jnp.asarray(np.concatenate(ws))


def quadgk(f, a: float, b: float, levels: int = 4):
    """Integrate f over [a, b] (vectorized f)."""
    x, w = gk_nodes(a, b, levels)
    return jnp.sum(w * f(x))


def quadgk_int(f, scale: float = 10.0, levels: int = 5):
    """Integrate f over (-inf, inf) via tanh substitution x = s*tan(u)."""
    u, w = gk_nodes(-np.pi / 2 + 1e-6, np.pi / 2 - 1e-6, levels)
    x = scale * jnp.tan(u)
    jac = scale / jnp.cos(u) ** 2
    return jnp.sum(w * f(x) * jac)
