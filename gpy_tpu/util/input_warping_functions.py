"""Input warping (Kumaraswamy CDF) for InputWarpedGP.

Reference: GPy/util/input_warping_functions.py (InputWarpingFunction,
KumarWarping — Snoek et al. 2014 input warping).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.module import Module
from ..core.transformations import Logexp

__all__ = ["InputWarpingFunction", "KumarWarping"]


class InputWarpingFunction(Module):
    def f(self, X):
        raise NotImplementedError


class KumarWarping(InputWarpingFunction):
    """x -> 1 - (1 - x^a)^b per warped column, x scaled to [0, 1].

    GPy: input_warping_functions.py KumarWarping (epsilon-clipped scaling).
    """

    def __init__(self, X, warping_indices=None, epsilon=1e-6, Xmin=None, Xmax=None,
                 name="kumar_warping"):
        super().__init__(name=name)
        X = np.asarray(X, dtype=float)
        if warping_indices is None:
            warping_indices = list(range(X.shape[1]))
        self.warping_indices = list(warping_indices)
        self.epsilon = float(epsilon)
        if Xmin is None:
            Xmin = X.min(0)
        if Xmax is None:
            Xmax = X.max(0)
        self.Xmin = np.asarray(Xmin) - self.epsilon
        self.Xmax = np.asarray(Xmax) + self.epsilon
        n = len(self.warping_indices)
        self._add_param("a", np.ones(n), transform=Logexp())
        self._add_param("b", np.ones(n), transform=Logexp())

    def f(self, X):
        X = jnp.asarray(X)
        a = jnp.asarray(self.a)
        b = jnp.asarray(self.b)
        cols = []
        j = 0
        for i in range(X.shape[1]):
            if i in self.warping_indices:
                x = (X[:, i] - self.Xmin[i]) / (self.Xmax[i] - self.Xmin[i])
                x = jnp.clip(x, 1e-9, 1 - 1e-9)
                cols.append(1.0 - (1.0 - x ** a[j]) ** b[j])
                j += 1
            else:
                cols.append(X[:, i])
        return jnp.stack(cols, axis=1)

    fgrad_X = None  # autodiff
