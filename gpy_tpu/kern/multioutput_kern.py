"""Multi-output kernels with cross-covariances, incl. derivative observations.

Reference: GPy/kern/src/multioutput_kern.py (MultioutputKern:~20),
multioutput_derivative_kern.py, diff_kern.py (DiffKern — derivative of a GP:
its covariances are d2k/dx dx' and dk/dx', which GPy hand-writes per kernel
via dK2_dXdX2 closed forms in rbf.py:55-176).

TPU design: DiffKern derives every derivative covariance from the base
kernel by autodiff (jax.grad of the scalar kernel, vmapped over the Gram) —
any base kernel gets derivative observations for free, where GPy supports
only the kernels with hand-coded third derivatives.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .kern import Kern

__all__ = ["DiffKern", "MultioutputKern", "MultioutputDerivativeKern"]


class DiffKern(Kern):
    """Derivative of a latent GP wrt input dim `dimension`.

    GPy: diff_kern.py. K(X,X2) = d^2 k / dx_d dx'_d; cross covariance with
    the base GP is dk/dx_d (see MultioutputKern).
    """

    def __init__(self, base_kern: Kern, dimension: int, name="DiffKern"):
        super().__init__(base_kern.input_dim, None, name)
        self.base_kern = base_kern
        self.dimension = int(dimension)

    def _k_scalar(self, x, x2):
        return self.base_kern.K(x[None, :], x2[None, :])[0, 0]

    def K(self, X, X2=None):
        X2v = X if X2 is None else X2
        d = self.dimension

        def kdd(x, x2):
            return jax.grad(lambda a: jax.grad(lambda b: self._k_scalar(a, b))(x2)[d])(x)[d]

        return jax.vmap(lambda x: jax.vmap(lambda x2: kdd(x, x2))(X2v))(X)

    def Kdiag(self, X):
        return jnp.diagonal(self.K(X))

    def cross_K(self, X, X2, base_first: bool):
        """cov(f(x), df/dx'_d (x')) if base_first else cov(df/dx_d, f)."""
        d = self.dimension
        if base_first:
            def kx(x, x2):
                return jax.grad(lambda b: self._k_scalar(x, b))(x2)[d]
        else:
            def kx(x, x2):
                return jax.grad(lambda a: self._k_scalar(a, x2))(x)[d]
        return jax.vmap(lambda x: jax.vmap(lambda x2: kx(x, x2))(X2))(X)


def _cross_cov(ki: Kern, kj: Kern, X, X2):
    """Cross covariance between output blocks i and j."""
    if ki is kj:
        return ki.K(X, X2)
    if isinstance(ki, DiffKern) and not isinstance(kj, DiffKern) and ki.base_kern is kj:
        return ki.cross_K(X, X2, base_first=False)
    if isinstance(kj, DiffKern) and not isinstance(ki, DiffKern) and kj.base_kern is ki:
        return kj.cross_K(X, X2, base_first=True)
    if isinstance(ki, DiffKern) and isinstance(kj, DiffKern) and ki.base_kern is kj.base_kern:
        di, dj = ki.dimension, kj.dimension

        def kdd(x, x2):
            return jax.grad(lambda a: jax.grad(lambda b: ki._k_scalar(a, b))(x2)[dj])(x)[di]

        return jax.vmap(lambda x: jax.vmap(lambda x2: kdd(x, x2))(X2))(X)
    # independent latent functions -> zero cross covariance
    return jnp.zeros((X.shape[0], X2.shape[0]))


class MultioutputKern(Kern):
    """Heterogeneous outputs over shared/linked latent functions.

    X carries the output index in its last column (as built by
    util.multioutput.build_XY); block (i, j) of the Gram uses the cross
    covariance of kernels i and j. GPy: multioutput_kern.py:~20.
    """

    def __init__(self, kernels, cross_covariances=None, name="MultioutputKern"):
        if not isinstance(kernels, (list, tuple)):
            kernels = [kernels]
        input_dim = max(k.input_dim for k in kernels) + 1
        super().__init__(input_dim, np.arange(input_dim), name)
        self.parts = list(kernels)

    def _split(self, X):
        idx = jnp.asarray(X[:, -1], dtype=jnp.int32)
        return X[:, :-1], idx

    def K(self, X, X2=None):
        Xv, i1 = self._split(X)
        X2v, i2 = (Xv, i1) if X2 is None else self._split(X2)
        out = jnp.zeros((Xv.shape[0], X2v.shape[0]))
        for a, ka in enumerate(self.parts):
            for b, kb in enumerate(self.parts):
                mask = (i1[:, None] == a) & (i2[None, :] == b)
                out = out + jnp.where(mask, _cross_cov(ka, kb, Xv, X2v), 0.0)
        return out

    def Kdiag(self, X):
        Xv, i1 = self._split(X)
        out = jnp.zeros(Xv.shape[0])
        for a, ka in enumerate(self.parts):
            out = out + jnp.where(i1 == a, ka.Kdiag(Xv), 0.0)
        return out


class MultioutputDerivativeKern(MultioutputKern):
    """Alias with GPy's name (multioutput_derivative_kern.py) — cross
    covariances between a GP and its DiffKern derivatives are automatic."""
