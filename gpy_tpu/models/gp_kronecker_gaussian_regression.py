"""Kronecker-structured exact GP regression (separable kernel over a grid).

Reference: GPy/models/gp_kronecker_gaussian_regression.py:9 (Saatci 2011
eigendecomposition trick) and GPy/core/gp_grid.py +
inference/latent_function_inference/gaussian_grid_inference.py (general
D-dimensional grids).

TPU design: per-axis eigh + tensor rotations (all dense matmuls); the cost
is O(sum n_d^3 + N sum n_d) instead of O(N^3).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.model import Model
from ..core.transformations import Logexp
from ..kern import RBF
from ..config import default_dtype

__all__ = ["GPKroneckerGaussianRegression", "GPRegressionGrid"]

LOG_2_PI = float(np.log(2 * np.pi))


class GPKroneckerGaussianRegression(Model):
    """K = K1 (x) K2 over a 2-axis grid; exact NLML via eigendecompositions."""

    def __init__(self, X1, X2, Y, kern1, kern2, noise_var=1.0,
                 name="KGPR"):
        super().__init__(name=name)
        dt = default_dtype()
        self.__dict__["X1"] = jnp.asarray(np.asarray(X1, float), dtype=dt)
        self.__dict__["X2"] = jnp.asarray(np.asarray(X2, float), dtype=dt)
        Y = np.asarray(Y, float)
        assert Y.shape == (self.X1.shape[0], self.X2.shape[0]), "Y must be (n1, n2)"
        self.__dict__["Y"] = jnp.asarray(Y, dtype=dt)
        self.kern1, self.kern2 = kern1, kern2
        self._add_param("noise_var", noise_var, transform=Logexp())

    def _eig(self):
        K1 = self.kern1.K(self.X1)
        K2 = self.kern2.K(self.X2)
        S1, Q1 = jnp.linalg.eigh(K1)
        S2, Q2 = jnp.linalg.eigh(K2)
        return S1, Q1, S2, Q2

    def log_likelihood(self):
        S1, Q1, S2, Q2 = self._eig()
        sigma2 = jnp.asarray(self.noise_var)
        Ytil = Q1.T @ self.Y @ Q2  # rotated
        S = S1[:, None] * S2[None, :] + sigma2
        N = self.Y.size
        return -0.5 * (
            N * LOG_2_PI + jnp.sum(jnp.log(jnp.maximum(S, 1e-300))) + jnp.sum(Ytil**2 / S)
        )

    def _alpha(self):
        S1, Q1, S2, Q2 = self._eig()
        sigma2 = jnp.asarray(self.noise_var)
        Ytil = Q1.T @ self.Y @ Q2
        S = S1[:, None] * S2[None, :] + sigma2
        return Q1 @ (Ytil / S) @ Q2.T, (S1, Q1, S2, Q2, S)

    def predict(self, X1new, X2new):
        """Predict at all pairs of (X1new x X2new); returns (mu, var) each
        (n1*, n2*) grids."""
        alpha, (S1, Q1, S2, Q2, S) = self._alpha()
        X1new = jnp.asarray(np.asarray(X1new, float), dtype=self.X1.dtype)
        X2new = jnp.asarray(np.asarray(X2new, float), dtype=self.X2.dtype)
        K1s = self.kern1.K(X1new, self.X1)  # (n1*, n1)
        K2s = self.kern2.K(X2new, self.X2)
        mu = K1s @ alpha @ K2s.T
        # var over the test grid: k** - sum_ij W_ij (K1s Q1)_{t1,i}^2 (K2s Q2)_{t2,j}^2
        A1 = (K1s @ Q1) ** 2  # (n1*, n1)
        A2 = (K2s @ Q2) ** 2
        quad = A1 @ (1.0 / S) @ A2.T
        k1d = self.kern1.Kdiag(X1new)
        k2d = self.kern2.Kdiag(X2new)
        var = k1d[:, None] * k2d[None, :] - quad + jnp.asarray(self.noise_var)
        return np.asarray(mu), np.asarray(jnp.maximum(var, 1e-12))


class GPRegressionGrid(Model):
    """General D-axis grid GP: K = kron_d K_d, Y over the full grid.

    Reference: GPy/models/gp_grid_regression.py:10 + core/gp_grid.py
    (kron_mmprod:64-95) + gaussian_grid_inference.py. The per-axis kernels
    default to RBF on each grid axis.
    """

    def __init__(self, Xs_list, Y, kernels=None, noise_var=1.0, name="GridGP"):
        super().__init__(name=name)
        dt = default_dtype()
        self.axes = [jnp.asarray(np.asarray(X, float), dtype=dt) for X in Xs_list]
        shape = tuple(X.shape[0] for X in self.axes)
        Y = np.asarray(Y, float).reshape(shape)
        self.__dict__["Y"] = jnp.asarray(Y, dtype=dt)
        if kernels is None:
            kernels = [RBF(X.shape[1]) for X in self.axes]
        self.kernels = list(kernels)
        self._add_param("noise_var", noise_var, transform=Logexp())

    def log_likelihood(self):
        from ..inference.grid import GaussianGridInference

        return GaussianGridInference().inference(
            self.kernels, self.axes, self.noise_var, self.Y)[1]

    def predict(self, Xnew_list):
        """Mean/var over the tensor grid of the new per-axis points."""
        from ..inference.grid import GaussianGridInference

        post, _ = GaussianGridInference().inference(
            self.kernels, self.axes, self.noise_var, self.Y)
        eigs, S, alpha = post.eigs, post.S, post.alpha
        sigma2 = jnp.asarray(self.noise_var)
        Ks = [k.K(jnp.asarray(np.asarray(Xn, float)), X) for k, Xn, X in
              zip(self.kernels, Xnew_list, self.axes)]
        mu = alpha
        for d, Kd in enumerate(Ks):
            mu = jnp.moveaxis(jnp.tensordot(Kd, jnp.moveaxis(mu, d, 0), axes=1), 0, d)
        A2s = [(Kd @ Q) ** 2 for Kd, (_, Q) in zip(Ks, eigs)]
        quad = 1.0 / S
        for d, A2 in enumerate(A2s):
            quad = jnp.moveaxis(jnp.tensordot(A2, jnp.moveaxis(quad, d, 0), axes=1), 0, d)
        kdiags = [k.Kdiag(jnp.asarray(np.asarray(Xn, float))) for k, Xn in
                  zip(self.kernels, Xnew_list)]
        kd = kdiags[0]
        for k2 in kdiags[1:]:
            kd = kd[..., None] * k2
        var = kd - quad + sigma2
        return np.asarray(mu), np.asarray(jnp.maximum(var, 1e-12))
