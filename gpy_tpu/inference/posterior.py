"""Posterior container: woodbury representation + prediction math.

Reference: GPy/inference/latent_function_inference/posterior.py (Posterior:9,
lazy woodbury properties:144-218, _raw_predict:220-302).

All fields are jnp arrays; the object is an immutable pytree-ish container
produced inside jitted inference functions. `woodbury_inv` is computed on
demand (needed only for full-covariance prediction and EP)."""
from __future__ import annotations

import jax.numpy as jnp
import jax.scipy.linalg as jsl

from ..util.linalg import dpotri

__all__ = ["Posterior"]


class Posterior:
    """Represents p(f | D) through:
        mean(X*)  = K_{*x} @ woodbury_vector
        cov(X*)   = K_{**} - K_{*x} @ woodbury_inv @ K_{x*}
    where x is the predictive variable (X for exact GPs, Z for sparse).
    """

    def __init__(
        self,
        woodbury_chol=None,
        woodbury_vector=None,
        K=None,
        mean=None,
        cov=None,
        K_chol=None,
        woodbury_inv=None,
        prior_mean=0.0,
    ):
        self._woodbury_chol = woodbury_chol
        self._woodbury_vector = woodbury_vector
        self._woodbury_inv = woodbury_inv
        self._K = K
        self._mean = mean
        self._covariance = cov
        self._K_chol = K_chol
        self._prior_mean = prior_mean

    # --- lazy properties (GPy posterior.py:144-218) -----------------------
    @property
    def woodbury_chol(self):
        return self._woodbury_chol

    @property
    def woodbury_vector(self):
        return self._woodbury_vector

    @property
    def woodbury_inv(self):
        # no mutation-caching: this object may cross jit trace boundaries
        if self._woodbury_inv is None:
            return dpotri(self._woodbury_chol)
        return self._woodbury_inv

    @property
    def K(self):
        return self._K

    @property
    def mean(self):
        """Posterior mean at the inducing/training points."""
        if self._mean is None:
            return self._K @ self.woodbury_vector + self._prior_mean
        return self._mean

    @property
    def covariance(self):
        if self._covariance is None:
            return self._K - self._K @ self.woodbury_inv @ self._K
        return self._covariance

    # --- prediction (GPy posterior.py:220-302; the variational branch is
    # Posterior._raw_predict's psi-statistics path at posterior.py:249-270)
    def _raw_predict(self, kern, Xnew, pred_var, full_cov: bool = False):
        if hasattr(Xnew, "mean") and hasattr(Xnew, "variance"):
            # Uncertain inputs: Xnew is a variational posterior q(X*) =
            # prod_n N(mu_n, diag(S_n)). Predict through the psi statistics:
            #   mu_* = psi1 la,   la = woodbury_vector
            #   var_* = la' (psi2_n - psi1 psi1') la + psi0 - tr(Winv psi2_n)
            # (total variance: E_q Var[f|x] + Var_q E[f|x].)
            psi0 = kern.psi0(pred_var, Xnew)          # (N,)
            psi1 = kern.psi1(pred_var, Xnew)          # (N, M)
            psi2n = kern.psi2n(pred_var, Xnew)        # (N, M, M)
            la = self.woodbury_vector                  # (M, D)
            mu = psi1 @ la
            if full_cov:
                raise NotImplementedError(
                    "full_cov with uncertain inputs is not implemented "
                    "(matches GPy posterior.py:258)"
                )
            tmp = psi2n - psi1[:, :, None] * psi1[:, None, :]
            var = jnp.einsum("nmk,md,kd->nd", tmp, la, la) + psi0[:, None]
            Winv = self.woodbury_inv
            var = var - jnp.einsum("nmk,mk->n", psi2n, Winv)[:, None]
            return mu, jnp.maximum(var, 1e-15)
        Kx = kern.K(pred_var, Xnew)  # (M, N*)
        mu = Kx.T @ self.woodbury_vector
        if full_cov:
            Kxx = kern.K(Xnew)
            if self._woodbury_chol is not None:
                tmp = jsl.solve_triangular(self._woodbury_chol, Kx, lower=True)
                var = Kxx - tmp.T @ tmp
            else:
                var = Kxx - Kx.T @ self.woodbury_inv @ Kx
            var = 0.5 * (var + var.T)
        else:
            Kxx = kern.Kdiag(Xnew)
            if self._woodbury_chol is not None:
                tmp = jsl.solve_triangular(self._woodbury_chol, Kx, lower=True)
                var = (Kxx - jnp.sum(tmp * tmp, axis=0))[:, None]
            else:
                var = (Kxx - jnp.sum(Kx * (self.woodbury_inv @ Kx), axis=0))[:, None]
            var = jnp.maximum(var, 1e-15)
        return mu, var

    def covariance_between_points(self, kern, X, X1, X2):
        """Posterior cov between two new sets. GPy: gp.py:735-786."""
        Kx1 = kern.K(X, X1)
        Kx2 = kern.K(X, X2)
        K12 = kern.K(X1, X2)
        return K12 - Kx1.T @ self.woodbury_inv @ Kx2
