"""Warped GPs: output warping (TanhFunction) and input warping (Kumaraswamy).

Reference: GPy/models/warped_gp.py:13 and GPy/models/input_warped_gp.py:12.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.gp import GP
from ..inference.exact import ExactGaussianInference
from ..kern import RBF
from ..likelihoods import Gaussian
from ..likelihoods.likelihood import gh_points
from ..util.warping_functions import TanhFunction
from ..util.input_warping_functions import KumarWarping

__all__ = ["WarpedGP", "InputWarpedGP"]


class WarpedGP(GP):
    """GP on z = f(Y) with Jacobian term: logL = NLML(f(Y)) + sum log f'(Y).

    GPy: warped_gp.py:13 (+ warping_functions). Predictions are pushed back
    through f^{-1} by Gauss-Hermite quadrature (mean) or directly (median).
    """

    def __init__(self, X, Y, kernel=None, warping_function=None,
                 warping_terms=3, normalizer=None, name="warp_gp"):
        if kernel is None:
            kernel = RBF(np.asarray(X).shape[1])
        super().__init__(X, Y, kernel, Gaussian(),
                         inference_method=ExactGaussianInference(),
                         name=name, normalizer=normalizer)
        self.warping_function = warping_function or TanhFunction(warping_terms)
        self.predict_in_warped_space = True

    def log_likelihood(self):
        z = self.warping_function.f(self.Y_normalized)
        _, lml = self.inference_method.inference(
            self.kern, self.X, self.likelihood, z, self.mean_function, self.Y_metadata
        )
        jac = jnp.sum(jnp.log(jnp.maximum(self.warping_function.fgrad_y(self.Y_normalized), 1e-12)))
        return lml + jac

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        z = self.warping_function.f(self.Y_normalized)
        post, _ = self.inference_method.inference(
            self.kern, self.X, self.likelihood, z, self.mean_function, self.Y_metadata
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    def predict(self, Xnew, full_cov=False, Y_metadata=None, kern=None,
                likelihood=None, include_likelihood=True, median=False):
        mu, var = self._raw_predict(Xnew, full_cov=False, kern=kern)
        if include_likelihood:
            var = var + jnp.asarray(self.likelihood.variance)
        if not self.predict_in_warped_space:
            return np.asarray(mu), np.asarray(var)
        if median:
            mean_w = self.warping_function.f_inv(mu)
            # delta-method variance
            g = self.warping_function.fgrad_y(mean_w)
            return np.asarray(mean_w), np.asarray(var / jnp.maximum(g, 1e-12) ** 2)
        # GH quadrature of f_inv over the latent Gaussian (GPy warped_gp.py)
        x, w = gh_points(20, dtype=mu.dtype)
        zs = mu[..., None] + jnp.sqrt(var)[..., None] * x
        ys = self.warping_function.f_inv(zs.reshape(-1, 1)).reshape(zs.shape)
        mean_w = jnp.sum(w * ys, axis=-1)
        var_w = jnp.sum(w * ys**2, axis=-1) - mean_w**2
        return np.asarray(mean_w), np.asarray(jnp.maximum(var_w, 1e-12))

    def predict_quantiles(self, Xnew, quantiles=(2.5, 97.5), Y_metadata=None, **kw):
        from scipy.stats import norm

        mu, var = self._raw_predict(Xnew, full_cov=False)
        var = var + jnp.asarray(self.likelihood.variance)
        qs = []
        for q in quantiles:
            zq = mu + float(norm.ppf(q / 100.0)) * jnp.sqrt(var)
            qs.append(np.asarray(self.warping_function.f_inv(zq)))
        return qs

    def log_predictive_density(self, x_test, y_test, Y_metadata=None):
        z_test = self.warping_function.f(jnp.asarray(np.asarray(y_test, dtype=float)))
        mu, var = self._raw_predict(x_test)
        lpd = self.likelihood.log_predictive_density(z_test, mu, var, Y_metadata)
        jac = jnp.log(jnp.maximum(self.warping_function.fgrad_y(jnp.asarray(np.asarray(y_test, float))), 1e-12))
        return np.asarray(lpd + jac)


class InputWarpedGP(GP):
    """GP on warped inputs x~ = w(x) (Kumaraswamy CDF per dim).

    GPy: input_warped_gp.py:12.
    """

    def __init__(self, X, Y, kernel=None, normalizer=False, warping_function=None,
                 warping_indices=None, Xmin=None, Xmax=None, epsilon=None,
                 name="input_warped_gp"):
        X = np.asarray(X, dtype=float)
        if kernel is None:
            kernel = RBF(X.shape[1])
        super().__init__(X, Y, kernel, Gaussian(),
                         inference_method=ExactGaussianInference(),
                         name=name, normalizer=normalizer)
        self.warping_function = warping_function or KumarWarping(
            X, warping_indices, epsilon or 1e-6, Xmin, Xmax
        )

    def log_likelihood(self):
        Xw = self.warping_function.f(self.X)
        _, lml = self.inference_method.inference(
            self.kern, Xw, self.likelihood, self.Y_normalized, self.mean_function, self.Y_metadata
        )
        return lml

    @property
    def _predictive_variable(self):
        return self.warping_function.f(self.X)

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        Xw = self.warping_function.f(self.X)
        post, _ = self.inference_method.inference(
            self.kern, Xw, self.likelihood, self.Y_normalized, self.mean_function, self.Y_metadata
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    def _raw_predict(self, Xnew, full_cov=False, kern=None):
        Xnew_w = self.warping_function.f(jnp.asarray(np.asarray(Xnew, dtype=float)))
        kern = kern or self.kern
        mu, var = self.posterior._raw_predict(kern, Xnew_w, self._predictive_variable, full_cov)
        return mu, var
