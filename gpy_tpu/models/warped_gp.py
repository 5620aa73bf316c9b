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

    @staticmethod
    def _warp_predict_tail(wf, noise_var, mu, var, include_likelihood,
                           warped, median):
        """Shared (traceable) prediction tail: latent noise + un-warping.
        Runs inside the cached jitted predict program (one tunnel dispatch)
        or eagerly on the fallback path — same math either way."""
        if include_likelihood:
            var = var + noise_var
        if not warped:
            return mu, var
        if median:
            mean_w = wf.f_inv(mu)
            # delta-method variance
            g = wf.fgrad_y(mean_w)
            return mean_w, var / jnp.maximum(g, 1e-12) ** 2
        # GH quadrature of f_inv over the latent Gaussian (GPy warped_gp.py)
        x, w = gh_points(20, dtype=mu.dtype)
        zs = mu[..., None] + jnp.sqrt(var)[..., None] * x
        ys = wf.f_inv(zs.reshape(-1, 1)).reshape(zs.shape)
        mean_w = jnp.sum(w * ys, axis=-1)
        var_w = jnp.sum(w * ys**2, axis=-1) - mean_w**2
        return mean_w, jnp.maximum(var_w, 1e-12)

    def predict(self, Xnew, full_cov=False, Y_metadata=None, kern=None,
                likelihood=None, include_likelihood=True, median=False):
        warped = self.predict_in_warped_space

        def _tail(mod, mu, var):
            return WarpedGP._warp_predict_tail(
                mod.warping_function, jnp.asarray(mod.likelihood.variance),
                mu, var, include_likelihood, warped, median)

        res, folded = self._raw_predict_ex(
            Xnew, full_cov=False, kern=kern, tail=_tail,
            tail_key=("warppred", bool(include_likelihood), bool(median),
                      bool(warped)))
        if folded:
            mu, var = res
        else:
            mu, var = res
            mu, var = WarpedGP._warp_predict_tail(
                self.warping_function, jnp.asarray(self.likelihood.variance),
                jnp.asarray(mu), jnp.asarray(var), include_likelihood,
                warped, median)
        import jax as _jax
        mu, var = _jax.device_get((mu, var))
        return np.asarray(mu), np.asarray(var)

    def predict_quantiles(self, Xnew, quantiles=(2.5, 97.5), Y_metadata=None, **kw):
        from scipy.stats import norm

        cs = tuple(float(norm.ppf(q / 100.0)) for q in quantiles)

        def _tail(mod, mu, var):
            wf = mod.warping_function
            var2 = var + jnp.asarray(mod.likelihood.variance)
            return tuple(wf.f_inv(mu + c * jnp.sqrt(var2)) for c in cs)

        res, folded = self._raw_predict_ex(
            Xnew, full_cov=False, tail=_tail, tail_key=("warpquant", cs))
        if folded:
            import jax as _jax
            return [np.asarray(q) for q in _jax.device_get(res)]
        mu, var = res
        var = var + jnp.asarray(self.likelihood.variance)
        return [np.asarray(self.warping_function.f_inv(mu + c * jnp.sqrt(var)))
                for c in cs]

    def log_predictive_density(self, x_test, y_test, Y_metadata=None):
        y = jnp.asarray(np.asarray(y_test, dtype=float))

        def _tail(mod, mu, var, yj):
            wf = mod.warping_function
            lpd = mod.likelihood.log_predictive_density(wf.f(yj), mu, var, None)
            jac = jnp.log(jnp.maximum(wf.fgrad_y(yj), 1e-12))
            return lpd + jac

        if Y_metadata is None:
            res, folded = self._raw_predict_ex(
                x_test, full_cov=False, tail=_tail, tail_key=("warplpd",),
                tail_args=(y,))
            if folded:
                import jax as _jax
                return np.asarray(_jax.device_get(res))
        z_test = self.warping_function.f(y)
        mu, var = self._raw_predict(x_test)
        lpd = self.likelihood.log_predictive_density(z_test, mu, var, Y_metadata)
        jac = jnp.log(jnp.maximum(self.warping_function.fgrad_y(y), 1e-12))
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
