"""Student-t process regression.

Reference: GPy/models/tp_regression.py (294 LoC) +
exact_studentt_inference.py. The TP marginal is multivariate-t; predictions
are t-distributed with scaled covariance.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.model import Model
from ..core.transformations import Logexp
from ..inference.exact import ExactStudentTInference
from ..kern import RBF

__all__ = ["TPRegression"]


class TPRegression(Model):
    def __init__(self, X, Y, kernel=None, deg_free=5.0, normalizer=None, name="TP regression"):
        super().__init__(name=name)
        from ..config import default_dtype

        dt = default_dtype()
        Xnp = np.asarray(X, dtype=float)
        Ynp = np.asarray(Y, dtype=float)
        self.__dict__["X"] = jnp.asarray(Xnp, dtype=dt)
        if normalizer is True:
            from ..util.normalizer import Standardize

            normalizer = Standardize()
        self.normalizer = normalizer or None
        if self.normalizer is not None:
            self.normalizer.scale_by(Ynp)
            Ynp_n = self.normalizer.normalize(Ynp)
        else:
            Ynp_n = Ynp
        self.__dict__["Y"] = jnp.asarray(Ynp, dtype=dt)
        self.__dict__["Y_normalized"] = jnp.asarray(Ynp_n, dtype=dt)
        self.num_data = Xnp.shape[0]
        self.output_dim = Ynp.shape[1]
        self.kern = kernel or RBF(Xnp.shape[1])
        self._add_param("deg_free", float(deg_free), transform=Logexp())
        self.inference_method = ExactStudentTInference()

    def log_likelihood(self):
        nu = jnp.asarray(self.deg_free)
        _, lml, _ = self.inference_method.inference(self.kern, self.X, self.Y_normalized, nu)
        return lml

    def _posterior(self):
        nu = jnp.asarray(self.deg_free)
        return self.inference_method.inference(self.kern, self.X, self.Y_normalized, nu)

    def predict(self, Xnew, full_cov=False):
        """Predictive t-distribution moments: mean and scaled covariance
        (nu + beta - 2)/(nu + N - 2) * Sigma*."""
        Xnew = jnp.asarray(np.asarray(Xnew, dtype=float), dtype=self.X.dtype)
        post, _, beta = self._posterior()
        mu, var = post._raw_predict(self.kern, Xnew, self.X, full_cov)
        nu = float(np.asarray(self.deg_free))
        N = self.num_data
        D = self.output_dim
        scale = (nu + float(beta) / D - 2.0) / (nu + N - 2.0)
        var = var * scale
        if self.normalizer is not None:
            mu = self.normalizer.inverse_mean(np.asarray(mu))
            var = self.normalizer.inverse_variance(np.asarray(var)) if not full_cov else self.normalizer.inverse_covariance(np.asarray(var))
        return np.asarray(mu), np.asarray(var)

    def predict_quantiles(self, Xnew, quantiles=(2.5, 97.5)):
        from scipy.stats import t as student_t

        mu, var = self.predict(Xnew)
        nu = float(np.asarray(self.deg_free)) + self.num_data
        return [mu + student_t.ppf(q / 100.0, nu) * np.sqrt(var) for q in quantiles]
