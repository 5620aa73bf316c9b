"""Index-routed likelihoods for multi-output models.

Reference: GPy/likelihoods/mixed_noise.py (MixedNoise:14) and
GPy/likelihoods/multioutput_likelihood.py (MultioutputLikelihood:20).
Routing is a masked sum over sub-likelihoods (XLA select) instead of GPy's
per-index python loops.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .likelihood import Likelihood
from .gaussian import Gaussian

__all__ = ["MixedNoise", "MultioutputLikelihood"]


class MixedNoise(Likelihood):
    """One Gaussian noise variance per output index (coregionalized regression).

    GPy: mixed_noise.py:14.
    """

    def __init__(self, likelihoods_list, name="mixed_noise"):
        super().__init__(None, name=name)
        assert all(isinstance(l, Gaussian) for l in likelihoods_list)
        self.likelihoods_list = list(likelihoods_list)

    def gaussian_variance(self, Y_metadata=None):
        variances = jnp.stack([jnp.asarray(l.variance) for l in self.likelihoods_list])
        idx = jnp.asarray(Y_metadata["output_index"], dtype=jnp.int32).reshape(-1)
        # one-hot matmul, not a gather: the gather's VJP is an N-update
        # scatter-add into the P variances (TPU scatters serialize)
        E = (idx[:, None] == jnp.arange(variances.shape[0])[None, :]).astype(variances.dtype)
        return (E @ variances).reshape(np.asarray(Y_metadata["output_index"]).shape)

    def noise_diagonal(self, N, Y_metadata=None):
        return self.gaussian_variance(Y_metadata).reshape(-1)

    def logpdf_link(self, link_f, y, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        return -0.5 * jnp.log(2 * jnp.pi * s2) - 0.5 * (y - link_f) ** 2 / s2

    def conditional_mean(self, f):
        return f

    def predictive_values(self, mu, var, full_cov=False, Y_metadata=None):
        s2 = self.gaussian_variance(Y_metadata)
        return mu, var + s2

    def predictive_quantiles(self, mu, var, quantiles, Y_metadata=None, **kw):
        from scipy.stats import norm

        s2 = self.gaussian_variance(Y_metadata)
        sd = jnp.sqrt(var + s2)
        return [mu + float(norm.ppf(q / 100.0)) * sd for q in quantiles]

    def samples_given_f(self, key, f, Y_metadata=None):
        import jax

        s2 = self.gaussian_variance(Y_metadata)
        return f + jnp.sqrt(s2) * jax.random.normal(key, jnp.shape(f), dtype=jnp.asarray(f).dtype)


class MultioutputLikelihood(Likelihood):
    """Heterogeneous likelihoods routed by Y_metadata['output_index'].

    GPy: multioutput_likelihood.py:20. logpdf is computed under every
    sub-likelihood and combined with an index mask — a select instead of a
    gather-scatter loop, which is the XLA-friendly formulation.
    """

    def __init__(self, likelihoods_list, name="multioutput_likelihood"):
        super().__init__(None, name=name)
        self.likelihoods_list = list(likelihoods_list)

    def _index(self, shape, Y_metadata):
        assert Y_metadata is not None and "output_index" in Y_metadata
        return jnp.asarray(Y_metadata["output_index"], dtype=jnp.int32)

    def logpdf(self, f, y, Y_metadata=None):
        idx = self._index(jnp.shape(y), Y_metadata)
        out = jnp.zeros(jnp.broadcast_shapes(jnp.shape(f), jnp.shape(y)))
        for j, lik in enumerate(self.likelihoods_list):
            sub_md = {k: v for k, v in (Y_metadata or {}).items() if k != "output_index"}
            lp = lik.logpdf(f, y, sub_md or None)
            mask = jnp.broadcast_to(idx == j, out.shape)
            out = jnp.where(mask, lp, out)
        return out

    def variational_expectations(self, Y, m, v, Y_metadata=None, gh_points_=20):
        idx = self._index(jnp.shape(Y), Y_metadata)
        out = jnp.zeros(jnp.shape(m))
        for j, lik in enumerate(self.likelihoods_list):
            sub_md = {k: val for k, val in (Y_metadata or {}).items() if k != "output_index"}
            F = lik.variational_expectations(Y, m, v, sub_md or None)
            out = jnp.where(jnp.broadcast_to(idx == j, out.shape), F, out)
        return out

    def predictive_values(self, mu, var, full_cov=False, Y_metadata=None):
        idx = self._index(jnp.shape(mu), Y_metadata)
        mean = jnp.zeros(jnp.shape(mu))
        vv = jnp.zeros(jnp.shape(var))
        for j, lik in enumerate(self.likelihoods_list):
            sub_md = {k: v2 for k, v2 in (Y_metadata or {}).items() if k != "output_index"}
            mj, vj = lik.predictive_values(mu, var, full_cov, sub_md or None)
            mask = jnp.broadcast_to(idx == j, mean.shape)
            mean = jnp.where(mask, mj, mean)
            vv = jnp.where(mask, vj, vv)
        return mean, vv
