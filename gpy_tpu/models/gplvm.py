"""GPLVM family: latent-variable models.

Reference: GPy/models/gplvm.py:11 (X as Param, grads via kern.gradients_X),
GPy/models/sparse_gplvm.py:9, GPy/models/bayesian_gplvm.py:12 (q(X) =
NormalPosterior, psi-statistics bound + KL), GPy/models/mrd.py:17
(multi-view shared latent space), GPy/inference/latent_function_inference/
inferenceX.py (infer_newX).

TPU design: X (or q(X)) is just another parameter leaf; dNLML/dX and
dELBO/d(mu,S) flow by autodiff through the Gram/psi-statistic matmuls — no
gradients_X / update_gradients_expectations plumbing.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.gp import GP
from ..core.sparse_gp import SparseGP
from ..core.variational import NormalPosterior
from ..inference.exact import ExactGaussianInference
from ..inference.var_dtc import VarDTC
from ..kern import RBF
from ..likelihoods import Gaussian
from ..util.initialization import initialize_latent

__all__ = ["GPLVM", "SparseGPLVM", "BayesianGPLVM", "MRD", "BCGPLVM",
           "DPBayesianGPLVM"]


class GPLVM(GP):
    """MAP GPLVM: latent X optimized jointly with hyperparameters."""

    def __init__(self, Y, input_dim, X=None, kernel=None, init="PCA",
                 normalizer=None, name="gplvm"):
        Y = np.asarray(Y, dtype=float)
        if X is None:
            X, _ = initialize_latent(init, input_dim, Y)
        if kernel is None:
            kernel = RBF(input_dim, ARD=input_dim > 1)
        super().__init__(X, Y, kernel, Gaussian(variance=1.0),
                         inference_method=ExactGaussianInference(),
                         name=name, normalizer=normalizer)
        self._add_param("latent_X", np.asarray(X, dtype=float))

    @property
    def _predictive_variable(self):
        return jnp.asarray(self.latent_X)

    def log_likelihood(self):
        Xl = jnp.asarray(self.latent_X)
        _, lml = self.inference_method.inference(
            self.kern, Xl, self.likelihood, self.Y_normalized, self.mean_function, self.Y_metadata
        )
        return lml

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, jnp.asarray(self.latent_X), self.likelihood, self.Y_normalized,
            self.mean_function, self.Y_metadata,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post


class BCGPLVM(GP):
    """Back-constrained GPLVM: X = mapping.f(Y), so the latent coordinates
    are a smooth parametric function of the data and the mapping's weights
    are optimized instead of free X. Reference: GPy/models/bcgplvm.py:11
    (parameters_changed pushes dL_dK -> gradients_X -> mapping grads by
    hand; here X(Y) sits inside the traced NLML and autodiff does it).
    """

    def __init__(self, Y, input_dim, kernel=None, mapping=None, name="bcgplvm"):
        from ..mappings import MLP as MLPMapping

        Y = np.asarray(Y, dtype=float)
        if mapping is None:
            mapping = MLPMapping(input_dim=Y.shape[1], output_dim=input_dim,
                                 hidden_dim=10)
        else:
            if mapping.input_dim != Y.shape[1]:
                raise ValueError("mapping input dim does not match Y dimension")
            if mapping.output_dim != input_dim:
                raise ValueError("mapping output dim does not match input_dim")
        if kernel is None:
            kernel = RBF(input_dim, ARD=input_dim > 1)
        X0 = np.asarray(mapping.f(jnp.asarray(Y)))
        super().__init__(X0, Y, kernel, Gaussian(variance=1.0),
                         inference_method=ExactGaussianInference(), name=name)
        self.mapping = mapping  # registered submodule: weights are params

    @property
    def latent_X(self):
        return self.mapping.f(jnp.asarray(self.Y_normalized))

    @property
    def _predictive_variable(self):
        return jnp.asarray(self.latent_X)

    def log_likelihood(self):
        _, lml = self.inference_method.inference(
            self.kern, self.latent_X, self.likelihood, self.Y_normalized,
            self.mean_function, self.Y_metadata,
        )
        return lml

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, self.latent_X, self.likelihood, self.Y_normalized,
            self.mean_function, self.Y_metadata,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post


class SparseGPLVM(SparseGP):
    """Sparse MAP GPLVM (GPy: sparse_gplvm.py:9)."""

    def __init__(self, Y, input_dim, X=None, kernel=None, init="PCA",
                 num_inducing=10, name="sparse_gplvm"):
        Y = np.asarray(Y, dtype=float)
        if X is None:
            X, _ = initialize_latent(init, input_dim, Y)
        if kernel is None:
            kernel = RBF(input_dim, ARD=input_dim > 1)
        rng = np.random.default_rng(0)
        Z = X[rng.permutation(X.shape[0])[:num_inducing]].copy()
        super().__init__(X, Y, Z, kernel, Gaussian(variance=1.0), name=name)
        self._add_param("latent_X", np.asarray(X, dtype=float))

    def log_likelihood(self):
        return self.inference_method.marginal_likelihood(
            self.kern, jnp.asarray(self.latent_X), jnp.asarray(self.Z),
            self.likelihood, self.Y_normalized, None, self.Y_metadata,
        )


class BayesianGPLVM(SparseGP):
    """Bayesian GPLVM: variational q(X) with psi-statistics bound.

    GPy: models/bayesian_gplvm.py:12. ELBO = VarDTC uncertain-input bound
    - KL(q(X) || N(0,I)).
    """

    def __init__(self, Y, input_dim, X=None, X_variance=None, init="PCA",
                 num_inducing=10, Z=None, kernel=None, likelihood=None,
                 name="bayesian gplvm"):
        Y = np.asarray(Y, dtype=float)
        if X is None:
            X, fracs = initialize_latent(init, input_dim, Y)
        if X_variance is None:
            X_variance = 0.5 * np.ones_like(X) + 0.01 * np.random.default_rng(0).random(X.shape)
        if Z is None:
            rng = np.random.default_rng(0)
            Z = X[rng.permutation(X.shape[0])[:num_inducing]].copy()
        if kernel is None:
            kernel = RBF(input_dim, ARD=True)
        likelihood = likelihood or Gaussian(variance=1.0)
        super().__init__(X, Y, Z, kernel, likelihood,
                         inference_method=VarDTC(), name=name)
        self.qX = NormalPosterior(X, X_variance)

    def log_likelihood(self):
        bound = self.inference_method.marginal_likelihood(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, None, self.Y_metadata, qX=self.qX,
        )
        return bound - self.qX.KL()

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood,
            self.Y_normalized, None, self.Y_metadata, qX=self.qX,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    @property
    def latent_mean(self):
        return np.asarray(self.qX.mean)

    def infer_newX(self, Y_new, optimize_iters=200, lr=1e-2, seed=0, variational=True):
        """Variational inference of q(X*) for new observations Y*.

        GPy: inference/latent_function_inference/inferenceX.py — builds a
        small gradient model over X*; here a direct jitted Adam loop over
        (mu*, S*) maximizing the bound with all model params frozen.
        variational=False gives the base-class MAP point estimate instead.
        """
        import optax

        if not variational:
            return super().infer_newX(Y_new, optimize_iters=optimize_iters,
                                      lr=lr, seed=seed, variational=False)
        Y_new = jnp.asarray(np.asarray(Y_new, dtype=float))
        n_new = Y_new.shape[0]
        Q = self.qX.input_dim
        frozen = self.stop_gradient()

        def neg_bound(mu, raw_S):
            qX = NormalPosterior(np.zeros((n_new, Q)), np.ones((n_new, Q)))
            qX._raw["mean"] = mu
            qX._raw["variance"] = raw_S
            bound = frozen.inference_method.marginal_likelihood(
                frozen.kern, None, jnp.asarray(frozen.Z), frozen.likelihood,
                Y_new, None, None, qX=qX,
            )
            return -(bound - qX.KL())

        # init mean at the training latent nearest in data space (same
        # warm start as the base-class MAP path; zero-init underconverges)
        Ytr = jnp.asarray(self.Y_normalized)
        d2 = jnp.sum((Y_new[:, None, :] - Ytr[None]) ** 2, -1)
        mu0 = jnp.asarray(self.qX.mean)[jnp.argmin(d2, axis=1)]
        rawS0 = jnp.zeros((n_new, Q))  # softplus^-1(~0.69)
        opt = optax.adam(lr)
        state = opt.init((mu0, rawS0))

        def step(carry, _):
            params, state = carry
            val, g = jax.value_and_grad(lambda p: neg_bound(*p))(params)
            updates, state = opt.update(g, state, params)
            return (optax.apply_updates(params, updates), state), val

        @jax.jit
        def run(params, state):
            # one scan — a per-step host loop is dispatch-bound
            return jax.lax.scan(step, (params, state), None, length=optimize_iters)

        (params, _), vals = run((mu0, rawS0), state)
        qX = NormalPosterior(np.asarray(params[0]), np.log1p(np.exp(np.asarray(params[1]))))
        return qX, -float(vals[-1])


class DPBayesianGPLVM(BayesianGPLVM):
    """Bayesian GPLVM with a discriminative prior on the variational latent
    means (e.g. `gpy_tpu.priors.DGPLVM`). Reference: GPy/models/dpgplvm.py:6
    (sets X_prior on self.X.mean). Any prior object whose lnpdf accepts the
    (N, Q) mean matrix works."""

    def __init__(self, Y, input_dim, X_prior, X=None, X_variance=None,
                 init="PCA", num_inducing=10, Z=None, kernel=None,
                 likelihood=None, name="dp bayesian gplvm"):
        super().__init__(Y, input_dim, X=X, X_variance=X_variance, init=init,
                         num_inducing=num_inducing, Z=Z, kernel=kernel,
                         likelihood=likelihood, name=name)
        self.qX.mean.set_prior(X_prior)


class MRD(SparseGP):
    """Manifold Relevance Determination: multiple views share one q(X),
    each view has its own (ARD) kernel, noise, and inducing inputs.

    GPy: models/mrd.py:17.
    """

    def __init__(self, Ylist, input_dim, X=None, X_variance=None, init="PCA",
                 num_inducing=10, Z=None, kernel=None, kernels=None,
                 name="mrd"):
        Ylist = [np.asarray(Y, dtype=float) for Y in Ylist]
        Ystack = np.hstack(Ylist)
        if X is None:
            X, _ = initialize_latent(init, input_dim, Ystack)
        if X_variance is None:
            X_variance = 0.5 * np.ones_like(X)
        rng = np.random.default_rng(0)
        if Z is None:
            Z = X[rng.permutation(X.shape[0])[:num_inducing]].copy()
        if kernels is None:
            kernels = [RBF(input_dim, ARD=True, name=f"rbf_view{i}") for i in range(len(Ylist))]
        # base holds view 0; other views appended
        super().__init__(X, Ylist[0], Z, kernels[0], Gaussian(variance=1.0),
                         inference_method=VarDTC(), name=name)
        self.qX = NormalPosterior(X, X_variance)
        self.views_Y = [jnp.asarray(Y) for Y in Ylist]
        self.view_kernels = list(kernels)
        self.view_likelihoods = [Gaussian(variance=1.0, name=f"noise_view{i}") for i in range(len(Ylist))]

    def log_likelihood(self):
        Z = jnp.asarray(self.Z)
        total = 0.0
        for Y, k, lik in zip(self.views_Y, self.view_kernels, self.view_likelihoods):
            total = total + self.inference_method.marginal_likelihood(
                k, None, Z, lik, Y, None, None, qX=self.qX
            )
        return total - self.qX.KL()

    def scales(self):
        """Per-view ARD relevances (the MRD diagnostic)."""
        return [np.asarray(k.input_sensitivity()) for k in self.view_kernels]
