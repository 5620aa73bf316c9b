"""GP base class: data + kern + likelihood + inference, full predict API.

Reference: GPy/core/gp.py (789 LoC): __init__:38-108, parameters_changed:269,
predict:308-365, predict_quantiles:395-416, predictive_gradients:418-474,
predict_jacobian:476-539, posterior_samples:601-652, optimize:663-684,
log_predictive_density:700-732, posterior_covariance_between_points:735-786,
set_XY:212-249.

TPU design: no observer cascade — `log_likelihood()` is a pure function of
the parameter pytree, re-traced under jit by Model.optimize. The posterior is
computed on demand and cached against the current parameter values (GPy
recomputes it inside parameters_changed on every mutation)."""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import default_dtype
from ..inference.exact import ExactGaussianInference
from ..likelihoods.gaussian import Gaussian
from .model import Model

__all__ = ["GP"]


class GP(Model):
    def __init__(
        self,
        X,
        Y,
        kernel,
        likelihood,
        inference_method=None,
        mean_function=None,
        name: str = "gp",
        Y_metadata: Optional[dict] = None,
        normalizer=None,
    ):
        super().__init__(name=name)
        dt = default_dtype()
        self.__dict__["X"] = jnp.asarray(np.asarray(X, dtype=float), dtype=dt)
        Ynp = np.asarray(Y, dtype=float)
        assert Ynp.ndim == 2, "Y must be (N, D)"
        self.num_data, self.input_dim = self.X.shape
        _, self.output_dim = Ynp.shape
        self.Y_metadata = Y_metadata

        # normalizer handling (GPy: core/gp.py:49-65)
        if normalizer is True:
            from ..util.normalizer import Standardize

            normalizer = Standardize()
        self.normalizer = normalizer or None
        if self.normalizer is not None:
            self.normalizer.scale_by(Ynp)
            self.__dict__["Y_normalized"] = jnp.asarray(self.normalizer.normalize(Ynp), dtype=dt)
        else:
            self.__dict__["Y_normalized"] = jnp.asarray(Ynp, dtype=dt)
        self.__dict__["Y"] = jnp.asarray(Ynp, dtype=dt)

        # default inference method (GPy: core/gp.py:97-102)
        if inference_method is None:
            if isinstance(likelihood, Gaussian):
                inference_method = ExactGaussianInference()
            else:
                from ..inference.ep import EP

                inference_method = EP()
        self.inference_method = inference_method

        self.kern = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.__dict__["_posterior_cache"] = None

    # --- objective ---------------------------------------------------------
    def log_likelihood(self):
        return self.inference_method.marginal_likelihood(
            self.kern, self.X, self.likelihood, self.Y_normalized, self.mean_function, self.Y_metadata
        )

    # --- posterior (cached against parameter values) ----------------------
    @property
    def _predictive_variable(self):
        return self.X

    def _param_fingerprint(self):
        raws = self.get_raw_dict()
        return (
            self._data_version(),
            tuple(sorted((k, np.asarray(v).tobytes()) for k, v in raws.items())),
        )

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post = self._compute_posterior()
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    def _compute_posterior(self):
        """Posterior at the current parameters.

        For plain exact-Gaussian inference the whole computation runs as
        ONE cached jitted program (hyperparameters and data as arguments):
        running it eagerly costs a per-op compile + ~24ms tunnel dispatch
        per operation on TPU, which made the first predict after every
        optimize() seconds-slow. Other inference methods (EP site loops
        with host-side persistence, Laplace, iterative) keep the eager
        path — their inference() implementations manage their own
        compiled internals.
        """
        from ..inference.exact import ExactGaussianInference
        from ..inference.posterior import Posterior as _WPost

        # uncertain-input X is a variational posterior (has .variance;
        # plain np/jnp arrays have .mean but no .variance attribute)
        if (type(self.inference_method) is ExactGaussianInference
                and not hasattr(self.X, "variance")):
            key = ("postexec", self.structure_version(), self._data_version(),
                   tuple(np.shape(self.X)))
            ecache = self.__dict__.setdefault("_posterior_exec_cache", {})
            fn = ecache.get(key)
            if fn is None:
                def _fn(fl, X, Y):
                    mod = self.with_flat_raw(fl)
                    p, _ = self.inference_method.inference(
                        mod.kern, X, mod.likelihood, Y,
                        mod.mean_function, self.Y_metadata)
                    return p._woodbury_chol, p._woodbury_vector, p._K

                fn = jax.jit(_fn)
                ecache[key] = fn
            L, alpha, K = fn(jnp.asarray(self.get_flat_raw()),
                             jnp.asarray(self.X),
                             jnp.asarray(self.Y_normalized))
            return _WPost(woodbury_chol=L, woodbury_vector=alpha, K=K)
        post, _ = self.inference_method.inference(
            self.kern, self.X, self.likelihood, self.Y_normalized,
            self.mean_function, self.Y_metadata
        )
        return post

    # --- prediction --------------------------------------------------------
    def _raw_predict(self, Xnew, full_cov=False, kern=None):
        (mu, var), _ = self._raw_predict_ex(Xnew, full_cov=full_cov, kern=kern)
        return mu, var

    def _raw_predict_ex(self, Xnew, full_cov=False, kern=None,
                        tail=None, tail_key=None, tail_args=()):
        """Raw predict, optionally folding a traced ``tail(mod, mu, var)``
        (e.g. the likelihood's predictive_values, or quantiles) into the
        same jitted program — one tunnel dispatch for the whole predict
        instead of one per eager op (measured 48.8 -> ~25 ms warm on TPU).
        Returns (result, tail_folded): result is (mu, var) when the tail
        was not folded, else whatever the tail returned."""
        kern_arg = kern
        kern = kern or self.kern
        if hasattr(Xnew, "mean") and hasattr(Xnew, "variance"):
            # uncertain inputs: Xnew is a variational posterior q(X*)
            # (GPy: predict(Xnew=VariationalPosterior) -> psi-statistics
            # branch of posterior.py:249-270). Mean functions of a random
            # input have no closed-form expectation here, matching GPy.
            mu, var = self.posterior._raw_predict(kern, Xnew, self._predictive_variable, full_cov)
            return (mu, var), False
        Xnew = jnp.asarray(np.asarray(Xnew, dtype=float), dtype=self.X.dtype)
        post = self.posterior
        from ..inference.posterior import Posterior as _WPost

        # One jitted executable per (shape, full_cov, posterior form),
        # cached on the model: running the prediction math eagerly costs a
        # per-op compile + ~24ms tunnel dispatch PER OPERATION on TPU
        # (measured: 33s cold / 0.1s warm for one 256-point ARD predict —
        # dozens of one-op programs). Hyperparameters and the woodbury
        # arrays enter as ARGUMENTS, so re-optimizing the model re-uses
        # the same executable.
        jittable = (isinstance(post, _WPost)
                    and type(post)._raw_predict is _WPost._raw_predict)
        if not jittable:
            mu, var = post._raw_predict(kern, Xnew, self._predictive_variable, full_cov)
            if self.mean_function is not None:
                mu = mu + self.mean_function.f(Xnew)
            return (mu, var), False
        wv, wi, wc = post.woodbury_vector, post._woodbury_inv, post._woodbury_chol
        cache = self.__dict__.setdefault("_predict_exec_cache", {})

        def _key(with_tail):
            return ("rawpred", Xnew.shape, str(Xnew.dtype), bool(full_cov),
                    None if kern_arg is None else id(kern_arg),
                    self.structure_version(),
                    (wv is None, wi is None, wc is None),
                    self.mean_function is not None,
                    tail_key if with_tail else None)

        def _make(with_tail):
            def _fn(fl, Xn, pv, wv, wi, wc, *textra):
                mod = self.with_flat_raw(fl)
                k = kern_arg if kern_arg is not None else mod.kern
                p = _WPost(woodbury_vector=wv, woodbury_inv=wi,
                           woodbury_chol=wc)
                mu, var = p._raw_predict(k, Xn, pv, full_cov)
                if mod.mean_function is not None:
                    mu = mu + mod.mean_function.f(Xn)
                if with_tail:
                    return tail(mod, mu, var, *textra)
                return mu, var

            return jax.jit(_fn)

        args = (jnp.asarray(self.get_flat_raw()), Xnew,
                jnp.asarray(self._predictive_variable), wv, wi, wc)
        if tail is not None:
            key = _key(True)
            fn = cache.get(key)
            if fn is None and key not in getattr(self, "_predict_fold_failed", set()):
                fn = cache[key] = _make(True)
            if fn is not None:
                try:
                    return fn(*args, *tail_args), True
                except Exception:  # non-traceable tail: fall back
                    cache.pop(key, None)
                    self.__dict__.setdefault("_predict_fold_failed", set()).add(key)
        key = _key(False)
        fn = cache.get(key)
        if fn is None:
            fn = cache[key] = _make(False)
        return fn(*args), False

    def predict(self, Xnew, full_cov=False, Y_metadata=None, kern=None, likelihood=None,
                include_likelihood=True):
        """Predictive mean and variance of Y*. GPy: core/gp.py:308-365."""
        lik = likelihood or self.likelihood
        lik_is_self = likelihood is None
        folded = False
        if (type(self)._raw_predict is not GP._raw_predict
                or not include_likelihood or Y_metadata is not None):
            # subclass supplies its own raw-predict (warped inputs,
            # coregionalized index handling), or an eager-only tail:
            # honor it, no folding
            mu, var = self._raw_predict(Xnew, full_cov=full_cov, kern=kern)
        else:
            def _tail(mod, mu, var):
                lk = mod.likelihood if lik_is_self else lik
                return lk.predictive_values(mu, var, full_cov, Y_metadata=None)

            (mu, var), folded = self._raw_predict_ex(
                Xnew, full_cov=full_cov, kern=kern,
                tail=_tail, tail_key=("lik", True if lik_is_self else id(lik)))
        if include_likelihood and not folded:
            mu, var = lik.predictive_values(mu, var, full_cov, Y_metadata=Y_metadata)
        # single host fetch for both outputs: two sequential np.asarray
        # fetches pay two ~24ms tunnel RTTs (see CLAUDE.md timing rules)
        mu, var = jax.device_get((mu, var))
        if self.normalizer is not None:
            mu = self.normalizer.inverse_mean(np.asarray(mu))
            if full_cov:
                var = self.normalizer.inverse_covariance(np.asarray(var))
            else:
                var = self.normalizer.inverse_variance(np.asarray(var))
            return np.asarray(mu), np.asarray(var)
        return np.asarray(mu), np.asarray(var)

    def predict_noiseless(self, Xnew, full_cov=False, Y_metadata=None, kern=None):
        return self.predict(Xnew, full_cov, Y_metadata, kern, include_likelihood=False)

    def predict_quantiles(self, Xnew, quantiles=(2.5, 97.5), Y_metadata=None, kern=None,
                          likelihood=None):
        """GPy: core/gp.py:395-416."""
        lik = likelihood or self.likelihood
        lik_is_self = likelihood is None
        qs = None
        if (type(self)._raw_predict is GP._raw_predict
                and Y_metadata is None):
            # fold the quantile math into the jitted predict program
            # (one tunnel dispatch; same rationale as predict())
            def _tail(mod, mu, var):
                lk = mod.likelihood if lik_is_self else lik
                out = lk.predictive_quantiles(mu, var, tuple(quantiles),
                                              Y_metadata=None)
                return tuple(out)

            res, folded = self._raw_predict_ex(
                Xnew, full_cov=False, kern=kern, tail=_tail,
                tail_key=("quant", tuple(quantiles),
                          True if lik_is_self else id(lik)))
            if folded:
                qs = list(jax.device_get(res))
            else:
                mu, var = res
                qs = lik.predictive_quantiles(mu, var, quantiles,
                                              Y_metadata=Y_metadata)
        if qs is None:
            mu, var = self._raw_predict(Xnew, full_cov=False, kern=kern)
            qs = lik.predictive_quantiles(mu, var, quantiles, Y_metadata=Y_metadata)
        if self.normalizer is not None:
            qs = [self.normalizer.inverse_mean(np.asarray(q)) for q in qs]
        return [np.asarray(q) for q in qs]

    def predictive_gradients(self, Xnew, kern=None):
        """d mu/d Xnew (N*, Q, D) and d var/d Xnew (N*, Q). GPy: gp.py:418-474."""
        kern = kern or self.kern
        Xnew = jnp.asarray(np.asarray(Xnew, dtype=float), dtype=self.X.dtype)
        wv = self.posterior.woodbury_vector
        pv = self._predictive_variable

        def mu_one(x):
            mu = kern.K(x[None], pv) @ wv  # (1, D)
            if self.mean_function is not None:
                mu = mu + self.mean_function.f(x[None])
            return mu[0]

        def var_one(x):
            _, v = self.posterior._raw_predict(kern, x[None], pv, full_cov=False)
            return v[0, 0]

        dmu = jax.vmap(jax.jacfwd(mu_one))(Xnew)  # (N*, D, Q)
        dvar = jax.vmap(jax.grad(var_one))(Xnew)  # (N*, Q)
        return np.asarray(jnp.swapaxes(dmu, 1, 2)), np.asarray(dvar)

    def predict_jacobian(self, Xnew, kern=None, full_cov=False):
        """Jacobian of the posterior mean. GPy: gp.py:476-539 (mean part)."""
        dmu, _ = self.predictive_gradients(Xnew, kern=kern)
        return dmu

    def predict_wishart_embedding(self, Xnew, kern=None, mean=True, covariance=True):
        """Expected Fisher/Wishart metric G = J^T J summed over outputs.

        GPy: gp.py:541-599 (predict_wishart_embedding)."""
        dmu = self.predict_jacobian(Xnew, kern=kern)  # (N*, Q, D)
        G = np.einsum("nqd,npd->nqp", dmu, dmu)
        return G

    def predict_magnification(self, Xnew, kern=None):
        G = self.predict_wishart_embedding(Xnew, kern=kern)
        return np.sqrt(np.maximum(np.linalg.det(G), 0.0))

    # --- sampling ----------------------------------------------------------
    @staticmethod
    def _sample_f_tail(mu, var, key, size, full_cov):
        n, D = mu.shape
        if full_cov:
            jitter = 1e-8 * jnp.trace(var) / n * jnp.eye(n, dtype=var.dtype)
            L = jnp.linalg.cholesky(var + jitter)
            z = jax.random.normal(key, (D, n, size), dtype=mu.dtype)
            samples = mu.T[:, :, None] + jnp.einsum("ij,djs->dis", L, z)
        else:
            z = jax.random.normal(key, (D, n, size), dtype=mu.dtype)
            samples = mu.T[:, :, None] + jnp.sqrt(var).T[:, :, None] * z
        return jnp.moveaxis(samples, 0, 1)  # (n, D, size)

    def posterior_samples_f(self, X, size=10, full_cov=True, seed=0, **kw):
        """Samples of latent f*. GPy: gp.py:601-628.

        The sample math runs inside the cached jitted predict program (one
        tunnel dispatch); the PRNG key is an argument, never a trace
        constant (fresh seeds must not recompile)."""
        out = None
        if type(self)._raw_predict is GP._raw_predict:
            def _tail(mod, mu, var, key):
                return GP._sample_f_tail(mu, var, key, size, full_cov)

            res, folded = self._raw_predict_ex(
                X, full_cov=full_cov, tail=_tail,
                tail_key=("samplesf", int(size)),
                tail_args=(jax.random.PRNGKey(seed),))
            if folded:
                out = res
        if out is None:
            mu, var = self._raw_predict(X, full_cov=full_cov)
            out = GP._sample_f_tail(jnp.asarray(mu), jnp.asarray(var),
                                    jax.random.PRNGKey(seed), size, full_cov)
        if self.normalizer is not None:
            out = jnp.asarray(self.normalizer.inverse_mean(np.asarray(out).transpose(0, 2, 1)).transpose(0, 2, 1))
        return np.asarray(out)

    def posterior_samples(self, X, size=10, Y_metadata=None, seed=0, full_cov=True, **kw):
        """Samples of Y*. GPy: gp.py:630-652. Folded into one jitted
        dispatch (f samples + likelihood sampling) when possible."""
        if (type(self)._raw_predict is GP._raw_predict
                and Y_metadata is None and self.normalizer is None):
            def _tail(mod, mu, var, key):
                kf, ky = jax.random.split(key)
                fs = GP._sample_f_tail(mu, var, kf, size, full_cov)
                return mod.likelihood.samples_given_f(ky, fs, None)

            res, folded = self._raw_predict_ex(
                X, full_cov=full_cov, tail=_tail,
                tail_key=("samplesy", int(size)),
                tail_args=(jax.random.PRNGKey(seed),))
            if folded:
                return np.asarray(jax.device_get(res))
        fs = self.posterior_samples_f(X, size=size, seed=seed,
                                      full_cov=full_cov, **kw)
        key = jax.random.PRNGKey(seed + 1)
        ys = self.likelihood.samples_given_f(key, jnp.asarray(fs), Y_metadata)
        return np.asarray(ys)

    # --- densities ----------------------------------------------------------
    def log_predictive_density(self, x_test, y_test, Y_metadata=None):
        """GPy: gp.py:700-714."""
        y = np.asarray(y_test, dtype=float)
        if self.normalizer is not None:
            y = self.normalizer.normalize(y)
        if (type(self)._raw_predict is GP._raw_predict
                and Y_metadata is None):
            def _tail(mod, mu, var, yj):
                return mod.likelihood.log_predictive_density(yj, mu, var, None)

            res, folded = self._raw_predict_ex(
                x_test, full_cov=False, tail=_tail, tail_key=("lpd",),
                tail_args=(jnp.asarray(y),))
            if folded:
                return np.asarray(jax.device_get(res))
            mu, var = res
        else:
            mu, var = self._raw_predict(x_test)
        return np.asarray(
            self.likelihood.log_predictive_density(jnp.asarray(y), mu, var, Y_metadata)
        )

    def log_predictive_density_sampling(self, x_test, y_test, Y_metadata=None,
                                        num_samples=1000, seed=0):
        """Monte-Carlo log predictive density: log (1/S) sum_s p(y*|f_s) with
        f_s ~ posterior marginals at x*. GPy: gp.py:716-732."""
        mu, var = self._raw_predict(x_test)
        y = np.asarray(y_test, dtype=float)
        if self.normalizer is not None:
            y = self.normalizer.normalize(y)
        key = jax.random.PRNGKey(seed)
        mu = jnp.asarray(mu)
        sd = jnp.sqrt(jnp.asarray(var))
        fs = mu[None] + sd[None] * jax.random.normal(key, (num_samples,) + mu.shape)
        logp = self.likelihood.logpdf(fs, jnp.asarray(y)[None], Y_metadata)
        return np.asarray(jax.scipy.special.logsumexp(logp, axis=0) - jnp.log(num_samples))

    def infer_newX(self, Y_new, optimize_iters=200, lr=1e-2, seed=0,
                   variational=False, tol=1e-6, optimizer="adam"):
        """Latent positions X* for new observations Y* on a trained
        latent-variable GP. GPy: gp.py:686-698 +
        inference/latent_function_inference/inferenceX.py:1-173 (which builds
        a throwaway gradient model and runs a real optimizer to tolerance;
        here the same convergence semantics run as one jitted while_loop).

        variational=False (default): MAP point estimate — maximize
        sum_d log p(y*_d | f(x*)) under the current posterior.
        Returns (X*, log_likelihood).

        variational=True: optimize a full q(X*) = prod N(mu, diag(S))
        (the reference's InferenceX path when the source model is Bayesian,
        inferenceX.py:35-60): maximize E_q[log p(y*|f*)] - KL(q || N(0,I))
        with E_q taken through the psi-statistics posterior predictive
        (posterior.py:249-270). Returns (NormalPosterior q(X*), elbo).

        optimize_iters is the iteration BUDGET; the loop exits early once the
        relative objective decrease falls below `tol` (tol=0 restores the
        fixed-budget behavior). optimizer: "adam" (default) or "lbfgs"
        (optax.lbfgs with zoom linesearch — the reference uses scg/lbfgs via
        the throwaway model's optimize()). The converged iteration count is
        stored on self._infer_newX_iters.
        """
        import optax

        Y_new = jnp.asarray(np.asarray(Y_new, dtype=float))
        if self.normalizer is not None:
            Y_new = jnp.asarray(self.normalizer.normalize(np.asarray(Y_new)))
        pv = self._predictive_variable
        post = self.posterior
        kern = self.kern.stop_gradient() if hasattr(self.kern, "stop_gradient") else self.kern
        noise = jnp.asarray(self.likelihood.variance) if hasattr(self.likelihood, "variance") else 1e-6

        # init mean at the training latent nearest in data space
        Ytr = jnp.asarray(self.Y_normalized)
        d2 = jnp.sum((Y_new[:, None, :] - Ytr[None]) ** 2, -1)
        X0 = pv[jnp.argmin(d2, axis=1)]

        if variational:
            from types import SimpleNamespace

            def neg_elbo(params):
                mu_x, raw_S = params
                S = jnp.exp(raw_S)
                qX = SimpleNamespace(mean=mu_x, variance=S)
                mu, var = post._raw_predict(kern, qX, pv, full_cov=False)
                # E_q E_{p(f|x)}[(y - f)^2] = (y - mu)^2 + Var[f*] (total)
                ell = -0.5 * jnp.sum(
                    ((Y_new - mu) ** 2 + var) / noise + jnp.log(2 * jnp.pi * noise)
                )
                kl = 0.5 * jnp.sum(mu_x**2 + S - jnp.log(S) - 1.0)
                return -(ell - kl)

            params0 = (X0, jnp.full_like(X0, jnp.log(0.5)))
        else:

            def neg_elbo(Xs):
                mu, var = post._raw_predict(kern, Xs, pv, full_cov=False)
                v = var + noise
                return 0.5 * jnp.sum((Y_new - mu) ** 2 / v + jnp.log(2 * jnp.pi * v))

            params0 = X0

        use_lbfgs = str(optimizer).lower() in ("lbfgs", "l-bfgs-b", "bfgs")
        opt = optax.lbfgs() if use_lbfgs else optax.adam(lr)
        state = opt.init(params0)

        def step(p, state):
            val, g = jax.value_and_grad(neg_elbo)(p)
            if use_lbfgs:
                updates, state = opt.update(g, state, p, value=val, grad=g,
                                            value_fn=neg_elbo)
            else:
                updates, state = opt.update(g, state, p)
            return optax.apply_updates(p, updates), state, val

        # whole ascent as one while_loop with relative-decrease stopping —
        # a per-step host loop is dispatch-bound. The carry's value slots
        # must match neg_elbo's output dtype (NOT Y_new's: f32 Y under x64
        # would raise a while_loop carry-dtype mismatch)
        big = jnp.asarray(jnp.inf, dtype=jax.eval_shape(neg_elbo, params0).dtype)

        def cond(carry):
            _, _, prev, val, it = carry
            keep = it < optimize_iters
            if tol and tol > 0:
                unconverged = (it < 2) | (
                    jnp.abs(prev - val) > tol * (1.0 + jnp.abs(val)))
                keep = keep & unconverged
            return keep

        def body(carry):
            p, state, _, val_prev, it = carry
            p, state, val = step(p, state)
            return (p, state, val_prev, val, it + 1)

        @jax.jit
        def run(p0, state):
            p, state, _, val, it = jax.lax.while_loop(
                cond, body, (p0, state, big, big, jnp.asarray(0)))
            # one final evaluation at the converged point
            return p, neg_elbo(p), it

        p, final_val, iters_used = run(params0, state)
        self._infer_newX_iters = int(iters_used)
        vals = jnp.asarray([final_val])
        if variational:
            from .variational import NormalPosterior

            qX = NormalPosterior(np.asarray(p[0]), np.asarray(jnp.exp(p[1])))
            return qX, -float(vals[-1])
        return np.asarray(p), -float(vals[-1])

    def posterior_covariance_between_points(self, X1, X2, kern=None):
        """GPy: gp.py:735-786."""
        kern = kern or self.kern
        cov = self.posterior.covariance_between_points(
            kern, self._predictive_variable, jnp.asarray(np.asarray(X1, float)), jnp.asarray(np.asarray(X2, float))
        )
        if self.normalizer is not None:
            cov = self.normalizer.inverse_covariance(np.asarray(cov))
        return np.asarray(cov)

    # --- data mutation ------------------------------------------------------
    def set_XY(self, X=None, Y=None):
        """GPy: gp.py:212-249."""
        dt = default_dtype()
        if X is not None:
            self.__dict__["X"] = jnp.asarray(np.asarray(X, dtype=float), dtype=dt)
            self.num_data = self.X.shape[0]
        if Y is not None:
            Ynp = np.asarray(Y, dtype=float)
            if self.normalizer is not None:
                self.normalizer.scale_by(Ynp)
                self.__dict__["Y_normalized"] = jnp.asarray(self.normalizer.normalize(Ynp), dtype=dt)
            else:
                self.__dict__["Y_normalized"] = jnp.asarray(Ynp, dtype=dt)
            self.__dict__["Y"] = jnp.asarray(Ynp, dtype=dt)
        self._bump_data_version()
        self.__dict__["_posterior_cache"] = None

    def set_X(self, X):
        self.set_XY(X=X)

    def set_Y(self, Y):
        self.set_XY(Y=Y)

    def optimize(self, optimizer="lbfgsb", **kwargs):
        self.inference_method.on_optimization_start()
        if getattr(self.inference_method, "_frozen", False):
            # alternated EP: converge sites once, eagerly, at the current
            # hypers; the optimization objective then holds them fixed.
            # The jitted objective must be rebuilt around the new constants.
            self.__dict__["_posterior_cache"] = None
            _ = self.posterior
            self.__dict__["_objgrad_cache"] = None
        try:
            return super().optimize(optimizer=optimizer, **kwargs)
        finally:
            self.inference_method.on_optimization_end()
            if getattr(self.inference_method, "ep_mode", None) == "alternated":
                self.__dict__["_objgrad_cache"] = None
                self.__dict__["_posterior_cache"] = None
