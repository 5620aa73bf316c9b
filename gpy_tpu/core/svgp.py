"""SVGP model: stochastic variational GP with minibatching + natural gradients.

Reference: GPy/core/svgp.py:12-105 (q(u) with flat-chol parameterization,
climin minibatch slicer, stochastic_grad, optimizeWithFreezingZ). The north
star adds natural-gradient steps on (m, S) (Hensman/Salimbeni style), which
GPy never had.

TPU design: one jitted `step` = minibatch ELBO + Adam on (hypers, Z) +
optional natural-gradient update on (q_u_mean, S); minibatch indices are
drawn on device; the whole loop runs as compiled steps with no host round
trips. The same step function is shard_map'd over the data axis in
parallel/sharded.py.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from ..inference.svgp import SVGPInference, svgp_elbo_parts
from ..util.choleskies import flat_to_triang, triang_to_flat
from .sparse_gp import SparseGP

__all__ = ["SVGP"]


class SVGP(SparseGP):
    def __init__(self, X, Y, Z, kernel, likelihood, mean_function=None,
                 name="SVGP", Y_metadata=None, batchsize: Optional[int] = None):
        super().__init__(
            X, Y, Z, kernel, likelihood,
            inference_method=SVGPInference(),
            mean_function=mean_function, name=name, Y_metadata=Y_metadata,
        )
        M = np.asarray(Z).shape[0]
        D = self.output_dim
        self._add_param("q_u_mean", np.zeros((M, D)))
        chol0 = np.tile(np.eye(M)[None], (D, 1, 1))
        self._add_param("q_u_chol", np.asarray(triang_to_flat(jnp.asarray(chol0))))
        self.batchsize = batchsize
        self.__dict__["_batch_start"] = 0

    # --- full-data ELBO (the optimization objective) -----------------------
    def log_likelihood(self):
        datafit, kl = svgp_elbo_parts(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood, self.Y_normalized,
            jnp.asarray(self.q_u_mean), jnp.asarray(self.q_u_chol),
            self.Y_metadata, 1.0, self.mean_function,
        )
        return datafit - kl

    @property
    def posterior(self):
        fp = self._param_fingerprint()
        cache = self.__dict__.get("_posterior_cache")
        if cache is not None and cache[0] == fp:
            return cache[1]
        post, _ = self.inference_method.inference(
            self.kern, self.X, jnp.asarray(self.Z), self.likelihood, self.Y_normalized,
            jnp.asarray(self.q_u_mean), jnp.asarray(self.q_u_chol),
            self.Y_metadata, 1.0, self.mean_function,
        )
        self.__dict__["_posterior_cache"] = (fp, post)
        return post

    # --- GPy-compatible minibatch API --------------------------------------
    def new_batch(self):
        """Round-robin slicer (GPy: core/svgp.py:90-96 climin slicer)."""
        assert self.batchsize is not None
        n = self.num_data
        i0 = self.__dict__["_batch_start"]
        idx = (np.arange(i0, i0 + self.batchsize) % n)
        self.__dict__["_batch_start"] = int((i0 + self.batchsize) % n)
        return np.asarray(self.X)[idx], np.asarray(self.Y_normalized)[idx]

    def stochastic_grad(self, parameters_or_batch=None):
        """Minibatch gradient of -ELBO wrt the flat raw vector (GPy API)."""
        Xb, Yb = self.new_batch()
        scale = self.num_data / self.batchsize

        def neg_elbo(flat):
            m = self.with_flat_raw(flat)
            datafit, kl = svgp_elbo_parts(
                m.kern, jnp.asarray(Xb), jnp.asarray(m.Z), m.likelihood, jnp.asarray(Yb),
                jnp.asarray(m.q_u_mean), jnp.asarray(m.q_u_chol),
                self.Y_metadata, scale, m.mean_function,
            )
            return -(datafit - kl) - m.log_prior()

        return np.asarray(jax.grad(neg_elbo)(self.get_flat_raw()))

    def optimizeWithFreezingZ(self, iters_fixed=200, iters_free=200, **kw):
        """GPy: core/svgp.py:102-105."""
        self.Z.fix()
        self.kern.get_raw_dict()  # touch
        self.optimize(max_iters=iters_fixed, **kw)
        self.Z.unfix()
        self.optimize(max_iters=iters_free, **kw)

    # --- on-device stochastic training loop --------------------------------
    def fit(self, iters=1000, batchsize=None, step_size=1e-2, natgrad_step_size=0.1,
            use_natgrad=True, seed=0, messages=False):
        """Compiled minibatch training: Adam on hypers/Z (+m,S if natgrad off),
        natural-gradient ascent on (q_u_mean, S).

        Returns the ELBO trace (per step, minibatch estimate).
        """
        import optax

        batchsize = min(batchsize or self.batchsize or min(256, self.num_data), self.num_data)
        scale = self.num_data / batchsize
        M = self.num_inducing
        D = self.output_dim
        X_all = self.X
        Y_all = self.Y_normalized
        md = self.Y_metadata

        # split params: variational (natgrad) vs the rest (adam)
        var_paths = {"q_u_mean", "q_u_chol"}
        raw = self.get_raw_dict(free_only=True)
        hyper_raw = {k: v for k, v in raw.items() if k not in var_paths}
        m0 = jnp.asarray(self.q_u_mean)
        S0 = jnp.einsum("dij,dkj->dik", flat_to_triang(jnp.asarray(self.q_u_chol), M),
                        flat_to_triang(jnp.asarray(self.q_u_chol), M))

        def elbo(hypers, q_mean, S, Xb, Yb):
            model = self.with_raw_dict(hypers)
            # symmetrize so autodiff returns the symmetric gradient dL/dS
            S = 0.5 * (S + jnp.swapaxes(S, 1, 2))
            Ls = jnp.linalg.cholesky(S + 1e-10 * jnp.eye(M, dtype=S.dtype))
            flat = triang_to_flat(Ls)
            datafit, kl = svgp_elbo_parts(
                model.kern, Xb, jnp.asarray(model.Z), model.likelihood, Yb,
                q_mean, flat, md, scale, model.mean_function,
            )
            return datafit - kl + model.log_prior()

        opt = optax.adam(step_size)
        opt_state = opt.init(hyper_raw)

        def natgrad_update(q_mean, S, dm, dS, lr):
            # natural params theta1 = S^-1 m, theta2 = -1/2 S^-1 (per output d)
            def upd(m_d, S_d, dm_d, dS_d):
                Si = jnp.linalg.inv(S_d)
                th1 = Si @ m_d
                th2 = -0.5 * Si
                g1 = dm_d - 2.0 * dS_d @ m_d
                g2 = dS_d
                th1n = th1 + lr * g1
                th2n = th2 + lr * g2
                S_new = -0.5 * jnp.linalg.inv(0.5 * (th2n + th2n.T))
                S_new = 0.5 * (S_new + S_new.T)
                return S_new @ th1n, S_new

            m_new, S_new = jax.vmap(upd)(q_mean.T[:, :, None], S, dm.T[:, :, None], dS)
            return m_new[:, :, 0].T, S_new

        full_batch = batchsize >= self.num_data

        def step(carry, key):
            hypers, q_mean, S, opt_state = carry
            if full_batch:
                Xb, Yb = X_all, Y_all
            else:
                idx = jax.random.randint(key, (batchsize,), 0, self.num_data)
                Xb, Yb = X_all[idx], Y_all[idx]
            val, grads = jax.value_and_grad(elbo, argnums=(0, 1, 2))(hypers, q_mean, S, Xb, Yb)
            g_h, g_m, g_S = grads
            neg_gh = jax.tree_util.tree_map(lambda g: -g, g_h)
            updates, new_opt = opt.update(neg_gh, opt_state, hypers)
            hypers = optax.apply_updates(hypers, updates)
            if use_natgrad:
                q_mean, S = natgrad_update(q_mean, S, g_m, g_S, natgrad_step_size)
            else:
                q_mean = q_mean + step_size * g_m
                S = S + step_size * g_S
                S = 0.5 * (S + jnp.swapaxes(S, 1, 2))
            return (hypers, q_mean, S, new_opt), val

        # run the scan in fixed-size jitted chunks so the compiled executable
        # is reused across fit() calls (cache keyed on config below)
        CHUNK = min(iters, 100)

        def run_chunk(carry, keys):
            return jax.lax.scan(step, carry, keys)

        cache_key = (CHUNK, batchsize, use_natgrad, float(step_size), float(natgrad_step_size),
                     self._data_version(), self.structure_version())
        cached = self.__dict__.get("_fit_chunk_cache")
        if cached is not None and cached[0] == cache_key:
            run_chunk_j = cached[1]
        else:
            run_chunk_j = jax.jit(run_chunk)
            self.__dict__["_fit_chunk_cache"] = (cache_key, run_chunk_j)

        master = jax.random.PRNGKey(seed)
        carry = (hyper_raw, m0, S0, opt_state)
        traces = []
        done = 0
        ci = 0
        while done < iters:
            sub = jax.random.fold_in(master, ci)
            keys = jax.random.split(sub, CHUNK)
            carry, tr = run_chunk_j(carry, keys)
            take = min(CHUNK, iters - done)
            traces.append(tr[:take])
            done += take
            ci += 1
        hypers, q_mean, S, _ = carry
        trace = jnp.concatenate(traces)
        # write back
        self.set_raw_dict(hypers)
        self.q_u_mean.set_value(q_mean)
        Ls = jnp.linalg.cholesky(S + 1e-10 * jnp.eye(M, dtype=S.dtype))
        self.q_u_chol.set_value(triang_to_flat(Ls))
        if messages:
            print(f"SVGP fit: ELBO {float(trace[0]):.2f} -> {float(trace[-1]):.2f}")
        return np.asarray(trace)
