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
import jax.scipy.linalg as jsl
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
        # init q(u) = prior N(0, Kmm): KL = 0 and the whitened coordinates
        # start at exactly I. (GPy inits the flat chol to identity,
        # core/svgp.py:24-31 — an arbitrary q with enormous initial KL when
        # Kmm is ill-conditioned; the prior init dominates it on every path.)
        Kmm0 = np.asarray(kernel.K(jnp.asarray(Z)))
        L0 = np.linalg.cholesky(Kmm0 + 1e-6 * np.eye(M))
        chol0 = np.tile(L0[None], (D, 1, 1))
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
            use_natgrad=True, whiten=False, seed=0, messages=False,
            batch_mode="auto"):
        """Compiled minibatch training: Adam on hypers/Z, natural-gradient
        ascent on (q_u_mean, S); with use_natgrad=False the variational
        params join the Adam update, parameterized by the Cholesky factor
        of S (unconditionally PD — plain ascent on S itself can step it
        indefinite when the data make the posterior covariance small).

        whiten=True trains the whitened variational distribution
        q(u) = N(Lmm v, Lmm S_w Lmm') (SURVEY §7.6): the KL is solve-free
        and the per-step algebra is two M^3 matmuls (+VJPs) cheaper; the
        model's stored (q_u_mean, q_u_chol) are converted at the fit
        boundaries, so the public parameterization is unchanged.

        batch_mode: "gather" draws each minibatch with replacement by a
        random index gather; "shuffle_slice" makes ONE device-side shuffled
        copy of the dataset per data version and draws random contiguous
        windows from it with lax.dynamic_slice (shuffled-epoch SGD —
        unbiased over the shuffle randomness, since which data rows sit
        near the array edges is itself uniformly random). "auto" (default)
        switches to shuffle_slice at num_data >= 2^20: a (4096,)-index
        gather from a 10M-row array costs 0.44 ms/step on TPU (~12 ns per
        gathered element, independent of locality — sorted or chunked
        indices measure the same) while the contiguous slice is 0.007 ms;
        this was the entire SVGP N=10M vs N=100k throughput gap.

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

        from ..inference.svgp import (CONST_JITTER, svgp_elbo_parts_L,
                                      svgp_elbo_parts_S,
                                      svgp_elbo_parts_S_white)

        opt = optax.adam(step_size)
        full_batch = batchsize >= self.num_data
        eye = jnp.eye(M, dtype=m0.dtype)

        assert batch_mode in ("auto", "gather", "shuffle_slice")
        use_shuffle = (not full_batch
                       and (batch_mode == "shuffle_slice"
                            or (batch_mode == "auto"
                                and self.num_data >= (1 << 20))))
        if use_shuffle:
            # one shuffled device copy per data version (see docstring)
            shuf = self.__dict__.get("_fit_shuffle_cache")
            if shuf is None or shuf[0] != self._data_version():
                perm = jax.random.permutation(
                    jax.random.PRNGKey(0xC0FFEE), self.num_data)
                _shuffle = jax.jit(lambda X, Y, p: (jnp.asarray(X)[p],
                                                    jnp.asarray(Y)[p]))
                Xs, Ys = _shuffle(X_all, Y_all, perm)
                shuf = (self._data_version(), Xs, Ys)
                self.__dict__["_fit_shuffle_cache"] = shuf
            X_all, Y_all = shuf[1], shuf[2]

        def _batch(key, Xd, Yd):
            # Xd/Yd are threaded through as jit ARGUMENTS: closing over the
            # dataset bakes it into the program as a constant, which both
            # bloats the executable and overflows remote-compile payload
            # limits at large N (e.g. 10M rows = 320MB)
            if full_batch:
                return Xd, Yd
            if use_shuffle:
                off = jax.random.randint(key, (), 0,
                                         self.num_data - batchsize + 1)
                return (jax.lax.dynamic_slice(Xd, (off, 0),
                                              (batchsize, Xd.shape[1])),
                        jax.lax.dynamic_slice(Yd, (off, 0),
                                              (batchsize, Yd.shape[1])))
            idx = jax.random.randint(key, (batchsize,), 0, self.num_data)
            return Xd[idx], Yd[idx]

        def _adam_on_hypers(hypers, g_h, opt_state):
            neg_gh = jax.tree_util.tree_map(lambda g: -g, g_h)
            updates, new_opt = opt.update(neg_gh, opt_state, hypers)
            return optax.apply_updates(hypers, updates), new_opt

        # --- natural-gradient step: ELBO closed-form in S ------------------
        # The step carries (S, S^-1, logdet S) so the hot loop never
        # factorizes S: the ELBO uses S through matmuls only (parts_S), the
        # entropy gradient +0.5 S^-1 is added analytically, and the update's
        # new precision H = S^-1 - 2 lr dS IS the only matrix that needs a
        # Cholesky (its factor also refreshes logdet S exactly).
        elbo_parts_S = svgp_elbo_parts_S_white if whiten else svgp_elbo_parts_S

        def elbo_S(hypers, q_mean, S, logdetS, Xb, Yb):
            model = self.with_raw_dict(hypers)
            S = 0.5 * (S + jnp.swapaxes(S, 1, 2))
            datafit, kl = elbo_parts_S(
                model.kern, Xb, jnp.asarray(model.Z), model.likelihood, Yb,
                q_mean, S, logdetS, md, scale, model.mean_function,
            )
            return datafit - kl + model.log_prior()

        def natgrad_step(carry, key, Xd, Yd):
            hypers, q_mean, S, Si, logdetS, opt_state = carry
            Xb, Yb = _batch(key, Xd, Yd)
            val, grads = jax.value_and_grad(elbo_S, argnums=(0, 1, 2))(
                hypers, q_mean, S, logdetS, Xb, Yb)
            g_h, g_m, g_S = grads
            hypers, opt_state = _adam_on_hypers(hypers, g_h, opt_state)
            lr = natgrad_step_size

            def upd(m_d, Si_d, dm_d, dS_d):
                # total dELBO/dS = autodiff part + 0.5 S^-1 (entropy term,
                # analytic because logdet S is a carried constant in elbo_S)
                dS_tot = 0.5 * (dS_d + dS_d.T) + 0.5 * Si_d
                th1 = Si_d @ m_d
                th1n = th1 + lr * (dm_d - 2.0 * dS_tot @ m_d)
                H = Si_d - 2.0 * lr * dS_tot  # -2 * new theta2 = new precision
                Lh = jnp.linalg.cholesky(H + 1e-10 * eye)
                Lhi = jsl.solve_triangular(Lh, eye, lower=True)
                S_new = Lhi.T @ Lhi
                S_new = 0.5 * (S_new + S_new.T)
                ld_new = -2.0 * jnp.sum(jnp.log(jnp.diagonal(Lh)))
                return S_new @ th1n, S_new, 0.5 * (H + H.T), ld_new

            m_new, S_new, Si_new, ld_new = jax.vmap(upd)(
                q_mean.T[:, :, None], Si, g_m.T[:, :, None], g_S)
            carry = (hypers, m_new[:, :, 0].T, S_new, Si_new, jnp.sum(ld_new), opt_state)
            return carry, val

        # --- plain-gradient step (use_natgrad=False) ------------------------
        # The carried variational covariance is its Cholesky factor Ls
        # (in the S slot of the shared carry): Adam on (hypers, m, Ls)
        # jointly. Ascent on S itself can step it indefinite (the posterior
        # covariance shrinks below the step size as data accumulates); the
        # factor parameterization is PD by construction — this is GPy's own
        # flat-chol parameterization (core/svgp.py:24-31), minus the packing.
        def elbo_L(hypers, q_mean, Ls, Xb, Yb):
            model = self.with_raw_dict(hypers)
            Ls = jnp.tril(Ls)
            if whiten:
                # traced logdet: the entropy gradient flows through it, so no
                # analytic correction is needed on the plain-gradient path
                S = jnp.einsum("dij,dkj->dik", Ls, Ls)
                logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(
                    jnp.diagonal(Ls, axis1=-2, axis2=-1))))
                datafit, kl = svgp_elbo_parts_S_white(
                    model.kern, Xb, jnp.asarray(model.Z), model.likelihood, Yb,
                    q_mean, S, logdet, md, scale, model.mean_function,
                )
                return datafit - kl + model.log_prior()
            # pass L directly — the flat-chol packing round trip (131k-element
            # scatter+gather and their VJPs) has no place in the hot loop
            datafit, kl = svgp_elbo_parts_L(
                model.kern, Xb, jnp.asarray(model.Z), model.likelihood, Yb,
                q_mean, Ls, md, scale, model.mean_function,
            )
            return datafit - kl + model.log_prior()

        def plain_step(carry, key, Xd, Yd):
            hypers, q_mean, Ls, Si, logdetS, opt_state = carry
            Xb, Yb = _batch(key, Xd, Yd)
            val, grads = jax.value_and_grad(elbo_L, argnums=(0, 1, 2))(
                hypers, q_mean, Ls, Xb, Yb)
            params = (hypers, q_mean, Ls)
            neg_g = jax.tree_util.tree_map(lambda g: -g, grads)
            updates, opt_state = opt.update(neg_g, opt_state, params)
            hypers, q_mean, Ls = optax.apply_updates(params, updates)
            return (hypers, q_mean, jnp.tril(Ls), Si, logdetS, opt_state), val

        step = natgrad_step if use_natgrad else plain_step

        # run the scan in fixed-size jitted chunks so the compiled executable
        # is reused across fit() calls (cache keyed on config below)
        CHUNK = min(iters, 100)

        def run_chunk(carry, keys, Xd, Yd):
            return jax.lax.scan(lambda c, k: step(c, k, Xd, Yd), carry, keys)

        # initial (m, S/L, S^-1, logdet S) from the stored flat chol — ONE
        # jitted dispatch: through the remote tunnel every eager op pays the
        # ~24ms dispatch floor, and the init/write-back chains have half a
        # dozen each (measured: they cost more than a whole 100-step
        # compiled chunk)
        def init_carry(chol_flat, m_in, hypers):
            Ls0 = flat_to_triang(chol_flat, M)
            m_ = m_in
            if whiten:
                # convert (m, S) -> whitened coords at the CURRENT hypers:
                # v = Lmm^-1 m, chol(S_w) = Lmm^-1 chol(S)
                mod = self.with_raw_dict(hypers)
                Kmm0 = mod.kern.K(jnp.asarray(mod.Z)) + CONST_JITTER * eye
                Lmi0 = jsl.solve_triangular(jnp.linalg.cholesky(Kmm0), eye,
                                            lower=True)
                m_ = Lmi0 @ m_
                Ls0 = jnp.einsum("ij,djk->dik", Lmi0, Ls0)  # lower-tri stays
            S0_ = jnp.einsum("dij,dkj->dik", Ls0, Ls0)
            Li0 = jax.vmap(lambda L: jsl.solve_triangular(L, eye, lower=True))(Ls0)
            Si0 = jnp.einsum("dji,djk->dik", Li0, Li0)  # L^-T L^-1 per output
            ld0 = 2.0 * jnp.sum(jnp.log(jnp.abs(
                jnp.diagonal(Ls0, axis1=-2, axis2=-1))))
            return m_, Ls0, S0_, Si0, ld0

        def write_back(q_mean, S, hypers):
            # -> (q_u_mean, q_u_chol_flat) in UNwhitened coordinates
            if use_natgrad:
                Ls = jnp.linalg.cholesky(S + 1e-10 * eye)
            else:
                Ls = jnp.tril(S)  # the plain path carries the factor itself
            if whiten:
                # un-whiten at the FINAL hypers: m = Lmm v, chol(S) = Lmm chol(S_w)
                mod = self.with_raw_dict(hypers)
                Kmm1 = mod.kern.K(jnp.asarray(mod.Z)) + CONST_JITTER * eye
                Lmm1 = jnp.linalg.cholesky(Kmm1)
                q_mean = Lmm1 @ q_mean
                Ls = jnp.einsum("ij,djk->dik", Lmm1, Ls)
            return q_mean, triang_to_flat(Ls)

        cache_key = (CHUNK, batchsize, use_natgrad, bool(whiten), use_shuffle,
                     float(step_size), float(natgrad_step_size),
                     self._data_version(), self.structure_version())
        cached = self.__dict__.get("_fit_chunk_cache")
        if cached is not None and cached[0] == cache_key:
            run_chunk_j, init_j, writeback_j = cached[1:]
        else:
            run_chunk_j = jax.jit(run_chunk)
            init_j = jax.jit(init_carry)
            writeback_j = jax.jit(write_back)
            self.__dict__["_fit_chunk_cache"] = (cache_key, run_chunk_j,
                                                 init_j, writeback_j)

        master = jax.random.PRNGKey(seed)
        m0, Ls0, S0, Si0, ld0 = init_j(jnp.asarray(self.q_u_chol), m0, hyper_raw)
        if use_natgrad:
            opt_state = opt.init(hyper_raw)
            carry = (hyper_raw, m0, S0, Si0, ld0, opt_state)
        else:
            opt_state = opt.init((hyper_raw, m0, Ls0))
            carry = (hyper_raw, m0, Ls0, Si0, ld0, opt_state)
        traces = []
        done = 0
        ci = 0
        while done < iters:
            take = min(CHUNK, iters - done)  # exact: a short tail chunk
            # compiles its own (smaller) executable instead of overshooting
            sub = jax.random.fold_in(master, ci)
            keys = jax.random.split(sub, take)
            carry, tr = run_chunk_j(carry, keys, X_all, Y_all)
            traces.append(tr)
            done += take
            ci += 1
        hypers, q_mean, S, _, _, _ = carry
        trace = jnp.concatenate(traces)
        # write back (unwhitened coordinates; one jitted dispatch)
        self.set_raw_dict(hypers)
        q_mean, chol_flat = writeback_j(q_mean, S, hypers)
        self.q_u_mean.set_value(q_mean)
        self.q_u_chol.set_value(chol_flat)
        if messages:
            print(f"SVGP fit: ELBO {float(trace[0]):.2f} -> {float(trace[-1]):.2f}")
        return np.asarray(trace)
