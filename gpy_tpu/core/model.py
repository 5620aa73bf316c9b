"""Model base: objective = -log_likelihood - log_prior, optimizers, checkgrad.

Reference: GPy/core/model.py (objective_function:96-108,
objective_function_gradients:110-127) + the paramz Model.optimize /
optimize_restarts / checkgrad machinery that GPy inherits.

TPU design: the objective is a pure jitted function of the flat unconstrained
parameter vector; `jax.value_and_grad` replaces paramz's
`_transform_gradients` chain rule and the whole observer cascade. scipy's
L-BFGS-B drives the host-side loop (like GPy's default 'lbfgsb'), calling the
compiled objective; an optax path (`optimizer='adam'`) runs fully on-device.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from .module import Module

__all__ = ["Model"]


class OptimizationResult:
    def __init__(self, x_opt, f_opt, status, n_iters, success):
        self.x_opt = x_opt
        self.f_opt = f_opt
        self.status = status
        self.n_iters = n_iters
        self.success = success

    def __repr__(self):
        return f"<OptimizationResult f_opt={self.f_opt:.6g} iters={self.n_iters} status={self.status!r}>"


class Model(Module):
    """Base for all trainable models."""

    def __init__(self, name: Optional[str] = None):
        super().__init__(name=name)
        self.__dict__["_objgrad_cache"] = None  # (structure_version, jitted_fn)

    # --- interface --------------------------------------------------------
    def log_likelihood(self):
        raise NotImplementedError

    def objective_function(self):
        """-logL - log_prior. GPy: core/model.py:96-108."""
        return -self.log_likelihood() - self.log_prior()

    def objective_function_gradients(self):
        """Gradient in unconstrained optimizer space. GPy: core/model.py:110-127."""
        _, g = self._objective_and_grad(self.get_flat_raw())
        return np.asarray(g)

    # --- jitted objective over flat raw vector ----------------------------
    def _flat_objective(self, flat):
        m = self.with_flat_raw(flat)
        return m.objective_function()

    def _get_objgrad(self):
        cache = self.__dict__.get("_objgrad_cache")
        ver = self.structure_version()
        key = (ver, self._data_version())
        if cache is not None and cache[0] == key:
            return cache[1]
        fn = jax.jit(jax.value_and_grad(self._flat_objective))
        self.__dict__["_objgrad_cache"] = (key, fn)
        return fn

    def _data_version(self) -> int:
        """Subclasses bump this when (X, Y) change, invalidating jit caches."""
        return self.__dict__.get("_data_ver", 0)

    def _bump_data_version(self):
        self.__dict__["_data_ver"] = self.__dict__.get("_data_ver", 0) + 1

    def _objective_and_grad(self, flat):
        return self._get_objgrad()(jnp.asarray(flat))

    # --- optimization -----------------------------------------------------
    def optimize(
        self,
        optimizer: str = "lbfgsb",
        max_iters: int = 1000,
        messages: bool = False,
        ipython_notebook: bool = False,
        clear_after_finish: bool = False,
        gtol: float = 1e-8,
        ftol: float = 2.2e-14,
        step_size: float = 1e-2,
        **kwargs,
    ):
        """Maximize the (penalized) marginal likelihood.

        optimizer: 'lbfgsb' | 'bfgs' | 'tnc' | 'simplex' (Nelder-Mead) |
        'scg' (Moller scaled conjugate gradients, GPy's classic default) |
        'lbfgs_device' (L-BFGS + zoom linesearch as ONE on-device
        lax.while_loop — no host round trips) |
        'adam' | 'adagrad' | 'rmsprop' | 'adadelta' | 'rprop' (on-device
        optax loops — the last two replace GPy's climin optimizers).
        GPy: GP.optimize core/gp.py:663-684 → paramz optimize.
        """
        for m in self.modules():
            hook = getattr(m, "on_optimization_start", None)
            if hook is not None and m is not self:
                hook()
        try:
            if optimizer in ("adam", "adagrad", "rmsprop", "adadelta", "rprop"):
                res = self._optimize_optax(optimizer, max_iters, step_size, messages)
            elif optimizer == "lbfgs_device":
                res = self._optimize_lbfgs_device(max_iters, messages, gtol)
            elif optimizer == "scg":
                res = self._optimize_scg(max_iters, messages, gtol, ftol)
            else:
                res = self._optimize_scipy(optimizer, max_iters, messages, gtol, ftol)
        finally:
            for m in self.modules():
                hook = getattr(m, "on_optimization_end", None)
                if hook is not None and m is not self:
                    hook()
        return res

    def _optimize_scipy(self, optimizer, max_iters, messages, gtol, ftol):
        import scipy.optimize

        objgrad = self._get_objgrad()
        n_evals = [0]
        t0 = time.time()

        def fg(x):
            n_evals[0] += 1
            v, g = objgrad(jnp.asarray(x))
            v = float(v)
            g = np.asarray(g, dtype=np.float64)
            if not np.isfinite(v):
                return 1e100, np.zeros_like(g)
            g = np.nan_to_num(g, nan=0.0, posinf=1e10, neginf=-1e10)
            if messages and n_evals[0] % 10 == 1:
                print(f"  eval {n_evals[0]:4d}  obj {v:.6f}  t={time.time()-t0:.1f}s")
            return v, g

        x0 = np.asarray(self.get_flat_raw(), dtype=np.float64)
        methods = {"lbfgsb": "L-BFGS-B", "bfgs": "BFGS", "tnc": "TNC",
                   "lbfgs": "L-BFGS-B", "simplex": "Nelder-Mead",
                   "neldermead": "Nelder-Mead"}
        if optimizer not in methods:
            raise ValueError(
                f"unknown optimizer {optimizer!r}; choose from "
                f"{sorted(methods) + ['scg', 'lbfgs_device', 'adam', 'adagrad', 'rmsprop', 'adadelta', 'rprop']}"
            )
        method = methods[optimizer]
        # scipy's TNC solver takes maxfun, not maxiter (passing maxiter
        # raises OptimizeWarning: Unknown solver options)
        opts = {"maxfun": max_iters} if method == "TNC" else {"maxiter": max_iters}
        if method == "L-BFGS-B":
            opts.update(dict(gtol=gtol, ftol=ftol, maxfun=15000 if max_iters < 15000 else max_iters * 2))
        if method == "Nelder-Mead":  # GPy 'simplex' (paramz opt_simplex): gradient-free
            r = scipy.optimize.minimize(lambda x: fg(x)[0], x0, method=method, options=opts)
        else:
            r = scipy.optimize.minimize(fg, x0, jac=True, method=method, options=opts)
        self.set_flat_raw(jnp.asarray(r.x))
        if messages:
            print(f"Optimization finished: f={r.fun:.6f} after {n_evals[0]} evals ({r.message})")
        return OptimizationResult(r.x, float(r.fun), str(r.message), int(r.get("nit", -1)), bool(r.success))

    def _optimize_scg(self, max_iters, messages, gtol, ftol, xtol=1e-8):
        """Scaled conjugate gradients (Moller 1993) — GPy's classic 'scg'
        optimizer (paramz/optimization/scg.py), reimplemented from the
        published algorithm against the jitted objective+gradient."""
        objgrad = self._get_objgrad()

        def fg(x):
            v, g = objgrad(jnp.asarray(x))
            return float(v), np.asarray(g, dtype=np.float64)

        x = np.asarray(self.get_flat_raw(), dtype=np.float64)
        sigma0 = 1e-4
        fold, gradnew = fg(x)
        fnow = fold
        gradold = gradnew.copy()
        d = -gradnew
        success = True
        nsuccess = 0
        beta, betamin, betamax = 1.0, 1e-15, 1e100
        status = "maxiter reached"
        it = 0
        mu = kappa = theta = 0.0
        for it in range(1, max_iters + 1):
            if success:
                mu = float(d @ gradnew)
                if mu >= 0:
                    d = -gradnew
                    mu = float(d @ gradnew)
                kappa = float(d @ d)
                if kappa < 1e-30:
                    status = "converged (zero direction)"
                    break
                sigma = sigma0 / np.sqrt(kappa)
                _, gplus = fg(x + sigma * d)
                theta = float(d @ (gplus - gradnew)) / sigma
            delta = theta + beta * kappa  # scaled curvature
            if delta <= 0:
                delta = beta * kappa
                beta = beta - theta / kappa
            alpha = -mu / delta
            xnew = x + alpha * d
            fnew, _ = fg(xnew)
            Delta = 2.0 * (fnew - fold) / (alpha * mu) if alpha * mu != 0 else -1.0
            if Delta >= 0 and np.isfinite(fnew):
                success = True
                nsuccess += 1
                x = xnew
                fnow = fnew
            else:
                success = False
                fnow = fold
            if messages and it % 10 == 1:
                print(f"  scg iter {it:4d}  obj {fnow:.6f}")
            if success:
                if (np.max(np.abs(alpha * d)) < xtol) and (abs(fnew - fold) < ftol):
                    status = "converged (x/f tolerance)"
                    break
                fold = fnew
                gradold = gradnew
                _, gradnew = fg(x)
                if float(gradnew @ gradnew) < gtol**2:
                    status = "converged (gradient)"
                    break
            if Delta < 0.25:
                beta = min(4.0 * beta, betamax)
            if Delta > 0.75:
                beta = max(0.5 * beta, betamin)
            if nsuccess == x.size:
                d = -gradnew
                nsuccess = 0
            elif success:
                gamma = float((gradold - gradnew) @ gradnew) / mu
                d = gamma * d - gradnew
        self.set_flat_raw(jnp.asarray(x))
        if messages:
            print(f"SCG finished: f={fnow:.6f} after {it} iters ({status})")
        return OptimizationResult(x, float(fnow), status, it, status != "maxiter reached")

    def _optimize_lbfgs_device(self, max_iters, messages, gtol):
        """L-BFGS with zoom linesearch running ENTIRELY on device.

        The scipy path ('lbfgsb') pays one host<->device round trip per
        objective evaluation (~tens of ms through a remote-device tunnel);
        here the whole bounded optimization is one jitted lax.while_loop —
        a single dispatch regardless of iteration count. Trajectories are
        not bitwise-identical to scipy's L-BFGS-B (different linesearch,
        no box constraints — raw space is unconstrained anyway), but both
        converge to the same optima; use 'lbfgsb' when exact scipy
        semantics matter.
        """
        import optax

        opt = optax.lbfgs()
        fn = self._flat_objective
        vag = optax.value_and_grad_from_state(fn)
        gtol = float(gtol)

        cache_key = ("lbfgs_device", int(max_iters), gtol,
                     self.structure_version(), self._data_version())
        cached = self.__dict__.get("_lbfgs_device_cache")
        if cached is not None and cached[0] == cache_key:
            run = cached[1]
        else:
            def cond(carry):
                _, _, it, gnorm = carry
                return (it < max_iters) & (gnorm > gtol)

            def body(carry):
                x, state, it, _ = carry
                v, g = vag(x, state=state)
                updates, state = opt.update(g, state, x, value=v, grad=g,
                                            value_fn=fn)
                x = optax.apply_updates(x, updates)
                return x, state, it + 1, jnp.max(jnp.abs(g))

            def run(x0):
                carry = (x0, opt.init(x0), 0, jnp.asarray(jnp.inf, x0.dtype))
                x, state, it, gnorm = jax.lax.while_loop(cond, body, carry)
                return x, it, gnorm

            run = jax.jit(run)
            self.__dict__["_lbfgs_device_cache"] = (cache_key, run)

        x0 = self.get_flat_raw()
        x, it, gnorm = run(x0)
        v = float(fn(x))
        it = int(it)
        # a non-finite result (diverged linesearch on a pathological start)
        # falls back to the start point rather than corrupting the model
        if not np.isfinite(v):
            x, v = x0, float(fn(x0))
        self.set_flat_raw(x)
        if messages:
            print(f"lbfgs_device finished: f={v:.6f} after {it} iters "
                  f"(max|g|={float(gnorm):.2e})")
        converged = float(gnorm) <= gtol
        return OptimizationResult(np.asarray(x), v,
                                  "converged" if converged else "max_iters",
                                  it, True)

    def _optimize_optax(self, optimizer, max_iters, step_size, messages):
        import optax

        opt = {"adam": optax.adam, "adagrad": optax.adagrad, "rmsprop": optax.rmsprop,
               "adadelta": optax.adadelta, "rprop": optax.rprop}[optimizer](step_size)

        def step(carry, _):
            x, state = carry
            v, g = jax.value_and_grad(self._flat_objective)(x)
            updates, state = opt.update(g, state, x)
            return (optax.apply_updates(x, updates), state), v

        # run whole chunks on device under one lax.scan — a per-step host
        # loop costs one dispatch round trip per iteration (~tens of ms
        # through a remote-device tunnel), dwarfing the step itself
        CHUNK = min(max_iters, 100)

        # cache the compiled chunk across optimize() calls (keyed like the
        # objgrad cache, plus the optimizer config that shapes the step)
        cache_key = (optimizer, float(step_size), self.structure_version(),
                     self._data_version())
        cached = self.__dict__.get("_optax_chunk_cache")
        if cached is not None and cached[0] == cache_key:
            run_chunk = cached[1]
        else:
            @partial(jax.jit, static_argnames="length")
            def run_chunk(carry, length):
                return jax.lax.scan(step, carry, None, length=length)

            self.__dict__["_optax_chunk_cache"] = (cache_key, run_chunk)

        x = self.get_flat_raw()
        carry = (x, opt.init(x))
        done = 0
        v = jnp.inf
        while done < max_iters:
            take = min(CHUNK, max_iters - done)  # exact: never overshoot
            carry, vs = run_chunk(carry, take)
            done += take
            v = vs[-1]
            if messages:
                print(f"  iter {done:5d}  obj {float(v):.6f}")
        x, _ = carry
        self.set_flat_raw(x)
        return OptimizationResult(np.asarray(x), float(v), f"{optimizer} finished", max_iters, True)

    def optimize_restarts(self, num_restarts=10, robust=False, verbose=True, parallel=False, seed=None, mesh=None, **kwargs):
        """GPy/paramz optimize_restarts: keep the best of several random inits.

        parallel=True runs ALL restarts simultaneously as one vmapped
        on-device optimization (requires an optax optimizer, default adam) —
        the TPU-native replacement for GPy's multiprocessing pool: R
        restarts cost barely more than one because the per-restart linalg
        batches on the MXU. Pass `mesh` (jax.sharding.Mesh) to additionally
        shard the restart batch across devices — R restarts on k chips run
        k-way data-parallel with zero cross-chip traffic (each restart is
        independent; XLA partitions the vmapped batch dimension).
        """
        rng = np.random.default_rng(seed)
        initial = self.get_flat_raw()
        if parallel:
            return self._optimize_restarts_vmapped(
                num_restarts, rng, initial, verbose, mesh=mesh, **kwargs)
        best_obj, best_x = np.inf, None
        results = []
        for i in range(num_restarts):
            try:
                if i > 0:
                    self.randomize(rng)
                res = self.optimize(**kwargs)
                results.append(res)
                if res.f_opt < best_obj:
                    best_obj, best_x = res.f_opt, self.get_flat_raw()
                if verbose:
                    print(f"Optimization restart {i+1}/{num_restarts}, f = {res.f_opt}")
            except Exception as e:
                if not robust:
                    raise
                if verbose:
                    print(f"Warning - optimization restart {i+1}/{num_restarts} failed: {e}")
        if best_x is not None:
            self.set_flat_raw(best_x)
        else:
            self.set_flat_raw(initial)
        return results

    def _optimize_restarts_vmapped(self, num_restarts, rng, initial, verbose,
                                   optimizer="adam", max_iters=1000,
                                   step_size=1e-2, mesh=None, **kwargs):
        import optax

        if optimizer not in ("adam", "adagrad", "rmsprop", "adadelta", "rprop"):
            raise ValueError(
                "parallel restarts run as one vmapped on-device loop and "
                f"need an optax optimizer, not {optimizer!r}")
        opt = {"adam": optax.adam, "adagrad": optax.adagrad,
               "rmsprop": optax.rmsprop, "adadelta": optax.adadelta,
               "rprop": optax.rprop}[optimizer](step_size)

        # batch of inits: the current point + (R-1) randomized draws
        inits = [np.asarray(initial)]
        try:
            for _ in range(num_restarts - 1):
                self.randomize(rng)
                inits.append(np.asarray(self.get_flat_raw()))
        finally:
            self.set_flat_raw(initial)
        xs0 = jnp.asarray(np.stack(inits))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            xs0 = jax.device_put(
                xs0, NamedSharding(mesh, P(tuple(mesh.axis_names))))

        def step(carry, _):
            x, st = carry
            v, g = jax.value_and_grad(self._flat_objective)(x)
            updates, st = opt.update(g, st, x)
            return (optax.apply_updates(x, updates), st), v

        def run(x0):
            (x, _), _ = jax.lax.scan(step, (x0, opt.init(x0)), None, length=max_iters)
            return x, self._flat_objective(x)

        xs, vf = jax.jit(jax.vmap(run))(xs0)
        vf = np.asarray(vf)
        vf_safe = np.where(np.isfinite(vf), vf, np.inf)
        best = int(np.argmin(vf_safe))
        if np.isfinite(vf_safe[best]):
            self.set_flat_raw(xs[best])
        if verbose:
            print(f"parallel restarts: objectives {np.round(vf, 3)} -> kept #{best}")
        return [OptimizationResult(np.asarray(xs[i]), float(vf[i]),
                                   f"{optimizer} vmapped restart", max_iters,
                                   bool(np.isfinite(vf[i])))
                for i in range(num_restarts)]

    # --- gradient checking (the universal test oracle; GPy m.checkgrad) ---
    def checkgrad(self, verbose=False, step=1e-6, tolerance=1e-3) -> bool:
        objgrad = self._get_objgrad()
        x = np.asarray(self.get_flat_raw(), dtype=np.float64)
        _, g = objgrad(jnp.asarray(x))
        g = np.asarray(g)
        num = np.zeros_like(x)
        for i in range(x.size):
            xp, xm = x.copy(), x.copy()
            xp[i] += step
            xm[i] -= step
            fp, _ = objgrad(jnp.asarray(xp))
            fm, _ = objgrad(jnp.asarray(xm))
            num[i] = (float(fp) - float(fm)) / (2 * step)
        denom = np.maximum(np.abs(g) + np.abs(num), 1e-10)
        ratio = np.abs(g - num) / denom
        ok = bool(np.all((ratio < tolerance) | (np.abs(g - num) < 1e-6)))
        if verbose:
            paths = [p for p, m, n in self._free_entries() for _ in range(int(np.prod(m._raw[n].shape)))]
            print(f"{'param':<40} {'analytic':>12} {'numeric':>12} {'ratio':>10}")
            for i in range(x.size):
                print(f"{paths[i]:<40} {g[i]:>12.6f} {num[i]:>12.6f} {ratio[i]:>10.2e}")
        return ok

    # --- serialization surface (GPy: m.save_model / m.to_dict / pickle) ----
    def to_dict(self):
        from ..util.serialization import to_dict as _td

        return _td(self)

    @staticmethod
    def from_dict(d):
        from ..util.serialization import from_dict as _fd

        return _fd(d)

    def save_model(self, output_filename, compress=True, save_data=True):
        from ..util.serialization import save_model as _sm

        return _sm(self, output_filename, compress=compress)

    def pickle(self, path):
        """GPy: m.pickle(path) — binary snapshot (gzip pickle)."""
        import gzip
        import pickle as _p

        state = {k: v for k, v in self.__dict__.items() if k not in ("_objgrad_cache", "_posterior_cache", "_fit_chunk_cache", "_optax_chunk_cache")}
        with gzip.open(path, "wb") as f:
            _p.dump((type(self), state), f)
        return path
