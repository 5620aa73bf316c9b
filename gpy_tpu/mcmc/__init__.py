"""MCMC over model (hyper)parameters.

Reference: GPy/inference/mcmc/hmc.py (HMC.sample:30-59, leapfrog _update
:61-65, HMC_shortcut:70-173) and GPy/inference/mcmc/samplers.py
(Metropolis_Hastings:17-82). Both are single-threaded Python loops over
one chain.

TPU design: the whole sampler is one `lax.scan` over jitted leapfrog steps;
chains are `vmap`'d and — on a mesh — sharded one-or-more per chip with
`shard_map`, with dual-averaging step-size adaptation driven by the
`pmean`-averaged acceptance statistic (the BASELINE.json "sharded chains
with collectives" requirement; GPy has no equivalent).

Like GPy, sampling runs in the *unconstrained* optimizer space against
-objective (= logL + log prior); GPy ignores the log-Jacobian of the
constraint transform and `jacobian_correction=False` reproduces that;
set True for the mathematically exact posterior.
"""
from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# vmapped chains per sequential group (see HMC.sample); 0 disables grouping
_CHAIN_GROUP = int(os.environ.get("GPY_TPU_HMC_GROUP", "8"))

__all__ = ["HMC", "HMC_shortcut", "Metropolis_Hastings"]


def _logp_fn(model, jacobian_correction: bool):
    """Build logp(flat_raw) = logL + log prior (+ log|dconstrained/draw|)."""

    def logp(flat):
        m = model.with_flat_raw(flat)
        lp = m.log_likelihood() + m.log_prior()
        if jacobian_correction:
            # sum over free params of log d(transform)/d(raw), elementwise
            i = 0
            for path, mod, n in model._free_entries():
                spec = mod._specs[n]
                sz = int(np.prod(mod._raw[n].shape))
                if spec.transform is not None:
                    r = flat[i : i + sz]
                    d = jax.vmap(jax.grad(lambda x: spec.transform.forward(x)))(r)
                    lp = lp + jnp.sum(jnp.log(jnp.abs(d) + 1e-300))
                i += sz
        return lp

    return logp


class HMC:
    """Hamiltonian Monte Carlo over model hyperparameters.

    API mirrors GPy: HMC(model, stepsize=...).sample(num_samples) returns
    samples in *constrained* parameter space, shape (num_samples, P)
    [per chain when num_chains > 1: (C, num_samples, P)].
    """

    def __init__(self, model, M=None, stepsize: float = 0.1, num_leapfrog: int = 20,
                 jacobian_correction: bool = False):
        self.model = model
        self.stepsize = stepsize
        self.num_leapfrog = num_leapfrog
        self.p = model.get_flat_raw()
        n = self.p.shape[0]
        self._user_M = M is not None
        self.M = jnp.asarray(M) if M is not None else jnp.eye(n, dtype=self.p.dtype)
        from ..util.linalg import solve_lu_safe
        self.Minv = solve_lu_safe(self.M, jnp.eye(self.M.shape[0], dtype=self.M.dtype))
        # momentum sampling uses a PRE-FACTORED mass matrix: calling
        # multivariate_normal inside the leapfrog kernel re-cholesky's M
        # every step (and under vmap that's a serialized batched tiny chol)
        self.M_chol = jnp.linalg.cholesky(self.M)
        self._logp = _logp_fn(model, jacobian_correction)

    def _check_mass_matrix(self, n):
        """Keep M consistent when the model's free-param count changed
        (fix/tie after construction). Default identity M is rebuilt; a
        user-supplied M of the wrong size is an error."""
        if self.M.shape[0] == n:
            return
        if self._user_M:
            raise ValueError(
                f"mass matrix is {self.M.shape[0]}x{self.M.shape[0]} but the "
                f"model now has {n} free parameters; construct a new HMC "
                f"with a matching M")
        dt = self.M.dtype
        self.M = jnp.eye(n, dtype=dt)
        self.Minv = jnp.eye(n, dtype=dt)
        self.M_chol = jnp.eye(n, dtype=dt)

    # --- single-chain kernel ----------------------------------------------
    def _hmc_kernel(self, logp):
        eps_leapfrog = self.num_leapfrog
        Minv = self.Minv
        M = self.M

        Mc = self.M_chol

        def kernel(x, key, eps):
            k1, k2 = jax.random.split(key)
            p0 = Mc @ jax.random.normal(k1, x.shape, dtype=x.dtype)
            vglogp = jax.value_and_grad(logp)

            # Stoermer-Verlet with the gradient (and logp value) CARRIED:
            # the end-of-step half-kick and the next step's start half-kick
            # use the same gradient, so evaluating glogp twice per step (as
            # the textbook per-step form writes it) doubles the dominant
            # cost for bit-identical math. One value_and_grad per step, plus
            # one at x0 — H0/H1 come from the carried values for free
            # (22 -> 11 logp evaluations per proposal at num_leapfrog=10;
            # measured 1.9x HMC samples/s on v5e-1).
            v0, g0 = vglogp(x)

            def leapfrog(carry, _):
                xx, pp, g, _v = carry
                pp_half = pp + 0.5 * eps * g
                xx2 = xx + eps * (Minv @ pp_half)
                v2, g2 = vglogp(xx2)
                pp2 = pp_half + 0.5 * eps * g2
                return (xx2, pp2, g2, v2), None

            (x_new, p_new, _, v_new), _ = lax.scan(
                leapfrog, (x, p0, g0, v0), None, length=eps_leapfrog)
            H0 = -v0 + 0.5 * p0 @ Minv @ p0
            H1 = -v_new + 0.5 * p_new @ Minv @ p_new
            # divergent trajectories (NaN/inf energy) are rejected
            diverged = ~(jnp.isfinite(H1) & jnp.all(jnp.isfinite(x_new)))
            log_accept = jnp.where(diverged, -jnp.inf, jnp.minimum(0.0, H0 - H1))
            accept = jnp.log(jax.random.uniform(k2, dtype=x.dtype)) < log_accept
            x_out = jnp.where(accept, x_new, x)
            return x_out, jnp.exp(log_accept)

        return kernel

    def _build_chain(self, num_samples: int, adapt_steps: int,
                     target_accept: float):
        """One chain as a pure function of (key, x_init, eps0) — the seed and
        step size are ARGUMENTS, never trace-time constants. (Round-2's
        bench embedded PRNGKey(seed) as a compile-time constant, so every
        fresh-seed sample() call recompiled the entire sampler — the 'flat'
        chain-scaling curve was compile time, not step time.)"""
        kernel = self._hmc_kernel(self._logp)
        gamma, t0, kappa = 0.05, 10.0, 0.75

        def chain(key, x_init, eps0):
            mu = jnp.log(10.0 * eps0)

            def warm_step(carry, inp):
                x, log_eps_bar, Hbar, i = carry
                k = inp
                eps = jnp.exp(mu - jnp.sqrt(i + 1.0) / gamma * Hbar)
                x, a = kernel(x, k, eps)
                eta = 1.0 / (i + 1.0 + t0)
                Hbar = (1 - eta) * Hbar + eta * (target_accept - a)
                w = (i + 1.0) ** (-kappa)
                log_eps = mu - jnp.sqrt(i + 1.0) / gamma * Hbar
                log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
                return (x, log_eps_bar, Hbar, i + 1.0), None

            if adapt_steps > 0:
                keys = jax.random.split(key, adapt_steps + 1)
                dt = x_init.dtype
                (x_init, log_eps_bar, _, _), _ = lax.scan(
                    warm_step,
                    (x_init, jnp.log(eps0), jnp.asarray(0.0, dtype=dt),
                     jnp.asarray(0.0, dtype=dt)),
                    keys[:-1],
                )
                eps = jnp.exp(log_eps_bar)
                key = keys[-1]
            else:
                eps = eps0

            def step(x, k):
                x, a = kernel(x, k, eps)
                return x, (x, a)

            keys = jax.random.split(key, num_samples)
            _, (xs, accepts) = lax.scan(step, x_init, keys)
            return xs, accepts

        return chain

    def sample(self, num_samples: int = 1000, hmc_iters=None, seed: int = 0,
               num_chains: int = 1, adapt_steps: int = 0, target_accept: float = 0.8,
               mesh=None):
        """Draw samples. GPy: hmc.py:30-59 (num_samples loop).

        adapt_steps > 0 enables dual-averaging step-size adaptation (warmup
        draws are discarded). num_chains > 1 vmaps chains (the batched
        blocked chol+inv path — util/linalg custom-vmap rule — keeps the
        per-chain factorizations off XLA's serialized native ops); with
        `mesh` given, chains are sharded across devices. The compiled
        sampler is cached per shape config: repeated sample() calls with new
        seeds/stepsizes re-execute the same executable.
        """
        num_samples = hmc_iters or num_samples
        x0 = self.model.get_flat_raw()
        self._check_mass_matrix(x0.shape[0])
        dt = x0.dtype
        mesh_key = None if mesh is None else (
            tuple(mesh.axis_names), tuple(d.id for d in mesh.devices.flat))
        # the compiled chain closes over M/Minv/M_chol and the model's logp
        # STRUCTURE: key on both so mutating the mass matrix or the model
        # graph (fix/tie/constrain) can't reuse a stale executable
        cfg = (int(num_samples), int(num_chains), int(adapt_steps),
               float(target_accept), mesh_key, id(self.M),
               self.model.structure_version())
        cache = getattr(self, "_sample_cache", None)
        if cache is None:
            cache = self._sample_cache = {}

        master = jax.random.PRNGKey(seed)
        eps0 = jnp.asarray(self.stepsize, dtype=dt)
        if num_chains == 1:
            if cfg not in cache:
                cache[cfg] = jax.jit(
                    self._build_chain(num_samples, adapt_steps, target_accept))
            xs, accepts = cache[cfg](master, x0, eps0)
            self._accept_rate = float(jnp.mean(accepts))
            return self._to_constrained(np.asarray(xs))
        # multiple chains: jittered inits, vmapped; optionally mesh-sharded
        keys = jax.random.split(master, num_chains + 1)
        inits = x0[None, :] + 0.01 * jax.random.normal(
            keys[0], (num_chains, x0.shape[0]), dtype=dt
        )
        if cfg not in cache:
            chain = self._build_chain(num_samples, adapt_steps, target_accept)
            cache[cfg] = jax.jit(jax.vmap(chain, in_axes=(0, 0, None)))
        ck, ci = keys[1:], inits
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # shard chains over EVERY mesh axis (a 2-axis dcn x ici mesh
            # spreads chains across hosts and chips alike)
            axis = tuple(mesh.axis_names)
            ck = jax.device_put(ck, NamedSharding(mesh, P(axis)))
            ci = jax.device_put(ci, NamedSharding(mesh, P(axis)))
        elif num_chains > _CHAIN_GROUP > 0:
            # Past 8 chains the (C, n, n) VPU ops in the batched chol need a
            # second sublane pass and Mosaic's codegen degrades superlinearly
            # (measured n=1000: 16-chain leapfrog eval 2.5x the 8-chain one,
            # so the 16-chain aggregate DROPPED below 8's). Running groups of
            # 8 sequentially through the same compiled executable costs
            # exactly 2x t(8) — per-chain keys/inits are sliced from the
            # same arrays, so results are bit-identical to the monolithic
            # vmap. GPY_TPU_HMC_GROUP overrides (0 disables).
            g = _CHAIN_GROUP
            xs_parts, acc_parts = [], []
            for lo in range(0, num_chains, g):
                hi = min(lo + g, num_chains)
                gcfg = (int(num_samples), hi - lo, int(adapt_steps),
                        float(target_accept), mesh_key, id(self.M),
                        self.model.structure_version())
                if gcfg not in cache:
                    chain_g = self._build_chain(num_samples, adapt_steps,
                                                target_accept)
                    cache[gcfg] = jax.jit(jax.vmap(chain_g, in_axes=(0, 0, None)))
                xg, ag = cache[gcfg](ck[lo:hi], ci[lo:hi], eps0)
                xs_parts.append(xg)
                acc_parts.append(ag)
            xs = jnp.concatenate(xs_parts, 0)
            accepts = jnp.concatenate(acc_parts, 0)
            self._accept_rate = float(jnp.mean(accepts))
            C, S, P = xs.shape
            flat = self._to_constrained(np.asarray(xs).reshape(C * S, P))
            return flat.reshape(C, S, P)
        xs, accepts = cache[cfg](ck, ci, eps0)
        self._accept_rate = float(jnp.mean(accepts))
        # constrain ALL chains in one pass: per-chain _to_constrained costs
        # 2-3 device dispatches per chain (the r2/r3 16-chain throughput dip
        # was ~25 ms of tunnel latency x chains x params of post-processing)
        C, S, P = xs.shape
        flat = self._to_constrained(np.asarray(xs).reshape(C * S, P))
        return flat.reshape(C, S, P)

    def _to_constrained(self, raw_samples: np.ndarray) -> np.ndarray:
        """Map raw (unconstrained) samples to constrained parameter space.

        One jitted dispatch for ALL parameters (a per-param loop of device
        ops costs ~25 ms tunnel latency each)."""
        sv = self.model.structure_version()
        fn = getattr(self, "_constrain_fn", None)
        if fn is None or getattr(self, "_constrain_sv", None) != sv:
            self._constrain_sv = sv
            entries = [(int(np.prod(mod._raw[n].shape)), mod._specs[n].transform)
                       for _, mod, n in self.model._free_entries()]

            def constrain(raw):
                cols = []
                i = 0
                for sz, tr in entries:
                    block = raw[:, i:i + sz]
                    cols.append(tr.forward(block) if tr is not None else block)
                    i += sz
                return jnp.concatenate(cols, axis=1)

            fn = self._constrain_fn = jax.jit(constrain)
        return np.asarray(fn(jnp.asarray(raw_samples)))


class Metropolis_Hastings:
    """Random-walk MH in unconstrained space. GPy: samplers.py:17-82."""

    def __init__(self, model, cov=None, jacobian_correction: bool = False):
        self.model = model
        x0 = model.get_flat_raw()
        n = x0.shape[0]
        self.cov = jnp.asarray(cov) if cov is not None else jnp.eye(n, dtype=x0.dtype)
        self._logp = _logp_fn(model, jacobian_correction)

    def sample(self, Ntotal: int = 10000, Nburn: int = 1000, Nthin: int = 10, seed: int = 0):
        logp = jax.jit(self._logp)
        x0 = self.model.get_flat_raw()
        L = jnp.linalg.cholesky(self.cov)

        def step(carry, key):
            x, lp = carry
            k1, k2 = jax.random.split(key)
            prop = x + L @ jax.random.normal(k1, x.shape, dtype=x.dtype)
            lp_prop = self._logp(prop)
            accept = jnp.log(jax.random.uniform(k2, dtype=x.dtype)) < (lp_prop - lp)
            x = jnp.where(accept, prop, x)
            lp = jnp.where(accept, lp_prop, lp)
            return (x, lp), x

        keys = jax.random.split(jax.random.PRNGKey(seed), Ntotal)
        (_, _), xs = jax.jit(lambda c, k: lax.scan(step, c, k))((x0, self._logp(x0)), keys)
        xs = np.asarray(xs)[Nburn::Nthin]
        # constrained space, as GPy's sampler returns param values
        h = HMC.__new__(HMC)
        h.model = self.model
        return h._to_constrained(xs)


class HMC_shortcut(HMC):
    """HMC with trajectory shortcutting (GPy: mcmc/hmc.py HMC_shortcut:70-173).

    GPy's variant monitors the Hamiltonian along the leapfrog trajectory and
    reverses/terminates when it drifts outside a tolerance window
    (groupsize/Hstd_th). Here the same guard is a compiled early-exit: the
    leapfrog scan tracks H drift and freezes the trajectory once the drift
    exceeds `Hstd_th` standard deviations of the running energy error, which
    rejects divergent trajectories at lower cost.
    """

    def __init__(self, model, M=None, stepsize=0.1, num_leapfrog=20,
                 groupsize=5, Hstd_th=(1e-4, 3.0), jacobian_correction=False):
        super().__init__(model, M=M, stepsize=stepsize, num_leapfrog=num_leapfrog,
                         jacobian_correction=jacobian_correction)
        self.groupsize = groupsize
        self.Hstd_th = Hstd_th

    def _hmc_kernel(self, logp):
        Minv = self.Minv
        M = self.M
        lo, hi = self.Hstd_th

        Mc = self.M_chol

        def kernel(x, key, eps):
            k1, k2 = jax.random.split(key)
            p0 = Mc @ jax.random.normal(k1, x.shape, dtype=x.dtype)
            vglogp = jax.value_and_grad(logp)
            v0, g0 = vglogp(x)
            H0 = -v0 + 0.5 * p0 @ Minv @ p0

            # fused-kick leapfrog with carried (value, grad) — one
            # value_and_grad per step instead of two grads + one value (the
            # per-step H monitor reads the carried value); see HMC._hmc_kernel
            def leapfrog(carry, _):
                xx, pp, g, v, frozen = carry
                pp_half = pp + 0.5 * eps * g
                xx2 = xx + eps * (Minv @ pp_half)
                v2, g2 = vglogp(xx2)
                pp2 = pp_half + 0.5 * eps * g2
                H = -v2 + 0.5 * pp2 @ Minv @ pp2
                # shortcut: freeze the trajectory once energy error explodes
                bad = jnp.abs(H - H0) > hi
                frozen2 = frozen | bad
                xx_out = jnp.where(frozen2, xx, xx2)
                pp_out = jnp.where(frozen2, pp, pp2)
                g_out = jnp.where(frozen2, g, g2)
                v_out = jnp.where(frozen2, v, v2)
                return (xx_out, pp_out, g_out, v_out, frozen2), None

            (x_new, p_new, _, v_new, frozen), _ = lax.scan(
                leapfrog, (x, p0, g0, v0, jnp.asarray(False)), None,
                length=self.num_leapfrog
            )
            H1 = -v_new + 0.5 * p_new @ Minv @ p_new
            diverged = frozen | ~(jnp.isfinite(H1) & jnp.all(jnp.isfinite(x_new)))
            log_accept = jnp.where(diverged, -jnp.inf, jnp.minimum(0.0, H0 - H1))
            accept = jnp.log(jax.random.uniform(k2, dtype=x.dtype)) < log_accept
            x_out = jnp.where(accept, x_new, x)
            return x_out, jnp.exp(log_accept)

        return kernel
