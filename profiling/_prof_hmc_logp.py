"""Ablate the HMC logp+grad cost at N=1000 (single chain and 8 chains).

Round-2 bench: single-chain HMC = 8 samples/s at num_leapfrog=10 => ~5.7ms
per glogp, yet chol+trsm at N=1000 measures 0.33ms. Where do the other 5ms
go? Pieces timed with the scan-chain protocol (new custom_vmap batched path
is active for the C=8 variants).
"""
import os
import sys
import time

os.environ["GPY_TPU_X64"] = "0"

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import gpy_tpu  # noqa: F401
from gpy_tpu.models import GPRegression


def timed(f, *args):
    t0 = time.perf_counter()
    r = f(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x)) if hasattr(x, "shape") else float(x), r)
    return time.perf_counter() - t0


def chain_time(make_body, args, k_short=2, k_long=8):
    def chain(k_len):
        @jax.jit
        def run(s, *args):
            def body(c, _):
                return make_body(c, *args), ()

            c, _ = lax.scan(body, s, None, length=k_len)
            return c

        return run

    fS, fL = chain(k_short), chain(k_long)
    for f in (fS, fL):
        float(f(jnp.float32(0.0), *args))
        float(f(jnp.float32(1e-4), *args))
    tS = min(timed(fS, jnp.float32(1e-4 * i), *args) for i in (2, 3, 4))
    tL = min(timed(fL, jnp.float32(1e-4 * i), *args) for i in (5, 6, 7))
    return max((tL - tS) / (k_long - k_short), 1e-7)


def main():
    n = 1000
    rng = np.random.default_rng(0)
    Xh = rng.random((n, 2)).astype(np.float32) * 4.0
    Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    mh = GPRegression(Xh, Yh, noise_var=0.1)
    x0 = mh.get_flat_raw()
    print("dtype of x0:", x0.dtype, file=sys.stderr, flush=True)

    def logp(flat):
        m2 = mh.with_flat_raw(flat)
        return m2.log_likelihood() + m2.log_prior()

    glogp = jax.value_and_grad(logp)

    X = jnp.asarray(Xh)
    Y = jnp.asarray(Yh)

    kern = mh.kern

    def k_build(kraw, s):
        k2 = kern.with_raw_dict(kraw)
        return k2.K(X + s * 1e-6)

    kraw = kern.get_raw_dict()

    res = {}

    def tm(name, body, args=()):
        t = chain_time(body, args)
        res[name] = t * 1e3
        print(f"{name}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)

    # K build
    tm("k_build", lambda c: jnp.sum(k_build(kraw, c)) * 1e-9)

    # K + jitchol
    from gpy_tpu.util.linalg import jitchol, jitchol_and_inv

    def kchol(c):
        K = k_build(kraw, c) + 0.1 * jnp.eye(n)
        return jnp.sum(jitchol(K)) * 1e-9

    tm("k_chol", kchol)

    def kcholinv(c):
        K = k_build(kraw, c) + 0.1 * jnp.eye(n)
        L, Li = jitchol_and_inv(K)
        return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

    tm("k_chol_inv", kcholinv)

    # full forward logp
    tm("logp_fwd", lambda c: logp(x0 + c * 1e-4) * 1e-9)

    # value+grad
    tm("logp_grad", lambda c: (lambda v, g: v * 1e-9 + jnp.sum(g) * 1e-9)(
        *glogp(x0 + c * 1e-4)))

    # 8-chain vmapped value+grad (new custom_vmap path)
    X0 = jnp.tile(x0[None, :], (8, 1))
    tm("vmap8_logp_grad", lambda c: (lambda v, g: jnp.sum(v) * 1e-9 + jnp.sum(g) * 1e-9)(
        *jax.vmap(glogp)(X0 + c * 1e-4)))

    # one full HMC kernel step (10 leapfrogs), single + 8 chains
    from gpy_tpu.mcmc import HMC

    hmc = HMC(mh, stepsize=2e-2, num_leapfrog=10)
    kernel = hmc._hmc_kernel(hmc._logp)

    def hmc_step(c):
        key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.int32(c * 1e4))
        x, a = kernel(x0 + c * 1e-4, key, jnp.float32(2e-2))
        return jnp.sum(x) * 1e-3 + a * 1e-3

    tm("hmc_step_1chain", hmc_step)

    def hmc_step8(c):
        key = jax.random.fold_in(jax.random.PRNGKey(0), jnp.int32(c * 1e4))
        keys = jax.random.split(key, 8)
        x, a = jax.vmap(kernel, in_axes=(0, 0, None))(
            X0 + c * 1e-4, keys, jnp.float32(2e-2))
        return jnp.sum(x) * 1e-3 + jnp.sum(a) * 1e-3

    tm("hmc_step_8chain", hmc_step8)

    # end-to-end curve with the executable cache (warm once per config with
    # one seed, then time fresh seeds — no recompiles)
    for n_c in (1, 2, 4, 8, 16):
        n_s = 40
        hmc.sample(num_samples=n_s, num_chains=n_c, seed=0)
        best = float("inf")
        for s in (3, 5):
            t0 = time.perf_counter()
            hmc.sample(num_samples=n_s, num_chains=n_c, seed=s)
            best = min(best, time.perf_counter() - t0)
        rate = n_s * n_c / best
        res[f"hmc_curve_{n_c}"] = round(rate, 1)
        print(f"hmc e2e {n_c} chains: {rate:.1f} samples/s",
              file=sys.stderr, flush=True)

    print(res)


if __name__ == "__main__":
    main()
