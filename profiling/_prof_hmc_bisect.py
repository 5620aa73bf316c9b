"""Root-cause probe for the round-1 32-chain HMC TPU worker fault.

Bisects chains x N x leapfrog to find which resource faults the worker.
Run standalone (NOT inside bench.py — a worker fault kills the process):

    python _prof_hmc_bisect.py [max_chains]

Hypothesis from round 1: the fault is the vmapped per-leapfrog batched
Cholesky working set (chains x N x N f32 for the N=1000 GP posterior
factor = 32 * 4MB * pipeline transients), not a JAX bug — the same 32
chains at N=250 should pass if so.
"""
import sys
import time

import numpy as np


def probe(n_chains, n_data, leapfrog=10, samples=8):
    import jax
    from gpy_tpu.mcmc import HMC
    from gpy_tpu.models import GPRegression

    rng = np.random.default_rng(0)
    X = rng.random((n_data, 2)).astype(np.float32) * 4.0
    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n_data, 1))).astype(np.float32)
    m = GPRegression(X, Y, noise_var=0.1)
    hmc = HMC(m, stepsize=2e-2, num_leapfrog=leapfrog)
    t0 = time.perf_counter()
    s = hmc.sample(num_samples=samples, num_chains=n_chains, seed=0)
    dt = time.perf_counter() - t0
    assert np.all(np.isfinite(s))
    return dt


if __name__ == "__main__":
    import os

    os.environ["GPY_TPU_X64"] = "0"
    max_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    for n_data in (250, 500, 1000):
        for n_chains in (8, 16, 32, 64):
            if n_chains > max_chains:
                break
            try:
                dt = probe(n_chains, n_data)
                print(f"n={n_data} chains={n_chains}: OK {dt:.1f}s", flush=True)
            except Exception as e:
                print(f"n={n_data} chains={n_chains}: FAIL {type(e).__name__} "
                      f"{str(e)[:120]}", flush=True)
                break
