"""Round-4: HMC chain curve after the batched-chol rework (bench protocol)."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.mcmc import HMC
from gpy_tpu.models import GPRegression

rng = np.random.default_rng(0)
n_h = 1000
Xh = rng.random((n_h, 2)).astype(np.float32) * 4.0
Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n_h, 1))).astype(np.float32)
mh = GPRegression(Xh, Yh, noise_var=0.1)
hmc = HMC(mh, stepsize=2e-2, num_leapfrog=10)

fpr = jax.jit(lambda x: jnp.sum(x) * 1.000001)
float(fpr(jnp.ones(8, jnp.float32))); float(fpr(jnp.full(8, 1.5, jnp.float32)))
fl = []
for i in range(5):
    xi = jnp.full(8, 2.0 + 0.1 * i, jnp.float32)
    t0 = time.perf_counter(); float(fpr(xi)); fl.append(time.perf_counter() - t0)
print('floor', round(min(fl) * 1e3, 1), 'ms', flush=True)

for n_c in (1, 2, 4, 8, 16):
    n_s = 40
    hmc.sample(num_samples=n_s, num_chains=n_c, seed=0)
    ts = []
    for sd in (3, 5, 7):
        t0 = time.perf_counter()
        hmc.sample(num_samples=n_s, num_chains=n_c, seed=sd)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{n_c:>2} chains: {n_s * n_c / best:7.1f} samples/s  "
          f"(ts {[round(t, 3) for t in ts]})", flush=True)
