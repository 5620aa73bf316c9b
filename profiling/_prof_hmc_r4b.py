"""Localize HMC 16-chain superlinearity: batched logp+grad alone vs leapfrog."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.mcmc import HMC, _logp_fn
from gpy_tpu.models import GPRegression

rng = np.random.default_rng(0)
n_h = 1000
Xh = rng.random((n_h, 2)).astype(np.float32) * 4.0
Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n_h, 1))).astype(np.float32)
mh = GPRegression(Xh, Yh, noise_var=0.1)
logp = _logp_fn(mh, True)
x0 = np.asarray(mh.get_flat_raw())
P = x0.size
vg = jax.value_and_grad(logp)


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def chain_vg(C, k_len):
    @jax.jit
    def run(X0, s):
        def body(carry, _):
            x, acc = carry
            v, g = jax.vmap(vg)(x)
            x2 = x + 1e-6 * g
            return (x2, acc + jnp.sum(v) * 1e-12), None

        (xf, acc), _ = jax.lax.scan(body, (X0, s * jnp.ones(())), None, length=k_len)
        return acc + jnp.sum(xf) * 1e-12

    return run


fpr = jax.jit(lambda x: jnp.sum(x) * 1.000001)
float(fpr(jnp.ones(8, jnp.float32))); float(fpr(jnp.full(8, 1.5, jnp.float32)))
fl = []
for i in range(5):
    xi = jnp.full(8, 2.0 + 0.1 * i, jnp.float32)
    t0 = time.perf_counter(); float(fpr(xi)); fl.append(time.perf_counter() - t0)
print('floor', round(min(fl) * 1e3, 1), 'ms', flush=True)

for C in (1, 2, 4, 8, 16):
    X0 = jnp.asarray(np.tile(x0, (C, 1)) + 0.01 * rng.standard_normal((C, P)),
                     jnp.float32)
    fa, fb = chain_vg(C, 4), chain_vg(C, 20)
    for f in (fa, fb):
        float(f(X0, jnp.float32(1e-6)))
        float(f(X0, jnp.float32(2e-6)))
    ta = min(timed(fa, X0, 1e-6 * i) for i in (3, 4, 5))
    tb = min(timed(fb, X0, 1e-6 * i) for i in (6, 7, 8))
    ms = (tb - ta) / 16.0 * 1e3
    print(f"C={C:<3} vmapped logp+grad {ms:7.3f} ms/eval", flush=True)
