"""Bisect the batched exact-GP logp pieces at C=8 vs 16 (n=1000)."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.mcmc import _logp_fn
from gpy_tpu.models import GPRegression

rng = np.random.default_rng(0)
n_h = 1000
Xh = rng.random((n_h, 2)).astype(np.float32) * 4.0
Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n_h, 1))).astype(np.float32)
mh = GPRegression(Xh, Yh, noise_var=0.1)
logp = _logp_fn(mh, True)
x0 = np.asarray(mh.get_flat_raw())
P = x0.size
Xj = jnp.asarray(Xh)

kern = mh.kern


def gram_only(x):
    m2 = mh.with_flat_raw(x)
    K = m2.kern.K(Xj)
    return jnp.sum(K * 1e-6)


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def mk_chain(fn, C, k_len):
    @jax.jit
    def run(X0, s):
        def body(carry, _):
            x, acc = carry
            v = jax.vmap(fn)(x)
            return (x + 1e-9 * v[:, None], acc + jnp.sum(v) * 1e-12), None

        (xf, acc), _ = jax.lax.scan(body, (X0, s * jnp.ones(())), None,
                                    length=k_len)
        return acc + jnp.sum(xf) * 1e-12

    return run


def bench(fn, name):
    for C in (8, 16):
        X0 = jnp.asarray(np.tile(x0, (C, 1)) + 0.01 * rng.standard_normal((C, P)),
                         jnp.float32)
        fa, fb = mk_chain(fn, C, 4), mk_chain(fn, C, 20)
        for f in (fa, fb):
            float(f(X0, jnp.float32(1e-6)))
            float(f(X0, jnp.float32(2e-6)))
        ta = min(timed(fa, X0, 1e-6 * i) for i in (3, 4, 5))
        tb = min(timed(fb, X0, 1e-6 * i) for i in (6, 7, 8))
        ms = (tb - ta) / 16.0 * 1e3
        print(f"{name:<24} C={C:<3} {ms:7.3f} ms/eval", flush=True)


fpr = jax.jit(lambda x: jnp.sum(x) * 1.000001)
float(fpr(jnp.ones(8, jnp.float32))); float(fpr(jnp.full(8, 1.5, jnp.float32)))
fl = []
for i in range(5):
    xi = jnp.full(8, 2.0 + 0.1 * i, jnp.float32)
    t0 = time.perf_counter(); float(fpr(xi)); fl.append(time.perf_counter() - t0)
print('floor', round(min(fl) * 1e3, 1), 'ms', flush=True)

bench(jax.grad(logp), "logp fwd+bwd")
