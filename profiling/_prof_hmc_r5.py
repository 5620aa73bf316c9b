"""R5 item 2: monolithic vmapped HMC logp+grad eval at C=1/8/16 on current
code (is the r4 '16-chain eval = 2.5x 8-chain' still true after the rec
pallas leaves?), plus gram-build and chol shares."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.mcmc import _logp_fn
from gpy_tpu.models import GPRegression

rng = np.random.default_rng(0)
n_h = 1000
Xh = rng.random((n_h, 2)).astype(np.float32) * 4.0
Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n_h, 1))).astype(np.float32)
mh = GPRegression(Xh, Yh, noise_var=0.1)
logp = _logp_fn(mh, False)
vg = jax.value_and_grad(logp)
x0 = jnp.asarray(np.asarray(mh.get_flat_raw()))
P = x0.size


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def measure(name, fn, A, k_short=1, k_long=5):
    def chain(k_len):
        @jax.jit
        def run(A, s):
            def body(c, _):
                v, g = fn(A + (s + c * 1e-20))
                return jnp.sum(v) * 1e-9 + jnp.sum(g) * 1e-12, ()
            c, _ = lax.scan(body, s * 0.0, None, length=k_len)
            return c
        return run

    f_s, f_l = chain(k_short), chain(k_long)
    for f in (f_s, f_l):
        float(f(A, jnp.float32(0.0)))
        float(f(A, jnp.float32(1e-4)))
    ts = min(timed(f_s, A, 1e-4 * i) for i in (2, 3, 4))
    tl = min(timed(f_l, A, 1e-4 * i) for i in (5, 6, 7))
    ms = (tl - ts) / (k_long - k_short) * 1e3
    print(f"{name}: {ms:.3f} ms")
    return ms


t1 = measure("logp+grad C=1", lambda x: vg(x), x0)
res = {1: t1}
for C in (2, 4, 8, 16, 32):
    xC = jnp.tile(x0[None, :], (C, 1)) + 1e-3 * jnp.asarray(
        rng.standard_normal((C, P)).astype(np.float32))
    vgC = jax.vmap(vg)
    res[C] = measure(f"logp+grad vmapped C={C}",
                     lambda x: vgC(x), xC)
print("\nscaling vs C=1:", {c: round(res[c] / t1, 2) for c in res})
print("per-chain efficiency:", {c: round(t1 * c / res[c], 2) for c in res})
print("16 vs 8 ratio:", round(res[16] / res[8], 3))
