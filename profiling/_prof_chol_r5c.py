"""Clean small-C LL-vs-v2 comparison, longer chains (k=2 vs 18)."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.ops.pallas_chol import (pallas_batched_chol_inv,
                                     pallas_batched_chol_inv_ll)

rng = np.random.default_rng(0)


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def measure(name, fn, A, k_short=2, k_long=18):
    def chain(k_len):
        @jax.jit
        def run(A, s):
            def body(c, _):
                L, Li = fn(A + (s + c * 1e-20))
                return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9, ()
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


def spd(C, n):
    A = rng.standard_normal((C, n, 64)).astype(np.float32)
    K = A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)
    return jax.device_put(jnp.asarray(K))


for C in (1, 2, 4, 8, 16):
    K1k = spd(C, 1000)
    a = measure(f"v2 n=1000 C={C}",
                lambda K: pallas_batched_chol_inv(K, version=2), K1k)
    b = measure(f"LL n=1000 C={C}",
                lambda K: pallas_batched_chol_inv_ll(K), K1k)
    print(f"  -> LL/v2 = {b / max(a, 1e-9):.2f}")
