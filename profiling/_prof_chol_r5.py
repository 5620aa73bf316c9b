"""R5 item 2: where does batched chol+inv time go at C=8 vs 16 (n=1000)?

Components: Pallas 128-block kernel, tri_inv, right-looking glue, doubling.
Chain-differenced on-device scan protocol (fresh scalar per timed call,
double warmup, (t_long - t_short)/(k_long - k_short))."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.ops.pallas_chol import (pallas_block_chol, pallas_block_chol_inv,
                                     pallas_batched_chol_inv,
                                     rec_pallas_chol_inv)
from gpy_tpu.ops.blocked_linalg import tri_inv_doubling

rng = np.random.default_rng(0)


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def chain(fn, k_len):
    @jax.jit
    def run(A, s):
        def body(c, _):
            out = fn(A + (s + c * 1e-20))
            acc = 0.0
            for o in (out if isinstance(out, tuple) else (out,)):
                acc = acc + jnp.sum(o) * 1e-9
            return acc, ()
        c, _ = lax.scan(body, s * 0.0, None, length=k_len)
        return c
    return run


def measure(name, fn, A, k_short=2, k_long=10):
    f_s, f_l = chain(fn, k_short), chain(fn, k_long)
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


for C in (8, 16):
    print(f"=== C={C} ===")
    K128 = spd(C, 128)
    measure(f"kernel128 chol (C={C})", lambda K: pallas_block_chol(K), K128)
    measure(f"kernel128 chol+inv v1 (C={C})",
            lambda K: pallas_block_chol_inv(K), K128)
    L128 = jnp.linalg.cholesky(K128)
    measure(f"tri_inv_doubling 128 (C={C})", lambda L: tri_inv_doubling(L), L128)

    K1k = spd(C, 1000)
    measure(f"batched_chol_inv v2 full n=1000 (C={C})",
            lambda K: pallas_batched_chol_inv(K, version=2), K1k, 1, 5)
    K1024 = spd(C, 1024)
    measure(f"rec_pallas_chol_inv n=1024 (C={C})",
            lambda K: rec_pallas_chol_inv(K), K1024, 1, 5)

print("\n=== left-looking variant ===")
from gpy_tpu.ops.pallas_chol import pallas_batched_chol_inv_ll
for C in (8, 16):
    K1k = spd(C, 1000)
    measure(f"LL batched_chol_inv n=1000 (C={C})",
            lambda K: pallas_batched_chol_inv_ll(K), K1k, 1, 5)

print("\n=== small-C crossover (LL vs v2) ===")
for C in (1, 2, 4):
    K1k = spd(C, 1000)
    measure(f"v2 n=1000 (C={C})",
            lambda K: pallas_batched_chol_inv(K, version=2), K1k, 1, 5)
    measure(f"LL n=1000 (C={C})",
            lambda K: pallas_batched_chol_inv_ll(K), K1k, 1, 5)
print("\n=== n=2048 ===")
for C in (4, 8):
    K2k = spd(C, 2048)
    measure(f"v2 n=2048 (C={C})",
            lambda K: pallas_batched_chol_inv(K, version=2), K2k, 1, 5)
    measure(f"LL n=2048 (C={C})",
            lambda K: pallas_batched_chol_inv_ll(K), K2k, 1, 5)
