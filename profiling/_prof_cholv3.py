"""Round-4: pallas chol+inv: monolithic vs chunked batch, across C."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.ops.pallas_chol import pallas_batched_chol_inv

n = 1000
rng = np.random.default_rng(0)


def make_K(C):
    A = rng.standard_normal((C, n, n)).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) / n + 2.0 * np.eye(n, dtype=np.float32)
    return jnp.asarray(K)


def apply(version, Kc):
    if version == 4:  # block=256
        return pallas_batched_chol_inv(Kc, version=2, block=256)
    if version == 3:  # chunked: sequential C/2-sized calls
        h = Kc.shape[0] // 2
        L1, Li1 = pallas_batched_chol_inv(Kc[:h], version=2)
        L2, Li2 = pallas_batched_chol_inv(Kc[h:], version=2)
        return (jnp.concatenate([L1, L2], 0), jnp.concatenate([Li1, Li2], 0))
    return pallas_batched_chol_inv(Kc, version=version)


def chain(version, C, k_len):
    @jax.jit
    def run(K, s):
        def body(carry, _):
            Kc = K + carry * jnp.eye(n, dtype=jnp.float32)
            L, Li = apply(version, Kc)
            c = jnp.sum(L[..., -1, :]) + jnp.sum(Li[..., -1, :])
            return s + 1e-12 * c, None

        out, _ = jax.lax.scan(body, s, None, length=k_len)
        return out

    return run


def timed(f, K, s):
    t0 = time.perf_counter()
    float(f(K, jnp.float32(s)))
    return time.perf_counter() - t0


fpr = jax.jit(lambda x: jnp.sum(x) * 1.000001)
float(fpr(jnp.ones(8, jnp.float32))); float(fpr(jnp.full(8, 1.5, jnp.float32)))
_fl = []
for i in range(5):
    xi = jnp.full(8, 2.0 + 0.1 * i, jnp.float32)
    t0 = time.perf_counter(); float(fpr(xi)); _fl.append(time.perf_counter() - t0)
print('floor', round(min(_fl) * 1e3, 1), 'ms', flush=True)

import sys
Cs = [int(c) for c in sys.argv[1].split(',')] if len(sys.argv) > 1 else [8, 16]
vers = [int(v) for v in sys.argv[2].split(',')] if len(sys.argv) > 2 else [2, 3, 3]
for C in Cs:
    K = jax.device_put(make_K(C))
    row = [f"C={C:<3}"]
    for version in vers:
        fa, fb = chain(version, C, 4), chain(version, C, 36)
        for f in (fa, fb):
            float(f(K, jnp.float32(1e-6)))
            float(f(K, jnp.float32(2e-6)))
        ta = min(timed(fa, K, 1e-6 * i) for i in (3, 4, 5, 6, 7))
        tb = min(timed(fb, K, 1e-6 * i) for i in (8, 9, 10, 11, 12))
        ms = (tb - ta) / 32.0 * 1e3
        row.append(f"v{version} {ms:7.3f} ms")
    print("  ".join(row), flush=True)
