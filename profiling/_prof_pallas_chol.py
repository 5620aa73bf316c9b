"""Measure the Pallas batch-vectorized chol+inv vs the alternatives on TPU.

Shapes: the HMC hot shape (C, 1000, 1000) for C in 1..16, plus the 128-block
kernel alone. Scan-chain two-length differencing protocol.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

from gpy_tpu.ops.pallas_chol import (pallas_batched_chol_inv, pallas_block_chol_inv, pallas_block_chol, _tri_inv_128)  # noqa: E402
from gpy_tpu.ops.blocked_linalg import rec_chol_inv  # noqa: E402


def timed(f, *args):
    t0 = time.perf_counter()
    r = f(*args)
    float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
    return time.perf_counter() - t0


def chain_time(make_body, args, k_short=2, k_long=10):
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

    # 128-block kernel alone at C=8
    for C in (1, 8, 16):
        Gb = jax.device_put(jnp.asarray(
            rng.standard_normal((C, 128, 32)).astype(np.float32)))

        def blk(c, G):
            Gv = G + c * 1e-6
            A = Gv @ jnp.swapaxes(Gv, -1, -2) + 128 * jnp.broadcast_to(
                jnp.eye(128, dtype=jnp.float32), (G.shape[0], 128, 128))
            L, Li = pallas_block_chol_inv(A)
            return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

        t = chain_time(blk, (Gb,), k_short=2, k_long=18)
        print(f"block128 v1 kernel C={C}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)

        def blk2(c, G):
            Gv = G + c * 1e-6
            A = Gv @ jnp.swapaxes(Gv, -1, -2) + 128 * jnp.broadcast_to(
                jnp.eye(128, dtype=jnp.float32), (G.shape[0], 128, 128))
            L = pallas_block_chol(A)
            Li = _tri_inv_128(L)
            return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

        t = chain_time(blk2, (Gb,), k_short=2, k_long=18)
        print(f"block128 v2+inv  C={C}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)

    for C in (1, 2, 4, 8, 16):
        G = jax.device_put(jnp.asarray(
            rng.standard_normal((C, n, 64)).astype(np.float32)))

        def make_K(s, G):
            Gv = G + s * 1e-6
            return Gv @ jnp.swapaxes(Gv, -1, -2) + n * jnp.broadcast_to(
                jnp.eye(n, dtype=G.dtype), (G.shape[0], n, n))

        for ver in (1, 2):
            def pall(c, G, _v=ver):
                L, Li = pallas_batched_chol_inv(make_K(c, G), version=_v)
                return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

            t1 = chain_time(pall, (G,))
            print(f"pallas v{ver} chol+inv C={C} n={n}: {t1*1e3:.3f} ms",
                  file=sys.stderr, flush=True)

        if C in (1, 8):
            def rec(c, G):
                L, Li = rec_chol_inv(make_K(c, G), 256)
                return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

            t2 = chain_time(rec, (G,))
            print(f"   rec256 chol+inv C={C}: {t2*1e3:.3f} ms",
                  file=sys.stderr, flush=True)

    # accuracy spot check on chip
    G = rng.standard_normal((4, n, 64)).astype(np.float32)
    K = jnp.asarray(G @ np.swapaxes(G, 1, 2) + n * np.eye(n, dtype=np.float32))
    L, Li = jax.jit(lambda k: pallas_batched_chol_inv(k, version=2))(K)
    Lr = np.linalg.cholesky(np.asarray(K, np.float64))
    err_L = np.abs(np.asarray(L) - Lr).max() / np.abs(Lr).max()
    err_I = max(np.abs(np.asarray(Li[b], np.float64) @ np.asarray(L[b], np.float64)
                       - np.eye(n)).max() for b in range(4))
    print(f"accuracy: L rel {err_L:.2e}, Li@L-I {err_I:.2e}", file=sys.stderr)


if __name__ == "__main__":
    main()
