"""Component breakdown of pallas_batched_chol_inv at various C (n=1000)."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.ops.pallas_chol import (pallas_block_chol, pallas_block_chol_inv,
                                     _tri_inv_128)

rng = np.random.default_rng(0)


def timed(f, K, s):
    t0 = time.perf_counter()
    float(f(K, jnp.float32(s)))
    return time.perf_counter() - t0


def chain_time(fn, K, consume):
    """fn: K -> out; consume: out -> scalar. Chain-differenced ms/call."""
    def mk(k_len):
        @jax.jit
        def run(K, s):
            def body(carry, _):
                out = fn(K * (1.0 + 1e-9 * carry))
                return s + 1e-12 * consume(out), None
            out, _ = jax.lax.scan(body, s, None, length=k_len)
            return out
        return run

    f_a, f_b = mk(8), mk(72)
    for f in (f_a, f_b):
        float(f(K, jnp.float32(1e-6)))
        float(f(K, jnp.float32(2e-6)))
    ta = min(timed(f_a, K, 1e-6 * i) for i in (3, 4, 5))
    tb = min(timed(f_b, K, 1e-6 * i) for i in (6, 7, 8))
    return (tb - ta) / 64.0 * 1e3


for C in (1, 2, 4, 8, 16):
    A = rng.standard_normal((C, 128, 128)).astype(np.float32)
    blk = jnp.asarray(A @ A.transpose(0, 2, 1) / 128 + 2 * np.eye(128, dtype=np.float32))
    t_k2 = chain_time(pallas_block_chol, blk, lambda L: jnp.sum(L[..., -1, :]))
    t_k1 = chain_time(lambda B: pallas_block_chol_inv(B)[0], blk,
                      lambda L: jnp.sum(L[..., -1, :]))
    Lb = jnp.linalg.cholesky(blk)
    t_inv = chain_time(_tri_inv_128, Lb, lambda X: jnp.sum(X[..., -1, :]))
    # glue-only: the panel/trailing matmuls at n=1024, nb=8 (batched XLA)
    n = 1024
    Kb = rng.standard_normal((C, n, n)).astype(np.float32)
    Kb = jnp.asarray(Kb @ Kb.transpose(0, 2, 1) / n + 2 * np.eye(n, dtype=np.float32))

    def glue(K):
        T = lambda X: jnp.swapaxes(X, -1, -2)
        Acur = K
        acc = jnp.float32(0.0)
        Dinv = jnp.broadcast_to(jnp.eye(128, dtype=jnp.float32), (C, 128, 128))
        for j in range(8):
            below = Acur[:, 128:, :128]
            P = below @ T(Dinv)
            acc = acc + jnp.sum(P[..., -1, :] if P.shape[1] else P)
            rem = Acur.shape[1] - 128
            if rem:
                Acur = Acur[:, 128:, 128:] - P @ T(P)
            else:
                Acur = Acur[:, 128:, 128:]
        return acc

    t_glue = chain_time(glue, Kb, lambda x: x)
    print(f"C={C:<3} block_chol_v2 {t_k2*1e3:7.1f} us  block_cholinv_v1 {t_k1*1e3:7.1f} us"
          f"  tri_inv {t_inv*1e3:7.1f} us  glue(n=1024) {t_glue:7.3f} ms", flush=True)
