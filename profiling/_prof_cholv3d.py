"""v2 path breakdown at C=8/16: L-only vs (L,Li); tri_inv and kernel shares."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.ops.pallas_chol import (pallas_block_chol, _tri_inv_128, _mm,
                                     pallas_batched_chol_inv, _B)

n = 1000
rng = np.random.default_rng(0)


def L_only(K):
    """The factor-producing half of pallas_batched_chol_inv (no Li doubling)."""
    C, nn, _ = K.shape
    nb = -(-nn // _B)
    npad = nb * _B
    if npad != nn:
        pad = npad - nn
        eye_pad = jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype), (C, pad, pad))
        K = jnp.concatenate([
            jnp.concatenate([K, jnp.zeros((C, nn, pad), K.dtype)], -1),
            jnp.concatenate([jnp.zeros((C, pad, nn), K.dtype), eye_pad], -1),
        ], -2)
    T = lambda X: jnp.swapaxes(X, -1, -2)
    A = K
    col_blocks = []
    for j in range(nb):
        Ablk = A[:, :_B, :_B]
        Ljj = pallas_block_chol(Ablk)
        Dinv = _tri_inv_128(Ljj)
        below = A[:, _B:, :_B]
        P = _mm(below, T(Dinv))
        col = jnp.concatenate(
            [jnp.zeros((C, j * _B, _B), K.dtype), Ljj, P], 1)
        col_blocks.append(col)
        rem = A.shape[1] - _B
        if rem:
            A = A[:, _B:, _B:] - _mm(P, T(P))
        else:
            A = A[:, _B:, _B:]
    return jnp.concatenate(col_blocks, -1)[:, :nn, :nn]


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def chain_time(fn, K, consume, k_a=4, k_b=36):
    def mk(k_len):
        @jax.jit
        def run(K, s):
            def body(carry, _):
                out = fn(K * (1.0 + 1e-9 * carry))
                return s + 1e-12 * consume(out), None
            out, _ = jax.lax.scan(body, s, None, length=k_len)
            return out
        return run
    f_a, f_b = mk(k_a), mk(k_b)
    for f in (f_a, f_b):
        float(f(K, jnp.float32(1e-6)))
        float(f(K, jnp.float32(2e-6)))
    ta = min(timed(f_a, K, 1e-6 * i) for i in (3, 4, 5))
    tb = min(timed(f_b, K, 1e-6 * i) for i in (6, 7, 8))
    return (tb - ta) / (k_b - k_a) * 1e3


for C in (8, 16):
    A = rng.standard_normal((C, n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.transpose(0, 2, 1) / n + 2.0 * np.eye(n, dtype=np.float32))
    t_L = chain_time(L_only, K, lambda L: jnp.sum(L[..., -1, :]))
    t_full = chain_time(lambda Kc: pallas_batched_chol_inv(Kc, version=2)[1], K,
                        lambda Li: jnp.sum(Li[..., -1, :]))
    # kernel + tri_inv per 128-block
    Ab = rng.standard_normal((C, 128, 128)).astype(np.float32)
    blk = jnp.asarray(Ab @ Ab.transpose(0, 2, 1) / 128 + 2 * np.eye(128, dtype=np.float32))
    t_kb = chain_time(pallas_block_chol, blk, lambda L: jnp.sum(L[..., -1, :]),
                      k_a=8, k_b=72)
    Lb = jnp.linalg.cholesky(blk)
    t_ti = chain_time(_tri_inv_128, Lb, lambda X: jnp.sum(X[..., -1, :]),
                      k_a=8, k_b=72)
    print(f"C={C:<3} full {t_full:6.3f} ms  L_only {t_L:6.3f} ms  "
          f"doubling {t_full - t_L:6.3f} ms  kernel/blk {t_kb*1e3:6.1f} us (x8={t_kb*8:5.3f})  "
          f"tri_inv/blk {t_ti*1e3:6.1f} us (x8={t_ti*8:5.3f})", flush=True)
