"""Batched chol+inv: right-looking v2 vs 2x2 recursion with pallas leaves."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.ops.pallas_chol import (pallas_batched_chol_inv,
                                     pallas_block_chol_inv, pallas_block_chol,
                                     _tri_inv_128, _mm)

n = 1000
rng = np.random.default_rng(0)


def rec_pallas_chol_inv(A, leaf=128, leaf_mode="v1"):
    """2x2 recursion carrying (L, Li); leaves factored+inverted by Pallas."""
    nn = A.shape[-1]
    if nn <= leaf:
        if leaf_mode == "v1":
            return pallas_block_chol_inv(A)
        L = pallas_block_chol(A)
        return L, _tri_inv_128(L)
    m = nn // 2
    T = lambda X: jnp.swapaxes(X, -1, -2)
    L11, L11i = rec_pallas_chol_inv(A[..., :m, :m], leaf, leaf_mode)
    L21 = _mm(A[..., m:, :m], T(L11i))
    L22, L22i = rec_pallas_chol_inv(A[..., m:, m:] - _mm(L21, T(L21)), leaf,
                                    leaf_mode)
    Li21 = -_mm(L22i, _mm(L21, L11i))
    z = jnp.zeros((*A.shape[:-2], m, nn - m), A.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([L11, z], -1), jnp.concatenate([L21, L22], -1)], -2)
    Li = jnp.concatenate(
        [jnp.concatenate([L11i, z], -1), jnp.concatenate([Li21, L22i], -1)], -2)
    return L, Li


def pad_pow2(K):
    C, nn, _ = K.shape
    P = 1024
    pad = P - nn
    eye_pad = jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype), (C, pad, pad))
    return jnp.concatenate([
        jnp.concatenate([K, jnp.zeros((C, nn, pad), K.dtype)], -1),
        jnp.concatenate([jnp.zeros((C, pad, nn), K.dtype), eye_pad], -1),
    ], -2)


def make_K(C):
    A = rng.standard_normal((C, n, n)).astype(np.float32)
    K = A @ A.transpose(0, 2, 1) / n + 2.0 * np.eye(n, dtype=np.float32)
    return jnp.asarray(K)


def apply(version, Kc):
    if version == "v2":
        return pallas_batched_chol_inv(Kc, version=2)
    Kp = pad_pow2(Kc)
    mode = "v1" if version == "rec_v1" else "v2t"
    L, Li = rec_pallas_chol_inv(Kp, 128, mode)
    return L[:, :n, :n], Li[:, :n, :n]


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


# correctness first (C=2)
K2 = make_K(2)
Lr = jnp.linalg.cholesky(K2)
for v in ("rec_v1", "rec_v2t"):
    L, Li = apply(v, K2)
    e1 = float(jnp.max(jnp.abs(jnp.tril(L) - Lr)))
    e2 = float(jnp.max(jnp.abs(Li @ L - jnp.eye(n))))
    print(f"{v}: L err {e1:.1e}, Li*L-I err {e2:.1e}", flush=True)

for C in (1, 8, 16):
    K = jax.device_put(make_K(C))
    row = [f"C={C:<3}"]
    for version in ("v2", "rec_v1", "rec_v2t"):
        fa, fb = chain(version, C, 4), chain(version, C, 36)
        for f in (fa, fb):
            float(f(K, jnp.float32(1e-6)))
            float(f(K, jnp.float32(2e-6)))
        ta = min(timed(fa, K, 1e-6 * i) for i in (3, 4, 5))
        tb = min(timed(fb, K, 1e-6 * i) for i in (6, 7, 8))
        row.append(f"{version} {(tb - ta) / 32.0 * 1e3:7.3f} ms")
    print("  ".join(row), flush=True)
