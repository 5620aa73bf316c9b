"""Kernel-only scaling: one (16,...) call vs two (8,...) vs grid over batch."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gpy_tpu.ops.pallas_chol import _block_kernel_v2, pallas_block_chol

rng = np.random.default_rng(0)


def timed(f, K, s):
    t0 = time.perf_counter()
    float(f(K, jnp.float32(s)))
    return time.perf_counter() - t0


def chain_time(fn, K, k_a=8, k_b=72):
    def mk(k_len):
        @jax.jit
        def run(K, s):
            def body(carry, _):
                out = fn(K * (1.0 + 1e-9 * carry))
                return s + 1e-12 * jnp.sum(out[..., -1, :]), None
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


def split_chol(B):
    C = B.shape[0]
    outs = [pallas_block_chol(B[i:i + 8]) for i in range(0, C, 8)]
    return jnp.concatenate(outs, 0)


def grid_chol(B):
    C, n, _ = B.shape
    G = C // 8
    out = pl.pallas_call(
        _block_kernel_v2,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((C, n, n), jnp.float32),
        in_specs=[pl.BlockSpec((8, n, n), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, n, n), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, n, n), jnp.float32)],
    )(B)
    return jnp.swapaxes(out, -1, -2)


def grid_chol4(B):
    C, n, _ = B.shape
    G = C // 4
    out = pl.pallas_call(
        _block_kernel_v2,
        grid=(G,),
        out_shape=jax.ShapeDtypeStruct((C, n, n), jnp.float32),
        in_specs=[pl.BlockSpec((4, n, n), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((4, n, n), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((4, n, n), jnp.float32)],
    )(B)
    return jnp.swapaxes(out, -1, -2)


def grid_chol16(B):
    C, n, _ = B.shape
    out = pl.pallas_call(
        _block_kernel_v2,
        grid=(1,),
        out_shape=jax.ShapeDtypeStruct((C, n, n), jnp.float32),
        in_specs=[pl.BlockSpec((C, n, n), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, n, n), lambda g: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((C, n, n), jnp.float32)],
    )(B)
    return jnp.swapaxes(out, -1, -2)


for C in (8, 16):
    A = rng.standard_normal((C, 128, 128)).astype(np.float32)
    blk = jnp.asarray(A @ A.transpose(0, 2, 1) / 128 + 2 * np.eye(128, dtype=np.float32))
    r = [f"C={C:<3}"]
    r.append(f"one-call {chain_time(pallas_block_chol, blk)*1e3:7.1f} us")
    r.append(f"split8 {chain_time(split_chol, blk)*1e3:7.1f} us")
    r.append(f"grid8 {chain_time(grid_chol, blk)*1e3:7.1f} us")
    r.append(f"grid4 {chain_time(grid_chol4, blk)*1e3:7.1f} us")
    r.append(f"grid1x {chain_time(grid_chol16, blk)*1e3:7.1f} us")
    # correctness
    ref = jnp.linalg.cholesky(blk)

    print("  ".join(r), flush=True)
