"""Grid kernel: scratch vs output-buffer at_ref (double-buffering test)."""
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


def _kernel_out(a_ref, lt_ref, at_ref):
    _block_kernel_v2(a_ref, lt_ref, at_ref)


def grid_chol_outbuf(B):
    C, n, _ = B.shape
    import os as _os
    g, cb = ((C // 8, 8) if C > 8 and C % 8 == 0 else (1, C)) if _os.environ.get('GRID','1')=='1' else (1, C)
    out = pl.pallas_call(
        _kernel_out,
        grid=(g,),
        out_shape=[jax.ShapeDtypeStruct((C, n, n), jnp.float32)] * 2,
        in_specs=[pl.BlockSpec((cb, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((cb, n, n), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 2,
    )(B)
    return jnp.swapaxes(out[0], -1, -2)


def split_outbuf(B):
    C = B.shape[0]
    if C <= 8:
        return grid_chol_outbuf(B)
    outs = [grid_chol_outbuf(B[i:i + 8]) for i in range(0, C, 8)]
    return jnp.concatenate(outs, 0)


for C in (8, 16, 32):
    A = rng.standard_normal((C, 128, 128)).astype(np.float32)
    blk = jnp.asarray(A @ A.transpose(0, 2, 1) / 128 + 2 * np.eye(128, dtype=np.float32))
    t_scr = chain_time(pallas_block_chol, blk)
    t_out = chain_time(grid_chol_outbuf, blk)
    t_spl = chain_time(split_outbuf, blk)
    err = float(jnp.max(jnp.abs(jnp.tril(grid_chol_outbuf(blk)) - jnp.linalg.cholesky(blk))))
    print(f"C={C:<3} scratch {t_scr*1e3:6.1f} us  outbuf {t_out*1e3:6.1f} us  "
          f"split_outbuf {t_spl*1e3:6.1f} us  err {err:.1e}", flush=True)
