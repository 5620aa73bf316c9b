"""Push chol8192 from 40% of f32-effective peak (VERDICT r2 item 2).

Variants at N=8192 f32 (scan-chain two-length differencing):
  1. rec_cholesky baseline (leaf 1024, ambient HIGHEST)
  2. leaf sweep: 512 / 1024 / 2048
  3. prec='high' trailing updates (3-pass bf16 instead of 6)
  4. both
Error vs HIGHEST pinned per variant. Also times the dominant chol consumer
shape: dpotrs-style solve with 8192 x 512 RHS (the bench NLML path).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")

from gpy_tpu.ops.blocked_linalg import rec_cholesky  # noqa: E402


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
    n = 8192
    rng = np.random.default_rng(1)
    A = jax.device_put(jnp.asarray(
        rng.standard_normal((n, 64)).astype(np.float32)))
    flops = n ** 3 / 3.0 + 2.0 * n * n * 64

    def make_K(s, A):
        Av = A + s * 1e-6
        return Av @ Av.T + n * jnp.eye(n, dtype=A.dtype)

    variants = [
        ("leaf1024_highest", dict(leaf=1024, prec=None)),
        ("leaf512_highest", dict(leaf=512, prec=None)),
        ("leaf2048_highest", dict(leaf=2048, prec=None)),
        ("leaf1024_high", dict(leaf=1024, prec="high")),
        ("leaf512_high", dict(leaf=512, prec="high")),
        ("leaf2048_high", dict(leaf=2048, prec="high")),
    ]
    res = {}
    K0 = jax.jit(lambda A: make_K(jnp.float32(0.0), A))(A)
    Lref = jax.jit(lambda K: rec_cholesky(K, 1024))(K0)
    for name, kw in variants:
        def body(c, A, _kw=kw):
            return jnp.sum(rec_cholesky(make_K(c, A), **_kw)) * 1e-9

        t = chain_time(body, (A,))
        tfs = flops / t / 1e12
        # error vs the HIGHEST baseline
        Lv = jax.jit(lambda K, _kw=kw: rec_cholesky(K, **_kw))(K0)
        err = float(jnp.max(jnp.abs(Lv - Lref))) / float(jnp.max(jnp.abs(Lref)))
        res[name] = (round(t * 1e3, 2), round(tfs, 2), err)
        print(f"{name}: {t*1e3:.2f} ms, {tfs:.2f} TF/s, rel err {err:.2e}",
              file=sys.stderr, flush=True)

    print(res)


if __name__ == "__main__":
    main()
