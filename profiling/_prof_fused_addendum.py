"""Addendum measurements for the Pallas verdict:
  1. XLA blockwise streamed matvec (ops/gram_matvec.py) in the same chained
     on-device protocol — the same-memory-class alternative to the fused
     Pallas kernel;
  2. N=100k end-to-end NLML+grad with fused_accum=f32x3 (the new default).

    python _prof_fused_addendum.py
"""
import os
import time

os.environ["GPY_TPU_X64"] = "0"

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import gpy_tpu
    import gpy_tpu.kern as gk
    from gpy_tpu.ops.gram_matvec import gram_matvec

    N, D, R = 50_000, 4, 128
    rng = np.random.default_rng(0)
    X = (rng.random((N, D)) * 10.0).astype(np.float32)
    ls = np.asarray([1.0, 1.1, 0.9, 1.2], np.float32)
    noise = np.full(N, 0.1, np.float32)
    V0 = rng.standard_normal((N, R)).astype(np.float32)
    k = gk.RBF(D, ARD=True)
    k.lengthscale = ls

    Xd = jax.device_put(jnp.asarray(X))
    nd = jax.device_put(jnp.asarray(noise))
    V0d = jax.device_put(jnp.asarray(V0))

    def chain(k_iters):
        def run(v0, Xa, na):
            def bd(v, _):
                w = gram_matvec(k, Xa, v, noise=na, block=2048)
                w = w / jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
                return w, ()

            v, _ = jax.lax.scan(bd, v0, None, length=k_iters)
            return jnp.sum(v[:64])

        return jax.jit(run)

    def _t(f, v):
        t0 = time.perf_counter()
        float(f(v, Xd, nd))
        return time.perf_counter() - t0

    f4, f20 = chain(4), chain(20)
    for f in (f4, f20):
        float(f(V0d, Xd, nd)); float(f(V0d * 1.0001, Xd, nd))
    t4 = min(_t(f4, V0d * (1.0 + 1e-4 * i)) for i in range(2, 5))
    t20 = min(_t(f20, V0d * (1.0 + 1e-4 * i)) for i in range(5, 8))
    print(f"xla-blockwise N={N} R={R}: {(t20-t4)/16*1e3:.1f} ms/matvec "
          f"(t4={t4*1e3:.0f} t20={t20*1e3:.0f})", flush=True)

    # N=100k e2e with the f32x3 default (auto policy picks fused past the cap)
    from gpy_tpu.models import GPRegression
    from gpy_tpu.inference.iterative import IterativeGaussianInference

    N2 = 100_000
    X2 = (rng.random((N2, D)) * 10.0).astype(np.float32)
    Y2 = (np.sin(X2[:, :1]) + 0.1 * rng.standard_normal((N2, 1))).astype(np.float32)
    m = GPRegression(X2, Y2, noise_var=0.1,
                     inference_method=IterativeGaussianInference(
                         max_cg=48, n_probes=8, block=2048))
    og = m._get_objgrad()
    fl = np.asarray(m.get_flat_raw())
    v, g = og(jnp.asarray(fl)); float(v); np.asarray(g)
    v, g = og(jnp.asarray(fl * 1.0001)); float(v); np.asarray(g)
    best = float("inf")
    for i in range(2, 4):
        t0 = time.perf_counter()
        v, g = og(jnp.asarray(fl + 1e-3 * i)); float(v); np.asarray(g)
        best = min(best, time.perf_counter() - t0)
    print(f"N=100k NLML+grad auto(fused f32x3): {best*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
