"""Fused Pallas gram-matvec measurement (VERDICT r1 item 9). Run on chip:

    python _prof_fused_matvec.py [N]

Measures, with the double-warm + fresh-input + host-fetch protocol:
  1. dispatch floor;
  2. VPU exp roofline: sum(exp(x)) on 67M elements vs sum(x) (exp rate);
  3. N=50k: one materialized dense matvec (HBM-bound) vs one fused Pallas
     matvec (VMEM-resident tiles), R=9 and R=128 (free-lane check);
  4. N=100k fused matvec (impossible materialized: 40GB Gram);
  5. end-to-end NLML+grad at N=50k: materialize-once vs fused.
"""
import os
import sys
import time

os.environ["GPY_TPU_X64"] = "0"

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import gpy_tpu
    from gpy_tpu.ops.pallas_gram_matvec import rbf_gram_matvec_fused
    from gpy_tpu.ops.gram_matvec import gram_materialize

    # floor
    f = jax.jit(lambda x: jnp.sum(x) * 1.000001)
    float(f(jnp.ones(8, jnp.float32))); float(f(jnp.full(8, 1.5, jnp.float32)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(f(jnp.full(8, 2.0 + 0.1 * i, jnp.float32)))
        ts.append(time.perf_counter() - t0)
    floor = min(ts)
    print(f"floor {floor*1e3:.1f} ms", flush=True)

    def timed(fn, mk, n=3):
        fn(mk(0)); fn(mk(1))
        best = float("inf")
        for i in range(2, 2 + n):
            a = mk(i)
            t0 = time.perf_counter()
            fn(a)
            best = min(best, time.perf_counter() - t0)
        return max(best - floor, 0.0)

    # --- exp roofline ------------------------------------------------------
    M = 8192 * 8192  # 67M
    base = np.linspace(-2, 0, 1024).astype(np.float32)
    sum_only = jax.jit(lambda x: jnp.sum(x.reshape(-1, 1024) * base))
    sum_exp = jax.jit(lambda x: jnp.sum(jnp.exp(x.reshape(-1, 1024) * base)))
    mk = lambda i: jnp.full((M,), 0.5 + 0.01 * i, jnp.float32)
    t_sum = timed(lambda a: float(sum_only(a)), mk)
    t_exp = timed(lambda a: float(sum_exp(a)), mk)
    rate = M / max(t_exp - t_sum, 1e-9) / 1e9
    print(f"sum-only {t_sum*1e3:.1f} ms, sum-exp {t_exp*1e3:.1f} ms "
          f"-> exp rate ~{rate:.0f} G/s", flush=True)

    # --- matvec comparison at N=50k ---------------------------------------
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    D = 4
    rng = np.random.default_rng(0)
    X = (rng.random((N, D)) * 10.0).astype(np.float32)
    ls = np.asarray([1.0, 1.1, 0.9, 1.2], np.float32)
    noise = np.full(N, 0.1, np.float32)

    import gpy_tpu.kern as gk
    k = gk.RBF(D, ARD=True)
    k.lengthscale = ls

    @jax.jit
    def dense_mv(K, V):
        return jnp.sum(K @ V) * 1e-6

    for R in (9, 128):
        V = rng.standard_normal((N, R)).astype(np.float32)

        fused = jax.jit(lambda Xa, Va: jnp.sum(
            rbf_gram_matvec_fused(Xa, Va, 1.3, ls, noise=jnp.asarray(noise))) * 1e-6)
        t_f = timed(lambda a: float(fused(jnp.asarray(X), a)),
                    lambda i: jnp.asarray(V + 1e-3 * i))
        print(f"N={N} R={R}: fused matvec {t_f*1e3:.1f} ms", flush=True)

    if N <= 60_000:
        # materialized path (the r1 default)
        Kmat, P = gram_materialize(k, jnp.asarray(X), noise=jnp.asarray(noise),
                                   block=2048)
        Kmat.block_until_ready()
        for R in (9, 128):
            V = rng.standard_normal((P, R)).astype(np.float32)
            t_d = timed(lambda a: float(dense_mv(Kmat, a)),
                        lambda i: jnp.asarray(V + 1e-3 * i))
            gbs = (P * P * 4) / max(t_d, 1e-9) / 1e9
            print(f"N={N} R={R}: dense matvec {t_d*1e3:.1f} ms (~{gbs:.0f} GB/s)",
                  flush=True)
        del Kmat

    # --- end-to-end NLML+grad at N -----------------------------------------
    from gpy_tpu.models import GPRegression
    from gpy_tpu.inference.iterative import IterativeGaussianInference

    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)
    for tag, kw in (("materialized", dict(materialize=True)),
                    ("fused", dict(materialize=False, fused=True)),
                    ("fused-p32", dict(materialize=False, fused=True, n_probes=32))):
        if N > 60_000 and tag == "materialized":
            continue
        m = GPRegression(X, Y, noise_var=0.1,
                         inference_method=IterativeGaussianInference(
                             max_cg=48, block=2048, **kw))
        og = m._get_objgrad()
        fl = np.asarray(m.get_flat_raw())

        def run(a):
            v, g = og(a)
            float(v); np.asarray(g)

        t = timed(run, lambda i: jnp.asarray(fl + 1e-3 * i))
        print(f"N={N} NLML+grad {tag}: {t*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
