"""Fused Pallas gram-matvec measurement v2 (VERDICT r1 item 9). Run on chip:

    python _prof_fused_matvec.py [N]

v1 lesson: timing one matvec per dispatch with a fresh host V confounds the
number with the host->device transfer of V through the tunnel (51MB for
R=128 — dominated everything). v2 chains matvecs ON DEVICE under lax.scan
(power-iteration style: v <- K v / |K v|), times scan lengths 4 and 20, and
reports (t20 - t4)/16 — dispatch floor, transfer, and warmup all cancel.

Compares, at N (default 50k), R=128 columns:
  * fused Pallas kernel, accum in {exact(6-pass), f32x3(3-pass), fast(1-pass)}
  * materialized dense K @ V (the r1 default; K built once inside jit,
    passed device-resident to the timed scan)
plus accuracy of each accum vs exact, and end-to-end NLML+grad per accum.
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
    from gpy_tpu.ops.pallas_gram_matvec import stationary_gram_matvec_fused

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    D, R = 4, 128
    rng = np.random.default_rng(0)
    X = (rng.random((N, D)) * 10.0).astype(np.float32)
    ls = np.asarray([1.0, 1.1, 0.9, 1.2], np.float32)
    noise = np.full(N, 0.1, np.float32)
    V0 = rng.standard_normal((N, R)).astype(np.float32)

    Xd = jax.device_put(jnp.asarray(X))
    nd = jax.device_put(jnp.asarray(noise))
    V0d = jax.device_put(jnp.asarray(V0))

    def chain(mv, k):
        def body(v, _):
            w = mv(v)
            w = w / jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
            return w, ()

        def run(v0):
            v, _ = jax.lax.scan(body, v0, None, length=k)
            return jnp.sum(v[:64])  # small fetch

        return jax.jit(run)

    def time_chain(mv, tag):
        f4, f20 = chain(mv, 4), chain(mv, 20)
        for f in (f4, f20):
            float(f(V0d)); float(f(V0d * 1.0001))  # compile + warm
        t4 = min(_t(f4, V0d * (1.0 + 1e-4 * i)) for i in range(2, 5))
        t20 = min(_t(f20, V0d * (1.0 + 1e-4 * i)) for i in range(5, 8))
        per = (t20 - t4) / 16.0
        print(f"{tag}: {per*1e3:.1f} ms/matvec  (t4={t4*1e3:.0f} t20={t20*1e3:.0f})",
              flush=True)
        return per

    def _t(f, v):
        t0 = time.perf_counter()
        float(f(v))
        return time.perf_counter() - t0

    results = {}
    for accum in ("exact", "f32x3", "fast"):
        mv = lambda v, a=accum: stationary_gram_matvec_fused(
            Xd, v, 1.3, ls, family=0, noise=nd, accum=a)
        results[accum] = time_chain(mv, f"fused[{accum}] N={N}")

    # accuracy of f32x3/fast vs exact (single matvec, same input)
    outs = {a: np.asarray(stationary_gram_matvec_fused(
        Xd, V0d[:, :8], 1.3, ls, family=0, noise=nd, accum=a))
        for a in ("exact", "f32x3", "fast")}
    for a in ("f32x3", "fast"):
        rel = np.max(np.abs(outs[a] - outs["exact"])) / np.max(np.abs(outs["exact"]))
        print(f"accum={a}: max rel err vs exact = {rel:.2e}", flush=True)

    # materialized dense baseline (r1 default), K device-resident
    if N <= 55_000:
        import gpy_tpu.kern as gk
        from gpy_tpu.ops.gram_matvec import gram_materialize

        k = gk.RBF(D, ARD=True)
        k.lengthscale = ls

        @jax.jit
        def build(Xa, na):
            K, P = gram_materialize(k, Xa, noise=na, block=2048)
            return K

        Kd = build(Xd, nd)
        Kd.block_until_ready()
        P = Kd.shape[0]
        V0p = jnp.concatenate([V0d, jnp.zeros((P - N, R), jnp.float32)], 0)

        # K must be a jit ARGUMENT: a closure capture embeds all 10GB as a
        # lowering constant (and remote_compile rejects it)
        def chain_k(k_iters):
            def run(v0, K):
                def bd(v, _):
                    w = K @ v
                    w = w / jnp.sqrt(jnp.sum(w * w, axis=0, keepdims=True))
                    return w, ()
                v, _ = jax.lax.scan(bd, v0, None, length=k_iters)
                return jnp.sum(v[:64])

            return jax.jit(run)

        f4, f20 = chain_k(4), chain_k(20)
        for f in (f4, f20):
            float(f(V0p, Kd)); float(f(V0p * 1.0001, Kd))

        def _tk(f, v):
            t0 = time.perf_counter()
            float(f(v, Kd))
            return time.perf_counter() - t0

        t4 = min(_tk(f4, V0p * (1.0 + 1e-4 * i)) for i in range(2, 5))
        t20 = min(_tk(f20, V0p * (1.0 + 1e-4 * i)) for i in range(5, 8))
        print(f"dense[materialized] N={N}: {(t20-t4)/16*1e3:.1f} ms/matvec "
              f"(t4={t4*1e3:.0f} t20={t20*1e3:.0f})", flush=True)
        del Kd

    # end-to-end NLML+grad per accum
    from gpy_tpu.models import GPRegression
    from gpy_tpu.inference.iterative import IterativeGaussianInference

    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)
    for accum in ("exact", "f32x3", "fast"):
        m = GPRegression(X, Y, noise_var=0.1,
                         inference_method=IterativeGaussianInference(
                             max_cg=48, n_probes=8, block=2048,
                             materialize=False, fused=True, fused_accum=accum))
        og = m._get_objgrad()
        fl = np.asarray(m.get_flat_raw())
        v, g = og(jnp.asarray(fl)); float(v); np.asarray(g)
        v, g = og(jnp.asarray(fl * 1.0001)); float(v); np.asarray(g)
        best = float("inf")
        vals = []
        for i in range(2, 4):
            t0 = time.perf_counter()
            v, g = og(jnp.asarray(fl + 1e-3 * i)); vv = float(v); np.asarray(g)
            best = min(best, time.perf_counter() - t0)
            vals.append(vv)
        print(f"N={N} NLML+grad fused[{accum}]: {best*1e3:.0f} ms "
              f"(value {vals[0]:.1f})", flush=True)


if __name__ == "__main__":
    main()
