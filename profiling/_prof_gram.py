"""Where does gram8192's 1.23 ms go? (VERDICT r2 item 3)

Ablates the RBF Gram build at N=8192, D=8 ARD, f32:
  a. distance-only (no exp) at HIGHEST / HIGH / f32x3-split matmul
  b. exp-only of a resident (N, N) matrix
  c. full gram at HIGHEST vs HIGH distance precision
  d. full gram consumed by sum (the bench protocol) vs materialized
     (forced HBM write via two consumers)
Roofline: 8192^2 f32 = 268 MB; one HBM write at ~819 GB/s = 0.33 ms.
Scan-chain two-length differencing, device-resident inputs.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")


def timed(f, *args):
    t0 = time.perf_counter()
    r = f(*args)
    float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
    return time.perf_counter() - t0


def chain_time(make_body, args, k_short=2, k_long=26):
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
    n, D = 8192, 8
    rng = np.random.default_rng(0)
    X = jax.device_put(jnp.asarray((rng.random((n, D)) * 4.0).astype(np.float32)))
    ls = jnp.asarray(1.0 + 0.1 * np.arange(D), jnp.float32)

    P = jax.lax.Precision

    def dist2(Xs, prec):
        sq = jnp.sum(Xs * Xs, axis=1)
        cross = jax.lax.dot_general(Xs, Xs, (((1,), (1,)), ((), ())),
                                    precision=prec)
        r2 = sq[:, None] + sq[None, :] - 2.0 * cross
        return jnp.where(r2 < 0.0, 0.0, r2)

    def dist2_f32x3(Xs):
        hi = Xs.astype(jnp.bfloat16)
        lo = (Xs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), precision=P.DEFAULT,
            preferred_element_type=jnp.float32)
        cross = dot(hi, hi) + dot(hi, lo) + dot(lo, hi)
        sq = jnp.sum(Xs * Xs, axis=1)
        r2 = sq[:, None] + sq[None, :] - 2.0 * cross
        return jnp.where(r2 < 0.0, 0.0, r2)

    res = {}

    def tm(name, body, args=()):
        t = chain_time(body, args)
        res[name] = round(t * 1e3, 3)
        print(f"{name}: {t*1e3:.3f} ms", file=sys.stderr, flush=True)

    Xs0 = X / ls

    # a. distance only
    tm("dist_highest", lambda c: jnp.sum(dist2((X + c * 1e-6) / ls, P.HIGHEST)) * 1e-9)
    tm("dist_high", lambda c: jnp.sum(dist2((X + c * 1e-6) / ls, P.HIGH)) * 1e-9)
    tm("dist_f32x3", lambda c: jnp.sum(dist2_f32x3((X + c * 1e-6) / ls)) * 1e-9)
    tm("dist_direct_vpu", lambda c: jnp.sum(
        sum(((X[:, d:d+1] / ls[d] + c * 1e-6) - (X[None, :, d] / ls[d])) ** 2
            for d in range(D))) * 1e-9)

    # b. exp only (resident negative matrix — passed as ARG, a 268MB
    # closure constant 413s the remote compiler)
    R2 = jax.jit(lambda Xs: dist2(Xs, P.HIGHEST))(Xs0)
    tm("exp_only", lambda c, R2: jnp.sum(jnp.exp(-0.5 * (R2 + c * 1e-9))) * 1e-9,
       (R2,))

    # c. full gram
    tm("gram_highest", lambda c: jnp.sum(
        jnp.exp(-0.5 * dist2((X + c * 1e-6) / ls, P.HIGHEST))) * 1e-9)
    tm("gram_high", lambda c: jnp.sum(
        jnp.exp(-0.5 * dist2((X + c * 1e-6) / ls, P.HIGH))) * 1e-9)

    def gram_direct(c):
        Xs = (X + c * 1e-6) / ls
        r2 = sum((Xs[:, d:d+1] - Xs[None, :, d]) ** 2 for d in range(D))
        return jnp.sum(jnp.exp(-0.5 * r2)) * 1e-9

    tm("gram_direct_vpu", gram_direct)

    # d. force a real materialization: two independent consumers of K
    def gram_2consumer(c):
        K = jnp.exp(-0.5 * dist2((X + c * 1e-6) / ls, P.HIGHEST))
        return jnp.sum(K) * 1e-9 + jnp.sum(K * K) * 1e-12

    tm("gram_2consumers", gram_2consumer)

    # error of HIGH / f32x3 vs HIGHEST on the gram entries
    def direct_r2(Xs):
        return sum((Xs[:, d:d+1] - Xs[None, :, d]) ** 2 for d in range(D))

    Kh = jax.jit(lambda Xs: jnp.exp(-0.5 * dist2(Xs, P.HIGHEST)))(Xs0)
    for nm, K2 in (("high", jax.jit(lambda Xs: jnp.exp(-0.5 * dist2(Xs, P.HIGH)))(Xs0)),
                   ("direct", jax.jit(lambda Xs: jnp.exp(-0.5 * direct_r2(Xs)))(Xs0))):
        err = float(jnp.max(jnp.abs(K2 - Kh)))
        print(f"gram {nm} max abs err vs highest: {err:.3e}", file=sys.stderr)
        res[f"err_{nm}"] = err

    print(res)


if __name__ == "__main__":
    main()
