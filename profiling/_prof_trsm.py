"""trsm variants at n=8192: native / rec(trsm leaf) / rec(inverse leaf)."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.ops.blocked_linalg import (rec_solve_lower, rec_solve_lower_invleaf,
                                        rec_cholesky)

n = 8192
rng = np.random.default_rng(1)
A = rng.standard_normal((n, 64)).astype(np.float32)
K = A @ A.T + n * np.eye(n, dtype=np.float32)
L = np.linalg.cholesky(K).astype(np.float32)
Lj = jax.device_put(jnp.asarray(L))


def timed(f, *args):
    t0 = time.perf_counter()
    float(f(*args))
    return time.perf_counter() - t0


def chain_time(fn, R, k_a=2, k_b=10):
    B0 = jax.device_put(jnp.asarray(
        rng.standard_normal((n, R)).astype(np.float32)))

    def mk(k_len):
        @jax.jit
        def run(L, B, s):
            def body(c, _):
                X = fn(L, B * (1.0 + 1e-9 * c) + s * 1e-12)
                return jnp.sum(X[-1]) * 1e-9, ()
            c, _ = lax.scan(body, s, None, length=k_len)
            return c
        return run

    fa, fb = mk(k_a), mk(k_b)
    for f in (fa, fb):
        float(f(Lj, B0, jnp.float32(0.0)))
        float(f(Lj, B0, jnp.float32(1.0)))
    ta = min(timed(fa, Lj, B0, jnp.float32(2.0 + i)) for i in range(3))
    tb = min(timed(fb, Lj, B0, jnp.float32(5.0 + i)) for i in range(3))
    return (tb - ta) / (k_b - k_a) * 1e3


native = lambda L, B: jax.scipy.linalg.solve_triangular(L, B, lower=True)
rec = lambda L, B: rec_solve_lower(L, B, 512)
inv = lambda L, B: rec_solve_lower_invleaf(L, B, 512, prec="high")
invHG = lambda L, B: rec_solve_lower_invleaf(L, B, 512, prec=None)

for R in (512, 8192):
    row = [f"RHS={R:<5}"]
    for name, f in (("native", native), ("rec512", rec), ("invleaf", inv),
                    ("invleaf_hi", invHG)):
        t = chain_time(f, R)
        tfs = n * n * R / t / 1e9
        row.append(f"{name} {t:7.2f} ms ({tfs:5.1f} TF/s)")
    print("  ".join(row), flush=True)

# accuracy on TPU
B = jnp.asarray(rng.standard_normal((n, 256)).astype(np.float32))
Xr = np.linalg.solve(L.astype(np.float64), np.asarray(B, np.float64))
for name, f in (("native", native), ("rec512", rec), ("invleaf", inv)):
    X = np.asarray(jax.jit(f)(Lj, B))
    print(f"{name} err vs f64: {np.max(np.abs(X - Xr)):.2e}")
