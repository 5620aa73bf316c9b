import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.ops.blocked_linalg import rec_cholesky

M = 512
eye = jnp.eye(M, dtype=jnp.float32)
rng = np.random.default_rng(0)
A = rng.standard_normal((M, M)).astype(np.float32) * 0.02
H0 = jnp.asarray(np.eye(M, dtype=np.float32) * 2.0 + 0.5 * (A + A.T))

def mk(body):
    def run(keys, H):
        def f(c, k):
            return c + body(H + 1e-4 * c * eye) * 1e-20 + 1.0, ()
        tot, _ = jax.lax.scan(f, jnp.float32(0.0), keys)
        return tot
    return jax.jit(run)

variants = [("xla chol", lambda H: jnp.sum(jnp.linalg.cholesky(H)))]
for leaf in (64, 128, 256):
    variants.append((f"rec chol leaf={leaf}",
                     lambda H, l=leaf: jnp.sum(rec_cholesky(H, leaf=l))))

steps = 100
ks = jnp.arange(steps)
for name, body in variants:
    fn = mk(body)
    float(fn(ks, H0)); float(fn(ks, H0 * 1.001))
    best = float("inf")
    for s in range(2, 5):
        t0 = time.perf_counter()
        float(fn(ks, H0 * (1 + 1e-4 * s)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:20s}: {best/steps*1e3:.3f} ms/iter", flush=True)
# correctness
L1 = np.asarray(jnp.linalg.cholesky(H0))
L2 = np.asarray(rec_cholesky(H0, leaf=128))
print("max |diff|:", np.max(np.abs(L1 - L2)))
