import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu

M = 512
eye = jnp.eye(M, dtype=jnp.float32)
rng = np.random.default_rng(0)
A = rng.standard_normal((M, M)).astype(np.float32) * 0.02
H0 = jnp.asarray(np.eye(M, dtype=np.float32) * 2.0 + 0.5 * (A + A.T))
X = jnp.asarray(rng.random((100_000, 8)).astype(np.float32))

def mk(body):
    def run(keys, H, Xd):
        def f(c, k):
            return c + body(H, Xd, k, c) * 1e-20 + 1.0, ()
        tot, _ = jax.lax.scan(f, jnp.float32(0.0), keys)
        return tot
    return jax.jit(run)

def empty(H, Xd, k, c): return c
def perturb(H, Xd, k, c): return jnp.sum(H + 1e-4 * c * eye)
def matmul1(H, Xd, k, c): return jnp.sum((H + 1e-4*c*eye) @ H)
def gather(H, Xd, k, c):
    idx = jax.random.randint(k, (4096,), 0, 100_000)
    return jnp.sum(Xd[idx])
def chol_noperturb(H, Xd, k, c):
    # data-dependence via c on a CHEAP path (diag add), same as before
    return jnp.sum(jnp.linalg.cholesky(H + 1e-4 * c * eye))

steps = 100
for name, body in [("empty", empty), ("perturb+sum", perturb),
                   ("512 matmul", matmul1), ("4096-row gather", gather),
                   ("chol", chol_noperturb)]:
    fn = mk(body)
    ks = jax.random.split(jax.random.PRNGKey(0), steps)
    float(fn(ks, H0, X)); float(fn(ks, H0*1.001, X))
    best = float("inf")
    for s in range(2, 5):
        t0 = time.perf_counter()
        float(fn(ks, H0 * (1 + 1e-4*s), X))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:16s}: {best/steps*1e3:.3f} ms/iter", flush=True)
