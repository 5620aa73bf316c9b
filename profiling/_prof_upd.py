import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import jax.scipy.linalg as jsl
import gpy_tpu

M = 512
eye = jnp.eye(M, dtype=jnp.float32)
rng = np.random.default_rng(0)
A = rng.standard_normal((M, M)).astype(np.float32) * 0.02

def mk(body):
    def run(keys, H0):
        def f(c, k):
            out = body(H0 + 1e-4 * c * eye)
            return c + out * 1e-20 + 1.0, ()
        tot, _ = jax.lax.scan(f, jnp.float32(0.0), keys)
        return tot
    return jax.jit(run)

# pieces of upd()
def chol_only(H): return jnp.sum(jnp.linalg.cholesky(H))
def chol_vmap(H): return jnp.sum(jax.vmap(jnp.linalg.cholesky)(H[None]))
def chol_inv(H):
    Lh = jnp.linalg.cholesky(H)
    Lhi = jsl.solve_triangular(Lh, eye, lower=True)
    return jnp.sum(Lhi)
def chol_inv_vmap(H):
    def u(Hd):
        Lh = jnp.linalg.cholesky(Hd)
        return jsl.solve_triangular(Lh, eye, lower=True)
    return jnp.sum(jax.vmap(u)(H[None]))
def full_upd(H):
    def u(Hd):
        Lh = jnp.linalg.cholesky(Hd)
        Lhi = jsl.solve_triangular(Lh, eye, lower=True)
        S_new = Lhi.T @ Lhi
        ld = -2.0 * jnp.sum(jnp.log(jnp.diagonal(Lh)))
        return S_new @ jnp.ones((M, 1), jnp.float32), S_new, ld
    a, b, c = jax.vmap(u)(H[None])
    return jnp.sum(a) + jnp.sum(b) + jnp.sum(c)

H0 = jnp.asarray(np.eye(M, dtype=np.float32) * 2.0 + 0.5 * (A + A.T))
steps = 100
for name, body in [("chol", chol_only), ("chol vmap[1]", chol_vmap),
                   ("chol+inv", chol_inv), ("chol+inv vmap[1]", chol_inv_vmap),
                   ("full upd vmap[1]", full_upd)]:
    fn = mk(body)
    ks = jnp.arange(steps)
    float(fn(ks, H0))
    float(fn(ks, H0 * 1.001))
    best = float("inf")
    for s in range(2, 5):
        t0 = time.perf_counter()
        float(fn(ks, H0 * (1 + 1e-4 * s)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:18s}: {best/steps*1e3:.3f} ms/iter", flush=True)
