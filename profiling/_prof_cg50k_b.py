"""Split the 861ms exact-50k NLML+grad into materialize / CG / grad-pass."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
import gpy_tpu.kern as gk
from gpy_tpu.models import GPRegression
from gpy_tpu.inference.iterative import IterativeGaussianInference, cg_batched
from gpy_tpu.ops.gram_matvec import gram_materialize

N = 50_000
rng = np.random.default_rng(0)
X = (rng.random((N, 4)) * 10.0).astype(np.float32)
Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)

mi = GPRegression(X, Y, noise_var=0.1,
                  inference_method=IterativeGaussianInference(
                      max_cg=48, n_probes=8, block=2048))
ogi = mi._get_objgrad()
flat = np.asarray(mi.get_flat_raw())


def t_of(f, *args):
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# full
jax.device_get(ogi(jnp.asarray(flat)))
jax.device_get(ogi(jnp.asarray(flat * 1.0001)))
t_full = min(t_of(ogi, jnp.asarray(flat + 1e-3 * i)) for i in (1, 2))
print(f"full nlml+grad: {t_full*1e3:.1f} ms", flush=True)

kern = gk.RBF(4)
Xj = jnp.asarray(X)
Yj = jnp.asarray(Y)


@jax.jit
def mat_only(Xa, s):
    K, P = gram_materialize(kern, Xa * (1.0 + 1e-9 * s),
                            noise=jnp.full((N,), 0.1 + 1e-6, jnp.float32),
                            block=2048)
    return jnp.sum(K[::4096, ::4096])


@jax.jit
def mat_cg(Xa, Ya, s):
    K, P = gram_materialize(kern, Xa * (1.0 + 1e-9 * s),
                            noise=jnp.full((N,), 0.1 + 1e-6, jnp.float32),
                            block=2048)
    pad = P - N
    Z = jax.random.rademacher(jax.random.PRNGKey(0), (N, 8), dtype=jnp.float32)
    B = jnp.concatenate([Ya, Z], 1)

    def mv(V):
        Vp = jnp.concatenate([V, jnp.zeros((pad, V.shape[1]), V.dtype)], 0) if pad else V
        return (K @ Vp)[:N]

    sol, al, be, rho0 = cg_batched(mv, B, maxiter=48)
    return jnp.sum(sol[::997]) + jnp.sum(al) + jnp.sum(be)


for name, f, args in (("materialize only", mat_only, (Xj,)),
                      ("materialize+CG48", mat_cg, (Xj, Yj))):
    f(*args, jnp.float32(0.0))
    f(*args, jnp.float32(1.0))
    t = min(t_of(f, *args, jnp.float32(2.0 + i)) for i in (0, 1))
    print(f"{name}: {t*1e3:.1f} ms", flush=True)
