"""One 50k materialized matvec at widths 9/128 and precisions, chained."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
import gpy_tpu.kern as gk
from gpy_tpu.ops.gram_matvec import gram_materialize

N = 50_000
rng = np.random.default_rng(0)
X = (rng.random((N, 4)) * 10.0).astype(np.float32)
kern = gk.RBF(4)
Xj = jnp.asarray(X)


def mk(width, prec, k_len):
    @jax.jit
    def run(Xa, s):
        K, P = gram_materialize(kern, Xa,
                                noise=jnp.full((N,), 0.1, jnp.float32),
                                block=2048)
        V0 = jax.random.normal(jax.random.PRNGKey(0), (P, width), jnp.float32)

        def body(carry, _):
            V, acc = carry
            out = jnp.matmul(K, V, precision=prec)
            nrm = jnp.sqrt(jnp.sum(out * out, axis=0, keepdims=True))
            return (out / (nrm + s), acc + jnp.sum(nrm) * 1e-9), None

        (_, acc), _ = jax.lax.scan(body, (V0, s * jnp.ones(())), None,
                                   length=k_len)
        return acc

    return run


def timed(f, s):
    t0 = time.perf_counter()
    float(f(Xj, jnp.float32(s)))
    return time.perf_counter() - t0


for width in (9, 128):
    for prec in ("default", "high", "highest"):
        fa, fb = mk(width, prec, 2), mk(width, prec, 10)
        for f in (fa, fb):
            float(f(Xj, jnp.float32(1e-6)))
            float(f(Xj, jnp.float32(2e-6)))
        ta = min(timed(fa, 1e-6 * i) for i in (3, 4))
        tb = min(timed(fb, 1e-6 * i) for i in (5, 6))
        print(f"width={width:<4} prec={prec:<8} {(tb-ta)/8*1e3:7.2f} ms/matvec",
              flush=True)
