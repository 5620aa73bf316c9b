"""Decompose the batched HMC logp eval at C=8/16: gram fwd, gram vjp,
chol+inv, NLML fwd, NLML vjp."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.mcmc import _logp_fn
from gpy_tpu.models import GPRegression

rng = np.random.default_rng(0)
n_h = 1000
Xh = rng.random((n_h, 2)).astype(np.float32) * 4.0
Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n_h, 1))).astype(np.float32)
mh = GPRegression(Xh, Yh, noise_var=0.1)
logp = _logp_fn(mh, False)
x0 = jnp.asarray(np.asarray(mh.get_flat_raw()))
P = x0.size
Xj = jnp.asarray(Xh)


def gram_sum(x):
    m2 = mh.with_flat_raw(x)
    return jnp.sum(m2.kern.K(Xj)) * 1e-6


def nlml(x):
    return logp(x)


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def measure(name, fn, A, k_short=1, k_long=9):
    def chain(k_len):
        @jax.jit
        def run(A, s):
            def body(c, _):
                out = fn(A + (s + c * 1e-20))
                acc = 0.0
                for o in (out if isinstance(out, tuple) else (out,)):
                    acc = acc + jnp.sum(o) * 1e-9
                return acc, ()
            c, _ = lax.scan(body, s * 0.0, None, length=k_len)
            return c
        return run

    f_s, f_l = chain(k_short), chain(k_long)
    for f in (f_s, f_l):
        float(f(A, jnp.float32(0.0)))
        float(f(A, jnp.float32(1e-4)))
    ts = min(timed(f_s, A, 1e-4 * i) for i in (2, 3, 4))
    tl = min(timed(f_l, A, 1e-4 * i) for i in (5, 6, 7))
    ms = (tl - ts) / (k_long - k_short) * 1e3
    print(f"{name}: {ms:.3f} ms")
    return ms


from gpy_tpu.util.linalg import chol_and_inv

res = {}
for C in (8, 16):
    print(f"=== C={C} ===")
    xC = jnp.tile(x0[None, :], (C, 1)) + 1e-3 * jnp.asarray(
        rng.standard_normal((C, P)).astype(np.float32))
    r = {}
    r["gram_fwd"] = measure(f"gram fwd C={C}", jax.vmap(gram_sum), xC)
    r["gram_vjp"] = measure(f"gram val+grad C={C}",
                            jax.vmap(jax.value_and_grad(gram_sum)), xC)
    r["nlml_fwd"] = measure(f"nlml fwd C={C}", jax.vmap(nlml), xC)
    r["nlml_vjp"] = measure(f"nlml val+grad C={C}",
                            jax.vmap(jax.value_and_grad(nlml)), xC)

    # chol+inv of the batched gram (forward only)
    def chol_of_gram(x):
        m2 = mh.with_flat_raw(x)
        K = m2.kern.K(Xj) + 0.1 * jnp.eye(n_h, dtype=Xj.dtype)
        L, Li = chol_and_inv(K)
        return jnp.sum(L) * 1e-6 + jnp.sum(Li) * 1e-6

    r["gram_chol_fwd"] = measure(f"gram+chol_inv fwd C={C}",
                                 jax.vmap(chol_of_gram), xC)
    res[C] = r

print("\n16/8 ratios:", {k: round(res[16][k] / res[8][k], 2) for k in res[8]})
print("derived chol_inv share: C8",
      round(res[8]["gram_chol_fwd"] - res[8]["gram_fwd"], 3),
      "C16", round(res[16]["gram_chol_fwd"] - res[16]["gram_fwd"], 3))
print("derived nlml backward: C8",
      round(res[8]["nlml_vjp"] - res[8]["nlml_fwd"], 3),
      "C16", round(res[16]["nlml_vjp"] - res[16]["nlml_fwd"], 3))
