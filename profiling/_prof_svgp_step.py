"""Ablation timing of the SVGP natgrad step at the bench config."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import jax.scipy.linalg as jsl
import gpy_tpu
from gpy_tpu.core.svgp import SVGP
from gpy_tpu.likelihoods import Gaussian
from gpy_tpu.inference.svgp import svgp_elbo_parts_S, CONST_JITTER
import gpy_tpu.kern as gk

N, M, D, B = 100_000, 512, 8, 4096
rng = np.random.default_rng(0)
X = rng.random((N, D)).astype(np.float32) * 4.0
Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)
Z = X[rng.permutation(N)[:M]].copy()
model = SVGP(X, Y, Z, gk.RBF(D, ARD=True), Gaussian(variance=0.1))
scale = N / B
md = None

raw = model.get_raw_dict(free_only=True)
hyper_raw = {k: v for k, v in raw.items() if k not in ("q_u_mean", "q_u_chol")}
m0 = jnp.zeros((M, 1), jnp.float32)
S0 = jnp.tile(jnp.eye(M, dtype=jnp.float32)[None], (1, 1, 1))
ld0 = jnp.float32(0.0)

def elbo_S(hypers, q_mean, S, logdetS, Xb, Yb):
    m = model.with_raw_dict(hypers)
    datafit, kl = svgp_elbo_parts_S(m.kern, Xb, jnp.asarray(m.Z), m.likelihood,
                                    Yb, q_mean, S, logdetS, md, scale, None)
    return datafit - kl

def batch(key, Xd, Yd):
    idx = jax.random.randint(key, (B,), 0, N)
    return Xd[idx], Yd[idx]

def mk_scan(stepfn):
    def run(keys, Xd, Yd):
        def body(c, k):
            out = stepfn(k, Xd, Yd)
            return c + out, ()
        tot, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return tot
    return jax.jit(run)

# variant: value only
v_val = mk_scan(lambda k, Xd, Yd: elbo_S(hyper_raw, m0, S0, ld0, *batch(k, Xd, Yd)))
# variant: value + full grads (consume sum of grads)
def vg(k, Xd, Yd):
    Xb, Yb = batch(k, Xd, Yd)
    val, gr = jax.value_and_grad(elbo_S, argnums=(0, 1, 2))(hyper_raw, m0, S0, ld0, Xb, Yb)
    s = sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(gr))
    return val + s
v_vg = mk_scan(vg)
# variant: grams only
def grams(k, Xd, Yd):
    Xb, Yb = batch(k, Xd, Yd)
    m = model.with_raw_dict(hyper_raw)
    Kmm = m.kern.K(jnp.asarray(m.Z))
    Kmn = m.kern.K(jnp.asarray(m.Z), Xb)
    return jnp.sum(Kmm) + jnp.sum(Kmn) + jnp.sum(Yb)
v_gr = mk_scan(grams)
# variant: grams + chol + inv
def gci(k, Xd, Yd):
    Xb, Yb = batch(k, Xd, Yd)
    m = model.with_raw_dict(hyper_raw)
    Kmm = m.kern.K(jnp.asarray(m.Z)) + CONST_JITTER * jnp.eye(M, dtype=jnp.float32)
    Kmn = m.kern.K(jnp.asarray(m.Z), Xb)
    Lmm = jnp.linalg.cholesky(Kmm)
    Lmi = jsl.solve_triangular(Lmm, jnp.eye(M, dtype=jnp.float32), lower=True)
    C = Lmi @ Kmn
    return jnp.sum(C) + jnp.sum(Yb)
v_gci = mk_scan(gci)

steps = 100
Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
for name, fn in [("grams", v_gr), ("grams+chol+inv+C", v_gci),
                 ("elbo value", v_val), ("elbo val+grad", v_vg)]:
    ks = jax.random.split(jax.random.PRNGKey(0), steps)
    float(fn(ks, Xj, Yj))  # compile
    ks = jax.random.split(jax.random.PRNGKey(1), steps)
    float(fn(ks, Xj, Yj))  # warm (fresh input)
    best = float("inf")
    for s in range(2, 5):
        ks = jax.random.split(jax.random.PRNGKey(s), steps)
        t0 = time.perf_counter()
        float(fn(ks, Xj, Yj))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:20s}: {best/steps*1e3:.3f} ms/iter", flush=True)
