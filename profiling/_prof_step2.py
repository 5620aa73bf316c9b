"""Ablation with loop-VARYING hypers (no hoisting): where do 2.78ms go?"""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import jax.scipy.linalg as jsl
import gpy_tpu, optax
from gpy_tpu.core.svgp import SVGP
from gpy_tpu.likelihoods import Gaussian
from gpy_tpu.inference.svgp import svgp_elbo_parts_S
import gpy_tpu.kern as gk

N, M, D, B = 100_000, 512, 8, 4096
rng = np.random.default_rng(0)
X = rng.random((N, D)).astype(np.float32) * 4.0
Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)
Z = X[rng.permutation(N)[:M]].copy()
model = SVGP(X, Y, Z, gk.RBF(D, ARD=True), Gaussian(variance=0.1))
scale = N / B
eye = jnp.eye(M, dtype=jnp.float32)

raw = model.get_raw_dict(free_only=True)
hyper_raw = {k: jnp.asarray(v, jnp.float32) for k, v in raw.items()
             if k not in ("q_u_mean", "q_u_chol")}
m0 = jnp.zeros((M, 1), jnp.float32)
S0 = jnp.eye(M, dtype=jnp.float32)[None]
Si0 = S0
ld0 = jnp.float32(0.0)
opt = optax.adam(1e-2)
ostate0 = opt.init(hyper_raw)
lr = 0.1

def elbo_S(hypers, q_mean, S, logdetS, Xb, Yb):
    m = model.with_raw_dict(hypers)
    S = 0.5 * (S + jnp.swapaxes(S, 1, 2))
    df, kl = svgp_elbo_parts_S(m.kern, Xb, jnp.asarray(m.Z), m.likelihood,
                               Yb, q_mean, S, logdetS, None, scale, None)
    return df - kl

def batch(key, Xd, Yd):
    idx = jax.random.randint(key, (B,), 0, N)
    return Xd[idx], Yd[idx]

def upd(m_d, Si_d, dm_d, dS_d):
    dS_tot = 0.5 * (dS_d + dS_d.T) + 0.5 * Si_d
    th1 = Si_d @ m_d
    th1n = th1 + lr * (dm_d - 2.0 * dS_tot @ m_d)
    H = Si_d - 2.0 * lr * dS_tot
    Lh = jnp.linalg.cholesky(H + 1e-10 * eye)
    Lhi = jsl.solve_triangular(Lh, eye, lower=True)
    S_new = Lhi.T @ Lhi
    S_new = 0.5 * (S_new + S_new.T)
    ld_new = -2.0 * jnp.sum(jnp.log(jnp.diagonal(Lh)))
    return S_new @ th1n, S_new, 0.5 * (H + H.T), ld_new

def step_full(carry, key, Xd, Yd):
    hypers, q_mean, S, Si, ld, ostate = carry
    Xb, Yb = batch(key, Xd, Yd)
    val, grads = jax.value_and_grad(elbo_S, argnums=(0, 1, 2))(hypers, q_mean, S, ld, Xb, Yb)
    g_h, g_m, g_S = grads
    neg = jax.tree_util.tree_map(lambda g: -g, g_h)
    updates, ostate = opt.update(neg, ostate, hypers)
    hypers = optax.apply_updates(hypers, updates)
    m_new, S_new, Si_new, ld_new = jax.vmap(upd)(q_mean.T[:, :, None], Si, g_m.T[:, :, None], g_S)
    return (hypers, m_new[:, :, 0].T, S_new, Si_new, jnp.sum(ld_new), ostate), val

def step_noupd(carry, key, Xd, Yd):  # grads of all, adam on hypers, S frozen
    hypers, q_mean, S, Si, ld, ostate = carry
    Xb, Yb = batch(key, Xd, Yd)
    val, grads = jax.value_and_grad(elbo_S, argnums=(0, 1, 2))(hypers, q_mean, S, ld, Xb, Yb)
    g_h, g_m, g_S = grads
    neg = jax.tree_util.tree_map(lambda g: -g, g_h)
    updates, ostate = opt.update(neg, ostate, hypers)
    hypers = optax.apply_updates(hypers, updates)
    q_mean = q_mean + 1e-9 * g_m  # consume grads so they're not DCE'd
    S = S + 1e-12 * g_S
    return (hypers, q_mean, S, Si, ld, ostate), val

def step_hgrad(carry, key, Xd, Yd):  # grads wrt hypers ONLY
    hypers, q_mean, S, Si, ld, ostate = carry
    Xb, Yb = batch(key, Xd, Yd)
    val, g_h = jax.value_and_grad(elbo_S, argnums=0)(hypers, q_mean, S, ld, Xb, Yb)
    neg = jax.tree_util.tree_map(lambda g: -g, g_h)
    updates, ostate = opt.update(neg, ostate, hypers)
    hypers = optax.apply_updates(hypers, updates)
    return (hypers, q_mean, S, Si, ld, ostate), val

def step_value(carry, key, Xd, Yd):  # value only, hypers perturbed to stay loop-varying
    hypers, q_mean, S, Si, ld, ostate = carry
    Xb, Yb = batch(key, Xd, Yd)
    val = elbo_S(hypers, q_mean, S, ld, Xb, Yb)
    hypers = jax.tree_util.tree_map(lambda h: h * (1.0 + 1e-9 * val * 1e-9), hypers)
    return (hypers, q_mean, S, Si, ld, ostate), val

steps = 100
Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
carry0 = (hyper_raw, m0, S0, Si0, ld0, ostate0)
for name, st in [("value only", step_value), ("hyper-grads", step_hgrad),
                 ("all grads, no upd", step_noupd), ("FULL step", step_full)]:
    def run(keys, Xd, Yd, c0=carry0, st=st):
        c, tr = jax.lax.scan(lambda c, k: st(c, k, Xd, Yd), c0, keys)
        return jnp.sum(tr)
    fn = jax.jit(run)
    ks = jax.random.split(jax.random.PRNGKey(0), steps)
    float(fn(ks, Xj, Yj))
    ks = jax.random.split(jax.random.PRNGKey(1), steps)
    float(fn(ks, Xj, Yj))
    best = float("inf")
    for s in range(2, 5):
        ks = jax.random.split(jax.random.PRNGKey(s), steps)
        t0 = time.perf_counter()
        float(fn(ks, Xj, Yj))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:20s}: {(best*1e3 - 26.3)/steps:.3f} ms/iter (raw {best*1e3/steps:.3f})", flush=True)
