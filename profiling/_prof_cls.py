"""Round-4: first TPU numbers for EP / Laplace / EPDTC (VERDICT r4 item 1)."""
import os, sys, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.core.sparse_gp import SparseGP
from gpy_tpu.inference.ep import EP
from gpy_tpu.inference.epdtc import EPDTC
from gpy_tpu.inference.laplace import Laplace
from gpy_tpu.likelihoods import Bernoulli
from gpy_tpu.models import GPClassification, GPClassificationLaplace
import gpy_tpu.kern as gk

rng = np.random.default_rng(0)

def floor_ms():
    f = jax.jit(lambda x: jnp.sum(x) * 1.000001)
    float(f(jnp.ones(8, jnp.float32))); float(f(jnp.full(8, 1.5, jnp.float32)))
    return min(min((time.perf_counter() - t0 for t0 in [time.perf_counter()]
                    if float(f(jnp.full(8, 2.0 + 0.1 * i, jnp.float32))) is not None), default=0)
               for i in range(5)) * 1e3

def floor2():
    f = jax.jit(lambda x: jnp.sum(x) * 1.000001)
    float(f(jnp.ones(8, jnp.float32))); float(f(jnp.full(8, 1.5, jnp.float32)))
    best = 1e9
    for i in range(5):
        xi = jnp.full(8, 2.0 + 0.1 * i, jnp.float32)
        t0 = time.perf_counter(); float(f(xi)); best = min(best, time.perf_counter() - t0)
    return best * 1e3

print("floor:", round(floor2(), 1), "ms", flush=True)

def banana(n):
    th = rng.uniform(0, np.pi, n).astype(np.float32)
    rr = (2.0 + 0.25 * rng.standard_normal(n)).astype(np.float32)
    c = rng.integers(0, 2, n)
    x1 = np.where(c, rr * np.cos(th), 1.0 - rr * np.cos(th))
    x2 = np.where(c, rr * np.sin(th) - 0.5, 0.5 - rr * np.sin(th))
    return np.stack([x1, x2], 1).astype(np.float32), c.reshape(-1, 1).astype(np.float32)

n_cls = 2048
Xcl, Ycl = banana(n_cls)

def time_objgrad(m, label):
    og = m._get_objgrad()
    fl = np.asarray(m.get_flat_raw())
    t0 = time.perf_counter(); jax.device_get(og(jnp.asarray(fl)))
    print(f"{label}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    jax.device_get(og(jnp.asarray(fl * 1.0001)))
    ts = []
    for i in range(4):
        t0 = time.perf_counter()
        jax.device_get(og(jnp.asarray(fl + 1e-4 * (i + 2))))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {[round(t*1e3,1) for t in ts]} ms (best {min(ts)*1e3:.1f})", flush=True)
    return min(ts)

m_ep = GPClassification(Xcl, Ycl)
time_objgrad(m_ep, "EP nlml+grad n2048")

lik_b = Bernoulli()
Kcl = jax.device_put(jnp.asarray(m_ep.kern.K(jnp.asarray(Xcl)) + 1e-8 * jnp.eye(n_cls)))
Yj = jax.device_put(jnp.asarray(Ycl))
ep_real = EP()
n_sweeps = int(jax.jit(lambda K: ep_real._converge_sites(K, lik_b, Yj, None)[2])(Kcl))
print("EP sweeps to converge:", n_sweeps, flush=True)

def sweep_chain(k):
    probe = EP(epsilon=0.0, max_iters=k)
    @jax.jit
    def run(K, s):
        tau, v, _ = probe._converge_sites(K + s * jnp.eye(n_cls), lik_b, Yj, None)
        return jnp.sum(tau) + jnp.sum(v)
    return run

f4, f20 = sweep_chain(4), sweep_chain(20)
for f in (f4, f20):
    float(f(Kcl, jnp.float32(0.0))); float(f(Kcl, jnp.float32(1e-6)))
def tsc(f, s):
    t0 = time.perf_counter(); float(f(Kcl, jnp.float32(s))); return time.perf_counter() - t0
t4 = min(tsc(f4, 1e-6 * i) for i in (2, 3, 4))
t20 = min(tsc(f20, 1e-6 * i) for i in (5, 6, 7))
print(f"EP ms/sweep: {(t20-t4)/16*1e3:.3f} (t4 {t4*1e3:.1f} t20 {t20*1e3:.1f})", flush=True)

m_la = GPClassificationLaplace(Xcl, Ycl)
time_objgrad(m_la, "Laplace nlml+grad n2048")
la_real = Laplace()
n_newton = int(jax.jit(lambda K: la_real._find_mode(K, lik_b, Yj, None, jnp.zeros_like(Yj))[1])(Kcl))
print("Laplace newton iters:", n_newton, flush=True)

def newton_chain(k):
    probe = Laplace(tol=0.0, max_iters=k)
    @jax.jit
    def run(K, s):
        f, _ = probe._find_mode(K + s * jnp.eye(n_cls), lik_b, Yj, None, jnp.zeros_like(Yj))
        return jnp.sum(f)
    return run

g2, g10 = newton_chain(2), newton_chain(10)
for f in (g2, g10):
    float(f(Kcl, jnp.float32(0.0))); float(f(Kcl, jnp.float32(1e-6)))
t2 = min(tsc(g2, 1e-6 * i) for i in (2, 3, 4))
t10 = min(tsc(g10, 1e-6 * i) for i in (5, 6, 7))
print(f"Laplace ms/newton: {(t10-t2)/8*1e3:.3f} (t2 {t2*1e3:.1f} t10 {t10*1e3:.1f})", flush=True)

Xcl4, Ycl4 = banana(4096)
Zcl = Xcl4[rng.permutation(4096)[:512]].copy()
m_epdtc = SparseGP(Xcl4, Ycl4, Zcl, gk.RBF(2), Bernoulli(),
                   inference_method=EPDTC(), name="epdtc_bench")
time_objgrad(m_epdtc, "EPDTC nlml+grad n4096 m512")
print("floor end:", round(floor2(), 1), "ms", flush=True)
