import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np, jax, jax.numpy as jnp
import gpy_tpu
from gpy_tpu.inference.laplace import Laplace
from gpy_tpu.likelihoods import Bernoulli
from gpy_tpu.models import GPClassificationLaplace
import gpy_tpu.kern as gk

rng = np.random.default_rng(0)
n = 2048
th = rng.uniform(0, np.pi, n).astype(np.float32)
rr = (2.0 + 0.25 * rng.standard_normal(n)).astype(np.float32)
c = rng.integers(0, 2, n)
X = np.stack([np.where(c, rr*np.cos(th), 1-rr*np.cos(th)),
              np.where(c, rr*np.sin(th)-0.5, 0.5-rr*np.sin(th))], 1).astype(np.float32)
Y = c.reshape(-1, 1).astype(np.float32)
lik = Bernoulli()
K = jax.device_put(jnp.asarray(gk.RBF(2).K(jnp.asarray(X)) + 1e-8*jnp.eye(n)))
Yj = jax.device_put(jnp.asarray(Y))

def tsc(f, s):
    t0 = time.perf_counter(); float(f(K, jnp.float32(s))); return time.perf_counter()-t0

for psd in (False, True):
    def newton_chain(k):
        probe = Laplace(tol=0.0, max_iters=k, psd_W=psd)
        @jax.jit
        def run(Kk, s):
            f, _ = probe._find_mode(Kk + s*jnp.eye(n), lik, Yj, None, jnp.zeros_like(Yj))
            return jnp.sum(f)
        return run
    g2, g10 = newton_chain(2), newton_chain(10)
    for f in (g2, g10):
        float(f(K, jnp.float32(0.0))); float(f(K, jnp.float32(1e-6)))
    t2 = min(tsc(g2, 1e-6*i) for i in (2,3,4))
    t10 = min(tsc(g10, 1e-6*i) for i in (5,6,7))
    print(f"psd_W={psd}: ms/newton {(t10-t2)/8*1e3:.3f} (t2 {t2*1e3:.1f} t10 {t10*1e3:.1f})", flush=True)

# full nlml+grad with auto (chol) path
m = GPClassificationLaplace(X, Y)
og = m._get_objgrad()
fl = np.asarray(m.get_flat_raw())
jax.device_get(og(jnp.asarray(fl))); jax.device_get(og(jnp.asarray(fl*1.0001)))
ts = []
for i in range(4):
    t0 = time.perf_counter()
    jax.device_get(og(jnp.asarray(fl + 1e-4*(i+2))))
    ts.append(time.perf_counter()-t0)
print("laplace nlml+grad (chol path):", [round(t*1e3,1) for t in ts], flush=True)
