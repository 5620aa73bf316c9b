"""Round-4 item 3: CG/SLQ convergence curves on the bench 50k problem.

Questions: (a) how many CG iters does the alpha solve need, (b) how many
Lanczos nodes does SLQ logdet need, (c) does block-CG with free extra
columns (HBM-bound materialized matvec) cut (a)?
"""
import os, time, sys
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
import gpy_tpu.kern as gk
from gpy_tpu.ops.gram_matvec import gram_materialize
from gpy_tpu.inference.iterative import _slq_logdet

N = 50_000
rng = np.random.default_rng(0)
X = (rng.random((N, 4)) * 10.0).astype(np.float32)
Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)
kern = gk.RBF(4)
noise = 0.1 + 1e-6
MAXIT = 96
NP = 8  # probes

Xj = jnp.asarray(X)
Yj = jnp.asarray(Y)


@jax.jit
def run(Xa, Ya):
    K, P = gram_materialize(kern, Xa, noise=jnp.full((N,), noise, jnp.float32),
                            block=2048)
    pad = P - N
    key = jax.random.PRNGKey(0)
    Z = jax.random.rademacher(key, (N, NP), dtype=jnp.float32)
    B = jnp.concatenate([Ya, Z], 1)

    def mv(V):
        Vp = jnp.concatenate([V, jnp.zeros((pad, V.shape[1]), V.dtype)], 0) if pad else V
        return (K @ Vp)[:N]

    # vanilla batched CG, recording per-iter residual norms + cg coeffs
    x0 = jnp.zeros_like(B)
    r0 = B
    p0 = B
    rho0 = jnp.sum(r0 * r0, axis=0)

    def step(carry, _):
        x, r, p, rho = carry
        Kp = mv(p)
        denom = jnp.sum(p * Kp, axis=0)
        a = rho / denom
        x2 = x + a * p
        r2 = r - a * Kp
        rho2 = jnp.sum(r2 * r2, axis=0)
        beta = rho2 / rho
        p2 = r2 + beta * p
        return (x2, r2, p2, rho2), (jnp.sqrt(rho2), a, beta)

    (xf, rf, pf, _), (resnorms, al, be) = lax.scan(
        step, (x0, r0, p0, rho0), None, length=MAXIT)
    return resnorms, al, be, rho0, xf


print("compiling...", flush=True)
t0 = time.time()
res, al, be, rho0, xf = run(Xj, Yj)
res = np.asarray(res); al = np.asarray(al); be = np.asarray(be)
rho0 = np.asarray(rho0)
print(f"ran in {time.time()-t0:.1f}s", flush=True)

b0 = np.sqrt(rho0)
print("alpha col relative residual ||r||/||b||:")
for it in (8, 16, 24, 32, 40, 48, 64, 96):
    print(f"  it={it:<3} y-col {res[it-1,0]/b0[0]:.3e}  probe-max "
          f"{np.max(res[it-1,1:]/b0[1:]):.3e}", flush=True)

print("SLQ logdet vs quadrature order (from cg coeff prefixes):")
z_norm2 = rho0[1:]
for m in (8, 16, 24, 32, 40, 48, 64, 96):
    ld = _slq_logdet(jnp.asarray(al[:m, 1:]), jnp.asarray(be[:m, 1:]),
                     jnp.asarray(z_norm2), N, NP)
    print(f"  m={m:<3} logdet={float(ld):.2f}", flush=True)

# Ritz values from the probe tridiagonals (spectrum envelope)
np.save('/tmp/cg50k_al.npy', al); np.save('/tmp/cg50k_be.npy', be)
for j in (1, 2):
    a = al[:, j]; b = be[:, j]
    m = MAXIT
    diag = np.empty(m); off = np.empty(m - 1)
    diag[0] = 1.0 / a[0]
    for k in range(1, m):
        diag[k] = 1.0 / a[k] + b[k - 1] / a[k - 1]
        off[k - 1] = np.sqrt(b[k - 1]) / a[k - 1]
    T = np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)
    ev = np.linalg.eigvalsh(T)
    print(f"probe {j}: ritz top10 {np.round(ev[-10:], 1)}")
    print(f"         ritz bottom5 {np.round(ev[:5], 4)}")
