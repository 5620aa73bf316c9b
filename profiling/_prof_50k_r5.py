"""R5 item 3: decompose exact-50k bf16 NLML+grad (424 ms vs 329 ms
48-sweep stream floor — where do the ~95 ms go?).

Pieces: materialize, per-CG-sweep cost (two-point max_cg differencing),
SLQ, gradient pass fwd (value-only) and bwd (value_and_grad - value)."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.inference.iterative import IterativeGaussianInference
from gpy_tpu.models import GPRegression

rng = np.random.default_rng(0)
n_it = 50_000
Xi = (rng.random((n_it, 4)) * 10.0).astype(np.float32)
Yi = (np.sin(Xi[:, :1]) + 0.1 * rng.standard_normal((n_it, 1))).astype(np.float32)


def build(max_cg):
    return GPRegression(Xi, Yi, noise_var=0.1,
                        inference_method=IterativeGaussianInference(
                            max_cg=max_cg, n_probes=8, block=2048,
                            materialize=True, gram_dtype="bfloat16"))


def one_shot(fn, args_list):
    """Best-of over fresh args (value-cached tunnel), after double warm."""
    ts = []
    for a in args_list:
        t0 = time.perf_counter()
        jax.device_get(fn(a))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


m48 = build(48)
og48 = m48._get_objgrad()
flat = np.asarray(m48.get_flat_raw())
jax.device_get(og48(jnp.asarray(flat)))
jax.device_get(og48(jnp.asarray(flat * 1.0001)))
t_vg48 = one_shot(og48, [jnp.asarray(flat + 1e-3 * i) for i in (2, 3, 4)])
print(f"value_and_grad max_cg=48: {t_vg48:.1f} ms")

m24 = build(24)
og24 = m24._get_objgrad()
jax.device_get(og24(jnp.asarray(flat)))
jax.device_get(og24(jnp.asarray(flat * 1.0001)))
t_vg24 = one_shot(og24, [jnp.asarray(flat + 1e-3 * i) for i in (2, 3, 4)])
print(f"value_and_grad max_cg=24: {t_vg24:.1f} ms")
sweep = (t_vg48 - t_vg24) / 24.0
print(f"per-sweep: {sweep:.2f} ms -> 48 sweeps = {48*sweep:.1f} ms")

# value-only (drops the backward pass of the surrogate quadratic forms)
vonly48 = jax.jit(m48._flat_objective)
jax.device_get(vonly48(jnp.asarray(flat)))
jax.device_get(vonly48(jnp.asarray(flat * 1.0001)))
t_v48 = one_shot(vonly48, [jnp.asarray(flat + 1e-3 * i) for i in (5, 6, 7)])
print(f"value only  max_cg=48: {t_v48:.1f} ms  (backward = {t_vg48-t_v48:.1f} ms)")

# materialize-only program (bf16 gram build + cast + noise fuse)
from gpy_tpu.ops.gram_matvec import gram_matvec, gram_materialize

kern = m48.kern
noise = jnp.full((n_it,), 0.1 + 1e-6, jnp.float32)
Xj = jax.device_put(jnp.asarray(Xi))


@jax.jit
def mat_only(kraw):
    k2 = kern.with_raw_dict(kraw)
    K, P = gram_materialize(k2, Xj, noise=noise, block=2048,
                            out_dtype="bfloat16")
    return jnp.sum(K[::4096, ::4096].astype(jnp.float32))


kr0 = kern.get_raw_dict()
jax.device_get(mat_only(kr0))
kr1 = {k: v * 1.0001 for k, v in kr0.items()}
jax.device_get(mat_only(kr1))
t_mat = one_shot(mat_only, [{k: v * (1 + 1e-3 * i) for k, v in kr0.items()}
                            for i in (2, 3, 4)])
print(f"materialize bf16 only: {t_mat:.1f} ms")

# gradient-pass fwd: the differentiable blockwise KU = gram_matvec(9 RHS)
U9 = jax.device_put(jnp.asarray(rng.standard_normal((n_it, 9)).astype(np.float32)))


@jax.jit
def ku_only(kraw):
    k2 = kern.with_raw_dict(kraw)
    KU = gram_matvec(k2, Xj, U9, noise=noise, block=2048)
    return jnp.sum(KU)


jax.device_get(ku_only(kr0))
jax.device_get(ku_only(kr1))
t_ku = one_shot(ku_only, [{k: v * (1 + 1e-3 * i) for k, v in kr0.items()}
                          for i in (5, 6, 7)])
print(f"grad-pass KU fwd (blockwise f32): {t_ku:.1f} ms")

vg_ku = jax.jit(jax.value_and_grad(
    lambda kr: ku_only.__wrapped__(kr) if hasattr(ku_only, '__wrapped__') else 0.0))
# simpler: value_and_grad of the un-jitted body
def ku_body(kraw):
    k2 = kern.with_raw_dict(kraw)
    KU = gram_matvec(k2, Xj, U9, noise=noise, block=2048)
    return jnp.sum(KU)
vg_ku = jax.jit(jax.value_and_grad(ku_body))
jax.device_get(vg_ku(kr0))
jax.device_get(vg_ku(kr1))
t_ku_vg = one_shot(vg_ku, [{k: v * (1 + 1e-3 * i) for k, v in kr0.items()}
                           for i in (8, 9, 10)])
print(f"grad-pass KU val+grad: {t_ku_vg:.1f} ms (bwd {t_ku_vg - t_ku:.1f})")

print(f"\naccount: 48 sweeps {48*sweep:.0f} + materialize {t_mat:.0f} "
      f"+ KU fwd {t_ku:.0f} + bwd {t_vg48-t_v48:.0f} "
      f"= {48*sweep + t_mat + t_ku + (t_vg48-t_v48):.0f} vs measured {t_vg48:.0f}")
