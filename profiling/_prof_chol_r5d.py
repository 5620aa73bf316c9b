"""Component breakdown of batched chol+inv at C=8/16 n=1000, ONE run,
interleaved: kernel share, tri_inv share, doubling share, matmul glue.

Cumulative-variant protocol: time (a) kernels only, (b) + tri_inv,
(c) full-minus-doubling, (d) full. Differences = component shares."""
import os, time
os.environ["GPY_TPU_X64"] = "0"
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
import gpy_tpu
from gpy_tpu.ops.pallas_chol import pallas_block_chol, _tri_inv_128, _mm, _B

rng = np.random.default_rng(0)


def timed(f, A, s):
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def make(fn, k_len):
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


def spd(C, n):
    A = rng.standard_normal((C, n, 64)).astype(np.float32)
    K = A @ np.swapaxes(A, -1, -2) + n * np.eye(n, dtype=np.float32)
    return jax.device_put(jnp.asarray(K))


def ll(K, with_tri=True, with_panels=True, with_doubling=True):
    """Inline left-looking with component switches."""
    C, n, _ = K.shape
    nb = -(-n // _B)
    npad = nb * _B
    if npad != n:
        pad = npad - n
        eye_pad = jnp.broadcast_to(jnp.eye(pad, dtype=K.dtype), (C, pad, pad))
        K = jnp.concatenate([
            jnp.concatenate([K, jnp.zeros((C, n, pad), K.dtype)], -1),
            jnp.concatenate([jnp.zeros((C, pad, n), K.dtype), eye_pad], -1),
        ], -2)
    T = lambda X: jnp.swapaxes(X, -1, -2)
    col_blocks, dinvs = [], []
    for j in range(nb):
        o = j * _B
        Acol = K[:, o:, o:o + _B]
        if j and with_panels:
            Lrows = jnp.concatenate(
                [cb[:, (o - (k * _B)):, :] for k, cb in enumerate(col_blocks)], -1)
            Lj = Lrows[:, :_B, :]
            Acol = Acol - _mm(Lrows, T(Lj))
        Ablk = Acol[:, :_B, :]
        Ljj = pallas_block_chol(Ablk)
        if with_tri:
            Dinv = _tri_inv_128(Ljj)
            dinvs.append(Dinv)
            P = _mm(Acol[:, _B:, :], T(Dinv)) if with_panels else Acol[:, _B:, :]
        else:
            P = Acol[:, _B:, :]
        col_blocks.append(jnp.concatenate([Ljj, P], 1))
    L = jnp.concatenate(
        [jnp.concatenate([jnp.zeros((C, j * _B, _B), K.dtype), cb], 1)
         for j, cb in enumerate(col_blocks)], -1)
    if not with_doubling or not with_tri:
        return (L,)
    items = [(dinv, _B, j * _B) for j, dinv in enumerate(dinvs)]
    while len(items) > 1:
        nxt = []
        for p in range(0, len(items) - 1, 2):
            Ai, sa, oa = items[p]
            Ci, sc, oc = items[p + 1]
            Bblk = L[:, oc:oc + sc, oa:oa + sa]
            low = -_mm(Ci, _mm(Bblk, Ai))
            comb = jnp.concatenate([
                jnp.concatenate([Ai, jnp.zeros((C, sa, sc), K.dtype)], -1),
                jnp.concatenate([low, Ci], -1)], -2)
            nxt.append((comb, sa + sc, oa))
        if len(items) % 2:
            nxt.append(items[-1])
        items = nxt
    return L, items[0][0]


VARIANTS = {
    "a_kernels_only": lambda K: ll(K, with_tri=False, with_panels=False),
    "b_+panels":      lambda K: ll(K, with_tri=False, with_panels=True),
    "c_+tri":         lambda K: ll(K, with_tri=True, with_panels=True,
                                   with_doubling=False),
    "d_full":         lambda K: ll(K),
}

KS, KL = 2, 10
for C in (8, 16):
    K = spd(C, 1000)
    progs = {}
    for name, fn in VARIANTS.items():
        fs, fl = make(fn, KS), make(fn, KL)
        for f in (fs, fl):
            float(f(K, jnp.float32(0.0)))
            float(f(K, jnp.float32(1e-4)))
        progs[name] = (fs, fl)
    res = {n: [] for n in progs}
    for rep in range(4):
        for name, (fs, fl) in progs.items():
            ts = min(timed(fs, K, 1e-4*(2 + 20*rep + i)) for i in range(3))
            tl = min(timed(fl, K, 1e-4*(9 + 20*rep + i)) for i in range(3))
            res[name].append((tl - ts) / (KL - KS) * 1e3)
    meds = {}
    for name in res:
        v = sorted(res[name])
        meds[name] = v[len(v)//2]
        print(f"C={C} {name}: {[round(x,3) for x in res[name]]} -> {meds[name]:.3f}")
    ks = list(meds)
    print(f"C={C} shares: kernels {meds[ks[0]]:.2f}, panels "
          f"{meds[ks[1]]-meds[ks[0]]:.2f}, tri {meds[ks[2]]-meds[ks[1]]:.2f}, "
          f"doubling {meds[ks[3]]-meds[ks[2]]:.2f}")
