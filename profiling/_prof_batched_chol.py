"""Profile: does batched (vmapped) chol/trsm serialize per batch element on TPU?

VERDICT r2 item 1: HMC chain scaling is flat 1->16 chains at N=1000. The
hypothesis (round-2 lead) is that the vmapped chol(1000) + trsm(eye) in the
EXPLICIT_INV path of exact inference serializes per chain. This script
measures, on the real chip, with the scan-chain two-length differencing
protocol (device-resident inputs, scalar-varied, double-warm, host-fetch
sync):

  1. native batched chol (C,1000,1000) vs C
  2. native batched trsm(eye) (C,1000,1000) vs C
  3. batched matmul same shapes vs C   (MXU reference: should scale ~C)
  4. native batched chol at leaf sizes (C,256,256) / (C,128,128)
  5. prototype recursive batched chol+inv (trsm-free except leaf) vs C
  6. the real vmapped NLML+grad of GPRegression(N=1000) per chain count
"""
import os
import sys
import time

os.environ["GPY_TPU_X64"] = "0"  # part 6 imports gpy_tpu; keep f32

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "highest")


def timed(f, *args):
    t0 = time.perf_counter()
    r = f(*args)
    float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
    return time.perf_counter() - t0


def chain_time(make_body, args, k_short=2, k_long=10, reps=3):
    """Scan-chain two-length differencing. make_body(s_carry, args) -> scalar
    contribution; we time k_long vs k_short chains and return per-iter s."""

    def chain(k_len):
        @jax.jit
        def run(s, *args):
            def body(c, _):
                return make_body(c, *args), ()

            c, _ = lax.scan(body, s, None, length=k_len)
            return c

        return run

    fS, fL = chain(k_short), chain(k_long)
    for f in (fS, fL):  # double warm, two distinct inputs
        float(f(jnp.float32(0.0), *args))
        float(f(jnp.float32(1e-4), *args))
    tS = min(timed(fS, jnp.float32(1e-4 * i), *args) for i in (2, 3, 4))
    tL = min(timed(fL, jnp.float32(1e-4 * i), *args) for i in (5, 6, 7))
    return max((tL - tS) / (k_long - k_short), 1e-7)


# ---------------- prototype: recursive batched chol + inverse ---------------
def rec_chol_inv_b(A, leaf=256):
    """(L, Li) for batched PSD A, trsm/chol only at leaf size; all glue is
    batched matmul (MXU). Li21 = -L22i @ L21 @ L11i."""
    n = A.shape[-1]
    if n <= leaf:
        L = jnp.linalg.cholesky(A)
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
        Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return L, Li
    m = n // 2
    T = lambda X: jnp.swapaxes(X, -1, -2)
    L11, L11i = rec_chol_inv_b(A[..., :m, :m], leaf)
    L21 = A[..., m:, :m] @ T(L11i)
    L22, L22i = rec_chol_inv_b(A[..., m:, m:] - L21 @ T(L21), leaf)
    Li21 = -L22i @ (L21 @ L11i)
    z = jnp.zeros(A.shape[:-2] + (m, n - m), A.dtype)
    L = jnp.concatenate(
        [jnp.concatenate([L11, z], -1), jnp.concatenate([L21, L22], -1)], -2)
    Li = jnp.concatenate(
        [jnp.concatenate([L11i, z], -1), jnp.concatenate([Li21, L22i], -1)], -2)
    return L, Li


def main():
    n = 1000
    rng = np.random.default_rng(0)
    out = {}

    for C in (1, 2, 4, 8):
        G = jax.device_put(jnp.asarray(
            rng.standard_normal((C, n, 64)).astype(np.float32)))

        def make_K(s, G):
            Gv = G + s * 1e-6
            return Gv @ jnp.swapaxes(Gv, -1, -2) + n * jnp.broadcast_to(
                jnp.eye(n, dtype=G.dtype), (G.shape[0], n, n))

        # 1. native batched chol
        t = chain_time(
            lambda c, G: jnp.sum(jnp.linalg.cholesky(make_K(c, G))) * 1e-9, (G,))
        out[f"chol_C{C}"] = t * 1e3

        # 2. native batched trsm(eye)
        def trsm_body(c, G):
            K = make_K(c, G)
            L = jnp.linalg.cholesky(K)
            eye = jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), K.shape)
            Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
            return jnp.sum(Li) * 1e-9

        t2 = chain_time(trsm_body, (G,))
        out[f"chol_trsm_C{C}"] = t2 * 1e3

        # 3. batched matmul reference
        t3 = chain_time(
            lambda c, G: jnp.sum(
                (lambda K: K @ K)(make_K(c, G))) * 1e-12, (G,))
        out[f"matmul_C{C}"] = t3 * 1e3

        # 5. prototype recursive batched chol+inv
        for leaf in (256, 128):
            def rec_body(c, G, _leaf=leaf):
                L, Li = rec_chol_inv_b(make_K(c, G), _leaf)
                return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

            t5 = chain_time(rec_body, (G,))
            out[f"rec{leaf}_cholinv_C{C}"] = t5 * 1e3

        print(f"C={C}: chol {out[f'chol_C{C}']:.2f}ms  "
              f"chol+trsm {out[f'chol_trsm_C{C}']:.2f}ms  "
              f"matmul {out[f'matmul_C{C}']:.2f}ms  "
              f"rec256 {out[f'rec256_cholinv_C{C}']:.2f}ms  "
              f"rec128 {out[f'rec128_cholinv_C{C}']:.2f}ms",
              file=sys.stderr, flush=True)

    # 4. leaf-size batched chol costs
    for ln in (256, 128):
        for C in (1, 8):
            Gl = jax.device_put(jnp.asarray(
                rng.standard_normal((C, ln, 32)).astype(np.float32)))

            def leaf_body(c, G, _ln=ln):
                Gv = G + c * 1e-6
                K = Gv @ jnp.swapaxes(Gv, -1, -2) + _ln * jnp.broadcast_to(
                    jnp.eye(_ln, dtype=G.dtype), (G.shape[0], _ln, _ln))
                L = jnp.linalg.cholesky(K)
                eye = jnp.broadcast_to(jnp.eye(_ln, dtype=G.dtype), K.shape)
                Li = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
                return jnp.sum(L) * 1e-9 + jnp.sum(Li) * 1e-9

            t = chain_time(leaf_body, (Gl,), k_short=2, k_long=18)
            out[f"leaf{ln}_cholinv_C{C}"] = t * 1e3
            print(f"leaf{ln} C={C}: chol+inv {t*1e3:.3f}ms",
                  file=sys.stderr, flush=True)

    # 6. real vmapped NLML+grad at N=1000 (the HMC logp inner loop)
    import gpy_tpu  # noqa: F401
    from gpy_tpu.models import GPRegression

    Xh = rng.random((n, 2)).astype(np.float32) * 4.0
    Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    mh = GPRegression(Xh, Yh, noise_var=0.1)
    x0 = mh.get_flat_raw()

    def logp(flat):
        return mh.with_flat_raw(flat).log_likelihood()

    glogp = jax.value_and_grad(logp)
    for C in (1, 2, 4, 8):
        X0 = jnp.tile(x0[None, :], (C, 1))

        def nlml_body(c, X0):
            v, g = jax.vmap(glogp)(X0 + c * 1e-4)
            return jnp.sum(v) * 1e-9 + jnp.sum(g) * 1e-9

        t = chain_time(nlml_body, (X0,), k_short=2, k_long=8)
        out[f"vmap_nlmlgrad_C{C}"] = t * 1e3
        print(f"vmap NLML+grad C={C}: {t*1e3:.2f}ms", file=sys.stderr, flush=True)

    print(out)


if __name__ == "__main__":
    main()
