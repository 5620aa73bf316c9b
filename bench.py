"""Benchmark: SVGP ELBO optimization steps/s on one TPU chip (f32 path).

Prints ONE JSON line and writes the COMPLETE results dict (incl. per-metric
{best, median, spread_pct, n} spreads) to BENCH_FULL.json in the repo root,
flushed after every stage so a killed run still leaves its artifact
(VERDICT r4 weak #2: the driver keeps only a 2000-char stdout tail — the
printed line is kept compact, spreads live in the file, and headline fields
sit at the END of the line so tail truncation preserves them).

The reference (SheffieldML/GPy) publishes no numbers (BASELINE.md); its SVGP
step is a single-threaded numpy/LAPACK pipeline (GPy/core/svgp.py +
inference/latent_function_inference/svgp.py). `vs_baseline` reports speedup
vs a numpy reimplementation of that same per-step math measured on this
host's CPU — the closest stand-in for GPy's own step cost (same O(|B|M^2+M^3)
pipeline, same BLAS).

Extra sub-metrics cover the other BASELINE.json axes: exact-GP NLML+grad
wall time at N (Cholesky path), sparse/classification inference, HMC
samples/s, predict-path latency, and a long-tail model-family smoke section.
"""
import contextlib
import json
import os
import signal
import sys
import time

os.environ["GPY_TPU_X64"] = "0"  # f32 on TPU for the perf path
_REPO = os.path.dirname(os.path.abspath(__file__))
# persistent XLA compile cache: predict_cold measures whether the backend
# honors it (VERDICT r4 next #6)
os.environ.setdefault("GPY_TPU_COMPILE_CACHE", os.path.join(_REPO, ".jax_cache"))

import numpy as np


def numpy_svgp_step_time(X, Y, Z, batch, iters=5):
    """GPy-equivalent SVGP step cost on CPU: q(f) marginals + GH quadrature
    + KL + gradient-sized linalg (mirrors GPy svgp.py:10-121 structure)."""
    import scipy.linalg as sla

    N, D = Y.shape
    M = Z.shape[0]
    rng = np.random.default_rng(0)
    m_u = np.zeros((M, D))
    L_u = np.eye(M)
    best = float("inf")
    for it in range(iters):
        t0 = time.perf_counter()
        idx = rng.integers(0, N, batch)
        Xb, Yb = X[idx], Y[idx]
        d2 = ((Z[:, None, :] - Z[None, :, :]) ** 2).sum(-1)
        Kmm = np.exp(-0.5 * d2) + 1e-6 * np.eye(M)
        d2c = ((Z[:, None, :] - Xb[None, :, :]) ** 2).sum(-1)
        Kmn = np.exp(-0.5 * d2c)
        Lm = np.linalg.cholesky(Kmm)
        A = sla.cho_solve((Lm, True), Kmn)
        mu = A.T @ m_u
        S = L_u @ L_u.T
        var = 1.0 - (A * Kmn).sum(0) + ((S @ A) * A).sum(0)
        # Gaussian variational expectations + grads (closed form, cheap)
        F = -0.5 * np.log(2 * np.pi * 0.1) - 0.5 * ((Yb - mu) ** 2 + var[:, None]) / 0.1
        # KL + backward-sized solves (the dominant O(M^3)/O(BM^2) work)
        _ = sla.cho_solve((Lm, True), m_u)
        _ = sla.cho_solve((Lm, True), S)
        _ = A @ (A.T @ m_u)
        _ = F.sum()
        best = min(best, time.perf_counter() - t0)
    return best


_SPREADS = {}
_FULL = {"schema": "gpy_tpu full bench results v1"}
_FULL_PATH = os.path.join(_REPO, "BENCH_FULL.json")


def flush_full():
    """Write the complete results dict after every stage so a killed/stalled
    run still leaves a readable artifact of record."""
    _FULL["spread"] = _SPREADS
    try:
        with open(_FULL_PATH, "w") as f:
            json.dump(_FULL, f, indent=1)
            f.write("\n")
    except OSError:  # pragma: no cover
        pass


def timed_repeats(make_call, n=4, stall_pct=25.0):
    """Stall discipline (VERDICT r4 next #7, threshold 50 -> 25): run
    make_call(i) -> seconds n times; if the spread exceeds stall_pct (an
    intra-run tunnel stall), run n more so the artifact records steady-state
    alongside the stall. Returns (times, retried)."""
    ts = [make_call(i) for i in range(n)]
    retried = False
    if min(ts) > 0 and 100.0 * (max(ts) - min(ts)) / min(ts) > stall_pct:
        ts += [make_call(n + i) for i in range(n)]
        retried = True
    return ts, retried


def record(extra, name, times, scale=1e3, rate=None, ndigits=2, retried=False):
    """Record a timed metric WITH variance bounds (VERDICT r2 weak #3).

    times: raw seconds per repeat. Writes the headline number under `name`
    (best time in ms, or best rate if `rate` is given as units-per-call) and
    {best, median, spread_pct, n} under the spread table so driver-run deltas
    can be told apart from tunnel drift. Spreads >25% are flagged
    `high_spread` so nothing ships unlabeled (VERDICT r4 weak #5).
    """
    ts = sorted(float(t) for t in times)
    med = ts[len(ts) // 2] if len(ts) % 2 else 0.5 * (ts[len(ts) // 2 - 1] + ts[len(ts) // 2])
    spread_pct = round(100.0 * (ts[-1] - ts[0]) / ts[0], 1) if ts[0] > 0 else 0.0
    if rate is not None:
        sp = {"best": round(rate / ts[0], ndigits),
              "median": round(rate / med, ndigits)}
    else:
        sp = {"best": round(ts[0] * scale, ndigits),
              "median": round(med * scale, ndigits)}
    sp["spread_pct"] = spread_pct
    sp["n"] = len(ts)
    if retried:
        sp["retried_after_stall"] = True
    if spread_pct > 25.0:
        sp["high_spread"] = True
    extra[name] = sp["best"]
    _SPREADS[name] = sp
    return extra[name]


def measure_dispatch_floor(jax, jnp):
    """Single-dispatch + host-fetch floor through the tunnel, ms.

    Every timed call uses a NEVER-SEEN input (the tunnel value-caches
    identical executions) and a host fetch (block_until_ready does not
    synchronize through the tunnel). Healthy: ~24ms; degraded: 60ms+.
    Recording this with every bench run labels tunnel state so
    round-over-round comparisons are trustworthy (VERDICT r1 weak #1)."""
    f = jax.jit(lambda x: jnp.sum(x) * 1.000001)
    float(f(jnp.ones(8, jnp.float32)))  # compile
    float(f(jnp.full(8, 1.5, jnp.float32)))  # first-exec warmup
    best = float("inf")
    for i in range(5):
        xi = jnp.full(8, 2.0 + 0.1 * i, jnp.float32)
        t0 = time.perf_counter()
        float(f(xi))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


# v5e per-chip peak: 197 TFLOP/s bf16 on the MXU. The f32 'highest' matmul
# policy (gpy_tpu/config.py) runs 6 bf16 passes per f32 product, so the
# f32-effective matmul ceiling is ~197/6 = 32.8 TF/s; chol/trsm recursions
# also spend non-matmul time, so fraction-of-peak is reported against the
# f32-effective number.
V5E_BF16_PEAK_TFS = 197.0
V5E_F32_EFF_PEAK_TFS = V5E_BF16_PEAK_TFS / 6.0


def _timed_scalar(f, A, s):
    import jax.numpy as jnp
    t0 = time.perf_counter()
    float(f(A, jnp.float32(s)))
    return time.perf_counter() - t0


def _alarm(signum, frame):
    raise TimeoutError("stage timed out")


@contextlib.contextmanager
def stage(extra, name, budget_s):
    """Per-stage scaffolding: alarm budget, error capture (the primary metric
    must always print), stderr progress line, and a BENCH_FULL.json flush."""
    print(f"bench: {name}...", file=sys.stderr, flush=True)
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(budget_s)
    try:
        yield
    except Exception as e:  # pragma: no cover
        extra[f"{name}_error"] = str(e)[:120]
    finally:
        signal.alarm(0)
        _FULL["extra"] = extra
        flush_full()


def timed_objgrad(extra, name, model, jax, jnp, scale=1e-4, n=3, ndigits=2):
    """Standard NLML+grad timing: double warmup with distinct inputs (the
    first fresh-args exec pays a one-time ~20ms warmup), then fresh theta per
    timed call (tunnel value-caches identical executions) fetched with ONE
    jax.device_get (two sequential fetches pay two ~24ms RTTs)."""
    og = model._get_objgrad()
    fl = np.asarray(model.get_flat_raw())
    jax.device_get(og(jnp.asarray(fl)))            # compile + fetch
    jax.device_get(og(jnp.asarray(fl * (1.0 + scale))))  # fresh-args warmup

    def call(i):
        t0 = time.perf_counter()
        jax.device_get(og(jnp.asarray(fl + scale * (i + 2))))
        return time.perf_counter() - t0

    ts, retried = timed_repeats(call, n=n)
    return record(extra, name, ts, ndigits=ndigits, retried=retried)


def measure_linalg_tfs(jax, jnp):
    """Speed-of-light section (VERDICT r1 weak #2): blocked Cholesky and
    kernel-Gram TF/s at N=4096/8192 via scan-chained two-length differencing
    (which cancels the dispatch floor — no explicit subtraction needed)."""
    from gpy_tpu.util.linalg import jitchol
    from gpy_tpu.ops.blocked_linalg import rec_cholesky, CHOL_UPDATE_PREC
    import gpy_tpu.kern as gk

    out = {}
    rng = np.random.default_rng(1)

    for n in (4096, 8192):
        # --- blocked cholesky ------------------------------------------
        # base arrays stay DEVICE-RESIDENT and are varied on-device from a
        # fresh scalar per timed call: shipping a fresh (n, 64) host array
        # per call through the tunnel measured the transfer, not the chol
        # (BENCH r2 first run recorded 3.3 "TF/s" that way)
        A = jax.device_put(jnp.asarray(
            rng.standard_normal((n, 64)).astype(np.float32)))

        flops_build = 2.0 * n * n * 64
        # chain k chols in a scan (carry feeds the next input) and report
        # (t10 - t2)/8: a single 4096 chol (~0.4ms) is below the dispatch
        # floor's resolution — one-shot timing returned garbage TF/s

        # the TF/s claim times the KERNEL (rec_cholesky at the default
        # 'high' trailing-update policy — exactly what cholesky_auto runs);
        # jitchol's number is kept separately because its safety ladder adds
        # an n^2 finite-check + cond per call, which is user-path overhead,
        # not factorization speed (this was the r3 driver-19.6 vs
        # standalone-23.7 "discrepancy": two different functions)
        def chol_chain(k_len, fn):
            @jax.jit
            def run(A, s):
                def body(c, _):
                    Av = A + (s + c * 1e-20)
                    K = Av @ Av.T + n * jnp.eye(n, dtype=A.dtype)
                    return jnp.sum(fn(K)) * 1e-9, ()

                c, _ = jax.lax.scan(body, s * 0.0, None, length=k_len)
                return c

            return run

        rc = lambda K: rec_cholesky(K, prec=CHOL_UPDATE_PREC)  # noqa: E731
        for label, fn in (("", rc), ("_ladder", jitchol)):
            f2, f10 = chol_chain(2, fn), chol_chain(10, fn)
            for f in (f2, f10):
                float(f(A, jnp.float32(0.0)))
                float(f(A, jnp.float32(1e-3)))
            t2 = min(_timed_scalar(f, A, 1e-3 * i) for i, f in
                     [(2, f2), (3, f2), (4, f2)])
            t10 = min(_timed_scalar(f, A, 1e-3 * i) for i, f in
                      [(5, f10), (6, f10), (7, f10)])
            t = max((t10 - t2) / 8.0, 1e-6)
            if label == "":
                tfs = (n**3 / 3.0 + flops_build) / t / 1e12
                out[f"chol{n}_tfs"] = round(tfs, 2)
            out[f"chol{n}{label}_ms"] = round(t * 1e3, 2)

        # --- RBF Gram (distance + exp; flops counted as the matmul part:
        # 2 N^2 D for the cross-term — the roofline-relevant MXU work; the
        # gram is exp/VPU-bound so this TF/s is small by construction —
        # gram_ms is the comparable number) ---
        D = 8
        Xg = jax.device_put(jnp.asarray(
            (rng.random((n, D)) * 4.0).astype(np.float32)))
        k = gk.RBF(D, ARD=True)

        def gram_chain(k_len):
            @jax.jit
            def run(X, s):
                def body(c, _):
                    return jnp.sum(k.K(X + (s + c * 1e-20)) * 1e-6), ()

                c, _ = jax.lax.scan(body, s * 0.0, None, length=k_len)
                return c

            return run

        # 48-iteration difference: a 4096 gram is ~0.15ms, so the 8-iter
        # difference (1.2ms) drowned in the +-4ms tunnel timing noise
        g2, g50 = gram_chain(2), gram_chain(50)
        for f in (g2, g50):
            float(f(Xg, jnp.float32(0.0)))
            float(f(Xg, jnp.float32(1e-3)))
        t2 = min(_timed_scalar(f, Xg, 1e-3 * i) for i, f in
                 [(2, g2), (3, g2), (4, g2)])
        t50 = min(_timed_scalar(f, Xg, 1e-3 * i) for i, f in
                  [(5, g50), (6, g50), (7, g50)])
        t = max((t50 - t2) / 48.0, 1e-6)
        out[f"gram{n}_tfs"] = round(2.0 * n * n * D / t / 1e12, 2)
        out[f"gram{n}_ms"] = round(t * 1e3, 3)

    out["chol8192_frac_of_f32_peak"] = round(
        out["chol8192_tfs"] / V5E_F32_EFF_PEAK_TFS, 3)
    return out


# ordering of the printed line's extra dict: least-critical keys FIRST so
# the 2000-char driver tail keeps the headline metrics at the END
_TAIL_PRIORITY = (
    "predict_", "kron", "grid", "warped", "tp_", "multioutput_deriv",
    "lvmogp", "kalman", "ep_", "laplace", "epdtc",
    "vardtc_", "fitc_", "coreg", "bgplvm", "svgp_steps_per_s_n10M",
    "exact50k", "exact_nlml", "gram", "chol", "hmc",
    "svgp_elbo_steps_per_s",
)


def _order_for_tail(extra):
    def key(k):
        for i, pref in enumerate(_TAIL_PRIORITY):
            if k.startswith(pref):
                return (1, i)
        return (0, 0)

    return {k: extra[k] for k in sorted(extra, key=key)}


# GPY_BENCH_SMOKE=1 shrinks every problem so the full bench wiring can be
# validated quickly (e.g. on CPU with GPY_BENCH_CPU=1) — numbers produced in
# smoke mode are labeled and meaningless
SMOKE = os.environ.get("GPY_BENCH_SMOKE") == "1"


def main():
    import jax

    if os.environ.get("GPY_BENCH_CPU") == "1":
        # the axon TPU plugin ignores JAX_PLATFORMS; this works pre-init
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import gpy_tpu  # noqa: F401  (configures precision policy + compile cache)
    from gpy_tpu.core.svgp import SVGP
    from gpy_tpu.likelihoods import Gaussian
    import gpy_tpu.kern as gk

    try:
        _FULL["compile_cache_dir"] = jax.config.jax_compilation_cache_dir or ""
    except AttributeError:  # pragma: no cover
        _FULL["compile_cache_dir"] = ""

    # --- tunnel-state label: dispatch floor FIRST --------------------------
    print("bench: measuring dispatch floor...", file=sys.stderr, flush=True)
    floor_ms = measure_dispatch_floor(jax, jnp)
    print(f"bench: dispatch floor {floor_ms:.1f} ms", file=sys.stderr, flush=True)

    # --- flagship: SVGP steps/s -------------------------------------------
    N, M, D, B = (4000, 64, 8, 512) if SMOKE else (100_000, 512, 8, 4096)
    rng = np.random.default_rng(0)
    X = rng.random((N, D)).astype(np.float32) * 4.0
    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, 1))).astype(np.float32)
    Z = X[rng.permutation(N)[:M]].copy()
    model = SVGP(X, Y, Z, gk.RBF(D, ARD=True), Gaussian(variance=0.1))

    print("bench: compiling svgp step...", file=sys.stderr, flush=True)
    # warm up TWICE with the same chunk shape: the first fit compiles, the
    # second retraces once for the updated on-device parameter layouts
    model.fit(iters=100, batchsize=B, step_size=1e-2, natgrad_step_size=0.1)
    model.fit(iters=100, batchsize=B, step_size=1e-2, natgrad_step_size=0.1)
    print("bench: timing svgp...", file=sys.stderr, flush=True)
    # steady-state throughput: 500 steps per timed call (5 pipelined chunks
    # of the same compiled executable) so the one-time dispatch/fetch floor
    # (~24ms via the tunnel) and the fit-boundary init/write-back don't
    # dominate the per-step number; best-of-4 for tunnel load variance
    steps = 20 if SMOKE else 500

    def _svgp_call(i):
        t0 = time.perf_counter()
        model.fit(iters=steps, batchsize=B, step_size=1e-2, natgrad_step_size=0.1)
        jax.block_until_ready(model.get_flat_raw())
        return time.perf_counter() - t0

    extra = {"smoke_mode": SMOKE,
             "dispatch_floor_ms": round(floor_ms, 1),
             "tunnel_degraded": bool(floor_ms > 60.0)}
    svgp_times, svgp_retried = timed_repeats(_svgp_call, n=4)
    steps_per_s = steps / min(svgp_times)
    record(extra, "svgp_elbo_steps_per_s", svgp_times, rate=steps, ndigits=1,
           retried=svgp_retried)
    svgp_median = _SPREADS["svgp_elbo_steps_per_s"]["median"]

    # --- CPU numpy stand-in for the reference step (same math) -------------
    ref_step = numpy_svgp_step_time(
        X.astype(np.float64), Y.astype(np.float64), Z.astype(np.float64), B
    )
    vs_baseline = steps_per_s * ref_step

    # --- speed-of-light / MFU section --------------------------------------
    with stage(extra, "linalg_tfs", 240):
        extra.update(measure_linalg_tfs(jax, jnp))

    # --- exact GP NLML+grad (BASELINE Cholesky path) -----------------------
    m8 = None
    with stage(extra, "exact_gp", 420):
        from gpy_tpu.models import GPRegression

        n_exact = 256 if SMOKE else 4096
        Xe = rng.random((n_exact, 4)).astype(np.float32)
        Ye = (np.sin(Xe[:, :1]) + 0.1 * rng.standard_normal((n_exact, 1))).astype(np.float32)
        me = GPRegression(Xe, Ye)
        timed_objgrad(extra, "exact_nlml_grad_ms_n4096", me, jax, jnp,
                      scale=1e-3)

        # N=8192 one-shot AND chain-differenced (the latter removes the
        # ~24ms dispatch floor and shows the pure on-device NLML+grad —
        # the number the blocked chol + inverse-leaf dtrtrs work moves)
        n8 = 512 if SMOKE else 8192
        X8 = rng.random((n8, 8)).astype(np.float32) * 4.0
        Y8 = (np.sin(X8[:, :1]) + 0.1 * rng.standard_normal((n8, 1))).astype(np.float32)
        m8 = GPRegression(X8, Y8, gk.RBF(8, ARD=True), noise_var=0.1)
        timed_objgrad(extra, "exact_nlml_grad_ms_n8192", m8, jax, jnp)

    # chain-differenced 8192 NLML+grad gets its OWN alarm budget: the two
    # chained executables are the biggest compiles of the bench and starved
    # the shared 420s window on the first r4 run
    with stage(extra, "exact_8192_chain", 420):
        loss8 = m8._flat_objective
        vg8 = jax.value_and_grad(loss8)
        flat8 = np.asarray(m8.get_flat_raw())

        def e8_chain(k_len):
            @jax.jit
            def run(f0, s):
                def body(c, _):
                    th, acc = c
                    v, g = vg8(th)
                    return (th + 1e-7 * s * g / (1.0 + jnp.abs(g)),
                            acc + v * 1e-9), ()

                (_, acc), _ = jax.lax.scan(body, (f0, s * 0.0), None,
                                           length=k_len)
                return acc

            return run

        c1, c3 = e8_chain(1), e8_chain(3)
        f8j = jnp.asarray(flat8)
        for f in (c1, c3):
            float(f(f8j, jnp.float32(1.0)))
            float(f(f8j, jnp.float32(2.0)))
        t1 = min(_timed_scalar(f, f8j, float(i)) for i, f in
                 [(3, c1), (4, c1), (5, c1)])
        t3 = min(_timed_scalar(f, f8j, float(i)) for i, f in
                 [(6, c3), (7, c3), (8, c3)])
        extra["exact_nlml_grad_ms_n8192_chain"] = round(
            max(t3 - t1, 1e-9) / 2.0 * 1e3, 2)

    # --- N=50k exact GP via matrix-free CG/SLQ (the BASELINE.json headline;
    # dense cholesky cannot fit the 10GB Gram on one chip) ------------------
    Xi = Yi = None
    with stage(extra, "exact50k", 240):
        from gpy_tpu.inference.iterative import IterativeGaussianInference
        from gpy_tpu.models import GPRegression

        n_it = 4096 if SMOKE else 50_000
        Xi = rng.random((n_it, 4)).astype(np.float32) * 10.0
        Yi = (np.sin(Xi[:, :1]) + 0.1 * rng.standard_normal((n_it, 1))).astype(np.float32)
        mi = GPRegression(Xi, Yi, noise_var=0.1,
                          inference_method=IterativeGaussianInference(
                              max_cg=8 if SMOKE else 48,
                              n_probes=4 if SMOKE else 8, block=2048))
        timed_objgrad(extra, "exact50k_cg_nlml_grad_ms", mi, jax, jnp,
                      scale=1e-3, ndigits=1)

    # --- same N=50k NLML+grad with the fused Pallas gram-matvec
    # (Gram tiles stay in VMEM; no 10GB materialization) --------------------
    with stage(extra, "exact50k_fused", 240):
        from gpy_tpu.inference.iterative import IterativeGaussianInference
        from gpy_tpu.models import GPRegression

        mf = GPRegression(Xi, Yi, noise_var=0.1,
                          inference_method=IterativeGaussianInference(
                              max_cg=8 if SMOKE else 48,
                              n_probes=4 if SMOKE else 8, block=2048,
                              materialize=False, fused=True))
        timed_objgrad(extra, "exact50k_cg_nlml_grad_ms_fused", mf, jax, jnp,
                      scale=1e-3, ndigits=1)

    # --- N=50k with bf16 Gram storage (opt-in throughput mode; SLQ logdet
    # bias 0.5-2% — pinned by tests/test_iterative.py) ----------------------
    with stage(extra, "exact50k_bf16", 240):
        from gpy_tpu.inference.iterative import IterativeGaussianInference
        from gpy_tpu.models import GPRegression

        mb16 = GPRegression(Xi, Yi, noise_var=0.1,
                            inference_method=IterativeGaussianInference(
                                max_cg=8 if SMOKE else 48,
                                n_probes=4 if SMOKE else 8, block=2048,
                                materialize=True, gram_dtype="bfloat16"))
        timed_objgrad(extra, "exact50k_cg_nlml_grad_ms_bf16gram", mb16, jax,
                      jnp, scale=1e-3, ndigits=1)

    # --- collapsed sparse GP regression (BASELINE config #2: VarDTC / FITC
    # at N~50k) -------------------------------------------------------------
    msp_predict = None
    with stage(extra, "sparse_vardtc_fitc", 300):
        from gpy_tpu.models import SparseGPRegression

        n_sp, m_sp = (4000, 64) if SMOKE else (50_000, 512)
        Xsp = rng.random((n_sp, D)).astype(np.float32) * 4.0
        Ysp = (np.sin(Xsp[:, :1])
               + 0.1 * rng.standard_normal((n_sp, 1))).astype(np.float32)
        Zsp = Xsp[rng.permutation(n_sp)[:m_sp]].copy()
        for infer in ("vardtc", "fitc"):
            msp = SparseGPRegression(Xsp, Ysp, gk.RBF(D, ARD=True), Z=Zsp,
                                     infer=infer)
            timed_objgrad(extra, f"{infer}_nlml_grad_ms_n50k_m512", msp,
                          jax, jnp)
            if infer == "vardtc":
                msp_predict = msp

    # --- predict-path latency (VERDICT r4 next #6: the round-4 predict
    # compilation was note-only). Cold = first predict on a model whose
    # posterior was never materialized (includes compile through the tunnel,
    # or a persistent-cache hit if the backend honors the cache); warm =
    # fresh same-shape Xnew through the cached executable. -------------------
    with stage(extra, "predict_latency", 420):
        from gpy_tpu.models import GPRegression

        n_p = 512 if SMOKE else 4096
        Xp = rng.random((n_p, 4)).astype(np.float32)
        Yp = (np.sin(Xp[:, :1]) + 0.1 * rng.standard_normal((n_p, 1))).astype(np.float32)
        mp = GPRegression(Xp, Yp, noise_var=0.1)
        Xq = rng.random((500, 4)).astype(np.float32)
        t0 = time.perf_counter()
        mu, var = mp.predict(Xq)
        np.asarray(mu), np.asarray(var)
        extra["predict_cold_ms_exact_n4096"] = round(
            (time.perf_counter() - t0) * 1e3, 1)

        def warm_call(i):
            t0 = time.perf_counter()
            mu, var = mp.predict(Xq + 1e-3 * (i + 1))
            np.asarray(mu), np.asarray(var)
            return time.perf_counter() - t0

        ts, retried = timed_repeats(warm_call, n=3)
        record(extra, "predict_warm_ms_exact_n4096", ts, ndigits=1,
               retried=retried)

        if msp_predict is not None:
            t0 = time.perf_counter()
            mu, var = msp_predict.predict(Xq)
            np.asarray(mu), np.asarray(var)
            extra["predict_cold_ms_sparse_n50k"] = round(
                (time.perf_counter() - t0) * 1e3, 1)

            def warm_sp(i):
                t0 = time.perf_counter()
                mu, var = msp_predict.predict(Xq + 1e-3 * (i + 1))
                np.asarray(mu), np.asarray(var)
                return time.perf_counter() - t0

            ts, retried = timed_repeats(warm_sp, n=3)
            record(extra, "predict_warm_ms_sparse_n50k", ts, ndigits=1,
                   retried=retried)

    # cross-process cold predict with a now-WARM compilation cache: the
    # in-process predict_cold above pays the one-time cache POPULATION
    # (measured ~45 s on a fresh .jax_cache vs 27 s with no cache at all);
    # every later process gets the cache HIT (~4.3 s — a 6x cold-start win,
    # VERDICT r4 next #6). A subprocess measures that steady-state number.
    with stage(extra, "predict_coldstart_cached", 300):
        import subprocess

        script = (
            "import os,time,numpy as np\n"
            "import jax, jax.numpy as jnp\n"
            "if os.environ.get('GPY_BENCH_CPU') == '1':\n"
            "    jax.config.update('jax_platforms', 'cpu')\n"
            "import gpy_tpu\n"
            "from gpy_tpu.models import GPRegression\n"
            "rng=np.random.default_rng(0)\n"
            f"n={'512' if SMOKE else '4096'}\n"
            "Xp=rng.random((n,4)).astype(np.float32)\n"
            "Yp=(np.sin(Xp[:,:1])+0.1*rng.standard_normal((n,1))).astype(np.float32)\n"
            "m=GPRegression(Xp,Yp,noise_var=0.1)\n"
            "Xq=rng.random((500,4)).astype(np.float32)\n"
            "t0=time.perf_counter(); mu,var=m.predict(Xq)\n"
            "np.asarray(mu),np.asarray(var)\n"
            "print('COLD_MS', (time.perf_counter()-t0)*1e3)\n")
        env = dict(os.environ)
        env["GPY_TPU_X64"] = "0"
        r = subprocess.run([sys.executable, "-c", script], env=env,
                           capture_output=True, text=True, timeout=280,
                           cwd=_REPO)
        for ln in r.stdout.splitlines():
            if ln.startswith("COLD_MS"):
                extra["predict_cold_cached_ms_exact_n4096"] = round(
                    float(ln.split()[1]), 1)
                break
        else:
            extra["predict_coldstart_cached_error"] = (
                r.stderr.strip()[-120:] or "no COLD_MS line")

    # --- SVGP at N=10M on one chip (BASELINE config #4 scale axis; dataset
    # is passed to the compiled chunk as an argument, never a captured
    # constant) --------------------------------------------------------------
    with stage(extra, "svgp_10M", 300):
        N10 = 100_000 if SMOKE else 10_000_000
        X10 = rng.random((N10, D), dtype=np.float32) * 4.0
        Y10 = (np.sin(X10[:, :1]) + 0.1 * rng.standard_normal((N10, 1))).astype(np.float32)
        Z10 = X10[rng.permutation(N10)[:M]].copy()
        m10 = SVGP(X10, Y10, Z10, gk.RBF(D, ARD=True), Gaussian(variance=0.1))
        m10.fit(iters=100, batchsize=B)
        m10.fit(iters=100, batchsize=B)

        def call10(i):
            t0 = time.perf_counter()
            m10.fit(iters=steps, batchsize=B)
            jax.block_until_ready(m10.get_flat_raw())
            return time.perf_counter() - t0

        ts, retried = timed_repeats(call10, n=3)
        record(extra, "svgp_steps_per_s_n10M", ts, rate=steps, ndigits=1,
               retried=retried)
        del m10, X10, Y10, Z10

    # --- BGPLVM on-device adam steps/s (BASELINE config #5 axis) -----------
    with stage(extra, "bgplvm", 240):
        from gpy_tpu.models import BayesianGPLVM

        Yb_ = (rng.standard_normal((1000, 3)) @ rng.standard_normal((3, 12))
               + 0.1 * rng.standard_normal((1000, 12))).astype(np.float32)
        mb_ = BayesianGPLVM(Yb_, 10, num_inducing=30)
        mb_.optimize(optimizer="adam", max_iters=200, step_size=5e-3)  # compile

        def callb(i):
            t0 = time.perf_counter()
            mb_.optimize(optimizer="adam", max_iters=200, step_size=5e-3)
            return time.perf_counter() - t0

        ts, retried = timed_repeats(callb, n=4)
        record(extra, "bgplvm_adam_steps_per_s_n1000", ts, rate=200,
               ndigits=1, retried=retried)

    # --- coregionalized multi-output NLML+grad (config #4 axis) ------------
    with stage(extra, "coreg", 240):
        from gpy_tpu.models import GPCoregionalizedRegression

        Xl = [np.sort(rng.random((1000, 1)).astype(np.float32) * 10, 0) for _ in range(4)]
        Yl = [np.sin(Xc + i) + 0.1 * rng.standard_normal(Xc.shape).astype(np.float32)
              for i, Xc in enumerate(Xl)]
        mc_ = GPCoregionalizedRegression(Xl, Yl)
        timed_objgrad(extra, "coreg_nlml_grad_ms_n4000", mc_, jax, jnp,
                      n=4, ndigits=1)

    # --- classification: EP / Laplace / EPDTC on the chip (BASELINE config
    # #3: "GP classification, EP + Laplace, banana") -------------------------
    with stage(extra, "classification", 600):
        from gpy_tpu.core.sparse_gp import SparseGP
        from gpy_tpu.inference.ep import EP
        from gpy_tpu.inference.epdtc import EPDTC
        from gpy_tpu.inference.laplace import Laplace
        from gpy_tpu.likelihoods import Bernoulli
        from gpy_tpu.models import GPClassification, GPClassificationLaplace

        extra["dispatch_floor_ms_cls_stage"] = round(
            measure_dispatch_floor(jax, jnp), 1)

        def _banana(n):
            # two interleaved crescent classes (banana-class decision surface)
            th = rng.uniform(0, np.pi, n).astype(np.float32)
            rr = (2.0 + 0.25 * rng.standard_normal(n)).astype(np.float32)
            c = rng.integers(0, 2, n)
            x1 = np.where(c, rr * np.cos(th), 1.0 - rr * np.cos(th))
            x2 = np.where(c, rr * np.sin(th) - 0.5, 0.5 - rr * np.sin(th))
            return (np.stack([x1, x2], 1).astype(np.float32),
                    c.reshape(-1, 1).astype(np.float32))

        n_cls = 256 if SMOKE else 2048
        Xcl, Ycl = _banana(n_cls)

        # EP (nested: sites re-converge INSIDE every objective evaluation)
        m_ep = GPClassification(Xcl, Ycl)
        timed_objgrad(extra, "ep_nlml_grad_ms_n2048", m_ep, jax, jnp,
                      n=4, ndigits=1)

        # EP sweeps-to-converge + ms/sweep. epsilon=0 forces exactly
        # max_iters sweeps -> two-length differencing cancels the setup
        # (gram + dispatch floor); the real EP() probe returns its
        # while_loop iteration count.
        lik_b = Bernoulli()
        Kcl = jax.device_put(jnp.asarray(m_ep.kern.K(jnp.asarray(Xcl))
                                         + 1e-8 * jnp.eye(n_cls)))
        Yj = jax.device_put(jnp.asarray(Ycl))

        ep_real = EP()
        n_sweeps = int(jax.jit(
            lambda K: ep_real._converge_sites(K, lik_b, Yj, None)[2])(Kcl))
        extra["ep_sweeps_to_converge_n2048"] = n_sweeps

        def sweep_chain(k):
            probe = EP(epsilon=0.0, max_iters=k)

            @jax.jit
            def run(K, s):
                tau, v, _ = probe._converge_sites(K + s * jnp.eye(n_cls), lik_b, Yj, None)
                return jnp.sum(tau) + jnp.sum(v)

            return run

        f4, f20 = sweep_chain(4), sweep_chain(20)
        for f in (f4, f20):
            float(f(Kcl, jnp.float32(0.0)))
            float(f(Kcl, jnp.float32(1e-6)))
        t4 = min(_timed_scalar(f4, Kcl, 1e-6 * i) for i in (2, 3, 4))
        t20 = min(_timed_scalar(f20, Kcl, 1e-6 * i) for i in (5, 6, 7))
        extra["ep_ms_per_sweep_n2048"] = round(max(t20 - t4, 1e-9) / 16.0 * 1e3, 3)

        # Laplace: full NLML+grad + Newton-iteration cost
        m_la = GPClassificationLaplace(Xcl, Ycl)
        timed_objgrad(extra, "laplace_nlml_grad_ms_n2048", m_la, jax, jnp,
                      n=4, ndigits=1)
        la_real = Laplace()
        n_newton = int(jax.jit(
            lambda K: la_real._find_mode(K, lik_b, Yj, None, jnp.zeros_like(Yj))[1])(Kcl))
        extra["laplace_newton_iters_n2048"] = n_newton

        def newton_chain(k):
            probe = Laplace(tol=0.0, max_iters=k)

            @jax.jit
            def run(K, s):
                f, _ = probe._find_mode(K + s * jnp.eye(n_cls), lik_b, Yj,
                                        None, jnp.zeros_like(Yj))
                return jnp.sum(f)

            return run

        g2, g10 = newton_chain(2), newton_chain(10)
        for f in (g2, g10):
            float(f(Kcl, jnp.float32(0.0)))
            float(f(Kcl, jnp.float32(1e-6)))
        t2 = min(_timed_scalar(g2, Kcl, 1e-6 * i) for i in (2, 3, 4))
        t10 = min(_timed_scalar(g10, Kcl, 1e-6 * i) for i in (5, 6, 7))
        extra["laplace_ms_per_newton_n2048"] = round(
            max(t10 - t2, 1e-9) / 8.0 * 1e3, 3)

    # EPDTC gets its own stage: it shared the classification alarm budget
    # and starved it on the r5 first run (its compile is the stage's
    # biggest; compile-cache population roughly doubles first-run compiles)
    with stage(extra, "epdtc", 420):
        from gpy_tpu.core.sparse_gp import SparseGP
        from gpy_tpu.inference.epdtc import EPDTC
        from gpy_tpu.likelihoods import Bernoulli

        n_ep4, m_ep4 = (512, 64) if SMOKE else (4096, 512)
        Xcl4, Ycl4 = _banana(n_ep4)
        Zcl = Xcl4[rng.permutation(n_ep4)[:m_ep4]].copy()
        m_epdtc = SparseGP(Xcl4, Ycl4, Zcl, gk.RBF(2), Bernoulli(),
                           inference_method=EPDTC(), name="epdtc_bench")
        timed_objgrad(extra, "epdtc_nlml_grad_ms_n4096_m512", m_epdtc, jax,
                      jnp, n=4, ndigits=1)

    # --- Kalman N=20k sequential vs chunked-hybrid parallel ----------------
    with stage(extra, "kalman", 300):
        from gpy_tpu.models import StateSpace

        n_k = 2000 if SMOKE else 20_000
        Xk = np.sort(rng.uniform(0, 100, n_k)).astype(np.float32)
        Yk = (np.sin(Xk / 3.0) + 0.2 * rng.standard_normal(n_k)).astype(np.float32)

        for parallel, name in ((False, "kalman20k_nlml_grad_ms_seq"),
                               (True, "kalman20k_nlml_grad_ms_parallel")):
            m_ss = StateSpace(Xk, Yk, parallel=parallel, noise_var=0.1)
            timed_objgrad(extra, name, m_ss, jax, jnp, ndigits=1)
        extra["kalman_parallel_speedup"] = round(
            extra["kalman20k_nlml_grad_ms_seq"]
            / extra["kalman20k_nlml_grad_ms_parallel"], 2)

    # --- long-tail model families: one NLML+grad smoke number each
    # (VERDICT r4 next #5 — the predict-path 33.6s cliff proved that
    # CPU-tested paths can hide tunnel pathologies; shapes kept small so
    # this section is compile-dominated, not compute-dominated) -------------
    with stage(extra, "longtail", 600):
        from gpy_tpu.models import (GPKroneckerGaussianRegression,
                                    GPRegressionGrid, WarpedGP, TPRegression,
                                    MultioutputGP, GPMultioutRegression)
        from gpy_tpu.kern import DiffKern

        extra["dispatch_floor_ms_longtail_stage"] = round(
            measure_dispatch_floor(jax, jnp), 1)

        # Kronecker-structured exact GP (32x24 grid = 768 points)
        X1 = np.linspace(0, 3, 32).reshape(-1, 1).astype(np.float32)
        X2 = np.linspace(0, 2, 24).reshape(-1, 1).astype(np.float32)
        F = np.sin(X1) @ np.cos(X2).T
        Ykr = (F + 0.05 * rng.standard_normal((32, 24))).astype(np.float32)
        m_kr = GPKroneckerGaussianRegression(X1, X2, Ykr, gk.RBF(1), gk.RBF(1),
                                             noise_var=0.05)
        timed_objgrad(extra, "kron_nlml_grad_ms_768", m_kr, jax, jnp)

        # grid regression (3D grid, 16*12*10 = 1920 points)
        Xs = [np.linspace(0, 3, n).reshape(-1, 1).astype(np.float32)
              for n in (16, 12, 10)]
        Fg = rng.standard_normal((16, 12, 10)).astype(np.float32)
        m_gr = GPRegressionGrid(Xs, Fg, noise_var=0.5)
        timed_objgrad(extra, "grid_nlml_grad_ms_1920", m_gr, jax, jnp)

        # WarpedGP (tanh warping, n=1000)
        Xw = rng.random((1000, 2)).astype(np.float32) * 4.0
        Yw = (np.sin(Xw[:, :1]) + 0.1 * rng.standard_normal((1000, 1))).astype(np.float32)
        m_w = WarpedGP(Xw, Yw)
        timed_objgrad(extra, "warped_nlml_grad_ms_1000", m_w, jax, jnp)

        # Student-t process regression (n=2048)
        Xt = rng.random((2048, 2)).astype(np.float32) * 4.0
        Yt = (np.sin(Xt[:, :1]) + 0.1 * rng.standard_normal((2048, 1))).astype(np.float32)
        m_t = TPRegression(Xt, Yt, deg_free=4.0)
        timed_objgrad(extra, "tp_nlml_grad_ms_2048", m_t, jax, jnp)

        # MultioutputGP with derivative observations (512 f + 512 f')
        Xd1 = np.linspace(0, 4, 512).reshape(-1, 1).astype(np.float32)
        Xd2 = np.linspace(0, 4, 512).reshape(-1, 1).astype(np.float32)
        base = gk.RBF(1)
        m_mo = MultioutputGP([Xd1, Xd2],
                             [np.sin(Xd1), np.cos(Xd2)],
                             [base, DiffKern(base, 0)],
                             [Gaussian(variance=1e-2), Gaussian(variance=1e-2)])
        timed_objgrad(extra, "multioutput_deriv_nlml_grad_ms_1024", m_mo,
                      jax, jnp)

        # LVMOGP (Kronecker SVI multiout, n=400 rows x 8 outputs)
        Xlv = np.linspace(0, 5, 400).reshape(-1, 1).astype(np.float32)
        Flv = np.sin(Xlv)
        Ylv = np.hstack([Flv * w for w in np.linspace(0.5, 1.5, 8)]).astype(np.float32)
        Ylv += 0.05 * rng.standard_normal(Ylv.shape).astype(np.float32)
        m_lv = GPMultioutRegression(Xlv, Ylv, Xr_dim=2, num_inducing=(32, 4),
                                    init="rand")
        timed_objgrad(extra, "lvmogp_elbo_grad_ms_400x8", m_lv, jax, jnp)

    # --- HMC samples/s/chip scaling curve (BASELINE.json metric axis).
    # Round-2 postmortem: sample() used to embed the PRNG seed as a trace
    # constant, so every timed call RECOMPILED the sampler — the r2 curve
    # (flat ~5-9 samples/s at every chain count) measured compile time, and
    # the r01->r02 "regression" 14.3->8.6 was compile-time drift. With the
    # executable cache + batched blocked chol path, steps are measured.
    with stage(extra, "hmc", 420):
        from gpy_tpu.mcmc import HMC
        from gpy_tpu.models import GPRegression

        n_h = 200 if SMOKE else 1000
        Xh = rng.random((n_h, 2)).astype(np.float32) * 4.0
        Yh = (np.sin(Xh[:, :1]) + 0.1 * rng.standard_normal((n_h, 1))).astype(np.float32)
        mh = GPRegression(Xh, Yh, noise_var=0.1)
        hmc = HMC(mh, stepsize=2e-2, num_leapfrog=10)
        # chain counts validated on hardware to 32 (_prof_hmc_bisect.py,
        # 2026-08-21); curve gate stays at 16 by default
        hmc_max = int(os.environ.get("GPY_BENCH_HMC_MAX", "2" if SMOKE else "16"))
        curve = {}
        curve_med = {}
        curve_spread = {}
        extra["dispatch_floor_ms_hmc_stage"] = round(
            measure_dispatch_floor(jax, jnp), 1)
        for n_c in (1, 2, 4, 8, 16):
            if n_c > hmc_max:
                break
            n_s = 40
            hmc.sample(num_samples=n_s, num_chains=n_c, seed=0)  # compile+warm

            def call_h(i):
                t0 = time.perf_counter()
                hmc.sample(num_samples=n_s, num_chains=n_c, seed=3 + 2 * i)
                return time.perf_counter() - t0

            ts, retried = timed_repeats(call_h, n=3)
            d = {}
            record(d, "x", ts, rate=n_s * n_c, ndigits=1, retried=retried)
            curve[str(n_c)] = d["x"]
            sp = _SPREADS.pop("x")
            curve_med[str(n_c)] = sp["median"]
            curve_spread[str(n_c)] = sp
            print(f"bench: hmc {n_c} chains: {curve[str(n_c)]} samples/s "
                  f"(median {curve_med[str(n_c)]})", file=sys.stderr, flush=True)
        extra["hmc_samples_per_s_by_chains_n1000"] = curve
        extra["hmc_median_by_chains_n1000"] = curve_med
        _SPREADS["hmc_samples_per_s_by_chains_n1000"] = curve_spread
        if "8" in curve:
            # r1/r2-comparable 8-chain headline point
            extra["hmc_samples_per_s_n1000_8chains"] = curve["8"]

    # closing floor: the tunnel floor DRIFTS within one run (30->60ms
    # observed) — bracketing the run lets a reader discount drifted stages
    extra["dispatch_floor_ms_end"] = round(measure_dispatch_floor(jax, jnp), 1)

    # printed line: compact (no spread table — that lives in the committed
    # BENCH_FULL.json) with headline fields at the END so the driver's
    # 2000-char stdout tail keeps them even if the front is truncated. The
    # r5 first run printed 2066 chars and would have lost its opening brace
    # to the tail — drop keys that BENCH_FULL carries anyway until the line
    # fits with margin.
    printed = dict(extra)
    if not SMOKE:
        printed.pop("smoke_mode", None)
    for k in list(printed):
        if k.startswith("dispatch_floor_ms_") and k != "dispatch_floor_ms_end":
            printed.pop(k)
    printed.pop("hmc_median_by_chains_n1000", None)  # in BENCH_FULL + spread
    out = {
        "extra": _order_for_tail(printed),
        "metric": "svgp_elbo_steps_per_s",
        "value": round(steps_per_s, 3),
        "value_median": svgp_median,
        "unit": "steps/s (N=100k, M=512, B=4096, RBF-ARD, 1 chip)",
        "vs_baseline": round(vs_baseline, 2),
    }
    line = json.dumps(out)
    if len(line) > 1900:  # still long: drop the long-tail section from the
        for k in list(out["extra"]):  # line (committed artifact keeps it)
            if k.split("_")[0] in ("kron", "grid", "warped", "tp",
                                   "multioutput", "lvmogp"):
                out["extra"].pop(k)
        line = json.dumps(out)
    _FULL.update({k: v for k, v in out.items() if k != "extra"})
    _FULL["extra"] = extra
    flush_full()
    print(line)


if __name__ == "__main__":
    main()
