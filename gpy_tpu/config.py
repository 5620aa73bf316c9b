"""Global configuration for gpy_tpu.

Replaces GPy's layered INI config (reference: GPy/util/config.py:20-36,
GPy/defaults.cfg) with a small typed config object. The knobs that mattered
there (openmp on/off, cython on/off, plotting backend) are irrelevant under
XLA; what matters on TPU is precision policy and jitter policy.

By default we enable float64 (GP numerics — Cholesky of ill-conditioned Gram
matrices — genuinely need it for parity with GPy's LAPACK path). On TPU f64 is
emulated; performance-critical paths (bench.py) may opt into f32 with a larger
jitter ladder via `set_default_dtype`.
"""
from __future__ import annotations

import dataclasses
import os

import jax


def _enable_x64() -> None:
    # Allow override via env; default on for GP numerical parity.
    if os.environ.get("GPY_TPU_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)


def _set_matmul_precision() -> None:
    """Force full-f32 matmul passes on TPU.

    TPU DEFAULT matmul precision is one bf16 pass (~8e-3 relative error).
    Squared-distance grams d2 = |x|^2 + |x'|^2 - 2 x.x' then come out wrong
    by O(|x|^2 * 8e-3) — measured at +-3 absolute on a 4-D N=8192 problem,
    which drives Cholesky to NaN. GP numerics are exactly the workload that
    cannot tolerate this; 'highest' (six bf16 passes == f32 accuracy) is the
    only safe default. Override with GPY_TPU_MATMUL_PRECISION=high|default
    for experiments. No-op on CPU (true f32 there).
    """
    prec = os.environ.get("GPY_TPU_MATMUL_PRECISION", "highest")
    jax.config.update("jax_default_matmul_precision", prec)


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (opt-in via GPY_TPU_COMPILE_CACHE=dir).

    Cuts cold-start compile latency across processes where the backend honors
    it (CPU does; a remote-compile TPU tunnel may bypass it — bench.py's
    predict_cold metric records which happened)."""
    d = os.environ.get("GPY_TPU_COMPILE_CACHE", "")
    if d:
        try:
            jax.config.update("jax_compilation_cache_dir", d)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:  # pragma: no cover - older jax knob names
            pass


_enable_x64()
_set_matmul_precision()
_enable_compilation_cache()


@dataclasses.dataclass
class Config:
    # starting jitter as a multiple of mean diagonal (GPy: util/linalg.py:56-82
    # starts at 1e-6 * mean(diag) and escalates 10x per retry, maxtries=5)
    jitter: float = 1e-6
    max_jitter_tries: int = 5
    # default dtype for model parameters / Gram matrices
    default_dtype: str = "float64" if os.environ.get("GPY_TPU_X64", "1") != "0" else "float32"
    # Pallas kernels: only used on TPU backend for large shapes; XLA path otherwise
    use_pallas: bool = True


config = Config()


def default_dtype():
    import jax.numpy as jnp

    return jnp.float64 if config.default_dtype == "float64" else jnp.float32


def complex_dtype():
    """Widest complex dtype the default backend supports.

    TPU implements no C128 (the r5 on-chip zoo sweep caught the LFM
    kernels failing to compile with 'Element type C128 is not supported
    on TPU'); its f64 is ~f32 precision anyway, so c64 there loses
    nothing real. CPU keeps c128 for the ~1e-13 Faddeeva accuracy."""
    import jax
    import jax.numpy as jnp

    try:
        backend = jax.default_backend()
    except Exception:
        return jnp.complex128
    if backend in ("tpu", "axon") or "tpu" in backend.lower():
        return jnp.complex64
    return jnp.complex128 if config.default_dtype == "float64" else jnp.complex64
