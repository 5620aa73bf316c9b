"""Tracing / profiling / step metrics.

The reference has no built-in tracing or profiling — only stdlib logging
(GPy/core/gp.py:16) and `time.time()` in the benchmark harness
(benchmarks/regression/run.py:38-41). SURVEY.md §5 specifies the TPU build
should do better: wrap steps with `jax.profiler` traces and simple
step-timing metrics. This module is that subsystem.

Design notes (TPU measurement is subtle — see CLAUDE.md):
  * `StepTimer` forces a host fetch of a scalar to synchronize; on remote
    TPU tunnels `block_until_ready` alone does NOT guarantee the device
    work is finished.
  * `trace(...)` wraps a region in a jax.profiler trace (viewable with
    TensorBoard / xprof) and is a no-op if profiling is unavailable.
  * `Metrics` is a tiny append-only recorder with summary statistics —
    deliberately not a metrics *backend* (none exists in the reference
    either); it prints/returns plain dicts that callers can ship anywhere.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import numpy as np

__all__ = ["StepTimer", "Metrics", "trace", "log_compiles"]


def _sync(value: Any) -> None:
    """Honest device synchronization: fetch a scalar to the host.

    jax.block_until_ready is not sufficient through remote-device tunnels;
    a host fetch is the only sync that is guaranteed everywhere.
    """
    try:
        import jax

        leaves = jax.tree_util.tree_leaves(value)
        for leaf in leaves:
            if hasattr(leaf, "addressable_data") or hasattr(leaf, "device_buffer") or hasattr(leaf, "block_until_ready"):
                np.asarray(jax.numpy.ravel(leaf)[:1])
                return
    except Exception:
        pass


class StepTimer:
    """Per-step wall-clock timing with device synchronization.

    Usage::

        timer = StepTimer()
        for i in range(n):
            with timer.step():
                out = train_step(state, batch)
            timer.mark_output(out)   # optional: sync on this value
        print(timer.summary())
    """

    def __init__(self, skip_first: int = 1):
        self.times: List[float] = []
        self.skip_first = skip_first
        self._t0: Optional[float] = None
        self._pending_output: Any = None

    @contextlib.contextmanager
    def step(self, sync_on: Any = None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            _sync(sync_on)
        self.times.append(time.perf_counter() - t0)

    def mark_output(self, value: Any) -> None:
        """Synchronize on `value` and attribute the wait to the last step."""
        if not self.times:
            return
        t0 = time.perf_counter()
        _sync(value)
        self.times[-1] += time.perf_counter() - t0

    @property
    def steady_times(self) -> List[float]:
        return self.times[self.skip_first:] if len(self.times) > self.skip_first else self.times

    def summary(self) -> Dict[str, float]:
        ts = np.asarray(self.steady_times or [0.0])
        return {
            "steps": int(len(self.times)),
            "mean_s": float(ts.mean()),
            "median_s": float(np.median(ts)),
            "best_s": float(ts.min()),
            "p90_s": float(np.percentile(ts, 90)),
            "steps_per_s": float(1.0 / max(np.median(ts), 1e-12)),
        }


class Metrics:
    """Append-only scalar metric recorder with summaries.

    The reference has no metrics surface at all; this replaces ad-hoc
    `messages=True` printing with something structured and testable.
    """

    def __init__(self):
        self._data: Dict[str, List[float]] = {}

    def record(self, name: str, value) -> None:
        self._data.setdefault(name, []).append(float(value))

    def record_many(self, **kv) -> None:
        for k, v in kv.items():
            self.record(k, v)

    def history(self, name: str) -> List[float]:
        return list(self._data.get(name, []))

    def last(self, name: str) -> Optional[float]:
        h = self._data.get(name)
        return h[-1] if h else None

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, vs in self._data.items():
            a = np.asarray(vs)
            out[k] = {
                "count": int(a.size),
                "last": float(a[-1]),
                "mean": float(a.mean()),
                "min": float(a.min()),
                "max": float(a.max()),
            }
        return out


@contextlib.contextmanager
def trace(name: str, trace_dir: Optional[str] = None):
    """Profile a region: jax.profiler trace (xprof/TensorBoard viewable).

    With `trace_dir`, starts/stops a full profiler session writing there;
    without, annotates the region with a named TraceAnnotation so it shows
    up inside an enclosing session. Degrades to a no-op if the profiler is
    unavailable (e.g. CPU-only minimal builds).
    """
    # only the profiler SETUP is guarded — an exception from the user's
    # with-block must propagate untouched (a second `yield` in an except
    # would mask it with "generator didn't stop after throw()")
    ann = None
    started = False
    try:
        import jax

        if trace_dir is not None:
            jax.profiler.start_trace(trace_dir)
            started = True
        ann = jax.profiler.TraceAnnotation(name)
        ann.__enter__()
    except Exception:
        ann = None
    try:
        yield
    finally:
        if ann is not None:
            ann.__exit__(None, None, None)
        if started:
            try:
                import jax

                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def log_compiles(enabled: bool = True):
    """Log every XLA compilation inside the region (retracing detector)."""
    import jax

    cm = None
    try:
        cm = jax.log_compiles(enabled)
        cm.__enter__()
    except Exception:
        cm = None
    try:
        yield
    finally:
        if cm is not None:
            cm.__exit__(None, None, None)
