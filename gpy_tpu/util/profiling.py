"""Tracing / profiling utilities (SURVEY.md §5: "wrap steps with
jax.profiler traces + simple step-timing metrics").

The reference has no profiling subsystem (stdlib logging only); on TPU the
useful instruments are (a) XLA step traces viewable in TensorBoard /
Perfetto and (b) honest wall-clock step timing that survives async
dispatch. Both live here:

    from gpy_tpu.util.profiling import trace, annotate, StepTimer

    with trace("/tmp/tb"):                 # XLA + host trace -> TensorBoard
        model.fit(iters=100, ...)

    with annotate("elbo-step"):            # named region inside a trace
        ...

    timer = StepTimer()
    for i in range(100):
        with timer.step():                  # host-fetch synchronized timing
            state = step_fn(state)
    timer.summary()                         # {mean_ms, p50_ms, p90_ms, n}

Honest-timing rules baked in (CLAUDE.md tunnel lessons): StepTimer.step
accepts the step's output and synchronizes by host-fetching one scalar of
it — `jax.block_until_ready` does NOT synchronize through the axon tunnel.
"""
from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["trace", "annotate", "StepTimer", "profile_objective"]


@contextlib.contextmanager
def trace(logdir: str, create_perfetto_link: bool = False):
    """XLA/host step trace over the with-body -> `logdir` (TensorBoard's
    profile plugin or Perfetto reads it)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline (TraceAnnotation);
    usable as a context manager."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with forced device synchronization."""

    def __init__(self):
        self.times_s = []

    @contextlib.contextmanager
    def step(self, sync=None):
        """Time the with-body. Pass `sync=jax_array` (or set it via
        `timer.sync_target = ...` inside the body) to host-fetch one
        element after the body — the only honest sync through a tunnel."""
        self.sync_target = sync
        t0 = time.perf_counter()
        yield self
        tgt = self.sync_target
        if tgt is not None:
            np.asarray(tgt).ravel()[:1]  # host fetch == synchronization
        self.times_s.append(time.perf_counter() - t0)

    def summary(self):
        t = np.asarray(self.times_s) * 1e3
        if t.size == 0:
            return {"n": 0}
        return {
            "n": int(t.size),
            "mean_ms": float(t.mean()),
            "p50_ms": float(np.percentile(t, 50)),
            "p90_ms": float(np.percentile(t, 90)),
            "min_ms": float(t.min()),
        }


def profile_objective(model, n_calls: int = 5, logdir: str | None = None):
    """Time the model's jitted objective+gradient (fresh inputs per call so
    a caching tunnel cannot fake it); optionally under an XLA trace.

    Returns the StepTimer summary dict.
    """
    import jax.numpy as jnp

    objgrad = model._get_objgrad()
    flat = np.asarray(model.get_flat_raw())
    v, g = objgrad(jnp.asarray(flat))
    float(v), np.asarray(g)  # compile + first exec
    # second warm exec with DISTINCT input: the first fresh-args execution
    # after a compile pays a one-time ~20ms warmup that must not be timed
    v, g = objgrad(jnp.asarray(flat * (1.0 + 1e-7)))
    float(v), np.asarray(g)
    timer = StepTimer()
    ctx = trace(logdir) if logdir else contextlib.nullcontext()
    with ctx:
        for i in range(1, n_calls + 1):
            with timer.step() as t:
                v, g = objgrad(jnp.asarray(flat + 1e-6 * i))
                t.sync_target = g
    return timer.summary()
