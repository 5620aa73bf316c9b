"""Data-division and checkpointed-optimization helpers.

Reference: GPy/util/parallel.py (divide_data:14 for MPI row sharding,
optimize_parallel:32 — an optimize loop with periodic model saves).
In this framework multi-device data parallelism is SPMD over a
`jax.sharding.Mesh` (see gpy_tpu.parallel), so `divide_data` survives only
as a host-side utility for manual row partitioning (e.g. building per-host
input shards), and `optimize_parallel` keeps its real feature: periodic
checkpointing during optimization.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = ["divide_data", "optimize_parallel"]


def divide_data(datanum, rank, size):
    """Contiguous row range [start, end) plus index list for shard `rank` of
    `size` (GPy parallel.py:14-30 semantics: remainder spread over the
    first shards)."""
    base = datanum // size
    rem = datanum % size
    start = rank * base + min(rank, rem)
    end = start + base + (1 if rank < rem else 0)
    return start, end, np.arange(start, end)


def optimize_parallel(model, optimizer=None, messages=True, max_iters=1000,
                      outpath=".", interval=100, name=None, **kwargs):
    """Optimize with periodic model saves every `interval` iterations
    (GPy parallel.py:32-50). Checkpoints are the portable JSON/gzip
    save_model format, so a crashed run resumes via gpy_tpu.load()."""
    name = name or getattr(model, "name", "model")
    os.makedirs(outpath, exist_ok=True)
    done = [0]

    remaining = max_iters
    while remaining > 0:
        chunk = min(interval, remaining)
        model.optimize(optimizer or "lbfgsb", max_iters=chunk,
                       messages=False, **kwargs)
        done[0] += chunk
        remaining -= chunk
        path = os.path.join(outpath, f"{name}_checkpoint")
        try:
            path = model.save_model(path)  # returns the path actually written
        except Exception as e:  # models without save_model still optimize
            if messages:
                print(f"checkpoint skipped ({e})")
            break
        if messages:
            print(f"iter {done[0]:6d}  obj {float(model.objective_function()):.6f}  saved {path}")
    return model
