"""Smoke test of the regression benchmark harness (benchmarks/regression.py),
the parity surface for the reference's benchmarks/regression/run.py."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.regression import RMSE, SparseGP_RBF, Task, run  # noqa: E402


class TinyTask(Task):
    name = "Tiny"
    n_train, n_test, n_features = 120, 60, 5


def test_harness_runs_and_learns(tmp_path):
    rows = run(tasks=(TinyTask,), methods=(SparseGP_RBF,), repeats=1,
               out_dir=str(tmp_path))
    assert len(rows) == 1
    r = rows[0]
    assert r["source"] == "synthetic"
    assert r["rmse"] < 0.6  # must beat the ~1.0 mean-predictor clearly
    assert (tmp_path / "regression.csv").exists()
    assert (tmp_path / "regression.json").exists()


def test_rmse():
    assert RMSE(np.ones(4), np.zeros(4)) == 1.0
