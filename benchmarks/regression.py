"""Regression benchmark harness — parity with the reference's
benchmarks/regression/{run,tasks,methods,evaluation,outputs}.py (334 LoC of
task/method/RMSE scaffolding), redesigned as one module.

Tasks mirror the reference set (UCI Housing: 250/256 split over 13 features,
tasks.py:29-55; WineQuality red: 1000/599 over 11 features, tasks.py:57-85).
When the UCI files are not cached locally (this environment has no network
egress), each task substitutes a deterministic synthetic regression problem
of the SAME shape so the harness always runs; the `source` column records
which one was used.

Methods mirror methods.py: GP_RBF (RBF+Linear ARD exact GP), SparseGP_RBF
(VarDTC, M=10% of N capped at 500), SVIGP_RBF (SVGP + natural-gradient
minibatch fit). Evaluation: RMSE + fit/predict wall-clock, `repeats` per
cell (run.py:14-21). Outputs: screen table + CSV + JSON (outputs.py).

Usage:  python benchmarks/regression.py [--repeats 2] [--out DIR]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# tasks
# ---------------------------------------------------------------------------

class Task:
    name = "task"
    n_train = n_test = n_features = 0

    def load(self, rng):
        """Return (Xtr, Ytr, Xte, Yte, source)."""
        data = self._real()
        if data is not None:
            X, Y = data
            idx = rng.permutation(X.shape[0])
            tr = idx[: self.n_train]
            te = idx[self.n_train : self.n_train + self.n_test]
            return X[tr], Y[tr], X[te], Y[te], "uci"
        X, Y = self._synthetic(rng)
        return (X[: self.n_train], Y[: self.n_train],
                X[self.n_train :], Y[self.n_train :], "synthetic")

    def _real(self):
        return None

    def _synthetic(self, rng):
        n = self.n_train + self.n_test
        d = self.n_features
        X = rng.standard_normal((n, d))
        # 3-sparse smooth signal: learnable at the reference task sizes
        # (a dense d-dim signal at N=250 is mean-predictor-hard for any GP)
        w = np.zeros((d, 1))
        w[rng.permutation(d)[:3]] = rng.standard_normal((3, 1))
        Y = (np.sin(X @ w) + 0.3 * X[:, :1]
             + 0.1 * rng.standard_normal((n, 1)))
        return X, Y


class Housing(Task):
    """UCI Boston housing (reference tasks.py:29-55)."""

    name = "Housing"
    n_train, n_test, n_features = 250, 256, 13

    def _real(self):
        try:
            from gpy_tpu.util.datasets import boston_housing, data_available

            if not data_available("boston_housing"):
                return None
            d = boston_housing()
            return np.asarray(d["X"], float), np.asarray(d["Y"], float)
        except Exception:
            return None


class WineQuality(Task):
    """UCI wine quality, red (reference tasks.py:57-85). Reads the cached
    winequality-red.csv from the datasets cache dir when present."""

    name = "WineQuality"
    n_train, n_test, n_features = 1000, 599, 11

    def _real(self):
        try:
            from gpy_tpu.util.datasets import data_path

            f = os.path.join(data_path(), "wine_quality", "winequality-red.csv")
            if not os.path.exists(f):
                return None
            raw = np.genfromtxt(f, delimiter=";", skip_header=1)
            return raw[:, :-1].astype(float), raw[:, -1:].astype(float)
        except Exception:
            return None


# ---------------------------------------------------------------------------
# methods
# ---------------------------------------------------------------------------

class Method:
    name = "method"

    def _norm_fit(self, X, Y):
        self._xm, self._xs = X.mean(0), X.std(0) + 1e-9
        self._ym, self._ys = Y.mean(0), Y.std(0) + 1e-9
        return (X - self._xm) / self._xs, (Y - self._ym) / self._ys

    def fit(self, X, Y):
        raise NotImplementedError

    def predict(self, X):
        raise NotImplementedError


class GP_RBF(Method):
    """Exact GP, RBF-ARD + Linear-ARD (reference methods.py:53-66)."""

    name = "GP_RBF"

    def fit(self, X, Y):
        import gpy_tpu.kern as gk
        from gpy_tpu.models import GPRegression

        Xn, Yn = self._norm_fit(X, Y)
        kern = gk.RBF(X.shape[1], ARD=True) + gk.Linear(X.shape[1], ARD=True)
        self.model = GPRegression(Xn, Yn, kernel=kern,
                                  noise_var=float(Yn.var()) * 0.01)
        self.model.optimize(max_iters=200)

    def predict(self, X):
        mu, _ = self.model.predict((X - self._xm) / self._xs)
        return np.asarray(mu) * self._ys + self._ym


class SparseGP_RBF(Method):
    """Sparse VarDTC GP (reference methods.py:68-88), M = min(N//10, 500)."""

    name = "SparseGP_RBF"

    def fit(self, X, Y):
        import gpy_tpu.kern as gk
        from gpy_tpu.models import SparseGPRegression

        Xn, Yn = self._norm_fit(X, Y)
        m = max(10, min(X.shape[0] // 10, 500))
        self.model = SparseGPRegression(Xn, Yn, num_inducing=m,
                                        kernel=gk.RBF(X.shape[1], ARD=True))
        self.model.likelihood.variance = float(Yn.var()) * 0.01
        self.model.optimize(max_iters=200)

    def predict(self, X):
        mu, _ = self.model.predict((X - self._xm) / self._xs)
        return np.asarray(mu) * self._ys + self._ym


class SVIGP_RBF(Method):
    """SVGP with natural-gradient minibatch fit (reference methods.py:90-109)."""

    name = "SVIGP_RBF"

    def fit(self, X, Y):
        import gpy_tpu.kern as gk
        from gpy_tpu.core.svgp import SVGP
        from gpy_tpu.likelihoods import Gaussian

        Xn, Yn = self._norm_fit(X, Y)
        rng = np.random.default_rng(0)
        m = max(10, min(X.shape[0] // 10, 500))
        Z = Xn[rng.permutation(Xn.shape[0])[:m]].copy()
        self.model = SVGP(Xn, Yn, Z, gk.RBF(X.shape[1], ARD=True),
                          Gaussian(variance=float(Yn.var()) * 0.01))
        self.model.fit(iters=400, batchsize=min(512, Xn.shape[0]),
                       step_size=1e-2, natgrad_step_size=0.1, whiten=True)

    def predict(self, X):
        mu, _ = self.model.predict((X - self._xm) / self._xs)
        return np.asarray(mu) * self._ys + self._ym


# ---------------------------------------------------------------------------
# evaluation + outputs
# ---------------------------------------------------------------------------

def RMSE(pred, truth):
    return float(np.sqrt(np.mean((np.asarray(pred) - np.asarray(truth)) ** 2)))


def run(tasks=(Housing, WineQuality), methods=(GP_RBF, SparseGP_RBF, SVIGP_RBF),
        repeats=2, out_dir=None, seed=0):
    rows = []
    for Tk in tasks:
        task = Tk()
        for Mt in methods:
            for rep in range(repeats):
                rng = np.random.default_rng(seed + rep)
                Xtr, Ytr, Xte, Yte, source = task.load(rng)
                method = Mt()
                t0 = time.perf_counter()
                method.fit(Xtr, Ytr)
                t_fit = time.perf_counter() - t0
                t0 = time.perf_counter()
                pred = method.predict(Xte)
                t_pred = time.perf_counter() - t0
                rows.append({
                    "task": task.name, "method": method.name, "repeat": rep,
                    "source": source, "rmse": round(RMSE(pred, Yte), 4),
                    "fit_s": round(t_fit, 2), "predict_s": round(t_pred, 3),
                })
                print(f"{task.name:12s} {method.name:14s} rep{rep} "
                      f"rmse={rows[-1]['rmse']:.4f} fit={t_fit:.1f}s "
                      f"predict={t_pred:.2f}s [{source}]", flush=True)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "regression.csv"), "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        with open(os.path.join(out_dir, "regression.json"), "w") as f:
            json.dump(rows, f, indent=1)
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    run(repeats=a.repeats, out_dir=a.out)
