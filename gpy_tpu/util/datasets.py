"""Datasets for examples/tests.

Reference: GPy/util/datasets.py (1500 LoC, ~60 downloaders with
authorize_download prompts + data_resources.json registry).

This environment has no network egress, so: (a) loaders first look for an
existing GPy data cache (GPY_DATA_PATH or ~/.config/GPy/datasets) and use
real files when present; (b) otherwise the toy generators below provide
documented synthetic stand-ins with the same shapes/dict API
({'X','Y','info'}), which is what the test-suite configs need.
"""
from __future__ import annotations

import os

import numpy as np

__all__ = [
    "toy_rbf_1d",
    "toy_linear_1d_classification",
    "olympic_marathon_men",
    "crescent_data",
    "oil_synthetic",
    "simulation_BGPLVM",
]


def _data_path():
    return os.environ.get(
        "GPY_DATA_PATH", os.path.expanduser("~/.config/GPy/datasets")
    )


def toy_rbf_1d(seed=0, n=500, noise=0.05):
    """GPy: datasets.toy_rbf_1d — sample from a known RBF GP."""
    rng = np.random.default_rng(seed)
    X = np.sort(rng.random((n, 1)) * 6, axis=0)
    d2 = (X - X.T) ** 2
    K = np.exp(-0.5 * d2 / 0.7**2) + noise * np.eye(n)
    Y = np.linalg.cholesky(K) @ rng.standard_normal((n, 1))
    return {"X": X, "Y": Y, "info": "samples from a RBF(l=0.7) GP + noise"}


def toy_linear_1d_classification(seed=0, n=100):
    """GPy: datasets.toy_linear_1d_classification."""
    rng = np.random.default_rng(seed)
    x1 = rng.normal(-1.0, 0.5, (n // 2, 1))
    x2 = rng.normal(1.0, 0.5, (n - n // 2, 1))
    X = np.vstack([x1, x2])
    Y = np.vstack([np.zeros((n // 2, 1)), np.ones((n - n // 2, 1))])
    return {"X": X, "Y": Y, "info": "two 1-D Gaussian clusters"}


def olympic_marathon_men():
    """Olympic marathon winning times (GPy: datasets.olympic_marathon_men).

    Uses the real file from a GPy data cache if available; otherwise a
    synthetic stand-in with the same structure (year vs pace trend) —
    clearly marked in 'info'.
    """
    path = os.path.join(_data_path(), "olympic_marathon_men", "olympicMarathonTimes.csv")
    if os.path.exists(path):
        data = np.genfromtxt(path, delimiter=",")
        return {"X": data[:, 0:1], "Y": data[:, 1:2], "info": "olympic marathon men (real)"}
    rng = np.random.default_rng(1896)
    years = np.arange(1896, 2016, 4.0)
    years = np.delete(years, [4, 11, 12])  # 1916, 1940, 1944 (wars)
    X = years.reshape(-1, 1)
    # declining pace trend + plateau, resembling the real series' shape
    pace = 5.2 - 2.0 * (1 - np.exp(-(X - 1896) / 50.0)) + 0.08 * rng.standard_normal(X.shape)
    return {"X": X, "Y": pace, "info": "SYNTHETIC stand-in for olympic marathon men"}


def crescent_data(seed=0, n=200):
    """Two interleaved crescents (GPy: datasets.crescent_data shape)."""
    rng = np.random.default_rng(seed)
    t1 = rng.random(n // 2) * np.pi
    t2 = rng.random(n - n // 2) * np.pi
    X1 = np.stack([np.cos(t1), np.sin(t1)], 1) + 0.15 * rng.standard_normal((n // 2, 2))
    X2 = np.stack([1 - np.cos(t2), 0.5 - np.sin(t2)], 1) + 0.15 * rng.standard_normal((n - n // 2, 2))
    X = np.vstack([X1, X2])
    Y = np.vstack([np.zeros((n // 2, 1)), np.ones((n - n // 2, 1))])
    return {"X": X, "Y": Y, "info": "two crescents"}


def oil_synthetic(seed=0, n=300):
    """Stand-in for the oil-flow dataset (3 classes, 12-D) used in GPLVM demos."""
    rng = np.random.default_rng(seed)
    Z = rng.standard_normal((n, 2))
    labels = rng.integers(0, 3, n)
    centers = rng.standard_normal((3, 2)) * 2
    Zc = Z * 0.5 + centers[labels]
    W = rng.standard_normal((2, 12))
    X = np.tanh(Zc @ W) + 0.05 * rng.standard_normal((n, 12))
    return {"X": X, "Y": labels.reshape(-1, 1), "info": "SYNTHETIC 3-class 12-D manifold"}


def simulation_BGPLVM(seed=0, n=100, q_true=3, d=10):
    """Latent-manifold simulation (GPy: datasets.simulation_BGPLVM)."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, q_true))
    W = rng.standard_normal((q_true, d))
    Y = np.sin(X) @ W + 0.05 * rng.standard_normal((n, d))
    return {"X": X, "Y": Y, "info": f"nonlinear map from {q_true} latent dims"}
