"""Regression demos. Reference: GPy/examples/regression.py (olympic_marathon_men:17,
toy_rbf_1d:~, sparse_GP_regression_1D:502, coregionalization_toy, ...).
Each function builds, optimizes, and returns the model (plot=True to draw).
"""
from __future__ import annotations

import numpy as np

from ..models import GPRegression, SparseGPRegression, GPCoregionalizedRegression, SVGP
from ..util import datasets
import gpy_tpu.kern as kern


def olympic_marathon_men(optimize=True, plot=False):
    data = datasets.olympic_marathon_men()
    m = GPRegression(data["X"], data["Y"])
    m.kern.lengthscale = 10.0
    if optimize:
        m.optimize()
    if plot:
        m.plot()
    return m


def toy_rbf_1d(optimize=True, plot=False, n=100):
    data = datasets.toy_rbf_1d(num_samples=n)
    m = GPRegression(data["X"], data["Y"])
    if optimize:
        m.optimize()
    if plot:
        m.plot()
    return m


def toy_rbf_1d_50(optimize=True, plot=False):
    return toy_rbf_1d(optimize, plot, n=50)


def sparse_GP_regression_1D(num_samples=400, num_inducing=5, optimize=True, plot=False):
    rng = np.random.default_rng(0)
    X = rng.uniform(-3.0, 3.0, (num_samples, 1))
    Y = np.sin(X) + rng.standard_normal((num_samples, 1)) * 0.05
    m = SparseGPRegression(X, Y, num_inducing=num_inducing)
    if optimize:
        m.optimize()
    if plot:
        m.plot()
    return m


def coregionalization_toy(optimize=True, plot=False):
    rng = np.random.default_rng(0)
    X1 = rng.random((40, 1)) * 8
    X2 = rng.random((30, 1)) * 8
    Y1 = np.sin(X1) + rng.standard_normal((40, 1)) * 0.05
    Y2 = np.sin(X2) + rng.standard_normal((30, 1)) * 0.05 + 2.0
    m = GPCoregionalizedRegression([X1, X2], [Y1, Y2])
    if optimize:
        m.optimize()
    return m


def svgp_bigdata(n=2000, optimize=True, plot=False):
    """'Gaussian processes for Big Data' demo (GPy core/svgp.py docstring)."""
    from ..likelihoods import Gaussian

    rng = np.random.default_rng(0)
    X = rng.random((n, 1)) * 10
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    Z = np.linspace(0, 10, 20).reshape(-1, 1)
    m = SVGP(X, Y, Z, kern.RBF(1), Gaussian(variance=0.1), batchsize=256)
    if optimize:
        m.fit(iters=300, step_size=1e-2)
    return m
