"""Dimensionality-reduction demos. Reference:
GPy/examples/dimensionality_reduction.py (gplvm_oil_100, bgplvm_simulation,
mrd_simulation, ...)."""
from __future__ import annotations

import numpy as np

from ..models import GPLVM, BayesianGPLVM, MRD
from ..util import datasets


def gplvm_oil_100(optimize=True, plot=False):
    data = datasets.oil_synthetic(n=100)
    m = GPLVM(data["X"], 2)
    if optimize:
        m.optimize(max_iters=200)
    if plot:
        m.plot_latent(labels=data["Y"][:, 0])
    return m


def bgplvm_simulation(optimize=True, plot=False, max_iters=300):
    data = datasets.simulation_BGPLVM(n=60, q_true=3, d=8)
    m = BayesianGPLVM(data["Y"], 5, num_inducing=10)
    if optimize:
        m.optimize(max_iters=max_iters)
    if plot:
        m.plot_latent()
    return m


def mrd_simulation(optimize=True, plot=False, max_iters=200):
    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 2))
    Y1 = np.sin(X) @ rng.standard_normal((2, 5))
    Y2 = np.cos(X[:, :1]) @ rng.standard_normal((1, 4))
    m = MRD([Y1, Y2], 3, num_inducing=8)
    if optimize:
        m.optimize(max_iters=max_iters)
    return m
