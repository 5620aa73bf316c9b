"""Classification demos. Reference: GPy/examples/classification.py
(toy_linear_1d_classification, crescent_data, sparse variants, oil)."""
from __future__ import annotations

from ..models import GPClassification, GPClassificationLaplace, SparseGPClassification
from ..util import datasets


def toy_linear_1d_classification(optimize=True, plot=False, seed=0):
    data = datasets.toy_linear_1d_classification(seed=seed)
    m = GPClassification(data["X"], data["Y"])
    if optimize:
        m.optimize()
    if plot:
        m.plot()
    return m


def toy_linear_1d_classification_laplace(optimize=True, plot=False, seed=0):
    data = datasets.toy_linear_1d_classification(seed=seed)
    m = GPClassificationLaplace(data["X"], data["Y"])
    if optimize:
        m.optimize()
    return m


def crescent_data(optimize=True, plot=False, seed=0):
    data = datasets.crescent_data(seed=seed)
    m = GPClassification(data["X"], data["Y"])
    if optimize:
        m.optimize()
    return m


def sparse_toy_linear_1d_classification(num_inducing=10, optimize=True, plot=False, seed=0):
    data = datasets.toy_linear_1d_classification(seed=seed)
    m = SparseGPClassification(data["X"], data["Y"], num_inducing=num_inducing)
    if optimize:
        m.optimize(max_iters=200)
    return m
