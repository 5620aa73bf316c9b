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


def oil(num_inducing=50, max_iters=100, optimize=True, plot=False):
    """Sparse classification on the three-phase oil-flow data (GPy
    classification.py oil; synthetic oil stand-in offline)."""
    try:
        data = datasets.oil()
    except Exception as e:
        print(f"[gpy_tpu.examples] dataset unavailable ({e}); using oil_synthetic")
        data = datasets.oil_synthetic()
    X = data["X"]
    Y = (data["Y"][:, 0:1] + 1.0) / 2.0  # first phase vs rest, {0,1}
    m = SparseGPClassification(X, Y, num_inducing=num_inducing)
    if optimize:
        m.optimize(max_iters=max_iters)
    return m


def toy_heaviside(seed=0, max_iters=100, optimize=True, plot=False):
    """1-D classification with the Heaviside link under EP (GPy
    classification.py toy_heaviside — EP is the only inference that can
    handle the non-differentiable link)."""
    from ..core.gp import GP
    from ..inference import EP
    from ..kern import RBF
    from ..likelihoods import Bernoulli, link_functions
    data = datasets.toy_linear_1d_classification(seed=seed)
    Y = data["Y"][:, 0:1]  # already {0,1}
    m = GP(data["X"], Y, RBF(1), Bernoulli(gp_link=link_functions.Heaviside()),
           inference_method=EP(), name="gp_classification_heaviside")
    if optimize:
        m.optimize(max_iters=max_iters)
    if plot:
        m.plot()
    return m


def sparse_toy_linear_1d_classification_uncertain_input(
        num_inducing=10, seed=0, max_iters=100, optimize=True, plot=False):
    """Sparse classification with uncertain inputs (GPy classification.py
    sparse_toy_linear_1d_classification_uncertain_input)."""
    import numpy as np
    from ..models import SparseGPClassificationUncertainInput
    data = datasets.toy_linear_1d_classification(seed=seed)
    X = data["X"]
    X_var = np.random.default_rng(seed).uniform(0.3, 0.5, X.shape)
    Y = data["Y"][:, 0:1]  # already {0,1}
    m = SparseGPClassificationUncertainInput(X, X_var, Y, num_inducing=num_inducing)
    if optimize:
        m.optimize(max_iters=max_iters)
    return m
