"""Non-Gaussian likelihood demos. Reference: GPy/examples/non_gaussian.py
(student_t_approx, toy_poisson_rbf_1d_laplace:342, boston_example)."""
from __future__ import annotations

import numpy as np

from ..core.gp import GP
from ..inference import Laplace
from ..likelihoods import StudentT, Poisson
import gpy_tpu.kern as kern


def student_t_approx(optimize=True, plot=False):
    """Robust regression with outliers (GPy: non_gaussian.student_t_approx)."""
    rng = np.random.default_rng(0)
    X = np.sort(rng.random((40, 1)) * 6, 0)
    Y = np.sin(X) + 0.1 * rng.standard_normal((40, 1))
    Y[::9] += 2.5 * rng.standard_normal((Y[::9].shape[0], 1))  # outliers
    m = GP(X, Y, kern.RBF(1), StudentT(deg_free=4.0, sigma2=0.1),
           inference_method=Laplace(), name="studentt_gp")
    if optimize:
        m.optimize(max_iters=200)
    if plot:
        m.plot()
    return m


def toy_poisson_rbf_1d_laplace(optimize=True, plot=False):
    """GPy: non_gaussian.py:342."""
    rng = np.random.default_rng(0)
    X = np.linspace(0, 6, 60).reshape(-1, 1)
    rate = np.exp(np.sin(X) + 1.0)
    Y = rng.poisson(rate).astype(float)
    m = GP(X, Y, kern.RBF(1), Poisson(), inference_method=Laplace(), name="poisson_gp")
    if optimize:
        m.optimize(max_iters=200)
    if plot:
        m.plot()
    return m
