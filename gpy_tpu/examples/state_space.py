"""State-space GP demos. Reference: GPy/examples/state_space.py."""
from __future__ import annotations

import numpy as np

from ..models.state_space import StateSpace
import gpy_tpu.kern as kern


def matern_kalman_1d(optimize=True, plot=False, n=300):
    rng = np.random.default_rng(0)
    X = np.sort(rng.random(n) * 10).reshape(-1, 1)
    Y = np.sin(X) + 0.2 * rng.standard_normal((n, 1))
    m = StateSpace(X, Y, kernel=kern.Matern32(1))
    if optimize:
        m.optimize(max_iters=100)
    return m


def sum_kernel_kalman(optimize=True, plot=False, n=200):
    rng = np.random.default_rng(1)
    X = np.sort(rng.random(n) * 10).reshape(-1, 1)
    Y = np.sin(X) + 0.3 * np.sin(5 * X) + 0.1 * rng.standard_normal((n, 1))
    k = kern.Matern32(1, lengthscale=2.0) + kern.Matern52(1, lengthscale=0.3)
    m = StateSpace(X, Y, kernel=k)
    if optimize:
        m.optimize(max_iters=100)
    return m


def state_space_example(n=2000, optimize=True, plot=False):
    """Dense GP vs O(N) Kalman state-space GP on the same Matern32 model
    (GPy examples/state_space.py state_space_example)."""
    import numpy as np
    from ..models import GPRegression, StateSpace
    import gpy_tpu.kern as gk
    rng = np.random.default_rng(0)
    X = np.linspace(0, 10, n)[:, None]
    Y = np.sin(X) + rng.normal(size=X.shape) * 0.1
    m1 = GPRegression(X[::4], Y[::4], kernel=gk.Matern32(1))  # dense on subset
    m2 = StateSpace(X, Y, kernel=gk.Matern32(1))
    if optimize:
        m1.optimize(max_iters=100)
        m2.optimize(max_iters=100)
    print(m1)
    print(m2)
    return m1, m2
