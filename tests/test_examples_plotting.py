"""Examples smoke tests (GPy: deactivated examples runner, revived) +
plotting surface tests (GPy test_plotting.py checks plot *data*, not pixels).
"""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest


def test_regression_examples():
    from gpy_tpu.examples import regression

    m = regression.toy_rbf_1d_50(optimize=True)
    assert np.isfinite(float(m.log_likelihood()))
    m2 = regression.olympic_marathon_men(optimize=True)
    assert np.isfinite(float(m2.log_likelihood()))
    m3 = regression.sparse_GP_regression_1D(num_samples=80, optimize=True)
    assert np.isfinite(float(m3.log_likelihood()))


def test_classification_examples():
    from gpy_tpu.examples import classification

    m = classification.toy_linear_1d_classification(optimize=True)
    p, _ = m.predict(np.asarray(m.X))
    assert np.mean((p > 0.5) == (np.asarray(m.Y) > 0.5)) > 0.8


def test_non_gaussian_examples():
    from gpy_tpu.examples import non_gaussian

    m = non_gaussian.student_t_approx(optimize=True)
    assert np.isfinite(float(m.log_likelihood()))


def test_state_space_examples():
    from gpy_tpu.examples import state_space

    m = state_space.matern_kalman_1d(optimize=True, n=100)
    assert np.isfinite(float(m.log_likelihood()))


def test_plot_surfaces():
    import gpy_tpu.plotting  # attaches methods
    from gpy_tpu.models import GPRegression
    from gpy_tpu.models.gplvm import GPLVM
    import gpy_tpu.kern as gk

    rng = np.random.default_rng(0)
    X = np.linspace(0, 5, 20).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((20, 1))
    m = GPRegression(X, Y)
    ax = m.plot()
    assert len(ax.lines) >= 1
    ax2 = m.plot_f()
    assert ax2 is not None
    ax3 = m.kern.plot()
    assert len(ax3.lines) == 1
    # latent plot
    Yh = rng.standard_normal((15, 4))
    lv = GPLVM(Yh, 2)
    ax4 = lv.plot_latent()
    assert ax4 is not None
    ax5 = m.plot_ARD()
    assert ax5 is not None
