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


def test_new_regression_examples():
    """The demos added for full GPy examples/regression.py coverage."""
    from gpy_tpu.examples import regression

    m = regression.uncertain_inputs_sparse_regression(max_iters=40)
    assert np.isfinite(float(m.log_likelihood()))
    m = regression.parametric_mean_function(max_iters=30)
    assert np.isfinite(float(m.log_likelihood()))
    m = regression.multioutput_gp_with_derivative_observations()
    assert np.isfinite(float(m.log_likelihood()))
    models, lls = regression.multiple_optima(resolution=3, model_restarts=1,
                                             max_iters=20)
    assert np.isfinite(lls).all() and len(models) == 1


def test_new_classification_examples():
    from gpy_tpu.examples import classification

    m = classification.toy_heaviside(max_iters=25)
    assert np.isfinite(float(m.log_likelihood()))
    m = classification.sparse_toy_linear_1d_classification_uncertain_input(max_iters=25)
    assert np.isfinite(float(m.log_likelihood()))
    m = classification.oil(num_inducing=15, max_iters=20)
    assert np.isfinite(float(m.log_likelihood()))


def test_new_dimred_examples():
    from gpy_tpu.examples import dimensionality_reduction as D

    m = D.bgplvm_test_model()
    assert np.isfinite(float(m.log_likelihood()))
    m = D.swiss_roll(N=40, num_inducing=8)
    assert np.isfinite(float(m.log_likelihood()))
    m = D.bcgplvm_linear_stick(max_iters=15)
    assert np.isfinite(float(m.log_likelihood()))
    m, qXs, (mu, var) = D.bgplvm_infer_new(max_iters=30)
    assert np.asarray(qXs.mean).shape[0] == mu.shape[0] == 10
    assert np.all(np.asarray(var) > 0)


def test_boston_and_state_space_example():
    from gpy_tpu.examples import non_gaussian, state_space

    scores = non_gaussian.boston_example(num_folds=2, max_iters=20)
    assert np.isfinite(scores["gaussian"]).all()
    m1, m2 = state_space.state_space_example(n=200, optimize=False)
    assert np.isfinite(float(m2.log_likelihood()))


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


def test_plotting_backend_registry():
    import gpy_tpu.plotting as gp
    assert gp.plotting_library() is not None
    with pytest.raises(ValueError):
        gp.change_plotting_library("nope")
    gp.change_plotting_library("none")
    with pytest.raises(RuntimeError):
        gp.plotting_library()
    gp.change_plotting_library("matplotlib")
    # plotly backend is gated: selecting it works or raises ImportError at draw
    try:
        gp.change_plotting_library("plotly")
        gp.plotting_library()
    except ImportError:
        pass
    finally:
        gp.change_plotting_library("matplotlib")


def test_extended_plot_surfaces():
    import gpy_tpu.plotting  # noqa: F401
    from gpy_tpu.models import GPRegression, SparseGPRegression
    from gpy_tpu.models.gplvm import GPLVM

    rng = np.random.default_rng(0)
    X = np.linspace(0, 5, 25).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((25, 1))
    m = GPRegression(X, Y)
    assert m.plot_mean() is not None
    assert m.plot_confidence() is not None
    assert m.plot_density() is not None
    assert m.plot_samples(samples=2) is not None
    assert m.plot_data_error() is not None
    assert m.plot_errorbars_trainset() is not None
    sm = SparseGPRegression(X, Y, num_inducing=5)
    ax = sm.plot()  # includes inducing markers
    assert ax is not None
    lv = GPLVM(rng.standard_normal((15, 4)), 2)
    assert lv.plot_latent_scatter(labels=rng.integers(0, 2, 15)) is not None
    assert lv.plot_magnification() is not None


def test_tango_palette_cycles():
    from gpy_tpu.plotting import tango
    tango.reset()
    seen = {tango.nextMedium() for _ in range(8)}
    assert len(seen) == 8
    assert all(c.startswith("#") for c in seen)


def test_visualize_viewers():
    import matplotlib.pyplot as plt
    from gpy_tpu.plotting import visualize
    from gpy_tpu.models.gplvm import GPLVM

    rng = np.random.default_rng(0)
    v = visualize.vector_show(rng.standard_normal(10))
    v.modify(rng.standard_normal(10))
    im = visualize.image_show(rng.standard_normal(256), dimensions=(16, 16))
    im.modify(rng.standard_normal(256))
    # stick viewer from xyz triples + connections
    xyz = rng.standard_normal((5, 3))
    conn = np.zeros((5, 5), dtype=bool); conn[0, 1] = conn[1, 2] = True
    st = visualize.stick_show(xyz.flatten(order="F")[None], connect=conn)
    st.modify(rng.standard_normal(15)[None])
    # lvm viewer decodes a moved latent point through the model
    Yh = rng.standard_normal((15, 10))
    lv = GPLVM(Yh, 2)
    dv = visualize.vector_show(Yh[0])
    viewer = visualize.lvm(np.zeros((1, 2)), lv, dv)
    viewer.modify(np.asarray([[0.5, -0.3]]))
    viewer.close()
    plt.close("all")


def test_dep_plots_surface():
    """matplot_dep specialty plots (GPy: priors_plots/variational_plots/
    img_plots/maps/controllers)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from gpy_tpu.plotting import dep_plots
    from gpy_tpu.core.priors import Gamma
    from gpy_tpu.core.variational import NormalPosterior

    ax = dep_plots.univariate_plot(Gamma(2.0, 1.0))
    assert len(ax.lines) == 1
    qX = NormalPosterior(np.random.randn(20, 3), np.full((20, 3), 0.2))
    ax = dep_plots.plot_variational_dist(qX)
    assert len(ax.lines) == 3
    fig = plt.figure()
    axes = dep_plots.plot_2D_images(fig, np.random.rand(6, 16), (4, 4))
    assert len(axes) == 6
    # maps gated on pyshp with a clean error
    import pytest
    with pytest.raises(ImportError, match="pyshp"):
        dep_plots.plot_bbox("/nonexistent.shp")
    # imshow controller recomputes on axis change
    fig, ax = plt.subplots()
    calls = []
    def pf(x0, x1, y0, y1, res):
        calls.append((x0, x1))
        xs = np.linspace(x0, x1, res)
        return np.sin(xs)[None, :].repeat(res, 0)
    c = dep_plots.ImshowController(ax, pf, (0, 0, 4, 4), resolution=16)
    ax.set_xlim(10, 20)
    ax.set_ylim(10, 20)
    assert len(calls) >= 2
    plt.close("all")


def test_advanced_examples():
    """Round-3 surface demos: tying, symbolic likelihood, fused matrix-free."""
    from gpy_tpu.examples import advanced

    m = advanced.tied_lengthscales(n=40)
    assert np.isfinite(float(m.log_likelihood()))
    m2 = advanced.symbolic_laplace_regression(n=30)
    assert np.isfinite(float(m2.log_likelihood()))
    m3 = advanced.matrix_free_exact_gp(n=400)
    assert np.isfinite(float(m3.log_likelihood()))
    m4 = advanced.big_data_svgp(n=2000)
    assert np.isfinite(float(m4.log_likelihood()))
