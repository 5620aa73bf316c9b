"""Plotting: GP fits, latent spaces, kernels (matplotlib backend).

Reference: GPy/plotting/ (4.9k LoC: abstract backend layer
abstract_plotting_library.py:34, model-method injection __init__.py:59-130,
gpy_plot/* logic, matplotlib+plotly backends, Tango palette).

TPU design: plotting is host-side; one lean matplotlib implementation
covers the main surfaces (m.plot / plot_f / plot_data / plot_mean /
plot_confidence / plot_samples / plot_latent / kernel plots). Methods are
attached to GP/GPLVM classes at import of this module, mirroring GPy's
injection mechanism.
"""
from __future__ import annotations

import numpy as np

__all__ = ["plot_fit", "plot_latent", "plot_kernel", "attach_plotting"]

# Tango-ish palette (GPy: plotting/Tango.py)
BLUE = "#204a87"
BLUE_LIGHT = "#729fcf"
GREY = "#555753"
RED = "#cc0000"


def _grid_for(m, plot_limits=None, resolution=200, visible_dims=None):
    X = np.asarray(m.X)
    if visible_dims is None:
        visible_dims = [0]
    d = visible_dims[0]
    if plot_limits is None:
        lo, hi = X[:, d].min(), X[:, d].max()
        pad = 0.15 * (hi - lo + 1e-9)
        lo, hi = lo - pad, hi + pad
    else:
        lo, hi = plot_limits
    xs = np.linspace(lo, hi, resolution)
    Xs = np.tile(X.mean(0), (resolution, 1))
    Xs[:, d] = xs
    return xs, Xs


def plot_fit(m, ax=None, plot_limits=None, resolution=200, plot_data=True,
             plot_raw=False, visible_dims=None, samples=0, lower=2.5, upper=97.5,
             Y_metadata=None, **kw):
    """1-D GP fit: mean + confidence band + data. GPy: m.plot()."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(8, 4))
    xs, Xs = _grid_for(m, plot_limits, resolution, visible_dims)
    if plot_raw:
        mu, var = m.predict_noiseless(Xs) if hasattr(m, "predict_noiseless") else m.predict(Xs)
        lo_q, hi_q = None, None
    else:
        mu, var = m.predict(Xs, Y_metadata=Y_metadata) if Y_metadata else m.predict(Xs)
    try:
        qs = m.predict_quantiles(Xs, (lower, upper), Y_metadata=Y_metadata) if Y_metadata else m.predict_quantiles(Xs, (lower, upper))
        lo_q, hi_q = np.asarray(qs[0]), np.asarray(qs[1])
    except Exception:
        sd = np.sqrt(np.asarray(var))
        lo_q, hi_q = mu - 1.96 * sd, mu + 1.96 * sd
    ax.fill_between(xs, lo_q[:, 0], hi_q[:, 0], alpha=0.3, color=BLUE_LIGHT, lw=0,
                    label="confidence")
    ax.plot(xs, np.asarray(mu)[:, 0], color=BLUE, lw=2, label="mean")
    if samples:
        fs = m.posterior_samples_f(Xs, size=samples)
        for i in range(samples):
            ax.plot(xs, fs[:, 0, i], color=BLUE, alpha=0.3, lw=0.8)
    if plot_data:
        d = (visible_dims or [0])[0]
        ax.plot(np.asarray(m.X)[:, d], np.asarray(m.Y)[:, 0], "x", color=GREY, mew=1.5,
                label="data")
    ax.legend(loc="best")
    return ax


def plot_data(m, ax=None, visible_dims=None, **kw):
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    d = (visible_dims or [0])[0]
    ax.plot(np.asarray(m.X)[:, d], np.asarray(m.Y)[:, 0], "x", color=GREY)
    return ax


def plot_latent(m, labels=None, ax=None, dims=(0, 1), **kw):
    """2-D latent space scatter with ARD-chosen dims. GPy: plot_latent."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    X = np.asarray(m.qX.mean) if hasattr(m, "qX") else np.asarray(m.latent_X)
    sens = np.asarray(m.kern.input_sensitivity())
    order = np.argsort(sens)[::-1]
    d0, d1 = order[0], (order[1] if X.shape[1] > 1 else order[0])
    if labels is None:
        ax.scatter(X[:, d0], X[:, d1], c=BLUE)
    else:
        labels = np.asarray(labels).reshape(-1)
        for lab in np.unique(labels):
            sel = labels == lab
            ax.scatter(X[sel, d0], X[sel, d1], label=str(lab))
        ax.legend()
    ax.set_xlabel(f"latent dim {d0}")
    ax.set_ylabel(f"latent dim {d1}")
    return ax


def plot_ARD(m, ax=None, **kw):
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots()
    sens = np.asarray(m.kern.input_sensitivity())
    ax.bar(np.arange(len(sens)), sens, color=BLUE)
    ax.set_xlabel("input dimension")
    ax.set_ylabel("ARD relevance")
    return ax


def plot_kernel(kern, ax=None, x=None, plot_limits=(-3.0, 3.0), resolution=200, **kw):
    """k(x, x') slice through x'=0. GPy: kernel_plots."""
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    if ax is None:
        _, ax = plt.subplots()
    xs = np.linspace(*plot_limits, resolution).reshape(-1, 1)
    Xs = np.tile(np.zeros(kern.input_dim), (resolution, 1))
    Xs[:, 0] = xs[:, 0]
    x0 = np.zeros((1, kern.input_dim)) if x is None else np.asarray(x).reshape(1, -1)
    K = np.asarray(kern.K(jnp.asarray(Xs), jnp.asarray(x0)))
    ax.plot(xs[:, 0], K[:, 0], color=BLUE, lw=2)
    ax.set_xlabel("x")
    ax.set_ylabel("k(x, 0)")
    return ax


def attach_plotting():
    """Inject plot methods onto model classes (GPy: plotting/__init__.py:59-130)."""
    from .core.gp import GP
    from .core.model import Model
    from .kern.kern import Kern
    from .models.gplvm import GPLVM, BayesianGPLVM

    GP.plot = plot_fit
    GP.plot_f = lambda m, **kw: plot_fit(m, plot_raw=True, **kw)
    GP.plot_data = plot_data
    GP.plot_ARD = plot_ARD
    Model.plot_ARD = plot_ARD
    Kern.plot = plot_kernel
    GPLVM.plot_latent = plot_latent
    BayesianGPLVM.plot_latent = plot_latent


attach_plotting()
