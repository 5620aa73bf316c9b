"""Backend-agnostic model plots.

Reference: GPy/plotting/gpy_plot/ (gp_plots.py: plot/plot_f/plot_mean/
plot_confidence/plot_density/plot_samples/plot_errorbars_trainset;
data_plots.py: plot_data/plot_data_error/plot_inducing; latent_plots.py:
plot_latent/plot_latent_scatter/plot_magnification; kernel_plots.py:
plot covariance + plot_ARD). All drawing goes through the registered
backend (see __init__.change_plotting_library).
"""
from __future__ import annotations

import numpy as np

from . import tango


def _lib():
    from . import plotting_library

    return plotting_library()


def _grid_for(m, plot_limits=None, resolution=200, visible_dims=None):
    X = np.asarray(m.X)
    d = (visible_dims or [0])[0]
    if plot_limits is None:
        lo, hi = X[:, d].min(), X[:, d].max()
        pad = 0.15 * (hi - lo + 1e-9)
        lo, hi = lo - pad, hi + pad
    else:
        lo, hi = plot_limits
    xs = np.linspace(lo, hi, resolution)
    Xs = np.tile(X.mean(0), (resolution, 1))
    Xs[:, d] = xs
    return xs, Xs, d


def plot_mean(m, ax=None, plot_limits=None, resolution=200, visible_dims=None,
              color=tango.BLUE, label="mean", **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    xs, Xs, _ = _grid_for(m, plot_limits, resolution, visible_dims)
    mu, _ = m.predict(Xs)
    lib.plot(canvas, xs, np.asarray(mu)[:, 0], color=color, label=label, lw=2)
    return lib.show_canvas(canvas)


def plot_confidence(m, ax=None, plot_limits=None, resolution=200,
                    visible_dims=None, lower=2.5, upper=97.5,
                    color=tango.BLUE_LIGHT, label="confidence", **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    xs, Xs, _ = _grid_for(m, plot_limits, resolution, visible_dims)
    lo_q, hi_q = _quantiles(m, Xs, lower, upper)
    lib.fill_between(canvas, xs, lo_q[:, 0], hi_q[:, 0], color=color, label=label)
    return lib.show_canvas(canvas)


def plot_density(m, ax=None, plot_limits=None, resolution=200,
                 visible_dims=None, color=tango.BLUE_LIGHT, label="density", **kw):
    """Nested percentile bands 5..95 (GPy gp_plots.plot_density)."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    xs, Xs, _ = _grid_for(m, plot_limits, resolution, visible_dims)
    percs = [5, 15, 25, 35, 45, 55, 65, 75, 85, 95]
    bands = [np.asarray(m.predict_quantiles(Xs, (p,))[0])[:, 0] for p in percs]
    lib.fill_gradient(canvas, xs, bands, color=color, label=label)
    return lib.show_canvas(canvas)


def _quantiles(m, Xs, lower, upper, Y_metadata=None):
    try:
        qs = (m.predict_quantiles(Xs, (lower, upper), Y_metadata=Y_metadata)
              if Y_metadata else m.predict_quantiles(Xs, (lower, upper)))
        return np.asarray(qs[0]), np.asarray(qs[1])
    except Exception:
        mu, var = m.predict(Xs)
        sd = np.sqrt(np.asarray(var))
        return np.asarray(mu) - 1.96 * sd, np.asarray(mu) + 1.96 * sd


def plot_samples(m, ax=None, plot_limits=None, resolution=200,
                 visible_dims=None, samples=3, color=tango.BLUE, **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    xs, Xs, _ = _grid_for(m, plot_limits, resolution, visible_dims)
    fs = m.posterior_samples_f(Xs, size=samples)
    for i in range(samples):
        lib.plot(canvas, xs, np.asarray(fs)[:, 0, i], color=color, alpha=0.4, lw=0.9)
    return lib.show_canvas(canvas)


def plot_fit(m, ax=None, plot_limits=None, resolution=200, plot_data=True,
             plot_raw=False, visible_dims=None, samples=0, lower=2.5, upper=97.5,
             Y_metadata=None, **kw):
    """The flagship m.plot(): mean + confidence + data (+ samples).
    GPy: gp_plots.plot."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    xs, Xs, d = _grid_for(m, plot_limits, resolution, visible_dims)
    if plot_raw and hasattr(m, "predict_noiseless"):
        mu, var = m.predict_noiseless(Xs)
        sd = np.sqrt(np.asarray(var))
        lo_q, hi_q = np.asarray(mu) - 1.96 * sd, np.asarray(mu) + 1.96 * sd
    else:
        mu, _ = m.predict(Xs, Y_metadata=Y_metadata) if Y_metadata else m.predict(Xs)
        lo_q, hi_q = _quantiles(m, Xs, lower, upper, Y_metadata)
    lib.fill_between(canvas, xs, lo_q[:, 0], hi_q[:, 0], color=tango.BLUE_LIGHT,
                     label="confidence")
    lib.plot(canvas, xs, np.asarray(mu)[:, 0], color=tango.BLUE, lw=2, label="mean")
    if samples:
        fs = m.posterior_samples_f(Xs, size=samples)
        for i in range(samples):
            lib.plot(canvas, xs, np.asarray(fs)[:, 0, i], color=tango.BLUE,
                     alpha=0.3, lw=0.8)
    if plot_data:
        lib.plot(canvas, np.asarray(m.X)[:, d], np.asarray(m.Y)[:, 0], color=tango.GREY,
                 label="data", marker="x", lw=0, mew=1.5)
    if hasattr(m, "Z"):
        plot_inducing(m, ax=canvas, visible_dims=visible_dims)
    return lib.show_canvas(canvas)


def plot_data(m, ax=None, visible_dims=None, color=tango.GREY, label="data", **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    d = (visible_dims or [0])[0]
    lib.plot(canvas, np.asarray(m.X)[:, d], np.asarray(m.Y)[:, 0], color=color,
             label=label, marker="x", lw=0, mew=1.5)
    return lib.show_canvas(canvas)


def plot_data_error(m, ax=None, visible_dims=None, color=tango.GREY, **kw):
    """Error bars of the noise sd around the data (GPy data_plots.plot_errorbars)."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    d = (visible_dims or [0])[0]
    sd = float(np.sqrt(np.asarray(m.likelihood.variance))) if hasattr(m, "likelihood") else 0.0
    lib.yerrorbar(canvas, np.asarray(m.X)[:, d], np.asarray(m.Y)[:, 0],
                  np.full(m.X.shape[0], sd), color=color)
    return lib.show_canvas(canvas)


def plot_errorbars_trainset(m, ax=None, visible_dims=None, lower=2.5, upper=97.5, **kw):
    """Predictive quantile error bars AT the training inputs (GPy gp_plots)."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    d = (visible_dims or [0])[0]
    X = np.asarray(m.X)
    lo_q, hi_q = _quantiles(m, X, lower, upper)
    mu, _ = m.predict(X)
    err = np.stack([np.asarray(mu)[:, 0] - lo_q[:, 0], hi_q[:, 0] - np.asarray(mu)[:, 0]])
    lib.yerrorbar(canvas, X[:, d], np.asarray(mu)[:, 0], err, color=tango.RED)
    return lib.show_canvas(canvas)


def plot_inducing(m, ax=None, visible_dims=None, color=tango.RED, label="inducing", **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    d = (visible_dims or [0])[0]
    Z = np.asarray(m.Z)
    ymin = float(np.asarray(m.Y).min())
    lib.scatter(canvas, Z[:, d], np.full(Z.shape[0], ymin), color=color,
                label=label, marker="^")
    return lib.show_canvas(canvas)


# --- latent-space plots -------------------------------------------------------

def _latent_X(m):
    return np.asarray(m.qX.mean) if hasattr(m, "qX") else np.asarray(m.latent_X)


def _top_dims(m, X):
    sens = np.asarray(m.kern.input_sensitivity())
    order = np.argsort(sens)[::-1]
    d0 = order[0]
    d1 = order[1] if X.shape[1] > 1 else order[0]
    return d0, d1


def plot_latent_scatter(m, labels=None, ax=None, **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    X = _latent_X(m)
    d0, d1 = _top_dims(m, X)
    tango.reset()
    if labels is None:
        lib.scatter(canvas, X[:, d0], X[:, d1], color=tango.BLUE)
    else:
        labels = np.asarray(labels).reshape(-1)
        for lab in np.unique(labels):
            sel = labels == lab
            lib.scatter(canvas, X[sel, d0], X[sel, d1], color=tango.nextMedium(),
                        label=str(lab))
    try:
        canvas.set_xlabel(f"latent dim {d0}")
        canvas.set_ylabel(f"latent dim {d1}")
    except AttributeError:
        pass
    return lib.show_canvas(canvas)


def plot_latent(m, labels=None, ax=None, resolution=60, plot_scatter=True, **kw):
    """Latent scatter over a greyscale background of predictive magnitude
    (GPy latent_plots.plot_latent: the background shades by the log
    predictive variance across the latent plane)."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    X = _latent_X(m)
    d0, d1 = _top_dims(m, X)
    try:
        lo = X[:, [d0, d1]].min(0) - 0.5
        hi = X[:, [d0, d1]].max(0) + 0.5
        g0 = np.linspace(lo[0], hi[0], resolution)
        g1 = np.linspace(lo[1], hi[1], resolution)
        G0, G1 = np.meshgrid(g0, g1)
        Xg = np.tile(X.mean(0), (resolution * resolution, 1))
        Xg[:, d0] = G0.ravel()
        Xg[:, d1] = G1.ravel()
        _, var = m.predict(Xg)
        V = np.log(np.asarray(var)).mean(-1).reshape(resolution, resolution)
        lib.imshow(canvas, -V, extent=(lo[0], hi[0], lo[1], hi[1]), cmap="Greys",
                   alpha=0.6)
    except Exception:
        pass  # models without predict over latents still get the scatter
    if plot_scatter:
        plot_latent_scatter(m, labels=labels, ax=canvas)
    return lib.show_canvas(canvas)


def plot_magnification(m, labels=None, ax=None, resolution=60, **kw):
    """Latent scatter over the Riemannian magnification factor
    sqrt(det(G)) of the learned mapping (GPy latent_plots.plot_magnification
    via predict_wishart_embedding)."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    X = _latent_X(m)
    d0, d1 = _top_dims(m, X)
    lo = X[:, [d0, d1]].min(0) - 0.5
    hi = X[:, [d0, d1]].max(0) + 0.5
    g0 = np.linspace(lo[0], hi[0], resolution)
    g1 = np.linspace(lo[1], hi[1], resolution)
    G0, G1 = np.meshgrid(g0, g1)
    Xg = np.tile(X.mean(0), (resolution * resolution, 1))
    Xg[:, d0] = G0.ravel()
    Xg[:, d1] = G1.ravel()
    G = np.asarray(m.predict_wishart_embedding(Xg))
    mag = np.sqrt(np.maximum(np.linalg.det(G), 0.0)).reshape(resolution, resolution)
    lib.imshow(canvas, mag, extent=(lo[0], hi[0], lo[1], hi[1]), cmap="Greys",
               alpha=0.7)
    plot_latent_scatter(m, labels=labels, ax=canvas)
    return lib.show_canvas(canvas)


def plot_steepest_gradient_map(m, labels=None, ax=None, resolution=60, **kw):
    """Latent map shaded by which output dimension changes fastest
    (GPy latent_plots.plot_steepest_gradient_map)."""
    lib = _lib()
    canvas = lib.new_canvas(ax=ax)
    X = _latent_X(m)
    d0, d1 = _top_dims(m, X)
    lo = X[:, [d0, d1]].min(0) - 0.5
    hi = X[:, [d0, d1]].max(0) + 0.5
    g0 = np.linspace(lo[0], hi[0], resolution)
    g1 = np.linspace(lo[1], hi[1], resolution)
    G0, G1 = np.meshgrid(g0, g1)
    Xg = np.tile(X.mean(0), (resolution * resolution, 1))
    Xg[:, d0] = G0.ravel()
    Xg[:, d1] = G1.ravel()
    J, _ = m.predict_jacobian(Xg)
    steep = np.argmax(np.abs(np.asarray(J)).sum(1), axis=-1).reshape(resolution, resolution)
    lib.imshow(canvas, steep, extent=(lo[0], hi[0], lo[1], hi[1]), cmap="tab10",
               alpha=0.5)
    plot_latent_scatter(m, labels=labels, ax=canvas)
    return lib.show_canvas(canvas)


# --- kernel plots --------------------------------------------------------------

def plot_ARD(m, ax=None, color=tango.BLUE, **kw):
    lib = _lib()
    canvas = lib.new_canvas(ax=ax, xlabel="input dimension", ylabel="ARD relevance")
    sens = np.asarray(m.kern.input_sensitivity())
    lib.bar(canvas, np.arange(len(sens)), sens, color=color)
    return lib.show_canvas(canvas)


def plot_kernel(kern, ax=None, x=None, plot_limits=(-3.0, 3.0), resolution=200,
                color=tango.BLUE, **kw):
    """k(x, x0) slice (1-D) or k over a 2-D grid. GPy: kernel_plots.plot."""
    import jax.numpy as jnp

    lib = _lib()
    xs = np.linspace(*plot_limits, resolution).reshape(-1, 1)
    x0 = np.zeros((1, kern.input_dim)) if x is None else np.asarray(x).reshape(1, -1)
    if kern.input_dim >= 2:
        canvas = lib.new_canvas(ax=ax, xlabel="x0", ylabel="x1")
        r = int(np.sqrt(resolution)) * 2
        g = np.linspace(*plot_limits, r)
        G0, G1 = np.meshgrid(g, g)
        Xs = np.zeros((r * r, kern.input_dim))
        Xs[:, 0] = G0.ravel()
        Xs[:, 1] = G1.ravel()
        K = np.asarray(kern.K(jnp.asarray(Xs), jnp.asarray(x0))).reshape(r, r)
        lib.contour(canvas, g, g, K)
        return lib.show_canvas(canvas)
    canvas = lib.new_canvas(ax=ax, xlabel="x", ylabel="k(x, x0)")
    Xs = np.tile(np.zeros(kern.input_dim), (resolution, 1))
    Xs[:, 0] = xs[:, 0]
    K = np.asarray(kern.K(jnp.asarray(Xs), jnp.asarray(x0)))
    lib.plot(canvas, xs[:, 0], K[:, 0], color=color, lw=2)
    return lib.show_canvas(canvas)
