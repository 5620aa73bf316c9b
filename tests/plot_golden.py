"""Shared harness for plot-data golden tests.

Builds DETERMINISTIC models (fixed seeds, fixed hypers, no optimize) and
records the arrays every plot pushes at the backend via the 'recording'
plotting library. `python tests/plot_golden.py` regenerates the committed
baselines in tests/plot_baselines/*.npz (the reference's
testing/baseline/*.npz workflow, test_plotting.py:1-703, at the data level
instead of the pixel level).
"""
import os

import numpy as np

BASELINE_DIR = os.path.join(os.path.dirname(__file__), "plot_baselines")


def _models():
    import gpy_tpu.kern as gk
    from gpy_tpu.models import (
        GPRegression,
        SparseGPRegression,
        GPClassification,
        BayesianGPLVM,
    )

    rng = np.random.default_rng(42)
    X = np.linspace(0, 5, 30).reshape(-1, 1)
    Y = np.sin(X) + 0.15 * rng.standard_normal((30, 1))
    reg = GPRegression(X, Y, kernel=gk.RBF(1, variance=0.8, lengthscale=1.1),
                       noise_var=0.05)

    sparse = SparseGPRegression(X, Y, Z=X[::5].copy(), noise_var=0.05)
    sparse.kern.lengthscale = 1.3

    Xc = np.sort(rng.standard_normal((25, 1)), axis=0)
    Yc = (Xc[:, 0] > 0).astype(float).reshape(-1, 1)
    clf = GPClassification(Xc, Yc, kernel=gk.RBF(1, variance=2.0, lengthscale=0.8))

    Yl = np.column_stack([np.sin(np.linspace(0, 6, 25)),
                          np.cos(np.linspace(0, 6, 25)),
                          rng.standard_normal(25) * 0.1])
    lvm = BayesianGPLVM(Yl, 2, num_inducing=6)
    return {"reg": reg, "sparse": sparse, "clf": clf, "lvm": lvm}


def record_all():
    """-> {name: RecordingCanvas} for every golden plot."""
    import gpy_tpu.plotting as gplt
    from gpy_tpu.plotting import gpy_plot as gp

    # restore whatever library is ACTIVE in-process (an env-var default
    # would clobber a programmatically selected backend)
    prev = gplt._library_name[0] or os.environ.get("GPY_TPU_PLOTTING",
                                                   "matplotlib")
    gplt.change_plotting_library("recording")
    try:
        m = _models()
        out = {
            "reg_fit": gp.plot_fit(m["reg"], resolution=50),
            "reg_density": gp.plot_density(m["reg"], resolution=40),
            "reg_errorbars": gp.plot_errorbars_trainset(m["reg"]),
            "sparse_fit": gp.plot_fit(m["sparse"], resolution=50),
            "clf_fit": gp.plot_fit(m["clf"], resolution=40),
            "lvm_latent": gp.plot_latent(m["lvm"], resolution=20),
            "lvm_ard": gp.plot_ARD(m["lvm"]),
        }
    finally:
        gplt.change_plotting_library(prev)
    return out


def flatten(canvas):
    """RecordingCanvas -> {f"{i:02d}_{primitive}_{key}": array} for npz."""
    flat = {}
    for i, (name, d) in enumerate(canvas):
        for k, v in d.items():
            if isinstance(v, np.ndarray) and v.dtype.kind in "fiub":
                flat[f"{i:02d}_{name}_{k}"] = v
    return flat


def regenerate():
    os.makedirs(BASELINE_DIR, exist_ok=True)
    for name, canvas in record_all().items():
        np.savez(os.path.join(BASELINE_DIR, f"{name}.npz"), **flatten(canvas))
        print("wrote", name, "with", len(flatten(canvas)), "arrays")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    regenerate()
