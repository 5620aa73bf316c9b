"""Plot-DATA golden tests (VERDICT r1 item 10).

Reference: GPy/testing/test_plotting.py compares plot contents against
testing/baseline/*.npz. Here the 'recording' backend captures the arrays
behind every primitive; tests assert (a) semantic identities against the
model's own predict API and (b) exact regeneration against the committed
baselines. Regenerate with `python tests/plot_golden.py` after an
intentional change.
"""
import os

import numpy as np
import pytest

from plot_golden import BASELINE_DIR, record_all, flatten, _models

_recorded = None


def recorded():
    global _recorded
    if _recorded is None:
        _recorded = record_all()
    return _recorded


# --- semantic identities ----------------------------------------------------

def test_fit_mean_equals_predict():
    canvas = recorded()["reg_fit"]
    m = _models()["reg"]
    mean_calls = [d for d in canvas.arrays("plot") if d.get("label") == "mean"]
    assert len(mean_calls) == 1
    xs = mean_calls[0]["X"]
    mu, _ = m.predict(xs.reshape(-1, 1))
    np.testing.assert_allclose(mean_calls[0]["Y"], mu[:, 0], rtol=1e-8)


def test_fit_confidence_equals_quantiles():
    canvas = recorded()["reg_fit"]
    m = _models()["reg"]
    (band,) = canvas.arrays("fill_between")
    lo, hi = m.predict_quantiles(band["X"].reshape(-1, 1), (2.5, 97.5))
    np.testing.assert_allclose(band["lower"], lo[:, 0], rtol=1e-7)
    np.testing.assert_allclose(band["upper"], hi[:, 0], rtol=1e-7)


def test_fit_data_points_are_the_training_set():
    canvas = recorded()["reg_fit"]
    m = _models()["reg"]
    data_calls = [d for d in canvas.arrays("plot") if d.get("label") == "data"]
    assert len(data_calls) == 1
    np.testing.assert_allclose(data_calls[0]["X"], np.asarray(m.X)[:, 0])
    np.testing.assert_allclose(data_calls[0]["Y"], np.asarray(m.Y)[:, 0])


def test_sparse_fit_marks_inducing_points():
    canvas = recorded()["sparse_fit"]
    m = _models()["sparse"]
    (ind,) = canvas.arrays("scatter")
    np.testing.assert_allclose(np.sort(ind["X"]), np.sort(np.asarray(m.Z)[:, 0]))


def test_density_bands_are_nested():
    canvas = recorded()["reg_density"]
    (grad,) = canvas.arrays("fill_gradient")
    bands = grad["percentiles"]  # (10, resolution)
    assert bands.shape[0] == 10
    assert np.all(np.diff(bands, axis=0) >= -1e-12)  # 5th..95th monotone


def test_errorbars_centered_on_mean():
    canvas = recorded()["reg_errorbars"]
    m = _models()["reg"]
    (eb,) = canvas.arrays("yerrorbar")
    mu, _ = m.predict(np.asarray(m.X))
    np.testing.assert_allclose(eb["Y"], mu[:, 0], rtol=1e-8)
    assert np.all(eb["error"] > 0)


def test_classification_probs_in_unit_interval():
    canvas = recorded()["clf_fit"]
    mean_calls = [d for d in canvas.arrays("plot") if d.get("label") == "mean"]
    p = mean_calls[0]["Y"]
    assert np.all((p >= 0) & (p <= 1))


def test_latent_background_is_log_variance():
    canvas = recorded()["lvm_latent"]
    ims = canvas.arrays("imshow")
    assert len(ims) == 1 and ims[0]["Z"].shape == (20, 20)
    assert np.all(np.isfinite(ims[0]["Z"]))
    assert len(canvas.arrays("scatter")) >= 1  # latent scatter on top


def test_ard_bars_are_input_sensitivity():
    canvas = recorded()["lvm_ard"]
    m = _models()["lvm"]
    (bar,) = canvas.arrays("bar")
    np.testing.assert_allclose(bar["height"], np.asarray(m.kern.input_sensitivity()),
                               rtol=1e-8)


# --- regenerate-and-compare against committed baselines ---------------------

@pytest.mark.parametrize("name", ["reg_fit", "reg_density", "reg_errorbars",
                                  "sparse_fit", "clf_fit", "lvm_latent", "lvm_ard"])
def test_against_baseline(name):
    path = os.path.join(BASELINE_DIR, f"{name}.npz")
    assert os.path.exists(path), (
        f"baseline {name}.npz missing — run `python tests/plot_golden.py`")
    want = np.load(path)
    got = flatten(recorded()[name])
    assert set(got) == set(want.files), (
        f"plot structure changed for {name}: {sorted(set(got) ^ set(want.files))}")
    for k in want.files:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-8,
                                   err_msg=f"{name}:{k}")
