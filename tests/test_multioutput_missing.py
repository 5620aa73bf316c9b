"""MultioutputGP (derivative observations) + missing-data sparse models.

Oracles: derivative cross-covariances vs finite differences of the base
kernel; SparseGPMiniBatch == SparseGP likelihood when nothing is missing
(GPy test_minibatch.py:26-160 invariant); missing-data bound equals the sum
of per-dimension observed-row bounds.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.kern.multioutput_kern import DiffKern, MultioutputKern
from gpy_tpu.models.multioutput_gp import MultioutputGP
from gpy_tpu.models.sparse_gp_minibatch import SparseGPMiniBatch, BayesianGPLVMMiniBatch
from gpy_tpu.models.sparse_gp_regression import SparseGPRegression
from gpy_tpu.likelihoods import Gaussian
from gpy_tpu.util import multioutput

rng = np.random.default_rng(31)


def test_diffkern_matches_fd():
    base = gk.RBF(1, variance=1.4, lengthscale=0.8)
    dk = DiffKern(base, 0)
    X = rng.standard_normal((4, 1))
    X2 = rng.standard_normal((3, 1))
    eps = 1e-5
    # cross: cov(df/dx, f) = d k(x, x2) / dx
    C = np.asarray(dk.cross_K(jnp.asarray(X), jnp.asarray(X2), base_first=False))
    for i in range(4):
        for j in range(3):
            kp = float(base.K(jnp.asarray(X[i:i+1] + eps), jnp.asarray(X2[j:j+1]))[0, 0])
            km = float(base.K(jnp.asarray(X[i:i+1] - eps), jnp.asarray(X2[j:j+1]))[0, 0])
            assert C[i, j] == pytest.approx((kp - km) / (2 * eps), rel=1e-5, abs=1e-7)
    # deriv-deriv diagonal: var(df/dx) = v / l^2 for RBF
    Kdd = np.asarray(dk.K(jnp.asarray(X)))
    assert Kdd[0, 0] == pytest.approx(1.4 / 0.8**2, rel=1e-6)


def test_multioutput_gp_with_derivatives():
    """Observing f and f' jointly must sharpen the fit (GPy multioutput_gp)."""
    f = lambda x: np.sin(x)
    df = lambda x: np.cos(x)
    X1 = np.linspace(0, 4, 9).reshape(-1, 1)
    X2 = np.linspace(0, 4, 7).reshape(-1, 1)
    Y1 = f(X1)
    Y2 = df(X2)
    base = gk.RBF(1)
    m = MultioutputGP([X1, X2], [Y1, Y2], [base, DiffKern(base, 0)],
                      [Gaussian(variance=1e-4), Gaussian(variance=1e-4)])
    assert np.isfinite(float(m.log_likelihood()))
    m.optimize(max_iters=100)
    Xs = np.linspace(0.2, 3.8, 8).reshape(-1, 1)
    Xs_idx, _, _ = multioutput.build_XY([Xs], index=[0])
    mu, _ = m.predict(Xs_idx)
    assert np.sqrt(np.mean((mu - f(Xs)) ** 2)) < 0.05
    # derivative predictions too
    Xs_d, _, _ = multioutput.build_XY([Xs], index=[1])
    mud, _ = m.predict(Xs_d)
    assert np.sqrt(np.mean((mud - df(Xs)) ** 2)) < 0.1


def test_minibatch_equals_plain_when_no_missing():
    n = 25
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.hstack([np.sin(X), np.cos(X)]) + 0.1 * rng.standard_normal((n, 2))
    Z = X[::4].copy()
    plain = SparseGPRegression(X, Y, Z=Z.copy(), noise_var=0.3)
    mb = SparseGPMiniBatch(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.3),
                           missing_data=False)
    assert float(mb.log_likelihood()) == pytest.approx(float(plain.log_likelihood()), rel=1e-8)
    mb2 = SparseGPMiniBatch(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.3),
                            missing_data=True)
    assert float(mb2.log_likelihood()) == pytest.approx(float(plain.log_likelihood()), rel=1e-6)


def test_missing_data_bound_equals_per_dim_sum():
    n = 20
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.hstack([np.sin(X), np.cos(X)]) + 0.1 * rng.standard_normal((n, 2))
    Y[3:8, 0] = np.nan
    Y[12:15, 1] = np.nan
    Z = X[::4].copy()
    mb = SparseGPMiniBatch(X, Y, Z.copy(), gk.RBF(1), Gaussian(variance=0.3),
                           missing_data=True)
    total = float(mb.log_likelihood())
    # per-dimension reference: plain VarDTC on the observed rows of each dim
    ref = 0.0
    for d in range(2):
        obs = ~np.isnan(Y[:, d])
        md = SparseGPRegression(X[obs], Y[obs, d:d+1], Z=Z.copy(), noise_var=0.3)
        ref += float(md.log_likelihood())
    assert total == pytest.approx(ref, rel=1e-6)


def test_missing_data_checkgrad():
    n = 15
    X = np.linspace(0, 5, n).reshape(-1, 1)
    Y = np.hstack([np.sin(X), np.cos(X)]) + 0.1 * rng.standard_normal((n, 2))
    Y[2:5, 0] = np.nan
    mb = SparseGPMiniBatch(X, Y, X[::3].copy(), gk.RBF(1), Gaussian(variance=0.3),
                           missing_data=True)
    assert mb.checkgrad()


def test_bgplvm_minibatch_missing():
    Yfull = np.sin(rng.standard_normal((20, 2))) @ rng.standard_normal((2, 5))
    Y = Yfull + 0.05 * rng.standard_normal((20, 5))
    Y[::4, 0] = np.nan
    m = BayesianGPLVMMiniBatch(Y, 2, num_inducing=6)
    assert np.isfinite(float(m.log_likelihood()))
    assert m.checkgrad()


def test_gp_multiout_regression():
    from gpy_tpu.models.gp_multiout_regression import GPMultioutRegression

    n, D = 30, 3
    X = np.linspace(0, 5, n).reshape(-1, 1)
    F = np.sin(X)
    # three correlated outputs from one latent function
    Y = np.hstack([F, 0.7 * F, -0.5 * F]) + 0.05 * rng.standard_normal((n, D))
    m = GPMultioutRegression(X, Y, Xr_dim=2, num_inducing=(12, 3), init="rand")
    ll0 = float(m.log_likelihood())
    m.optimize(max_iters=300)
    assert float(m.log_likelihood()) > ll0
    assert m.output_embedding.shape == (D, 2)
    mu, var = m.predict(X)
    assert mu.shape == (n, D) and var.shape == (n, D)
    assert np.all(np.isfinite(mu)) and np.all(var > 0)
    # correlated outputs (0,1) should embed nearer than anticorrelated (0,2)
    Xr = m.output_embedding
    B = np.asarray(m.kern_row.K(np.asarray(Xr)))
    assert B[0, 1] > B[0, 2]


def test_gp_multiout_regression_md():
    from gpy_tpu.models.gp_multiout_regression import GPMultioutRegressionMD

    n = 25
    X1 = np.linspace(0, 5, n).reshape(-1, 1)
    Y1 = np.sin(X1) + 0.05 * rng.standard_normal((n, 1))
    X2 = X1[::2]
    Y2 = 0.8 * np.sin(X2) + 0.05 * rng.standard_normal((X2.shape[0], 1))
    X = np.vstack([X1, X2])
    Y = np.vstack([Y1, Y2])
    indexD = np.r_[np.zeros(n, dtype=int), np.ones(X2.shape[0], dtype=int)]
    m = GPMultioutRegressionMD(X, Y, indexD, Xr_dim=1, num_inducing=(10, 2),
                               init="rand")
    assert np.isfinite(float(m.log_likelihood()))
    m.optimize(max_iters=100)
    assert np.isfinite(float(m.log_likelihood()))
    mu, var = m.predict(X1)
    assert mu.shape == (n, 2) and np.all(np.isfinite(mu)) and np.all(var > 0)


def test_cluster_with_offset():
    from gpy_tpu.util.cluster_with_offset import cluster

    # two groups of series: sin-shaped and cos-shaped
    x = np.linspace(0, 5, 15).reshape(-1, 1)
    inputs = [x.copy() for _ in range(4)]
    data = [
        np.sin(x.T) + 0.05 * rng.standard_normal((1, 15)),
        np.sin(x.T + 0.3) + 0.05 * rng.standard_normal((1, 15)),
        3 + np.cos(2 * x.T) + 0.05 * rng.standard_normal((1, 15)),
        3 + np.cos(2 * x.T + 0.2) + 0.05 * rng.standard_normal((1, 15)),
    ]
    clusters = cluster(data, inputs)
    # the two sin series should end up together, separate from the cos pair
    sets = [set(c) for c in clusters]
    assert any({0, 1} <= s and not ({2, 3} & s) for s in sets) or any(
        {2, 3} <= s and not ({0, 1} & s) for s in sets
    )
