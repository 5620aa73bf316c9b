"""Tests for the last export-parity surfaces: VarDTC_minibatch streaming
bound, grid inference as a named class, TruncLinear_inf, MLPext /
PiecewiseLinear mappings, sde_* kernel names."""
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.core.variational import NormalPosterior
from gpy_tpu.inference import VarDTC, VarDTC_minibatch, GaussianGridInference
from gpy_tpu.likelihoods import Gaussian


def _toy(N=530, M=12, D=2, Q=3, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.random((N, Q)) * 3
    Y = np.sin(X[:, :1]) + 0.1 * rng.standard_normal((N, D))
    return X, Y, X[:M].copy()


def test_vardtc_minibatch_matches_vardtc_certain():
    X, Y, Z = _toy()
    k = gk.RBF(X.shape[1], ARD=True)
    lik = Gaussian(variance=0.1)
    p1, l1 = VarDTC().inference(k, jnp.asarray(X), jnp.asarray(Z), lik, jnp.asarray(Y))
    # batchsize does not divide N: exercises the zero-weight padding rows
    p2, l2 = VarDTC_minibatch(batchsize=128).inference(
        k, jnp.asarray(X), jnp.asarray(Z), lik, jnp.asarray(Y))
    assert abs(float(l1 - l2)) < 1e-5 * abs(float(l1))
    np.testing.assert_allclose(
        np.asarray(p1.woodbury_vector), np.asarray(p2.woodbury_vector), atol=1e-6)


def test_vardtc_minibatch_matches_vardtc_uncertain():
    X, Y, Z = _toy()
    rng = np.random.default_rng(1)
    N, Q = X.shape
    k = gk.RBF(Q, ARD=True)
    lik = Gaussian(variance=0.1)
    qX = NormalPosterior(rng.standard_normal((N, Q)), 0.1 + 0.1 * rng.random((N, Q)))
    _, l1 = VarDTC().inference(k, None, jnp.asarray(Z), lik, jnp.asarray(Y), qX=qX)
    _, l2 = VarDTC_minibatch(batchsize=100).inference(
        k, None, jnp.asarray(Z), lik, jnp.asarray(Y), qX=qX)
    assert abs(float(l1 - l2)) < 1e-5 * abs(float(l1))


def test_gaussian_grid_inference_matches_dense():
    rng = np.random.default_rng(2)
    x1 = np.sort(rng.random((7, 1)), 0) * 3
    x2 = np.sort(rng.random((5, 1)), 0) * 3
    Y = rng.standard_normal((7, 5))
    k1, k2 = gk.RBF(1), gk.Matern32(1)
    post, lm = GaussianGridInference().inference(
        [k1, k2], [jnp.asarray(x1), jnp.asarray(x2)], 0.3, jnp.asarray(Y))
    K = np.kron(np.asarray(k1.K(x1)), np.asarray(k2.K(x2))) + 0.3 * np.eye(35)
    y = Y.reshape(-1)
    sign, logdet = np.linalg.slogdet(K)
    ref = -0.5 * (35 * np.log(2 * np.pi) + logdet + y @ np.linalg.solve(K, y))
    assert abs(float(lm) - ref) < 1e-5 * abs(ref)
    np.testing.assert_allclose(
        np.asarray(post.alpha).reshape(-1), np.linalg.solve(K, y), atol=1e-6)


def test_trunclinear_inf_psd_and_diag():
    rng = np.random.default_rng(3)
    k = gk.TruncLinear_inf(2, (0.0, 2.0), ARD=True)
    X = rng.random((9, 2)) * 2
    K = np.asarray(k.K(X))
    np.testing.assert_allclose(np.diag(K), np.asarray(k.Kdiag(X)), atol=1e-6)
    np.testing.assert_allclose(K, K.T, atol=1e-12)
    assert np.linalg.eigvalsh(K).min() > -1e-8


def test_trunclinear_inf_in_model_checkgrad():
    from gpy_tpu.models import GPRegression

    rng = np.random.default_rng(4)
    X = rng.random((20, 2)) * 2
    Y = np.sin(X[:, :1]) + 0.05 * rng.standard_normal((20, 1))
    m = GPRegression(X, Y, kernel=gk.TruncLinear_inf(2, (0.0, 2.0), ARD=True))
    assert m.checkgrad()


def test_mlpext_mean_function_checkgrad():
    from gpy_tpu.models import GPRegression
    from gpy_tpu.mappings import MLPext

    rng = np.random.default_rng(5)
    X = rng.random((25, 2))
    Y = np.sin(3 * X[:, :1]) + 0.05 * rng.standard_normal((25, 1))
    mf = MLPext(2, 1, hidden_dims=[4, 3], activation="tanh")
    m = GPRegression(X, Y, mean_function=mf)
    assert m.checkgrad()


def test_piecewise_linear_values_and_grad():
    from gpy_tpu.mappings import PiecewiseLinear
    import jax

    pw = PiecewiseLinear(1, 1, values=[0.0, 1.0, 3.0], breaks=[0.0, 1.0, 2.0])
    xs = np.array([[-1.0], [0.5], [1.5], [4.0]])
    np.testing.assert_allclose(
        np.asarray(pw.f(xs)).ravel(), [-1.0, 0.5, 2.0, 5.0], atol=1e-12)
    g = pw.gradients_X(np.ones((4, 1)), xs)
    # slopes: 1 (left of range), 1 (first segment), 2 (second), 1 (right)
    np.testing.assert_allclose(np.asarray(g).ravel(), [1.0, 1.0, 2.0, 1.0], atol=1e-8)


def test_sde_named_kernels_run_statespace():
    from gpy_tpu.models import StateSpace

    rng = np.random.default_rng(6)
    t = np.sort(rng.random((40, 1)), 0) * 10
    y = np.sin(t) + 0.1 * rng.standard_normal((40, 1))
    k = gk.sde_Matern32(1) + gk.sde_White(1, variance=0.05)
    m = StateSpace(t, y, kernel=k)
    assert np.isfinite(float(m.log_likelihood()))
    assert gk.DiffGenomeKern is gk.DEtime


def test_infer_newX_tolerance_and_lbfgs():
    """infer_newX must stop early at tolerance and support lbfgs (reference
    InferenceX runs a real optimizer to convergence, inferenceX.py:1-173)."""
    import numpy as np
    from gpy_tpu.models import GPLVM

    rng = np.random.default_rng(0)
    Y = (rng.standard_normal((30, 2)) @ rng.standard_normal((2, 5))
         + 0.05 * rng.standard_normal((30, 5)))
    m = GPLVM(Y, 2)
    m.optimize(max_iters=30)
    Ynew = Y[:4] + 0.01 * rng.standard_normal((4, 5))

    Xmap, ll = m.infer_newX(Ynew, optimize_iters=500, tol=1e-8)
    assert m._infer_newX_iters < 500  # converged before the budget
    assert np.isfinite(ll) and Xmap.shape == (4, 2)

    Xl, ll_l = m.infer_newX(Ynew, optimize_iters=200, tol=1e-9,
                            optimizer="lbfgs")
    assert np.isfinite(ll_l) and Xl.shape == (4, 2)
    # lbfgs should reach at least the adam objective (both maximize ll)
    assert ll_l >= ll - 1.0

    # tol=0 restores the fixed-budget behavior
    m.infer_newX(Ynew, optimize_iters=25, tol=0)
    assert m._infer_newX_iters == 25
