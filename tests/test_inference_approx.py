"""Approximate inference tests: Laplace & EP.

Mirrors GPy/testing/test_inference.py:57-235 — the key oracle is *method
equivalence*: with a Gaussian likelihood, Laplace and EP must reproduce exact
inference (log-marginal and posterior); for classification, EP ~ Laplace and
both must pass gradient checks and produce calibrated predictive probs.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpy_tpu.core.gp import GP
from gpy_tpu.inference import ExactGaussianInference, Laplace, EP
from gpy_tpu.likelihoods import Gaussian, Bernoulli, StudentT, Poisson
from gpy_tpu.models import GPClassification, GPClassificationLaplace, GPRegression
import gpy_tpu.kern as gk

rng = np.random.default_rng(3)


def _banana(n=40):
    X = rng.standard_normal((n, 2))
    f = np.sin(2 * X[:, 0]) + 0.5 * X[:, 1]
    Y = (f + 0.3 * rng.standard_normal(n) > 0).astype(float).reshape(-1, 1)
    return X, Y


def test_laplace_equals_exact_for_gaussian():
    """Gaussian likelihood: the Laplace approximation is exact (GPy
    test_inference.py pattern)."""
    X = np.linspace(0, 4, 18).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((18, 1))
    lik = Gaussian(variance=0.1)
    k = gk.RBF(1, variance=1.3, lengthscale=0.8)
    exact_post, exact_lml = ExactGaussianInference().inference(k, jnp.asarray(X), lik, jnp.asarray(Y))
    lap_post, lap_lml = Laplace().inference(k, jnp.asarray(X), lik, jnp.asarray(Y))
    assert float(lap_lml) == pytest.approx(float(exact_lml), rel=1e-6)
    mu1, v1 = exact_post._raw_predict(k, jnp.asarray([[1.5]]), jnp.asarray(X))
    mu2, v2 = lap_post._raw_predict(k, jnp.asarray([[1.5]]), jnp.asarray(X))
    assert float(mu1[0, 0]) == pytest.approx(float(mu2[0, 0]), rel=1e-5)
    assert float(v1[0, 0]) == pytest.approx(float(v2[0, 0]), rel=1e-4)


def test_ep_equals_exact_for_gaussian():
    X = np.linspace(0, 4, 15).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((15, 1))
    lik = Gaussian(variance=0.2)
    k = gk.RBF(1, variance=1.0, lengthscale=1.0)
    exact_post, exact_lml = ExactGaussianInference().inference(k, jnp.asarray(X), lik, jnp.asarray(Y))
    ep_post, ep_lml = EP(max_iters=200, delta=1.0).inference(k, jnp.asarray(X), lik, jnp.asarray(Y))
    # note exact inference adds 1e-8 observation jitter; EP adds 1e-8 kernel jitter
    assert float(ep_lml) == pytest.approx(float(exact_lml), rel=1e-5)
    mu1, v1 = exact_post._raw_predict(k, jnp.asarray([[2.0]]), jnp.asarray(X))
    mu2, v2 = ep_post._raw_predict(k, jnp.asarray([[2.0]]), jnp.asarray(X))
    assert float(mu1[0, 0]) == pytest.approx(float(mu2[0, 0]), rel=1e-4)
    assert float(v1[0, 0]) == pytest.approx(float(v2[0, 0]), rel=1e-3)


def test_classification_ep_checkgrad():
    X, Y = _banana(25)
    m = GPClassification(X, Y)
    assert m.checkgrad()


def test_classification_laplace_checkgrad():
    X, Y = _banana(25)
    m = GPClassificationLaplace(X, Y)
    assert m.checkgrad()


def test_classification_ep_vs_laplace_predictions():
    X, Y = _banana(50)
    m1 = GPClassification(X, Y)
    m2 = GPClassificationLaplace(X, Y)
    p1, _ = m1.predict(X)
    p2, _ = m2.predict(X)
    # both are approximations of the same posterior; should agree coarsely
    assert np.mean(np.abs(p1 - p2)) < 0.12
    # and classify training data better than chance
    acc = np.mean((p1 > 0.5) == (Y > 0.5))
    assert acc > 0.7


def test_classification_optimize():
    X, Y = _banana(40)
    m = GPClassification(X, Y)
    ll0 = float(m.log_likelihood())
    m.optimize(max_iters=50)
    assert float(m.log_likelihood()) >= ll0 - 1e-6
    p, _ = m.predict(X)
    assert np.mean((p > 0.5) == (Y > 0.5)) > 0.75


def test_laplace_studentt_regression():
    """StudentT + Laplace (non-log-concave path). GPy test_model.py pattern."""
    n = 25
    X = np.linspace(0, 4, n).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    Y[5] += 3.0  # outlier
    lik = StudentT(deg_free=4.0, sigma2=0.1)
    m = GP(X, Y, gk.RBF(1), lik, inference_method=Laplace(), name="tgp")
    assert m.checkgrad()
    m.optimize(max_iters=80)
    mu, _ = m.predict(X, include_likelihood=False)
    # robust fit: the outlier point is not chased
    assert abs(mu[5, 0] - np.sin(X[5, 0])) < 1.0


def test_laplace_poisson_counts():
    n = 30
    X = np.linspace(0, 4, n).reshape(-1, 1)
    rate = np.exp(np.sin(X) + 1.0)
    Y = rng.poisson(rate).astype(float)
    m = GP(X, Y, gk.RBF(1), Poisson(), inference_method=Laplace(), name="poisgp")
    assert m.checkgrad()
    m.optimize(max_iters=80)
    mu, _ = m.predict(X)  # predictive mean of counts
    assert np.corrcoef(mu[:, 0], rate[:, 0])[0, 1] > 0.8


def test_ep_poisson_quadrature_moments():
    """EP with quadrature-based moment matching (non-analytic likelihood)."""
    n = 20
    X = np.linspace(0, 4, n).reshape(-1, 1)
    Y = rng.poisson(np.exp(np.sin(X))).astype(float)
    m = GP(X, Y, gk.RBF(1), Poisson(), inference_method=EP(max_iters=80, delta=0.5), name="poisep")
    ll = float(m.log_likelihood())
    assert np.isfinite(ll)
    assert m.checkgrad()


def test_heaviside_ep_moments_and_classification():
    """Analytic truncated-Gaussian EP moments for the Heaviside link.
    Reference: GPy bernoulli.py:80-85 attempts these but references an
    undefined variable (`a`) and crashes; here they are exact."""
    import jax.numpy as jnp
    from scipy.stats import norm as sn
    from gpy_tpu.likelihoods import Bernoulli, link_functions
    lik = Bernoulli(gp_link=link_functions.Heaviside())
    for (y, tau, v) in [(1.0, 2.0, 1.0), (0.0, 0.5, -0.3), (1.0, 1.0, -2.0)]:
        mu, s2 = v / tau, 1 / tau
        s = 2 * y - 1
        # truncated-Gaussian oracle
        z = s * mu / np.sqrt(s2)
        ratio = sn.pdf(z) / sn.cdf(z)
        m1 = mu + s * np.sqrt(s2) * ratio
        m2 = s2 * (1 - ratio * (z + ratio))
        logZ, mh, vh = [float(x) for x in lik.moments_match_ep(
            jnp.asarray(y), jnp.asarray(tau), jnp.asarray(v))]
        assert abs(logZ - sn.logcdf(z)) < 1e-10
        assert abs(m1 - mh) < 1e-10 and abs(m2 - vh) < 1e-9
    # end-to-end: noise-free-link classification is exact on separable data
    from gpy_tpu.core.gp import GP
    from gpy_tpu.inference import EP
    from gpy_tpu.kern import RBF
    from gpy_tpu.util import datasets
    data = datasets.toy_linear_1d_classification(seed=0)
    Y = data["Y"][:, 0:1]
    m = GP(data["X"], Y, RBF(1), Bernoulli(gp_link=link_functions.Heaviside()),
           inference_method=EP(), name="heaviside_gpc")
    m.optimize(max_iters=30)
    p, _ = m.predict(np.asarray(m.X))
    assert np.mean((p > 0.5) == (Y > 0.5)) > 0.95


# --- LaplaceBlock (GPy laplace.py:355-502) ----------------------------------
def test_laplace_block_matches_diagonal_laplace():
    """With a diagonal-Hessian likelihood, LaplaceBlock == Laplace exactly
    (the block path embeds diag(W); same mode, same evidence)."""
    from gpy_tpu.inference import LaplaceBlock
    X, Y = _banana(24)
    k = gk.RBF(2, variance=0.9, lengthscale=1.2)
    lik = Bernoulli()
    p1, l1 = Laplace().inference(k, jnp.asarray(X), lik, jnp.asarray(Y))
    p2, l2 = LaplaceBlock().inference(k, jnp.asarray(X), lik, jnp.asarray(Y))
    assert float(l2) == pytest.approx(float(l1), rel=1e-6, abs=1e-6)
    Xs = jnp.asarray(rng.standard_normal((5, 2)))
    mu1, v1 = p1._raw_predict(k, Xs, jnp.asarray(X))
    mu2, v2 = p2._raw_predict(k, Xs, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(mu2), np.asarray(mu1), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v1), rtol=1e-4, atol=1e-6)


def test_laplace_block_coupled_likelihood():
    """A genuinely coupled likelihood (pairwise quadratic coupling of latents):
    block Newton must find the analytic Gaussian-posterior evidence.

    With log p(y|f) = -0.5 f' P f + y' f  (P full PD), the Laplace
    approximation is exact: log Z = log N(b; 0, K + P^{-1}) + const-terms
    evaluated analytically below.
    """
    from gpy_tpu.inference import LaplaceBlock
    from gpy_tpu.likelihoods import Likelihood

    n = 12
    A = rng.standard_normal((n, n)) * 0.2
    P = A @ A.T + np.eye(n)  # PD coupling
    yv = rng.standard_normal((n, 1))

    class CoupledQuadratic(Likelihood):
        def logpdf(self, f, y, Y_metadata=None):
            Pj = jnp.asarray(P, dtype=f.dtype)
            return -0.5 * jnp.sum(f * (Pj @ f)) + jnp.sum(y * f)

        def d_logpdf_df(self, f, y, Y_metadata=None):
            return -jnp.asarray(P, dtype=f.dtype) @ f + y

        def d2_logpdf_df2_block(self, f, y, Y_metadata=None):
            return -jnp.asarray(P, dtype=f.dtype) * jnp.ones_like(f[:1, :1])

    X = rng.standard_normal((n, 1))
    k = gk.RBF(1, variance=1.1, lengthscale=0.7)
    K = np.asarray(k.K(jnp.asarray(X))) + 1e-8 * np.eye(n)
    post, lml = LaplaceBlock().inference(
        k, jnp.asarray(X), CoupledQuadratic(), jnp.asarray(yv))

    # analytic: psi(f) = -.5 f'(K^-1+P)f + y'f ; logZ = .5 y'(K^-1+P)^-1 y
    #           - .5 logdet(I + K P)
    H = np.linalg.inv(K) + P
    fhat = np.linalg.solve(H, yv)
    logZ = 0.5 * float((yv.T @ fhat)[0, 0]) - 0.5 * np.linalg.slogdet(np.eye(n) + K @ P)[1]
    assert float(lml) == pytest.approx(logZ, rel=1e-5, abs=1e-5)


def test_ep_alternated_mode():
    """GPy's default ep_mode='alternated' (expectation_propagation.py:188-213):
    sites converge once per optimize() call and are held fixed while the
    hyperparameters move. Re-running optimize re-converges the sites; the
    final objective must be close to the nested-mode optimum."""
    from gpy_tpu.core.gp import GP
    import gpy_tpu.kern as gk

    X, Y = _banana(60)
    m_alt = GP(X, Y, gk.RBF(2), Bernoulli(),
               inference_method=EP(ep_mode="alternated"), name="alt")
    m_nest = GP(X, Y, gk.RBF(2), Bernoulli(),
                inference_method=EP(ep_mode="nested"), name="nest")
    f0 = float(m_alt.objective_function())
    for _ in range(3):  # the GPy pattern: alternate EP <-> hyper steps
        m_alt.optimize(max_iters=40)
    f1 = float(m_alt.objective_function())
    assert f1 < f0
    m_nest.optimize(max_iters=120)
    f_nest = float(m_nest.objective_function())
    assert abs(f1 - f_nest) < 0.05 * abs(f_nest) + 1.0
    # predictions agree between the two modes at their optima
    Xs = rng.standard_normal((6, 2))
    p1, _ = m_alt.predict(Xs)
    p2, _ = m_nest.predict(Xs)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0.1)


# --- EP at scale + robustness (VERDICT r1 item 6; GPy
# expectation_propagation.py:286-358 damped loop, :404-441 site persistence)

def test_ep_near_separable_n500():
    """Parallel-damped EP with oscillation back-off must converge on a
    near-separable labeling at N=500 (where undamped parallel updates
    oscillate)."""
    n = 500
    X = np.sort(rng.standard_normal((n, 1)), axis=0)
    Y = (X[:, 0] > 0.0).astype(float).reshape(-1, 1)  # exactly separable
    m = GPClassification(X, Y, kernel=gk.RBF(1, variance=5.0, lengthscale=0.5))
    lml = float(m.log_likelihood())
    assert np.isfinite(lml)
    p, _ = m.predict(X)
    acc = np.mean((p[:, 0] > 0.5) == (Y[:, 0] > 0.5))
    assert acc > 0.97
    # probabilities stay calibrated-ish away from the boundary
    assert np.all(p[np.abs(X[:, 0]) > 1.0, 0][X[np.abs(X[:, 0]) > 1.0, 0] > 0] > 0.8)


def test_ep_power_eta_converges():
    """Power EP (eta<1) on a hard labeling: finite evidence, sensible preds,
    and close to the eta=1 answer on an easy dataset."""
    n = 200
    X = np.sort(rng.standard_normal((n, 1)), axis=0)
    Y = (np.sin(2 * X[:, 0]) + 0.1 * rng.standard_normal(n) > 0).astype(float).reshape(-1, 1)
    m1 = GPClassification(X, Y, inference_method=EP(eta=1.0, max_iters=100))
    m2 = GPClassification(X, Y, inference_method=EP(eta=0.7, max_iters=100))
    l1, l2 = float(m1.log_likelihood()), float(m2.log_likelihood())
    assert np.isfinite(l1) and np.isfinite(l2)
    p1, _ = m1.predict(X)
    p2, _ = m2.predict(X)
    assert np.mean(np.abs(p1 - p2)) < 0.05


def test_ep_site_serialization_resume():
    """A deserialized EP model reuses stored converged sites (GPy `loading`
    flag, expectation_propagation.py:188-213): identical predictions with no
    re-convergence."""
    X, Y = _banana(30)
    m = GPClassification(X, Y)
    p0, v0 = m.predict(X)
    assert m.inference_method._site_cache is not None  # converged eagerly
    d = m.to_dict()
    m2 = type(m).from_dict(d)
    assert m2.inference_method._loading is True
    tau_a = np.asarray(m.inference_method._site_cache[1])
    tau_b = np.asarray(m2.inference_method._site_cache[1])
    np.testing.assert_allclose(tau_a, tau_b, rtol=1e-12)
    # poison convergence so any re-run would be obvious
    m2.inference_method.max_iters = 0
    p1, v1 = m2.predict(X)
    np.testing.assert_allclose(p0, p1, rtol=1e-8)
    np.testing.assert_allclose(v0, v1, rtol=1e-8)


def test_laplace_psd_chol_path_matches_lu():
    """Log-concave likelihoods route Newton through chol(B); must match the
    general LU path to machine precision (value, gradient, prediction)."""
    from gpy_tpu.core.gp import GP
    from gpy_tpu.inference.laplace import Laplace
    from gpy_tpu.kern import RBF
    from gpy_tpu.likelihoods import Bernoulli

    rng = np.random.default_rng(7)
    n = 80
    X = rng.standard_normal((n, 2))
    Y = (X[:, :1] + 0.3 * rng.standard_normal((n, 1)) > 0).astype(float)
    m_lu = GP(X, Y, RBF(2), Bernoulli(), inference_method=Laplace(psd_W=False))
    m_ch = GP(X, Y, RBF(2), Bernoulli(), inference_method=Laplace(psd_W=True))
    # auto-detection picks the chol path for Bernoulli (log_concave = True)
    assert Laplace()._psd(Bernoulli()) is True
    np.testing.assert_allclose(float(m_lu.log_likelihood()),
                               float(m_ch.log_likelihood()), rtol=1e-12)
    np.testing.assert_allclose(m_lu.objective_function_gradients(),
                               m_ch.objective_function_gradients(), atol=1e-7)
    p_lu, _ = m_lu.predict(X[:6])
    p_ch, _ = m_ch.predict(X[:6])
    np.testing.assert_allclose(p_lu, p_ch, atol=1e-10)
