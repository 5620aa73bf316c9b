"""SymbolicLikelihood: sympy log-pdf -> full likelihood surface
(VERDICT r2 missing #4; reference machinery: GPy/core/symbolic.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

sympy = pytest.importorskip("sympy")

from gpy_tpu.likelihoods import Gaussian, StudentT, SymbolicLikelihood


def _sym_gaussian():
    f, y = sympy.symbols("f y")
    s = sympy.Symbol("s", positive=True)
    return SymbolicLikelihood(
        -(y - f) ** 2 / (2 * s) - sympy.log(2 * sympy.pi * s) / 2,
        parameters={"s": 0.3}, conditional_mean=f, conditional_variance=s,
        name="symgauss")


def test_symbolic_gaussian_matches_closed_form():
    lik = _sym_gaussian()
    ref = Gaussian(variance=0.3)
    rng = np.random.default_rng(0)
    F = jnp.asarray(rng.standard_normal((6, 1)))
    Y = jnp.asarray(rng.standard_normal((6, 1)))
    np.testing.assert_allclose(np.asarray(lik.logpdf(F, Y)),
                               np.asarray(ref.logpdf(F, Y)), rtol=1e-10)
    # variational expectations (quadrature) vs the Gaussian closed form
    m = jnp.asarray(rng.standard_normal((6, 1)))
    v = jnp.asarray(0.2 + 0.3 * rng.random((6, 1)))
    ve_sym = lik.variational_expectations(Y, m, v)
    ve_ref = ref.variational_expectations(Y, m, v)
    np.testing.assert_allclose(np.asarray(ve_sym), np.asarray(ve_ref),
                               rtol=1e-6, atol=1e-8)
    # predictive density through quadrature
    lpd = lik.log_predictive_density(Y, m, v)
    lpd_ref = ref.log_predictive_density(Y, m, v)
    np.testing.assert_allclose(np.asarray(lpd), np.asarray(lpd_ref),
                               rtol=1e-5, atol=1e-6)


def test_symbolic_studentt_in_full_model():
    """End to end: a symbolic Student-t trains inside GPVariationalGaussian-
    Approximation-style inference (Laplace) with its dof/scale as params."""
    from gpy_tpu.models import GPRegression
    from gpy_tpu.core.gp import GP
    from gpy_tpu.inference.laplace import Laplace
    import gpy_tpu.kern as gk

    f, y = sympy.symbols("f y")
    s = sympy.Symbol("s", positive=True)
    nu = sympy.Integer(4)
    expr = (sympy.log(sympy.gamma((nu + 1) / 2) / (sympy.gamma(nu / 2)
            * sympy.sqrt(nu * sympy.pi * s)))
            - (nu + 1) / 2 * sympy.log(1 + (y - f) ** 2 / (nu * s)))
    lik = SymbolicLikelihood(expr, parameters={"s": 0.1})

    ref = StudentT(deg_free=4.0, sigma2=0.1)
    rng = np.random.default_rng(1)
    F = jnp.asarray(rng.standard_normal((5, 1)))
    Y = jnp.asarray(rng.standard_normal((5, 1)))
    np.testing.assert_allclose(np.asarray(lik.logpdf(F, Y)),
                               np.asarray(ref.logpdf(F, Y)), rtol=1e-6)

    X = rng.random((25, 1)) * 4
    Yd = np.sin(X) + 0.1 * rng.standard_normal((25, 1))
    m = GP(X, Yd, gk.RBF(1), lik, inference_method=Laplace())
    assert m.checkgrad(tolerance=1e-3)
    nl0 = -float(m.log_likelihood())
    m.optimize(max_iters=25)
    assert -float(m.log_likelihood()) < nl0


def test_symbolic_likelihood_pickle_roundtrip():
    import pickle

    lik = _sym_gaussian()
    l2 = pickle.loads(pickle.dumps(lik))
    F = jnp.asarray([[0.3]]); Y = jnp.asarray([[0.1]])
    np.testing.assert_allclose(np.asarray(l2.logpdf(F, Y)),
                               np.asarray(lik.logpdf(F, Y)))
