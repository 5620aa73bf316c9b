"""EPDTC tests: with Z = X it must match dense EP; classification works."""
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu.kern as gk
from gpy_tpu.core.sparse_gp import SparseGP
from gpy_tpu.inference.ep import EP
from gpy_tpu.inference.epdtc import EPDTC
from gpy_tpu.likelihoods import Bernoulli
from gpy_tpu.core.gp import GP

rng = np.random.default_rng(77)


def _banana(n=30):
    X = rng.standard_normal((n, 2))
    Y = ((np.sin(2 * X[:, 0]) + 0.5 * X[:, 1]) > 0).astype(float).reshape(-1, 1)
    return X, Y


def test_epdtc_full_inducing_matches_dense_ep():
    X, Y = _banana(25)
    k1 = gk.RBF(2, variance=1.2, lengthscale=0.9)
    k2 = gk.RBF(2, variance=1.2, lengthscale=0.9)
    dense = GP(X, Y, k1, Bernoulli(), inference_method=EP(max_iters=200, delta=0.8), name="d")
    sparse = SparseGP(X, Y, X.copy(), k2, Bernoulli(),
                      inference_method=EPDTC(max_iters=200, delta=0.8), name="s")
    l1 = float(dense.log_likelihood())
    l2 = float(sparse.log_likelihood())
    assert l2 == pytest.approx(l1, rel=5e-3)
    p1, _ = dense.predict(X)
    p2, _ = sparse.predict(X)
    np.testing.assert_allclose(p1, p2, atol=2e-2)


def test_epdtc_checkgrad_and_optimize():
    X, Y = _banana(35)
    m = SparseGP(X, Y, X[::4].copy(), gk.RBF(2), Bernoulli(),
                 inference_method=EPDTC(), name="epdtc")
    assert m.checkgrad()
    m.optimize(max_iters=50)
    p, _ = m.predict(X)
    assert np.mean((p > 0.5) == (Y > 0.5)) > 0.7


def test_epdtc_alternated_mode():
    """Alternated EPDTC: sites frozen during optimize(), re-converged per
    call; optimum close to nested mode."""
    from gpy_tpu.models import SparseGPClassification

    rng = np.random.default_rng(11)
    N = 50
    X = rng.standard_normal((N, 2))
    Y = ((np.sin(2 * X[:, 0]) + 0.5 * X[:, 1]) > 0).astype(float).reshape(-1, 1)
    from gpy_tpu.inference import EPDTC
    import gpy_tpu.kern as gk
    from gpy_tpu.core.sparse_gp import SparseGP
    from gpy_tpu.likelihoods import Bernoulli

    Z = X[:8].copy()
    m_a = SparseGP(X, Y, Z, gk.RBF(2), Bernoulli(),
                   inference_method=EPDTC(ep_mode="alternated"), name="a")
    m_n = SparseGP(X, Y, Z, gk.RBF(2), Bernoulli(),
                   inference_method=EPDTC(ep_mode="nested"), name="n")
    f0 = float(m_a.objective_function())
    for _ in range(3):
        m_a.optimize(max_iters=30)
    f1 = float(m_a.objective_function())
    assert f1 < f0   # each alternation round improves the evidence
    m_n.optimize(max_iters=90)
    # the two schemes need not land on the same optimum (GPy's alternated
    # mode routinely stops elsewhere); predictions must agree coarsely
    p_a, _ = m_a.predict(X)
    p_n, _ = m_n.predict(X)
    assert np.mean(np.abs(np.asarray(p_a) - np.asarray(p_n))) < 0.15
    assert np.mean((np.asarray(p_a) > 0.5) == (Y > 0.5)) > 0.75


def test_epdtc_site_serialization_resume():
    """Deserialized EPDTC model reuses stored converged sites (GPy
    `loading` semantics): identical predictions with convergence poisoned."""
    X, Y = _banana(25)
    m = SparseGP(X, Y, X[::3].copy(), gk.RBF(2), Bernoulli(),
                 inference_method=EPDTC(), name="epdtc_ser")
    p0, v0 = m.predict(X)
    assert m.inference_method._site_cache is not None
    m2 = type(m).from_dict(m.to_dict())
    assert m2.inference_method._loading is True
    m2.inference_method.max_iters = 0  # any re-convergence would be obvious
    p1, v1 = m2.predict(X)
    np.testing.assert_allclose(p0, p1, rtol=1e-8)
    np.testing.assert_allclose(v0, v1, rtol=1e-8)
