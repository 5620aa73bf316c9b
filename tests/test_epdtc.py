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
