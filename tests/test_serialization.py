"""Serialization round-trips (GPy/testing/test_serialization.py pattern:
to_dict/from_dict for kernels, likelihoods, models; save/load files)."""
import os
import numpy as np
import jax.numpy as jnp
import pytest

import gpy_tpu
import gpy_tpu.kern as gk
import gpy_tpu.likelihoods as gl
from gpy_tpu.models import GPRegression, GPClassification
from gpy_tpu.models.sparse_gp_regression import SparseGPRegression
from gpy_tpu.util.serialization import to_dict, from_dict, save_model, load_model

rng = np.random.default_rng(9)


@pytest.mark.parametrize("make", [
    lambda: gk.RBF(2, variance=1.5, lengthscale=[0.5, 2.0], ARD=True),
    lambda: gk.Matern32(1) + gk.White(1),
    lambda: gk.Linear(2) * gk.Bias(2),
    lambda: gk.StdPeriodic(1, period=2.5),
    lambda: gk.Coregionalize(1, output_dim=3, rank=2),
], ids=["rbf_ard", "sum", "prod", "periodic", "coreg"])
def test_kernel_roundtrip(make):
    k = make()
    X = rng.standard_normal((6, k.input_dim))
    K1 = np.asarray(k.K(jnp.asarray(X)))
    k2 = from_dict(to_dict(k))
    K2 = np.asarray(k2.K(jnp.asarray(X)))
    np.testing.assert_allclose(K1, K2, atol=1e-12)
    # params still linked and mutable
    names1 = [p for p, _, _ in k.named_params()]
    names2 = [p for p, _, _ in k2.named_params()]
    assert names1 == names2


@pytest.mark.parametrize("make", [
    lambda: gl.Gaussian(variance=0.3),
    lambda: gl.Bernoulli(),
    lambda: gl.StudentT(deg_free=4.0, sigma2=1.2),
    lambda: gl.Poisson(),
], ids=["gauss", "bern", "studentt", "poisson"])
def test_likelihood_roundtrip(make):
    l = make()
    l2 = from_dict(to_dict(l))
    f = jnp.asarray(rng.standard_normal((4, 1)))
    y = jnp.asarray(np.abs(rng.standard_normal((4, 1))) + 0.5)
    if isinstance(l, gl.Bernoulli):
        y = (y > 1.0).astype(float)
    np.testing.assert_allclose(np.asarray(l.logpdf(f, y)), np.asarray(l2.logpdf(f, y)), atol=1e-12)


def test_model_roundtrip_file(tmp_path):
    X = np.linspace(0, 5, 20).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((20, 1))
    m = GPRegression(X, Y)
    m.kern.lengthscale.fix(1.3)
    m.kern.variance.set_prior(gpy_tpu.priors.Gamma(2.0, 1.0))
    m.optimize(max_iters=30)
    path = str(tmp_path / "model.json.gz")
    save_model(m, path)
    m2 = load_model(path)
    assert float(m2.log_likelihood()) == pytest.approx(float(m.log_likelihood()), rel=1e-10)
    mu1, v1 = m.predict(X)
    mu2, v2 = m2.predict(X)
    np.testing.assert_allclose(mu1, mu2, atol=1e-10)
    # fixed flag and prior survived
    assert m2.kern._specs["lengthscale"].fixed
    assert m2.kern._specs["variance"].prior is not None
    # loaded model still optimizes
    m2.optimize(max_iters=10)


def test_sparse_model_roundtrip(tmp_path):
    X = np.linspace(0, 5, 25).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rng.standard_normal((25, 1))
    m = SparseGPRegression(X, Y, num_inducing=6)
    path = save_model(m, str(tmp_path / "sparse.json.gz"))
    m2 = load_model(path)
    assert float(m2.log_likelihood()) == pytest.approx(float(m.log_likelihood()), rel=1e-10)


def test_classification_roundtrip(tmp_path):
    X = rng.standard_normal((20, 2))
    Y = (X[:, :1] > 0).astype(float)
    m = GPClassification(X, Y)
    lml = float(m.log_likelihood())
    m2 = load_model(save_model(m, str(tmp_path / "cls.json.gz")))
    assert float(m2.log_likelihood()) == pytest.approx(lml, rel=1e-6)


def test_gpy_load_alias(tmp_path):
    X = np.linspace(0, 5, 10).reshape(-1, 1)
    Y = np.sin(X)
    m = GPRegression(X, Y)
    p = save_model(m, str(tmp_path / "m.json.gz"))
    m2 = gpy_tpu.load(p)
    assert isinstance(m2, GPRegression)


def test_symbolic_kernel_roundtrip():
    sympy = pytest.importorskip("sympy")
    import gpy_tpu.kern as gk

    x, z, v = sympy.symbols("x z v")
    k = gk.Symbolic(1, k=v * sympy.exp(-(x - z) ** 2), parameters={"v": 1.5})
    k2 = from_dict(to_dict(k))
    X = np.random.default_rng(0).standard_normal((10, 1))
    np.testing.assert_allclose(np.asarray(k2.K(X)), np.asarray(k.K(X)), rtol=1e-12)


def test_tie_roundtrips_through_to_dict():
    import numpy as np
    import gpy_tpu.kern as gk
    from gpy_tpu.models import GPRegression
    from gpy_tpu.util.serialization import from_dict, to_dict

    rng = np.random.default_rng(0)
    X = rng.random((20, 2))
    Y = rng.standard_normal((20, 1))
    m = GPRegression(X, Y, gk.RBF(2) + gk.Matern32(2))
    m.tie("kern.parts#0.variance", "kern.parts#1.variance")
    m2 = from_dict(to_dict(m))
    assert m2.num_free_params == m.num_free_params
    np.testing.assert_allclose(float(m2.log_likelihood()),
                               float(m.log_likelihood()), rtol=1e-10)
    # post-load eager mutation must propagate through the tie AND be seen
    # by the objective (identity-preserving decode: attribute and _children
    # views are the same object)
    m2.kern.parts[0].variance = 3.0
    np.testing.assert_allclose(np.asarray(m2.kern.parts[1].variance), 3.0)
    m.kern.parts[0].variance = 3.0
    np.testing.assert_allclose(float(m2.log_likelihood()),
                               float(m.log_likelihood()), rtol=1e-10)
