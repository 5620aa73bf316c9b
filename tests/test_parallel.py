"""Sharding invariants on the 8-device virtual CPU mesh.

The exact invariant GPy's manual mpi_test__.py checked (rank0 objective ==
serial recompute), automated: sharded ELBO/gradients == single-device values.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpy_tpu.core.svgp import SVGP
from gpy_tpu.likelihoods import Gaussian
from gpy_tpu.parallel import (
    make_mesh,
    pad_rows_to_multiple,
    data_parallel_elbo_and_grad,
    sharded_svgp_train_step,
    shard_rows,
)
import gpy_tpu.kern as gk

rng = np.random.default_rng(5)


def _model(n=48):
    X = np.linspace(0, 5, n).reshape(n, 1)
    Y = np.sin(X) + 0.2 * rng.standard_normal((n, 1))
    return SVGP(X, Y, X[::6].copy(), gk.RBF(1), Gaussian(variance=0.2))


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_elbo_matches_serial():
    m = _model(48)
    mesh = make_mesh()
    Xp, Yp, w = pad_rows_to_multiple(np.asarray(m.X), np.asarray(m.Y_normalized), 8)
    val, grads = data_parallel_elbo_and_grad(m, mesh, Xp, Yp, w)
    serial = float(m.log_likelihood()) + float(m.log_prior())
    assert float(val) == pytest.approx(serial, rel=1e-10)
    # gradient parity vs single-device autodiff
    flat_grad = jax.grad(lambda f: m.with_flat_raw(f).log_likelihood() + m.with_flat_raw(f).log_prior())(
        m.get_flat_raw()
    )
    gd = m.flat_to_raw_dict(flat_grad)
    for k in gd:
        np.testing.assert_allclose(np.asarray(grads[k]), np.asarray(gd[k]), rtol=1e-8, atol=1e-10,
                                   err_msg=k)


def test_sharded_elbo_with_padding():
    m = _model(45)  # not divisible by 8
    mesh = make_mesh()
    Xp, Yp, w = pad_rows_to_multiple(np.asarray(m.X), np.asarray(m.Y_normalized), 8)
    val, _ = data_parallel_elbo_and_grad(m, mesh, Xp, Yp, w)
    serial = float(m.log_likelihood()) + float(m.log_prior())
    assert float(val) == pytest.approx(serial, rel=1e-10)


def test_sharded_train_step_runs_and_improves():
    m = _model(48)
    mesh = make_mesh()
    Xp, Yp, w = pad_rows_to_multiple(np.asarray(m.X), np.asarray(m.Y_normalized), 8)
    step, (raw, state), shard = sharded_svgp_train_step(m, mesh, step_size=5e-2)
    Xs, Ys, ws = shard(jnp.asarray(Xp)), shard(jnp.asarray(Yp)), shard(jnp.asarray(w))
    v0 = None
    for i in range(20):
        raw, state, v = step(raw, state, Xs, Ys, ws)
        if v0 is None:
            v0 = float(v)
    assert float(v) > v0
    # write back and check model consistent
    m.set_raw_dict({k: jnp.asarray(val) for k, val in raw.items()})
    assert np.isfinite(float(m.log_likelihood()))
