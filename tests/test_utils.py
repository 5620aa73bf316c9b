"""Utility-layer tests (GPy test_util.py analogue): linalg, quadrature,
misc math, wofz, choleskies, multioutput builders."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.special as ss
from scipy.stats import norm

from gpy_tpu.util import linalg as gl
from gpy_tpu.util import choleskies as gc
from gpy_tpu.util import misc as gm
from gpy_tpu.util.quad_integrate import quadgk, quadgk_int
from gpy_tpu.util import multioutput as gmo

rng = np.random.default_rng(2)


def _psd(n=6):
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


def test_jitchol_clean_matrix():
    A = _psd()
    L = np.asarray(gl.jitchol(A))
    np.testing.assert_allclose(L @ L.T, np.asarray(A), atol=1e-8)
    _, ju = gl.chol_jitter_used(A)
    assert float(ju) == 0.0


def test_jitchol_rank_deficient():
    v = rng.standard_normal((6, 1))
    A = jnp.asarray(v @ v.T)  # rank 1
    L, ju = gl.chol_jitter_used(A)
    assert float(ju) > 0
    assert np.all(np.isfinite(np.asarray(L)))


def test_pdinv_identities():
    A = _psd()
    Ai, L, Li, logdet = gl.pdinv(A)
    np.testing.assert_allclose(np.asarray(Ai @ A), np.eye(6), atol=1e-7)
    assert float(logdet) == pytest.approx(float(np.linalg.slogdet(np.asarray(A))[1]), rel=1e-8)


def test_backsub_both_sides():
    A = _psd()
    L = jnp.linalg.cholesky(A)
    X = jnp.asarray(rng.standard_normal((6, 6)))
    left = np.asarray(gl.backsub_both_sides(L, X, "left"))
    Linv = np.linalg.inv(np.asarray(L))
    np.testing.assert_allclose(left, Linv.T @ np.asarray(X) @ Linv, atol=1e-8)


def test_choleskies_roundtrip():
    M, D = 5, 3
    Ls = np.tril(rng.standard_normal((D, M, M)))
    flat = gc.triang_to_flat(jnp.asarray(Ls))
    assert flat.shape == (gc.num_flat(M), D)
    back = np.asarray(gc.flat_to_triang(flat, M))
    np.testing.assert_allclose(back, Ls, atol=1e-12)


def test_quadgk():
    val = float(quadgk(lambda x: jnp.sin(x) ** 2, 0.0, np.pi))
    assert val == pytest.approx(np.pi / 2, rel=1e-10)
    val2 = float(quadgk_int(lambda x: jnp.exp(-(x**2) / 2)))
    assert val2 == pytest.approx(np.sqrt(2 * np.pi), rel=1e-6)


def test_misc_gaussian_helpers():
    x = jnp.asarray(np.linspace(-4, 4, 11))
    np.testing.assert_allclose(np.asarray(gm.std_norm_cdf(x)), norm.cdf(np.asarray(x)), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(gm.derivLogCdfNormal(x)),
        norm.pdf(np.asarray(x)) / norm.cdf(np.asarray(x)),
        rtol=1e-8,
    )


def test_block_matrices():
    A = [[jnp.ones((2, 2)), jnp.zeros((2, 3))], [jnp.zeros((3, 2)), 2 * jnp.ones((3, 3))]]
    M = gm.block(A)
    assert M.shape == (5, 5)
    blocks = gm.unblock(M, [2, 3], [2, 3])
    np.testing.assert_allclose(np.asarray(blocks[1][1]), 2 * np.ones((3, 3)))


def test_conf_matrix():
    p = np.array([0.9, 0.2, 0.7, 0.4])
    y = np.array([1, 0, 1, 1])
    M, acc = gm.conf_matrix(p, y)
    assert M[0, 0] == 2 and acc == pytest.approx(0.75)


def test_common_subarrays():
    X = np.array([[1, 0], [1, 0], [0, 1]])
    d = gm.common_subarrays(X)
    assert d[(1, 0)] == [0, 1] and d[(0, 1)] == [2]


def test_build_XY_and_index_to_slices():
    X1, X2 = rng.random((3, 2)), rng.random((2, 2))
    Y1, Y2 = rng.random((3, 1)), rng.random((2, 1))
    X, Y, I = gmo.build_XY([X1, X2], [Y1, Y2])
    assert X.shape == (5, 3) and Y.shape == (5, 1)
    np.testing.assert_allclose(X[:, -1], [0, 0, 0, 1, 1])
    sl = gmo.index_to_slices(I)
    assert sl[0] == [slice(0, 3)] and sl[1] == [slice(3, 5)]


def test_ln_diff_erf():
    from gpy_tpu.util.ln_diff_erfs import ln_diff_erf, erfcx

    z1 = np.array([-1.0, 0.5, 3.0])
    z2 = z1 + np.array([0.5, 1.0, 0.2])
    got = np.asarray(ln_diff_erf(jnp.asarray(z1), jnp.asarray(z2)))
    want = np.log(ss.erf(z2) - ss.erf(z1))
    np.testing.assert_allclose(got, want, rtol=1e-8)
    # deep tail: the naive difference underflows; compare against the
    # scipy-erfcx stable identity instead
    t1, t2 = 8.0, 8.5
    got_t = float(ln_diff_erf(jnp.asarray([t1]), jnp.asarray([t2]))[0])
    want_t = -t1**2 + np.log(ss.erfcx(t1) - ss.erfcx(t2) * np.exp(t1**2 - t2**2))
    assert got_t == pytest.approx(want_t, rel=1e-10)
    x = np.array([-3.0, 0.0, 2.0, 10.0, 30.0])
    np.testing.assert_allclose(np.asarray(erfcx(jnp.asarray(x))), ss.erfcx(x), rtol=1e-6)


def test_warping_function_inverse():
    from gpy_tpu.util.warping_functions import TanhFunction

    wf = TanhFunction(n_terms=2)
    y = jnp.asarray(rng.standard_normal((8, 1)))
    z = wf.f(y)
    y_back = wf.f_inv(z, y=y + 0.1)
    np.testing.assert_allclose(np.asarray(y_back), np.asarray(y), atol=1e-8)
