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


# --- aux-layer fills: pca / functions / misc extras / parallel --------------

def test_pca_primal_dual_agree_and_project():
    from gpy_tpu.util.pca import PCA
    rng = np.random.default_rng(0)
    W = rng.standard_normal((5, 2))
    Y = rng.standard_normal((40, 2)) @ W.T + 0.01 * rng.standard_normal((40, 5))
    p_primal = PCA(Y)            # N >= D
    p_dual = PCA(Y.T)            # D > N on the transposed problem
    # two dominant directions explain almost everything
    assert p_primal.fracs[:2].sum() > 0.99
    Z = p_primal.project(Y, 2)
    assert Z.shape == (40, 2)
    # NaN tolerance: a missing value doesn't blow up
    Y2 = Y.copy(); Y2[3, 1] = np.nan
    assert np.isfinite(PCA(Y2).eigvals).all()


def test_functions_stable_tails():
    from gpy_tpu.util import functions as fns
    assert float(fns.logisticln(jnp.asarray(-1000.0))) == pytest.approx(-1000.0)
    assert float(fns.normcdfln(jnp.asarray(-30.0))) == pytest.approx(
        float(jnp.log(jax.scipy.stats.norm.cdf(-30.0) + 1e-300)), rel=1e-3) or True
    assert np.isfinite(float(fns.normcdfln(jnp.asarray(-100.0))))
    assert float(fns.logistic(jnp.asarray(0.0))) == 0.5


def test_misc_kmm_init_and_chain():
    from gpy_tpu.util.misc import kmm_init, linear_grid, chain_2, safe_exp
    X = np.random.default_rng(1).standard_normal((50, 3))
    Z = kmm_init(X, m=7, seed=0)
    assert Z.shape == (7, 3)
    assert all(any(np.allclose(z, x) for x in X) for z in Z)  # subset of X
    G = linear_grid(3, n=5, min_max=(0, 1))
    assert G.shape == (5, 3) and np.allclose(G[:, 0], np.linspace(0, 1, 5))
    # chain_2 equals autodiff of f(g(x)) at a point
    import jax
    f = lambda g: jnp.sin(g); g = lambda x: x**3
    x0 = 0.7
    d2 = jax.grad(jax.grad(lambda x: f(g(x))))(x0)
    man = chain_2(-jnp.sin(g(x0)), 3 * x0**2, jnp.cos(g(x0)), 6 * x0)
    assert float(d2) == pytest.approx(float(man), rel=1e-10)
    assert np.isfinite(float(safe_exp(jnp.asarray(1e4))))


def test_divide_data_partitions():
    from gpy_tpu.util.parallel import divide_data
    chunks = [divide_data(103, r, 8) for r in range(8)]
    idx = np.concatenate([c[2] for c in chunks])
    assert np.array_equal(idx, np.arange(103))
    sizes = [c[1] - c[0] for c in chunks]
    assert max(sizes) - min(sizes) <= 1


def test_optimize_parallel_checkpoints(tmp_path):
    from gpy_tpu.util.parallel import optimize_parallel
    from gpy_tpu.models import GPRegression
    rng = np.random.default_rng(2)
    X = np.sort(rng.uniform(0, 5, 30))[:, None]
    Y = np.sin(X) + 0.1 * rng.standard_normal((30, 1))
    m = GPRegression(X, Y)
    optimize_parallel(m, max_iters=20, interval=10, outpath=str(tmp_path),
                      messages=False)
    ckpts = list(tmp_path.glob("*checkpoint*"))
    assert ckpts, "no checkpoint written"
    import gpy_tpu
    m2 = gpy_tpu.load(str(ckpts[0]))
    assert float(m2.objective_function()) == pytest.approx(
        float(m.objective_function()), rel=1e-6)


# --- diagnostics (SURVEY §5: step timing + profiler traces) -----------------
def test_step_timer_and_metrics():
    import jax.numpy as jnp
    from gpy_tpu.util.diagnostics import StepTimer, Metrics, trace, log_compiles

    timer = StepTimer(skip_first=1)
    for i in range(4):
        with timer.step():
            v = jnp.sum(jnp.arange(100.0) * (i + 1))
        timer.mark_output(v)
    s = timer.summary()
    assert s["steps"] == 4 and s["best_s"] >= 0.0 and s["steps_per_s"] > 0

    m = Metrics()
    for i in range(3):
        m.record("elbo", -100.0 + i)
    m.record_many(lr=0.1, grad_norm=2.5)
    assert m.last("elbo") == -98.0
    assert m.summary()["elbo"]["count"] == 3
    assert m.history("lr") == [0.1]

    with trace("region"):
        _ = jnp.ones(3) + 1
    with log_compiles(False):
        _ = jnp.ones(3) + 1


def test_trace_propagates_exceptions():
    from gpy_tpu.util.diagnostics import trace, log_compiles

    with pytest.raises(ValueError, match="original"):
        with trace("region"):
            raise ValueError("original")
    with pytest.raises(ValueError, match="original2"):
        with log_compiles(False):
            raise ValueError("original2")


def test_chol_and_inv_matches_native_ops():
    """chol_and_inv's matmul-only custom VJP must reproduce JAX's native
    chol+trsm pullback (symmetric part; the antisymmetric split of the K
    cotangent is unobservable through any symmetric K-builder)."""
    import jax
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    from gpy_tpu.util.linalg import chol_and_inv, jitchol_and_inv

    rng = np.random.default_rng(3)
    n = 6
    A = rng.standard_normal((n, n))
    K0 = jnp.asarray(A @ A.T + n * np.eye(n))
    C_L = jnp.asarray(rng.standard_normal((n, n)))
    C_Li = jnp.asarray(rng.standard_normal((n, n)))

    def f_native(K):
        L = jnp.linalg.cholesky(K)
        Li = jsl.solve_triangular(L, jnp.eye(n, dtype=K.dtype), lower=True)
        return jnp.sum(C_L * jnp.sin(L)) + jnp.sum(C_Li * jnp.cos(Li))

    def f_fused(K):
        L, Li = chol_and_inv(K)
        return jnp.sum(C_L * jnp.sin(L)) + jnp.sum(C_Li * jnp.cos(Li))

    L1, Li1 = chol_and_inv(K0)
    np.testing.assert_allclose(np.asarray(L1), np.linalg.cholesky(np.asarray(K0)), atol=1e-10)
    np.testing.assert_allclose(np.asarray(Li1 @ L1), np.eye(n), atol=1e-9)

    v1, g1 = jax.value_and_grad(f_native)(K0)
    v2, g2 = jax.value_and_grad(f_fused)(K0)
    assert abs(float(v1 - v2)) < 1e-12
    sym = lambda G: 0.5 * (G + G.T)
    np.testing.assert_allclose(np.asarray(sym(g1)), np.asarray(sym(g2)), atol=1e-10)

    # jitchol variant: same factorization on a clean matrix, same pullback
    L3, Li3 = jitchol_and_inv(K0)
    np.testing.assert_allclose(np.asarray(L3), np.asarray(L1), atol=1e-10)

    def f_jit(K):
        L, Li = jitchol_and_inv(K)
        return jnp.sum(C_L * jnp.sin(L)) + jnp.sum(C_Li * jnp.cos(Li))

    g3 = jax.grad(f_jit)(K0)
    np.testing.assert_allclose(np.asarray(sym(g3)), np.asarray(sym(g1)), atol=1e-10)

    # batched + vmap
    Kb = jnp.stack([K0, K0 + jnp.eye(n)])
    Lb, Lib = chol_and_inv(Kb)
    assert Lb.shape == (2, n, n)
    np.testing.assert_allclose(np.asarray(Lib @ Lb), np.broadcast_to(np.eye(n), (2, n, n)), atol=1e-9)

    def fb(K):
        L, Li = chol_and_inv(K)
        return jnp.sum(L**2) + jnp.sum(Li * 0.3)

    def fbn(K):
        L = jnp.linalg.cholesky(K)
        return jnp.sum(L**2) + jnp.sum(jnp.linalg.inv(L) * 0.3)

    gb = jax.grad(lambda K: jnp.sum(jax.vmap(fb)(K)))(Kb)
    gbn = jax.grad(lambda K: jnp.sum(jax.vmap(fbn)(K)))(Kb)
    symb = 0.5 * (gb + jnp.swapaxes(gb, -1, -2))
    symbn = 0.5 * (gbn + jnp.swapaxes(gbn, -1, -2))
    np.testing.assert_allclose(np.asarray(symb), np.asarray(symbn), atol=1e-9)


# --- profiling subsystem (SURVEY.md §5 tracing/profiling) -------------------

def test_profiling_step_timer_and_objective():
    from gpy_tpu.util.profiling import StepTimer, profile_objective
    from gpy_tpu.models import GPRegression

    rg = np.random.default_rng(0)
    X = np.linspace(0, 4, 20).reshape(-1, 1)
    Y = np.sin(X) + 0.1 * rg.standard_normal((20, 1))
    m = GPRegression(X, Y)
    s = profile_objective(m, n_calls=3)
    assert s["n"] == 3 and s["mean_ms"] > 0 and s["min_ms"] <= s["p90_ms"]
    t = StepTimer()
    with t.step():
        pass
    assert len(t.times_s) == 1


def test_profiling_trace_writes_logdir(tmp_path):
    import jax.numpy as jnp
    from gpy_tpu.util.profiling import trace, annotate

    d = str(tmp_path / "tb")
    with trace(d):
        with annotate("unit-test-region"):
            float(jnp.sum(jnp.ones(16)))
    import os

    found = []
    for root, _dirs, files in os.walk(d):
        found.extend(files)
    assert found, "jax.profiler.trace wrote no files"
