"""Recursive blocked cholesky/trsm (ops/blocked_linalg.py): parity with the
XLA native ops (small `leaf` forces the recursion on CPU-sized problems)
and gradient correctness through the recursion.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gpy_tpu.ops import blocked_linalg as bl

rng = np.random.default_rng(0)


def _spd(n):
    A = rng.standard_normal((n, n))
    return jnp.asarray(A @ A.T + n * np.eye(n))


@pytest.mark.parametrize("n", [96, 257, 400])  # odd sizes exercise uneven splits
def test_rec_cholesky_matches_native(n):
    K = _spd(n)
    L = bl.rec_cholesky(K, leaf=64)
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(K)),
                               atol=1e-10)


def test_rec_solves_match_native():
    K = _spd(300)
    L = jnp.linalg.cholesky(K)
    B = jnp.asarray(rng.standard_normal((300, 5)))
    st = jax.scipy.linalg.solve_triangular
    np.testing.assert_allclose(np.asarray(bl.rec_solve_lower(L, B, leaf=64)),
                               np.asarray(st(L, B, lower=True)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bl.rec_solve_lower_t(L, B, leaf=64)),
                               np.asarray(st(L, B, lower=True, trans=1)), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bl.rec_rsolve_lower_t(B.T, L, leaf=64)),
                               np.asarray(st(L, B, lower=True).T), atol=1e-12)


def test_gradient_through_rec_cholesky_matches_native():
    """The whole point: autodiff through the recursion equals the native
    cholesky VJP (which it replaces on the large-N TPU path)."""
    K = _spd(200)

    def f_rec(K):
        L = bl.rec_cholesky(K, leaf=64)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.01 * jnp.sum(L**2)

    def f_nat(K):
        L = jnp.linalg.cholesky(K)
        return jnp.sum(jnp.log(jnp.diagonal(L))) + 0.01 * jnp.sum(L**2)

    g1 = jax.grad(f_rec)(K)
    g2 = jax.grad(f_nat)(K)
    # The recursion reads only the lower triangle of K, so the raw cotangents
    # distribute the symmetric mass differently; for a symmetric K (always the
    # case: K is a Gram matrix built from parameters via a symmetric map) only
    # the symmetrized gradient is observable downstream. Chain rule check:
    # d/dt f(chol(K + t*S)) must agree for symmetric directions S.
    s1 = np.asarray(g1 + g1.T) / 2
    s2 = np.asarray(g2 + g2.T) / 2
    np.testing.assert_allclose(s1, s2, atol=1e-10)
    # and via an explicit symmetric directional derivative
    S = rng.standard_normal((200, 200)); S = jnp.asarray(S + S.T)
    d1 = jax.jvp(f_rec, (K,), (S,))[1]
    d2 = jax.jvp(f_nat, (K,), (S,))[1]
    assert float(d1) == pytest.approx(float(d2), rel=1e-9)


def test_auto_dispatch_small_uses_native_path():
    # below min_n these must be exactly the native results (same op)
    K = _spd(64)
    np.testing.assert_array_equal(np.asarray(bl.cholesky_auto(K)),
                                  np.asarray(jnp.linalg.cholesky(K)))
    L = jnp.linalg.cholesky(K)
    B = jnp.asarray(rng.standard_normal((64, 3)))
    np.testing.assert_array_equal(
        np.asarray(bl.solve_lower_auto(L, B)),
        np.asarray(jax.scipy.linalg.solve_triangular(L, B, lower=True)))


def test_jitchol_large_path_still_recovers():
    """jitchol now routes through cholesky_auto; the jitter ladder must still
    rescue a rank-deficient matrix (forced through the recursive path)."""
    from gpy_tpu.util.linalg import jitchol
    n = 120
    U = rng.standard_normal((n, 3))
    K = jnp.asarray(U @ U.T)  # rank-3: plain cholesky fails
    L = jitchol(K)
    assert bool(jnp.all(jnp.isfinite(L)))
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K), atol=1e-3)


# --- batched blocked chol+inv (custom-vmap switch; VERDICT r2 item 1) -------

def _spd_batch(B, n, rank=None, seed=7):
    r = np.random.default_rng(seed)
    G = r.standard_normal((B, n, rank or n))
    return jnp.asarray(G @ np.swapaxes(G, 1, 2) + n * np.eye(n))


def test_rec_chol_inv_batched_matches_native():
    from gpy_tpu.ops.blocked_linalg import rec_chol_inv
    K = _spd_batch(3, 300)
    L, Li = rec_chol_inv(K, leaf=128)
    Lr = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lr), atol=1e-8)
    eye = np.eye(300)
    for b in range(3):
        np.testing.assert_allclose(
            np.asarray(Li[b] @ L[b]), eye, atol=1e-8)


def test_vmapped_chol_and_inv_matches_loop():
    """vmap(chol_and_inv) takes the batched-rule path; values and gradients
    must match the per-element unbatched call."""
    from gpy_tpu.util.linalg import chol_and_inv, jitchol_and_inv
    K = _spd_batch(4, 300)

    for fn in (chol_and_inv, jitchol_and_inv):
        Lv, Liv = jax.vmap(fn)(K)
        for b in range(4):
            L1, Li1 = fn(K[b])
            np.testing.assert_allclose(np.asarray(Lv[b]), np.asarray(L1),
                                       atol=1e-8)
            np.testing.assert_allclose(np.asarray(Liv[b]), np.asarray(Li1),
                                       atol=1e-8)

        def scalar(Kb):
            L, Li = fn(Kb)
            return jnp.sum(L * jnp.cos(jnp.arange(300.0))) + jnp.sum(Li ** 2) * 1e-3

        gv = jax.vmap(jax.grad(scalar))(K)
        for b in range(4):
            g1 = jax.grad(scalar)(K[b])
            np.testing.assert_allclose(np.asarray(gv[b]), np.asarray(g1),
                                       rtol=1e-6, atol=1e-8)


def test_vmapped_jitchol_inv_ladder_rescues_bad_element():
    """One rank-deficient element in the batch: the scalar-predicate ladder
    must rescue it while leaving clean elements bit-identical to the
    no-ladder result."""
    from gpy_tpu.util.linalg import jitchol_and_inv
    r = np.random.default_rng(3)
    n = 300
    Kgood = np.asarray(_spd_batch(1, n))[0]
    U = r.standard_normal((n, 3))
    Kbad = U @ U.T  # rank-3
    K = jnp.asarray(np.stack([Kgood, Kbad]))
    L, Li = jax.vmap(jitchol_and_inv)(K)
    assert bool(jnp.all(jnp.isfinite(L))) and bool(jnp.all(jnp.isfinite(Li)))
    np.testing.assert_allclose(np.asarray(L[0] @ L[0].T), Kgood, atol=1e-6)
    # the rescued element reproduces K + jitter*I at ladder tolerance
    np.testing.assert_allclose(np.asarray(L[1] @ L[1].T), Kbad, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(Li[1] @ L[1]), np.eye(n), atol=1e-6)


def test_explicit_batched_chol_and_inv_routes_blocked():
    """ndim==3 direct calls (no vmap) also take the batched recursion."""
    from gpy_tpu.util.linalg import chol_and_inv
    K = _spd_batch(2, 300, seed=11)
    L, Li = chol_and_inv(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(K)),
                               atol=1e-8)


# --- NLML-level custom VJP for the explicit-inverse exact path --------------

def test_exact_inv_terms_gradients_match_reference_formulation():
    """The one-matmul backward (dL/dK = 0.5(aa' - cK^-1) form) must match
    the generic autodiff of the chol+solve formulation, for every output
    cotangent combination (incl. the rare L/alpha consumers)."""
    from gpy_tpu.inference.exact import _exact_inv_terms

    r = np.random.default_rng(5)
    n, d = 40, 2
    G = r.standard_normal((n, 8))
    Ky = jnp.asarray(G @ G.T + n * np.eye(n))
    YY = jnp.asarray(r.standard_normal((n, d)))

    def ref(Ky, YY):
        L = jnp.linalg.cholesky(Ky)
        Li = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(n, dtype=Ky.dtype), lower=True)
        t = Li @ YY
        alpha = Li.T @ t
        return jnp.sum(t * t), 2 * jnp.sum(jnp.log(jnp.diag(L))), L, alpha

    # several scalarizations exercise different cotangent patterns
    combos = [
        lambda q, ld, L, a: q,                       # quad only
        lambda q, ld, L, a: ld,                      # logdet only
        lambda q, ld, L, a: 3.0 * q + 0.5 * ld,      # the NLML combination
        lambda q, ld, L, a: jnp.sum(a * jnp.arange(d, dtype=a.dtype)),
        lambda q, ld, L, a: jnp.sum(L * jnp.cos(jnp.arange(n * n, dtype=L.dtype)).reshape(n, n)),
        lambda q, ld, L, a: q + ld + jnp.sum(a) + jnp.sum(jnp.tril(L)),
    ]
    for f in combos:
        g1 = jax.grad(lambda K, Y: f(*_exact_inv_terms(K, Y)), argnums=(0, 1))(Ky, YY)
        g2 = jax.grad(lambda K, Y: f(*ref(K, Y)), argnums=(0, 1))(Ky, YY)
        # symmetric part of the K cotangent is the observable quantity
        s1 = 0.5 * (g1[0] + g1[0].T)
        s2 = 0.5 * (g2[0] + g2[0].T)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                                   rtol=1e-9, atol=1e-10)


def test_exact_inv_terms_vmapped_grad():
    """vmapped value_and_grad through the explicit-inverse NLML path (the
    HMC multi-chain shape) matches the per-element loop."""
    from gpy_tpu.inference.exact import _exact_inv_terms

    r = np.random.default_rng(6)
    n, C = 300, 3
    G = r.standard_normal((C, n, 8))
    Ky = jnp.asarray(G @ np.swapaxes(G, 1, 2) + n * np.eye(n))
    YY = jnp.asarray(r.standard_normal((C, n, 1)))

    def nlml(K, Y):
        q, ld, L, a = _exact_inv_terms(K, Y)
        return 0.5 * (q + ld)

    gv = jax.vmap(jax.grad(nlml, argnums=(0, 1)))(Ky, YY)
    for b in range(C):
        g1 = jax.grad(nlml, argnums=(0, 1))(Ky[b], YY[b])
        np.testing.assert_allclose(np.asarray(gv[0][b]), np.asarray(g1[0]),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(gv[1][b]), np.asarray(g1[1]),
                                   rtol=1e-8, atol=1e-9)


def test_jitter_ladder_probes_with_the_result_factorization(monkeypatch):
    """r5 regression: the jitter ladder must probe with the SAME cholesky
    that produces the final result. The old code probed with the native
    chol: a jitter the native probe accepted could still NaN the blocked
    factorization (on TPU at n=2048 this silently returned a NaN L and the
    Laplace mode finder 'converged' to f=0). Simulated here with a chol
    that fails below a diagonal threshold: the ladder must escalate until
    the ACTUAL factorization succeeds."""
    import jax.numpy as jnp
    import gpy_tpu.util.linalg as ul

    real = ul.cholesky_auto

    def picky_chol(A, *a, **k):
        # fails (NaN) unless the mean diagonal reaches 0.6 — models the
        # blocked path being stricter than the native probe
        L = real(A, *a, **k)
        dm = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1))
        return jnp.where(dm >= 0.6, L, jnp.full_like(L, jnp.nan))

    monkeypatch.setattr(ul, "cholesky_auto", picky_chol)
    A = 0.5 * jnp.eye(16)   # PD; native chol fine; picky chol needs jitter
    L = ul.jitchol(A, maxtries=10)
    assert np.all(np.isfinite(np.asarray(L))), (
        "ladder accepted a jitter the result factorization cannot handle")
    # the applied jitter must be the level the picky chol needed (>= 0.1)
    rec = float(np.asarray(L)[0, 0]) ** 2 - 0.5
    assert rec >= 0.1 - 1e-9, rec
