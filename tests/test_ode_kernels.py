"""Latent-force (ODE) kernel tests — oracle: numerical integration of the
defining ODE covariance integrals (replaces GPy's hand-derived erf algebra
checks)."""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.integrate import quad, dblquad

from gpy_tpu.kern.eq_ode1 import EQ_ODE1


def test_eq_ode1_kfu_vs_quadrature():
    B, l, w = 1.3, 0.6, 0.8
    k = EQ_ODE1(output_dim=1, rank=1, W=np.array([[w]]), lengthscale=[l], decay=[B])
    for t, z in [(0.5, 0.3), (1.5, 1.0), (2.0, 0.2), (0.8, 1.5)]:
        got = float(k.K(jnp.asarray([[t, 0.0]]), jnp.asarray([[z, 1.0]]))[0, 0])
        want, _ = quad(lambda tau: np.exp(-B * (t - tau)) * np.exp(-((tau - z) ** 2) / l**2), 0, t)
        assert got == pytest.approx(w * want, rel=1e-6)


def test_eq_ode1_kdiag_vs_quadrature():
    B, l, w = 1.3, 0.6, 0.8
    k = EQ_ODE1(output_dim=1, rank=1, W=np.array([[w]]), lengthscale=[l], decay=[B])
    for t in [0.4, 1.2, 2.5]:
        got = float(k.Kdiag(jnp.asarray([[t, 0.0]]))[0])
        want, _ = dblquad(
            lambda a, b: np.exp(-B * (2 * t - a - b)) * np.exp(-((a - b) ** 2) / l**2),
            0, t, 0, t,
        )
        assert got == pytest.approx(w * w * want, rel=1e-6)


def test_eq_ode1_kuu_block_structure():
    k = EQ_ODE1(output_dim=2, rank=2)
    X = np.array([[0.1, 2.0], [0.5, 2.0], [0.3, 3.0]])  # latent indices 0,0,1
    K = np.asarray(k.K(jnp.asarray(X)))
    assert K[0, 2] == 0.0 and K[1, 2] == 0.0  # independent latent forces
    assert K[0, 0] == pytest.approx(1.0)
    np.testing.assert_allclose(K, K.T)


def test_eq_ode1_gradients_flow():
    import jax

    k = EQ_ODE1(output_dim=1, rank=1, W=np.array([[0.8]]), lengthscale=[0.6], decay=[1.3])
    Xf = jnp.asarray([[0.7, 0.0], [1.1, 0.0]])
    Xu = jnp.asarray([[0.4, 1.0], [0.9, 1.0]])

    def f(flat):
        k2 = k.with_flat_raw(flat)
        return jnp.sum(k2.K(Xf, Xu))

    g = jax.grad(f)(k.get_flat_raw())
    assert np.all(np.isfinite(np.asarray(g)))
    # FD check on the decay entry
    eps = 1e-6
    flat = np.asarray(k.get_flat_raw())
    for i in range(flat.size):
        fp = flat.copy(); fp[i] += eps
        fm = flat.copy(); fm[i] -= eps
        fd = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        assert float(g[i]) == pytest.approx(fd, rel=1e-4, abs=1e-7)


def test_ode_uy_psd_and_structure():
    import gpy_tpu.kern as gk

    k = gk.ODE_UY(2, variance_U=1.0, variance_Y=0.8, lengthscale_U=1.2, lengthscale_Y=0.7)
    t = np.linspace(0, 3, 6).reshape(-1, 1)
    X = np.vstack([np.hstack([t, np.zeros_like(t)]), np.hstack([t, np.ones_like(t)])])
    K = np.asarray(k.K(jnp.asarray(X)))
    np.testing.assert_allclose(K, K.T, atol=1e-9)
    w = np.linalg.eigvalsh(K)
    assert w.min() > -1e-7 * w.max()
    # U block is Matern32
    Kuu_ref = (1 + np.sqrt(3) * np.abs(t - t.T) / 1.2) * np.exp(-np.sqrt(3) * np.abs(t - t.T) / 1.2)
    np.testing.assert_allclose(K[:6, :6], Kuu_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(k.Kdiag(jnp.asarray(X))), np.diag(K), atol=1e-8)


def test_ode_uyc_adds_ubias():
    import gpy_tpu.kern as gk

    k0 = gk.ODE_UY(2)
    k1 = gk.ODE_UYC(2, ubias=0.7)
    t = np.linspace(0.1, 2, 4).reshape(-1, 1)
    X = np.vstack([np.hstack([t, np.zeros_like(t)]), np.hstack([t, np.ones_like(t)])])
    K0 = np.asarray(k0.K(jnp.asarray(X)))
    K1 = np.asarray(k1.K(jnp.asarray(X)))
    np.testing.assert_allclose(K1[:4, :4] - K0[:4, :4], 0.7, atol=1e-9)
    np.testing.assert_allclose(K1[4:, 4:], K0[4:, 4:], atol=1e-9)


def test_ode_st_ode_t_psd():
    import gpy_tpu.kern as gk

    rng2 = np.random.default_rng(0)
    t = np.sort(rng2.random(5)).reshape(-1, 1)
    x = rng2.random((5, 1))
    Xst = np.vstack([np.hstack([t, x, np.zeros_like(t)]), np.hstack([t, x, np.ones_like(t)])])
    Kst = np.asarray(gk.ODE_st(3).K(jnp.asarray(Xst)))
    np.testing.assert_allclose(Kst, Kst.T, atol=1e-8)
    assert np.linalg.eigvalsh(Kst).min() > -1e-6 * np.abs(Kst).max()
    Xt = np.vstack([np.hstack([t, np.zeros_like(t)]), np.hstack([t, np.ones_like(t)])])
    Kt = np.asarray(gk.ODE_t(2).K(jnp.asarray(Xt)))
    np.testing.assert_allclose(Kt, Kt.T, atol=1e-8)
    assert np.linalg.eigvalsh(Kt).min() > -1e-6 * np.abs(Kt).max()


def test_eq_ode2_vs_quadrature():
    from gpy_tpu.kern.eq_ode2 import EQ_ODE2

    Cd, Bd, l, w = 0.9, 2.0, 0.6, 0.8  # underdamped
    k = EQ_ODE2(output_dim=1, rank=1, W=np.array([[w]]), lengthscale=[l], C=[Cd], B=[Bd])
    al, om = Cd / 2, np.sqrt(Bd - Cd**2 / 4)
    G = lambda s: np.exp(-al * s) * np.sin(om * s) / om
    got = float(k.K(jnp.asarray([[1.5, 0.0]]), jnp.asarray([[1.0, 1.0]]))[0, 0])
    want, _ = quad(lambda tau: G(1.5 - tau) * np.exp(-((tau - 1.0) ** 2) / l**2), 0, 1.5)
    assert got == pytest.approx(w * want, rel=1e-7)
    got = float(k.K(jnp.asarray([[1.2, 0.0]]), jnp.asarray([[0.5, 0.0]]))[0, 0])
    want, _ = dblquad(lambda a, b: G(1.2 - a) * G(0.5 - b) * np.exp(-((a - b) ** 2) / l**2), 0, 0.5, 0, 1.2)
    assert got == pytest.approx(w * w * want, rel=1e-6)


def test_eq_ode2_overdamped():
    from gpy_tpu.kern.eq_ode2 import EQ_ODE2

    l, w = 0.6, 0.8
    k = EQ_ODE2(output_dim=1, rank=1, W=np.array([[w]]), lengthscale=[l], C=[3.0], B=[1.0])
    al, omi = 1.5, np.sqrt(3.0**2 / 4 - 1.0)
    G = lambda s: np.exp(-al * s) * np.sinh(omi * s) / omi
    got = float(k.K(jnp.asarray([[1.0, 0.0]]), jnp.asarray([[0.6, 1.0]]))[0, 0])
    want, _ = quad(lambda tau: G(1.0 - tau) * np.exp(-((tau - 0.6) ** 2) / l**2), 0, 1.0)
    assert got == pytest.approx(w * want, rel=1e-7)


def test_eq_ode2_joint_gram_psd_and_grads():
    import jax
    from gpy_tpu.kern.eq_ode2 import EQ_ODE2

    k = EQ_ODE2(output_dim=2, rank=1, W=np.array([[0.8], [0.5]]),
                lengthscale=[0.7], C=[1.0, 1.4], B=[2.0, 1.2])
    t = np.linspace(0.1, 2, 5).reshape(-1, 1)
    Xf = np.vstack([np.hstack([t, np.zeros_like(t)]), np.hstack([t, np.ones_like(t)])])
    Xu = np.hstack([t, np.full_like(t, 2.0)])
    Kff = np.asarray(k.K(jnp.asarray(Xf)))
    Kfu = np.asarray(k.K(jnp.asarray(Xf), jnp.asarray(Xu)))
    Kuu = np.asarray(k.K(jnp.asarray(Xu), jnp.asarray(Xu)))
    joint = np.block([[Kff, Kfu], [Kfu.T, Kuu]])
    np.testing.assert_allclose(joint, joint.T, atol=1e-9)
    assert np.linalg.eigvalsh(joint).min() > -1e-7
    # gradients flow through the complex path
    def f(flat):
        k2 = k.with_flat_raw(flat)
        return jnp.sum(k2.K(jnp.asarray(Xf), jnp.asarray(Xu)))
    g = np.asarray(jax.grad(f)(k.get_flat_raw()))
    assert np.all(np.isfinite(g))
    eps = 1e-6
    flat = np.asarray(k.get_flat_raw())
    for i in [0, 1, 3, 5]:
        fp = flat.copy(); fp[i] += eps
        fm = flat.copy(); fm[i] -= eps
        fd = (float(f(jnp.asarray(fp))) - float(f(jnp.asarray(fm)))) / (2 * eps)
        assert g[i] == pytest.approx(fd, rel=1e-4, abs=1e-7)


def test_ibp_lfm():
    from gpy_tpu.models.ibp_lfm import IBPLFM

    rngl = np.random.default_rng(5)
    t = np.linspace(0.1, 4, 25)
    X = np.vstack([np.stack([t, np.zeros_like(t)], 1), np.stack([t, np.ones_like(t)], 1)])
    Y = np.concatenate([np.sin(1.5 * t) * 0.8, 0.05 * rngl.standard_normal(25)]).reshape(-1, 1)
    m = IBPLFM(X, Y, input_dim=2, output_dim=2, rank=2, num_inducing=12)
    ll0 = float(m.log_likelihood())
    assert m.checkgrad(step=1e-5)
    m.optimize(max_iters=150)
    assert float(m.log_likelihood()) > ll0
    g = m.gates
    assert g.shape == (2, 2)
    # the driven output keeps larger total gate mass than the noise output
    assert g[0].max() > g[1].min()


def test_ibplfm_exact_psi_terms():
    """The bound's psi statistics are the exact spike-and-slab expectations
    (reference gatherPsiStat, ibp_lfm.py:28-100): per-force psi0 sums to the
    full Kff diagonal at gamma=1, and the Bernoulli second moment makes the
    bound differ from the naive E[Kfu]'WE[Kfu] one."""
    import jax.numpy as jnp
    from gpy_tpu.kern.eq_ode2 import EQ_ODE2
    from gpy_tpu.models.ibp_lfm import IBPLFM

    k = EQ_ODE2(2, output_dim=2, rank=2)
    t = jnp.asarray(np.linspace(0.3, 3.0, 6))
    d_idx = jnp.asarray(np.array([0, 0, 0, 1, 1, 1]))
    pf = k.Kdiag_per_force(t, d_idx)
    full = jnp.diagonal(k._Kff(t, d_idx, t, d_idx))
    np.testing.assert_allclose(np.asarray(pf.sum(1)), np.asarray(full), atol=1e-10)

    # tau is a live variational parameter with autodiff gradients
    rngl = np.random.default_rng(3)
    ts = np.linspace(0.2, 3.0, 15)
    X = np.vstack([np.stack([ts, np.full_like(ts, d)], 1) for d in range(2)])
    Y = rngl.standard_normal((30, 1))
    m = IBPLFM(X, Y, input_dim=2, output_dim=2, rank=2, num_inducing=6)
    assert m.tau.shape == (2, 2)
    assert m.checkgrad(step=1e-5)


def test_eq_ode2_upsilon_all_damping_regimes():
    """Branch-stable Upsilon vs numerical quadrature of the defining
    integral — the overdamped regime used to lose all precision
    (e^{nu^2} cancellation), making Kfu inconsistent with Kff/Kuu."""
    import jax.numpy as jnp
    from gpy_tpu.kern.eq_ode2 import EQ_ODE2, _upsilon

    def upsilon_num(gamma, t, tp, l, n=40001):
        tau = np.linspace(0.0, t, n)
        f = np.exp(-gamma * (t - tau)) * np.exp(-((tau - tp) ** 2) / l**2)
        return np.trapezoid(f, tau)

    for gamma, t, tp, l in [(1.0 + 2.0j, 2.0, 0.7, 0.8),
                            (5.35 + 0j, 2.0, 0.7, 2.3),
                            (0.9 + 0j, 3.0, 2.5, 1.5),
                            (7.0 + 0j, 1.5, 1.2, 3.0)]:
        num = upsilon_num(gamma, t, tp, l)
        ana = complex(np.asarray(_upsilon(jnp.asarray(gamma), jnp.asarray(t),
                                          jnp.asarray(tp), jnp.asarray(l))))
        assert abs(ana - num) / max(abs(num), 1e-300) < 1e-6

    # Nystrom consistency of the kernel blocks in every damping regime
    def gap(k, C, B, W, ls):
        k.C.set_value(np.asarray(C)); k.B.set_value(np.asarray(B))
        k.W.set_value(np.asarray(W)); k.lengthscale.set_value(np.asarray(ls))
        t = jnp.asarray(np.linspace(0.1, 4, 12)); d = jnp.asarray(np.zeros(12, int))
        tz = jnp.asarray(np.linspace(0.1, 4, 8)); q = jnp.asarray(np.zeros(8, int))
        S = k._Kff(t, d, t, d) - k._Kfu(t, d, tz, q) @ jnp.linalg.solve(
            k._Kuu(tz, q) + 1e-9 * jnp.eye(8), k._Kfu(t, d, tz, q).T)
        return float(jnp.linalg.eigvalsh(S).min())

    k = EQ_ODE2(2, output_dim=2, rank=1)
    assert gap(k, [1.0, 1.0], [3.0, 3.0], [[1.0], [0.5]], [0.8]) > -1e-8
    assert gap(k, [6.5, 2.4], [6.3, 1.2], [[6.4], [5.1]], [2.3]) > -1e-8   # overdamped
    assert gap(k, [4.0, 4.0], [4.0, 4.0], [[1.0], [1.0]], [1.0]) > -1e-8  # critical
