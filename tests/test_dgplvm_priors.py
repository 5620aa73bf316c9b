"""DGPLVM discriminative priors: parity with the reference formulas
(GPy/core/parameterization/priors.py:416-1258, re-derived as numpy oracles
here) plus autodiff gradient checks and end-to-end GPLVM integration."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpy_tpu.core.priors import DGPLVM, DGPLVM_Lamda, DGPLVM_T, DGPLVM_KFDA
import gpy_tpu


def _scatter_oracle(x, lbl):
    """Reference Sb/Sw (priors.py:649-668) via explicit loops."""
    N, Q = x.shape
    C = lbl.shape[1]
    labels = lbl.argmax(1)
    M0 = x.mean(0)
    Sb = np.zeros((Q, Q))
    Sw = np.zeros((Q, Q))
    for c in range(C):
        xs = x[labels == c]
        Nc = len(xs)
        Mc = xs.mean(0)
        B = (Mc - M0)[:, None]
        Sb += (Nc / N) * B @ B.T
        W = xs - Mc
        Sw += (Nc / N) * (W.T @ W / Nc)
    return Sb, Sw


def _make_labels(N, C, rng):
    labels = rng.integers(0, C, N)
    labels[:C] = np.arange(C)  # every class non-empty
    onehot = np.zeros((N, C))
    onehot[np.arange(N), labels] = 1
    return onehot


def test_dgplvm_lnpdf_matches_reference_formula():
    rng = np.random.default_rng(0)
    N, Q, C = 20, 3, 3
    x = rng.normal(size=(N, Q))
    lbl = _make_labels(N, C, rng)
    Sb, Sw = _scatter_oracle(x, lbl)
    expect = (-1.0 / 2.5) * np.trace(np.linalg.solve(Sb + 0.1 * np.eye(Q), Sw))
    p = DGPLVM(2.5, lbl, (N, Q))
    got = float(p.lnpdf(x.ravel()))
    assert abs(got - expect) < 1e-10


def test_dgplvm_lamda_and_t_projections():
    rng = np.random.default_rng(1)
    N, Q, C = 15, 4, 2
    x = rng.normal(size=(N, Q))
    lbl = _make_labels(N, C, rng)
    lam = rng.random(Q) + 0.5
    Sb, Sw = _scatter_oracle(x * lam, lbl)
    expect = (-1.0 / 1.7) * np.trace(np.linalg.solve(Sb + 0.9 * np.eye(Q), Sw))
    got = float(DGPLVM_Lamda(1.7, lbl, (N, Q), lam).lnpdf(x))
    assert abs(got - expect) < 1e-10

    vec = rng.normal(size=(Q, 2))
    Sb, Sw = _scatter_oracle(x @ vec, lbl)
    expect = (-1.0 / 1.7) * np.trace(np.linalg.solve(Sb + 0.1 * np.eye(2), Sw))
    got = float(DGPLVM_T(1.7, lbl, (N, Q), vec).lnpdf(x))
    assert abs(got - expect) < 1e-10


def test_dgplvm_kfda_matches_reference_formula_sorted():
    # Sorted-by-class rows: the reference's positional a/A equal ours.
    rng = np.random.default_rng(2)
    N0, N1, Q = 7, 9, 3
    N = N0 + N1
    x = rng.normal(size=(N, Q))
    lbl = np.zeros((N, 2))
    lbl[:N0, 0] = 1
    lbl[N0:, 1] = 1
    kern = gpy_tpu.kern.RBF(Q, variance=1.3, lengthscale=0.8)
    lambdaa, sigma2 = 0.05, 2.0
    K = np.asarray(kern.K(jnp.asarray(x)))
    a = np.concatenate([np.full(N0, 1 / N0), np.full(N1, -1 / N1)])[:, None]
    A = np.zeros((N, N))
    A[:N0, :N0] = (np.eye(N0) - 1 / N0) / np.sqrt(N0)
    A[N0:, N0:] = (np.eye(N1) - 1 / N1) / np.sqrt(N1)
    paran = lambdaa * np.eye(N) + A @ K @ A
    J = a.T @ K @ a - a.T @ K @ A @ np.linalg.solve(paran, A @ K @ a)
    expect = float((-1.0 / sigma2) * J.item() / lambdaa)
    p = DGPLVM_KFDA(lambdaa, sigma2, lbl, kern, (N, Q))
    assert abs(float(p.lnpdf(x)) - expect) < 1e-8


@pytest.mark.parametrize("cls", ["dgplvm", "kfda"])
def test_dgplvm_grad_finite_difference(cls):
    rng = np.random.default_rng(3)
    N, Q = 10, 2
    x = rng.normal(size=(N, Q))
    lbl = _make_labels(N, 2, rng)
    if cls == "dgplvm":
        p = DGPLVM(1.0, lbl, (N, Q))
    else:
        p = DGPLVM_KFDA(0.1, 1.0, lbl, gpy_tpu.kern.RBF(Q), (N, Q))
    f = lambda v: p.lnpdf(v.reshape(N, Q))
    g = np.asarray(jax.grad(lambda v: f(v))(jnp.asarray(x.ravel())))
    eps = 1e-6
    for i in rng.choice(N * Q, 6, replace=False):
        e = np.zeros(N * Q)
        e[i] = eps
        fd = (float(f(jnp.asarray(x.ravel() + e))) - float(f(jnp.asarray(x.ravel() - e)))) / (2 * eps)
        assert abs(fd - g[i]) < 1e-4 * max(1.0, abs(fd))


def test_dgplvm_prior_on_gplvm_latent():
    # Attaching the prior to a GPLVM's X shifts the objective by -lnpdf and
    # the discriminative term pulls same-class points together.
    rng = np.random.default_rng(4)
    N, Q, D = 16, 2, 3
    lbl = _make_labels(N, 2, rng)
    Y = rng.normal(size=(N, D)) + 2.0 * lbl[:, :1]
    m = gpy_tpu.models.GPLVM(Y, Q)
    base = float(m.objective_function())
    prior = DGPLVM(1.0, lbl, (N, Q))
    m.latent_X.set_prior(prior)
    shifted = float(m.objective_function())
    assert abs((base - float(prior.lnpdf(np.asarray(m.latent_X.values)))) - shifted) < 1e-6
    m.optimize(max_iters=30)
    assert np.isfinite(float(m.objective_function()))
