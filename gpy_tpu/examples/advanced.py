"""Demos of surface the reference framework does not ship runnable examples
for: parameter tying, symbolic (sympy) likelihoods, and matrix-free exact
GPs with the differentiable fused Pallas gram-matvec. Each function builds,
optimizes, and returns the model (plot=True to draw), matching the style of
the other example modules (reference: GPy/examples/*).
"""
from __future__ import annotations

import numpy as np

from ..models import GPRegression
import gpy_tpu.kern as kern


def tied_lengthscales(n=80, optimize=True, plot=False):
    """Sum of an RBF and a Matern32 constrained to share one lengthscale:
    `m.tie(...)` keeps the values equal with a single optimizer slot
    (paramz tie parity)."""
    rng = np.random.default_rng(0)
    X = np.sort(rng.random((n, 1)) * 8.0, axis=0)
    Y = np.sin(X) + 0.15 * rng.standard_normal((n, 1))
    k = kern.RBF(1) + kern.Matern32(1)
    m = GPRegression(X, Y, k, noise_var=0.1)
    m.tie("kern.parts#0.lengthscale", "kern.parts#1.lengthscale")
    if optimize:
        m.optimize()
    assert float(np.asarray(m.kern.parts[0].lengthscale)) == float(
        np.asarray(m.kern.parts[1].lengthscale))
    if plot:
        m.plot()
    return m


def symbolic_laplace_regression(n=60, optimize=True, plot=False):
    """A likelihood written as a sympy log-pdf (heavy-tailed Student-t with
    trainable scale) trained with Laplace inference — the derivative towers
    the reference code-generates (GPy/core/symbolic.py) come from autodiff."""
    import sympy

    from ..core.gp import GP
    from ..inference.laplace import Laplace
    from ..likelihoods import SymbolicLikelihood

    f, y = sympy.symbols("f y")
    s = sympy.Symbol("s", positive=True)
    nu = sympy.Integer(4)
    expr = (sympy.log(sympy.gamma((nu + 1) / 2)
                      / (sympy.gamma(nu / 2) * sympy.sqrt(nu * sympy.pi * s)))
            - (nu + 1) / 2 * sympy.log(1 + (y - f) ** 2 / (nu * s)))
    lik = SymbolicLikelihood(expr, parameters={"s": 0.1}, name="studentT_sym")

    rng = np.random.default_rng(1)
    X = np.sort(rng.random((n, 1)) * 6.0, axis=0)
    Y = np.sin(X) + 0.1 * rng.standard_normal((n, 1))
    Y[::13] += 2.0  # outliers the heavy tails absorb
    m = GP(X, Y, kern.RBF(1), lik, inference_method=Laplace())
    if optimize:
        m.optimize(max_iters=150)
    if plot:
        m.plot()
    return m


def big_data_svgp(n=200_000, optimize=True, plot=False):
    """SVGP at large N with shuffled-window minibatching: fit() pre-shuffles
    the dataset once on device and draws contiguous windows per step
    (batch_mode='auto' switches this on from 2^20 rows — a random index
    gather costs ~12 ns per gathered element on TPU regardless of index
    locality, ~0.44 ms/step at N=10M, while the contiguous slice is free).
    Shown here with batch_mode forced on so the demo is fast at 200k."""
    from ..core.svgp import SVGP
    from ..likelihoods import Gaussian

    rng = np.random.default_rng(3)
    X = (rng.random((n, 4)) * 4.0).astype(np.float32)
    Y = (np.sin(X[:, :1]) + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    Z = X[rng.permutation(n)[:256]].copy()
    m = SVGP(X, Y, Z, kern.RBF(4, ARD=True), Gaussian(variance=0.1))
    if optimize:
        m.fit(iters=300, batchsize=2048, batch_mode="shuffle_slice")
    if plot:
        m.plot()
    return m


def matrix_free_exact_gp(n=3000, optimize=True, plot=False):
    """Exact GP via CG + stochastic Lanczos quadrature with the fused Pallas
    gram-matvec (Gram tiles never leave VMEM; differentiable end to end) —
    the path that scales one-chip exact inference past the 10GB dense Gram."""
    from ..inference.iterative import IterativeGaussianInference

    rng = np.random.default_rng(2)
    X = (rng.random((n, 2)) * 6.0).astype(np.float32)
    Y = (np.sin(X[:, :1]) * np.cos(0.5 * X[:, 1:])
         + 0.1 * rng.standard_normal((n, 1))).astype(np.float32)
    m = GPRegression(X, Y, noise_var=0.1,
                     inference_method=IterativeGaussianInference(
                         max_cg=32, n_probes=8, fused=True))
    if optimize:
        m.optimize(optimizer="adam", max_iters=60, step_size=5e-2)
    if plot:
        m.plot()
    return m
