"""Symbolic (sympy-defined) covariance functions.

Reference: GPy/kern/src/symbolic.py (Symbolic kernel) + GPy/core/symbolic.py
(Symbolic_core: 420 lines of sympy codegen — expression caching, hand-rolled
`sym.diff` derivative tables for theta and X, C-code generation via
sympy_helpers.cpp).

TPU design: the entire codegen machinery collapses to `sympy.lambdify` with
the JAX printer. The lambdified expression is ordinary jnp code, so XLA
traces/fuses it like any hand-written kernel and **autodiff supplies every
derivative** the reference generated symbolically (dK/dtheta, dK/dX,
gradients_X_diag). K(X, X2) is evaluated by broadcasting column slices
(N,1) x (1,M) through the scalar expression — one fused elementwise XLA
program, no N*M Python loop.

Variables: the expression uses `x_0..x_{Q-1}` and `z_0..z_{Q-1}` (or plain
`x`, `z` when input_dim == 1); every other free symbol becomes a trainable
parameter (positive by default, matching GPy kernel conventions).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.transformations import Logexp
from .kern import Kern

__all__ = ["Symbolic"]


class Symbolic(Kern):
    def __init__(self, input_dim, k=None, parameters=None, active_dims=None,
                 name="symbolic", positive_params=True):
        """k: a sympy expression in x_i, z_i and parameter symbols.

        parameters: optional {name: initial_value} for the parameter symbols
        (default 1.0). positive_params: constrain parameters through Logexp
        (set False for expressions needing signed parameters).
        """
        import sympy

        if k is None:
            raise ValueError("You must provide a sympy expression for the covariance function.")
        super().__init__(input_dim, active_dims=active_dims, name=name)

        x_syms = [sympy.Symbol(f"x_{i}") for i in range(input_dim)]
        z_syms = [sympy.Symbol(f"z_{i}") for i in range(input_dim)]
        if input_dim == 1:
            # accept the x/z shorthand by renaming to x_0/z_0
            k = k.subs({sympy.Symbol("x"): x_syms[0], sympy.Symbol("z"): z_syms[0]})
        elif any(s.name in ("x", "z") for s in k.free_symbols):
            raise ValueError(
                "with input_dim > 1 use x_0..x_{Q-1} / z_0..z_{Q-1}; bare "
                "'x'/'z' would silently become trainable parameters")

        io_names = {s.name for s in x_syms} | {s.name for s in z_syms}
        param_syms = sorted(
            (s for s in k.free_symbols if s.name not in io_names),
            key=lambda s: s.name,
        )
        parameters = dict(parameters or {})
        unknown = set(parameters) - {s.name for s in param_syms}
        if unknown:
            raise ValueError(f"parameters {sorted(unknown)} not in the expression")
        tr = Logexp() if positive_params else None
        for s in param_syms:
            self._add_param(s.name, float(parameters.get(s.name, 1.0)), transform=tr)
        self.__dict__["_param_names"] = [s.name for s in param_syms]
        self.__dict__["_sym_k"] = k
        self._rebuild_after_load()

    def _rebuild_after_load(self):
        """(Re)lambdify from the stored expression — also the serialization
        hook (the compiled callables are skipped by to_dict and rebuilt
        here on from_dict)."""
        import sympy

        k = self._sym_k
        x_syms = [sympy.Symbol(f"x_{i}") for i in range(self.input_dim)]
        z_syms = [sympy.Symbol(f"z_{i}") for i in range(self.input_dim)]
        param_syms = [sympy.Symbol(n) for n in self._param_names]
        # one lambdified callable for K; kdiag is K with z := x
        kdiag = k.subs(dict(zip(z_syms, x_syms)))
        args = x_syms + z_syms + param_syms
        self.__dict__["_k_fn"] = sympy.lambdify(args, k, modules="jax")
        self.__dict__["_kdiag_fn"] = sympy.lambdify(x_syms + param_syms, kdiag, modules="jax")

    def _param_values(self):
        return [jnp.asarray(getattr(self, n)) for n in self._param_names]

    def K(self, X, X2=None):
        X = self._slice(jnp.asarray(X))
        X2v = X if X2 is None else self._slice(jnp.asarray(X2))
        xs = [X[:, None, i] for i in range(self.input_dim)]
        zs = [X2v[None, :, i] for i in range(self.input_dim)]
        out = self._k_fn(*xs, *zs, *self._param_values())
        return jnp.broadcast_to(jnp.asarray(out), (X.shape[0], X2v.shape[0]))

    def Kdiag(self, X):
        X = self._slice(jnp.asarray(X))
        xs = [X[:, i] for i in range(self.input_dim)]
        out = self._kdiag_fn(*xs, *self._param_values())
        return jnp.broadcast_to(jnp.asarray(out), (X.shape[0],))

    def __str__(self):
        return f"Symbolic({self._sym_k})"
