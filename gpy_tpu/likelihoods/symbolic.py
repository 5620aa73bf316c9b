"""Symbolic (sympy-defined) likelihoods.

Reference: GPy/core/symbolic.py (Symbolic_core, 420 lines of sympy codegen:
derivative tables, expression caching, C generation). The reference ships
that machinery advertised for likelihoods as well as kernels, but its only
shipped consumer is the Symbolic kernel — no concrete symbolic likelihood
class exists in the reference tree. Here the whole engine is
`sympy.lambdify(modules="jax")` (one traced jnp expression) and the
Likelihood base's autodiff + Gauss-Hermite machinery supplies every
derivative tower, EP moment, variational expectation and predictive density
the reference would have code-generated.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.transformations import Logexp
from .likelihood import Likelihood

__all__ = ["SymbolicLikelihood"]


class SymbolicLikelihood(Likelihood):
    """Likelihood from a sympy log-pdf expression.

    log_pdf: a sympy expression for log p(y | f) in the symbols `f` (the
    GP link output) and `y` (the observation); every other free symbol
    becomes a trainable parameter (positive by default, like the symbolic
    kernel). Optional sympy expressions `conditional_mean` /
    `conditional_variance` (in `f` + parameters) enable the moment-based
    predictive API; without them the quadrature predictive density,
    variational expectations, EP moments and MCMC_pdf_samples still work.

    Example (Gaussian with trainable noise):
        f, y, s = sympy.symbols("f y s", positive=True)
        lik = SymbolicLikelihood(-(y - f)**2/(2*s) - sympy.log(2*sympy.pi*s)/2,
                                 conditional_mean=f, conditional_variance=s)
    """

    def __init__(self, log_pdf, parameters=None, conditional_mean=None,
                 conditional_variance=None, gp_link=None, name="symbolic",
                 positive_params=True):
        import sympy

        super().__init__(gp_link=gp_link, name=name)
        names = {s.name for s in log_pdf.free_symbols}
        if "f" not in names or "y" not in names:
            raise ValueError("log_pdf must use symbols 'f' and 'y'")
        param_syms = sorted(
            (s for s in log_pdf.free_symbols if s.name not in ("f", "y")),
            key=lambda s: s.name)
        parameters = dict(parameters or {})
        unknown = set(parameters) - {s.name for s in param_syms}
        if unknown:
            raise ValueError(f"parameters {sorted(unknown)} not in the expression")
        tr = Logexp() if positive_params else None
        for s in param_syms:
            self._add_param(s.name, float(parameters.get(s.name, 1.0)),
                            transform=tr)
        self.__dict__["_param_names"] = [s.name for s in param_syms]
        self.__dict__["_sym_logpdf"] = log_pdf
        self.__dict__["_sym_cmean"] = conditional_mean
        self.__dict__["_sym_cvar"] = conditional_variance
        self._rebuild_after_load()

    def _rebuild_after_load(self):
        """(Re)lambdify — also the serialization hook (compiled callables
        are rebuilt on load, matching kern/symbolic.py)."""
        import sympy

        f, y = sympy.Symbol("f"), sympy.Symbol("y")
        ps = [sympy.Symbol(n) for n in self._param_names]
        self.__dict__["_logpdf_fn"] = sympy.lambdify(
            [f, y, *ps], self._sym_logpdf, modules="jax")
        for attr, expr in (("_cmean_fn", self._sym_cmean),
                           ("_cvar_fn", self._sym_cvar)):
            self.__dict__[attr] = (
                sympy.lambdify([f, *ps], expr, modules="jax")
                if expr is not None else None)

    def __getstate__(self):
        d = dict(self.__dict__)
        for k in ("_logpdf_fn", "_cmean_fn", "_cvar_fn"):
            d.pop(k, None)  # lambdified callables don't pickle
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
        self._rebuild_after_load()

    def _pvals(self):
        return [jnp.asarray(getattr(self, n)) for n in self._param_names]

    def logpdf_link(self, link_f, y, Y_metadata=None):
        out = self._logpdf_fn(link_f, jnp.asarray(y), *self._pvals())
        return jnp.broadcast_to(jnp.asarray(out), jnp.broadcast_shapes(
            jnp.shape(link_f), jnp.shape(y)))

    def conditional_mean(self, f):
        if self._cmean_fn is None:
            raise NotImplementedError(
                "pass conditional_mean= to enable the moment predictive API")
        out = self._cmean_fn(f, *self._pvals())
        return jnp.broadcast_to(jnp.asarray(out), jnp.shape(f))

    def conditional_variance(self, f):
        if self._cvar_fn is None:
            raise NotImplementedError(
                "pass conditional_variance= to enable the moment predictive API")
        out = self._cvar_fn(f, *self._pvals())
        return jnp.broadcast_to(jnp.asarray(out), jnp.shape(f))

    def __str__(self):
        return f"SymbolicLikelihood({self._sym_logpdf})"
