"""Mean functions / mappings.

Reference: GPy/core/mapping.py (Mapping, Bijective_mapping) and GPy/mappings/
(Linear, Constant, Additive, Compound, Identity, MLP, Kernel). `gradients_X`
and `update_gradients` towers are autodiff'd away — only `f` is needed.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .core.module import Module

__all__ = ["Mapping", "Linear", "Constant", "Additive", "Compound", "Identity",
           "MLP", "MLPext", "PiecewiseLinear", "Kernel"]


class Mapping(Module):
    def __init__(self, input_dim, output_dim, name="mapping"):
        super().__init__(name=name)
        self.input_dim = int(input_dim)
        self.output_dim = int(output_dim)

    def f(self, X):
        raise NotImplementedError

    def gradients_X(self, dL_dF, X):
        g = jax.grad(lambda x: jnp.sum(jnp.asarray(dL_dF) * self.f(x)))
        return g(jnp.asarray(X))

    def __add__(self, other):
        return Additive(self, other)


class Linear(Mapping):
    """f(X) = X A. GPy: mappings/linear.py."""

    def __init__(self, input_dim, output_dim, name="linmap"):
        super().__init__(input_dim, output_dim, name)
        self._add_param("A", np.random.randn(input_dim, output_dim))

    def f(self, X):
        return X @ jnp.asarray(self.A)


class Constant(Mapping):
    """f(X) = c. GPy: mappings/constant.py."""

    def __init__(self, input_dim, output_dim, value=0.0, name="constmap"):
        super().__init__(input_dim, output_dim, name)
        self._add_param("C", np.full((1, output_dim), float(value)))

    def f(self, X):
        return jnp.broadcast_to(jnp.asarray(self.C), (X.shape[0], self.output_dim))


class Identity(Mapping):
    def __init__(self, input_dim, output_dim, name="identity"):
        assert input_dim == output_dim
        super().__init__(input_dim, output_dim, name)

    def f(self, X):
        return X


class Additive(Mapping):
    def __init__(self, mapping1, mapping2, name="add_map"):
        assert mapping1.input_dim == mapping2.input_dim
        assert mapping1.output_dim == mapping2.output_dim
        super().__init__(mapping1.input_dim, mapping1.output_dim, name)
        self.mapping1 = mapping1
        self.mapping2 = mapping2

    def f(self, X):
        return self.mapping1.f(X) + self.mapping2.f(X)


class Compound(Mapping):
    def __init__(self, mapping1, mapping2, name="compound_map"):
        assert mapping1.output_dim == mapping2.input_dim
        super().__init__(mapping1.input_dim, mapping2.output_dim, name)
        self.mapping1 = mapping1
        self.mapping2 = mapping2

    def f(self, X):
        return self.mapping2.f(self.mapping1.f(X))


class MLP(Mapping):
    """One-hidden-layer tanh MLP mean function. GPy: mappings/mlp.py."""

    def __init__(self, input_dim, output_dim, hidden_dim=3, name="mlpmap"):
        super().__init__(input_dim, output_dim, name)
        self.hidden_dim = int(hidden_dim)
        self._add_param("W1", np.random.randn(input_dim, hidden_dim) / np.sqrt(input_dim + 1))
        self._add_param("b1", np.zeros(hidden_dim))
        self._add_param("W2", np.random.randn(hidden_dim, output_dim) / np.sqrt(hidden_dim + 1))
        self._add_param("b2", np.zeros(output_dim))

    def f(self, X):
        h = jnp.tanh(X @ jnp.asarray(self.W1) + jnp.asarray(self.b1))
        return h @ jnp.asarray(self.W2) + jnp.asarray(self.b2)


class MLPext(Mapping):
    """Multi-hidden-layer MLP mean function, linear output layer.

    GPy: mappings/mlpext.py:8 (tanh/sigmoid/relu activations; optional
    Gaussian prior on all weights via set_prior)."""

    _ACTS = {"tanh": jnp.tanh,
             "sigmoid": lambda x: 1.0 / (1.0 + jnp.exp(-x)),
             "relu": lambda x: jnp.where(x < 0, 0.0, x)}

    def __init__(self, input_dim=1, output_dim=1, hidden_dims=(3,), prior=None,
                 activation="tanh", name="mlpmap"):
        super().__init__(input_dim, output_dim, name)
        assert activation in self._ACTS, "activation must be tanh/sigmoid/relu"
        self.activation = activation
        self.hidden_dims = list(hidden_dims)
        rng = np.random.default_rng(0)
        dims = [input_dim] + self.hidden_dims + [output_dim]
        self._n_layers = len(dims) - 1
        for i in range(self._n_layers):
            self._add_param("W%d" % i, rng.standard_normal((dims[i], dims[i + 1])))
            self._add_param("b%d" % i, rng.standard_normal(dims[i + 1]))
        if prior is not None:
            from .core.priors import Gaussian as GaussianPrior

            self.set_prior(GaussianPrior(0.0, float(prior)))

    def f(self, X):
        act = self._ACTS[self.activation]
        h = jnp.asarray(X)
        for i in range(self._n_layers):
            h = h @ jnp.asarray(getattr(self, "W%d" % i)) + jnp.asarray(getattr(self, "b%d" % i))
            if i < self._n_layers - 1:
                h = act(h)
        return h


class PiecewiseLinear(Mapping):
    """1-D piecewise-linear mapping through (breaks, values) knots; slope 1
    outside the knot range. GPy: mappings/piecewise_linear.py:5."""

    def __init__(self, input_dim, output_dim, values, breaks, name="piecewise_linear"):
        assert input_dim == 1 and output_dim == 1
        super().__init__(input_dim, output_dim, name)
        values = np.asarray(values, dtype=float).ravel()
        breaks = np.asarray(breaks, dtype=float).ravel()
        assert values.size == breaks.size
        self._add_param("values", values)
        self._add_param("breaks", breaks)

    def f(self, X):
        x = jnp.asarray(X).ravel()
        b = jnp.asarray(self.breaks)
        v = jnp.asarray(self.values)
        order = jnp.argsort(b)
        sb, sv = b[order], v[order]
        # interior: interpolate; jnp.interp is piecewise-linear between knots
        y = jnp.interp(x, sb, sv)
        # unit-slope extrapolation outside the knot range (GPy semantics)
        y = jnp.where(x < sb[0], x + sv[0] - sb[0], y)
        y = jnp.where(x > sb[-1], x + sv[-1] - sb[-1], y)
        return y.reshape(-1, 1)


class Kernel(Mapping):
    """f(X) = K(X, Z) A — kernel-basis mapping. GPy: mappings/kernel.py."""

    def __init__(self, input_dim, output_dim, Z, kernel, name="kernmap"):
        super().__init__(input_dim, output_dim, name)
        self.Z = jnp.asarray(Z)
        self.kernel = kernel
        self._add_param("A", np.random.randn(np.asarray(Z).shape[0], output_dim))

    def f(self, X):
        return self.kernel.K(X, self.Z) @ jnp.asarray(self.A)
