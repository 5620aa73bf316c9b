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

__all__ = ["Mapping", "Linear", "Constant", "Additive", "Compound", "Identity", "MLP", "Kernel"]


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


class Kernel(Mapping):
    """f(X) = K(X, Z) A — kernel-basis mapping. GPy: mappings/kernel.py."""

    def __init__(self, input_dim, output_dim, Z, kernel, name="kernmap"):
        super().__init__(input_dim, output_dim, name)
        self.Z = jnp.asarray(Z)
        self.kernel = kernel
        self._add_param("A", np.random.randn(np.asarray(Z).shape[0], output_dim))

    def f(self, X):
        return self.kernel.K(X, self.Z) @ jnp.asarray(self.A)
