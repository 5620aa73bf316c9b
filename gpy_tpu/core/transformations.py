"""Constraint bijectors: unconstrained optimizer space <-> constrained params.

Replaces paramz transformations (reference: GPy/core/parameterization/
transformations.py re-exports paramz's Logexp/Logistic/NegativeLogexp/...).
In GPy the optimizer works in `optimizer_array` space and gradients are
chain-ruled back by `_transform_gradients`; here the transform is applied
*inside* the jitted loss so autodiff does the chain rule.

All transforms are stateless frozen singletons so they can live in pytree
aux_data (hashable / comparable).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.nn import softplus

__all__ = [
    "Transform",
    "Logexp",
    "Exponent",
    "NegativeLogexp",
    "Logistic",
    "Fixed",
    "positive",
    "negative",
    "bounded",
]

_LIM = 36.0  # beyond this softplus(x) == x to double precision


class Transform:
    """Bijector: forward(raw unconstrained) -> constrained value."""

    domain = "real"

    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def initial_raw(self, y):
        return self.inverse(jnp.asarray(y))

    def __repr__(self):
        return self.__class__.__name__

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self), tuple(sorted(self.__dict__.items()))))

    def __str__(self):
        return ""


class Logexp(Transform):
    """softplus: y = log(1+exp(x)) — GPy's positivity constraint (paramz Logexp)."""

    domain = "positive"

    def forward(self, x):
        return softplus(x)

    def inverse(self, y):
        y = jnp.asarray(y)
        # stable inverse-softplus: log(exp(y)-1) = y + log1p(-exp(-y))
        return jnp.where(y > _LIM, y, jnp.log(jnp.expm1(jnp.clip(y, 1e-300, _LIM))))

    def __str__(self):
        return "+ve"


class Exponent(Transform):
    """y = exp(x)."""

    domain = "positive"

    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(jnp.asarray(y))

    def __str__(self):
        return "+ve(exp)"


class NegativeLogexp(Transform):
    domain = "negative"

    def forward(self, x):
        return -softplus(x)

    def inverse(self, y):
        return Logexp().inverse(-jnp.asarray(y))

    def __str__(self):
        return "-ve"


class Logistic(Transform):
    """y = lo + (hi-lo) * sigmoid(x) — GPy's Logistic(lower, upper)."""

    domain = "bounded"

    def __init__(self, lower: float, upper: float):
        self.lower = float(lower)
        self.upper = float(upper)

    def forward(self, x):
        return self.lower + (self.upper - self.lower) / (1.0 + jnp.exp(-x))

    def inverse(self, y):
        y = jnp.asarray(y)
        p = jnp.clip((y - self.lower) / (self.upper - self.lower), 1e-12, 1 - 1e-12)
        return jnp.log(p) - jnp.log1p(-p)

    def __repr__(self):
        return f"Logistic({self.lower}, {self.upper})"

    def __str__(self):
        return f"{self.lower},{self.upper}"


class Fixed(Transform):
    """Marker used by `param.fix()` (GPy `__fixed__`)."""

    def __str__(self):
        return "fixed"


def positive() -> Transform:
    return Logexp()


def negative() -> Transform:
    return NegativeLogexp()


def bounded(lower: float, upper: float) -> Transform:
    return Logistic(lower, upper)
