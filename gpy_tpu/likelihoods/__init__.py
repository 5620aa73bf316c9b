"""Likelihood tower (public names mirror GPy/likelihoods/__init__.py)."""
from . import link_functions
from .likelihood import Likelihood
from .gaussian import Gaussian, HeteroscedasticGaussian
from .bernoulli import Bernoulli
from .families import (
    Poisson,
    Binomial,
    Exponential,
    Gamma,
    StudentT,
    Weibull,
    LogLogistic,
    LogGaussian,
)
from .mixed_noise import MixedNoise, MultioutputLikelihood
from .symbolic import SymbolicLikelihood

__all__ = [
    "SymbolicLikelihood",
    "link_functions",
    "Likelihood",
    "Gaussian",
    "HeteroscedasticGaussian",
    "Bernoulli",
    "Poisson",
    "Binomial",
    "Exponential",
    "Gamma",
    "StudentT",
    "Weibull",
    "LogLogistic",
    "LogGaussian",
    "MixedNoise",
    "MultioutputLikelihood",
]
