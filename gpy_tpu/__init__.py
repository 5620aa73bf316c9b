"""gpy_tpu: TPU-native Gaussian-process framework (capabilities of SheffieldML/GPy).

Built from scratch in JAX/XLA/Pallas. See SURVEY.md for the reference map.
Public surface mirrors GPy: gpy_tpu.models, gpy_tpu.kern, gpy_tpu.likelihoods,
gpy_tpu.inference, gpy_tpu.priors, gpy_tpu.mappings.
"""
from . import config  # noqa: F401  (sets x64 policy before anything else)
from . import kern
from . import likelihoods
from . import inference
from . import models
from . import mappings
from . import util
from .core import priors
from .core.model import Model
from .core.module import Module, Param
from .core.gp import GP

__version__ = "0.1.0"

__all__ = [
    "kern", "likelihoods", "inference", "models", "mappings", "util", "priors",
    "plotting", "examples", "mcmc", "parallel",
    "Model", "Module", "Param", "GP",
]


def __getattr__(name):
    # plotting (matplotlib import) and examples are heavy — load lazily,
    # but keep them on the public surface as GPy does (GPy/__init__.py
    # imports plotting eagerly when matplotlib is present)
    if name in ("plotting", "examples", "mcmc", "parallel"):
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def load(path):
    """Load a pickled/serialized model. GPy: GPy/__init__.py:41-58."""
    from .util.serialization import load_model

    return load_model(path)
