"""Classification models.

Reference: GPy/models/gp_classification.py:10 (Bernoulli+EP) and GPy's
Laplace alternative (examples/classification.py).
"""
from __future__ import annotations

import numpy as np

from ..core.gp import GP
from ..inference.ep import EP
from ..inference.laplace import Laplace
from ..kern import RBF
from ..likelihoods import Bernoulli

__all__ = ["GPClassification", "GPClassificationLaplace"]


class GPClassification(GP):
    """Binary GP classification: Bernoulli(probit) likelihood + EP inference."""

    def __init__(self, X, Y, kernel=None, Y_metadata=None, mean_function=None,
                 inference_method=None, likelihood=None, name="gp_classification"):
        if kernel is None:
            kernel = RBF(np.asarray(X).shape[1])
        likelihood = likelihood or Bernoulli()
        super().__init__(
            X, Y, kernel, likelihood,
            inference_method=inference_method or EP(),
            mean_function=mean_function, name=name, Y_metadata=Y_metadata,
        )


class GPClassificationLaplace(GPClassification):
    def __init__(self, X, Y, kernel=None, **kw):
        super().__init__(X, Y, kernel=kernel, inference_method=Laplace(), **kw)
