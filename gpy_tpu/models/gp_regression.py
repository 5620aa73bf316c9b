"""GPRegression. Reference: GPy/models/gp_regression.py:9-36."""
from __future__ import annotations

import numpy as np

from ..core.gp import GP
from ..inference.exact import ExactGaussianInference
from ..kern import RBF
from ..likelihoods import Gaussian

__all__ = ["GPRegression"]


class GPRegression(GP):
    """Exact GP regression with Gaussian noise (defaults: RBF kernel).

    GPRegression(X, Y).optimize().predict(Xs) mirrors the GPy call surface.
    """

    def __init__(self, X, Y, kernel=None, Y_metadata=None, normalizer=None,
                 noise_var=1.0, mean_function=None, inference_method=None,
                 name="GP regression"):
        """inference_method: defaults to dense ExactGaussianInference; pass
        gpy_tpu.inference.IterativeGaussianInference() for matrix-free
        CG/SLQ inference at N beyond dense-Cholesky memory."""
        if kernel is None:
            kernel = RBF(np.asarray(X).shape[1])
        likelihood = Gaussian(variance=noise_var)
        super().__init__(
            X, Y, kernel, likelihood,
            inference_method=inference_method or ExactGaussianInference(),
            mean_function=mean_function,
            name=name, Y_metadata=Y_metadata, normalizer=normalizer,
        )
