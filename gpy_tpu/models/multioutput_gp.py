"""MultioutputGP: heterogeneous outputs + derivative observations.

Reference: GPy/models/multioutput_gp.py:24.
"""
from __future__ import annotations

import numpy as np

from ..core.gp import GP
from ..inference.exact import ExactGaussianInference
from ..kern.multioutput_kern import MultioutputKern
from ..likelihoods import Gaussian, MixedNoise, MultioutputLikelihood
from ..util import multioutput

__all__ = ["MultioutputGP"]


class MultioutputGP(GP):
    def __init__(self, X_list, Y_list, kernel_list, likelihood_list=None,
                 kernel_cross_covariances={}, inference_method=None,
                 name="multioutputgp"):
        X, Y, self.output_index = multioutput.build_XY(X_list, Y_list)
        kernel = MultioutputKern(kernel_list, kernel_cross_covariances)
        if likelihood_list is None:
            likelihood_list = [Gaussian(name=f"noise_{i}") for i in range(len(Y_list))]
        if all(isinstance(l, Gaussian) for l in likelihood_list):
            likelihood = MixedNoise(likelihood_list)
            inference_method = inference_method or ExactGaussianInference()
        else:
            likelihood = MultioutputLikelihood(likelihood_list)
            if inference_method is None:
                from ..inference.ep import EP

                inference_method = EP()
        super().__init__(
            X, Y, kernel, likelihood, inference_method=inference_method,
            Y_metadata={"output_index": self.output_index}, name=name,
        )

    def predict(self, Xnew, Y_metadata=None, **kw):
        """Xnew must carry the output-index column (build with
        util.multioutput.build_XY)."""
        if Y_metadata is None:
            Y_metadata = {"output_index": np.asarray(Xnew)[:, -1:].astype(int)}
        return super().predict(Xnew, Y_metadata=Y_metadata, **kw)
