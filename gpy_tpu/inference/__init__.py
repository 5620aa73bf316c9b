"""Inference methods (reference: GPy/inference/latent_function_inference/)."""
from .exact import LatentFunctionInference, ExactGaussianInference, ExactStudentTInference
from .posterior import Posterior
from .laplace import Laplace
from .ep import EP

__all__ = [
    "LatentFunctionInference",
    "ExactGaussianInference",
    "ExactStudentTInference",
    "Posterior",
    "Laplace",
    "EP",
]
