"""Inference methods (reference: GPy/inference/latent_function_inference/)."""
from .exact import LatentFunctionInference, ExactGaussianInference, ExactStudentTInference
from .posterior import Posterior
from .laplace import Laplace, LaplaceBlock
from .ep import EP
from .var_dtc import VarDTC, VarDTC_minibatch
from .fitc import FITC, DTC, PEP
from .svgp import SVGPInference
from .svi_multiout import VarDTC_SVI_Multiout, VarDTC_SVI_Multiout_Miss, PosteriorMultioutput
from .var_gauss import VarGauss
from .grid import GaussianGridInference
from .var_dtc_missing import VarDTCMissingData
from .epdtc import EPDTC

__all__ = [
    "LatentFunctionInference",
    "ExactGaussianInference",
    "ExactStudentTInference",
    "Posterior",
    "Laplace",
    "LaplaceBlock",
    "EP",
    "VarDTC",
    "FITC",
    "DTC",
    "PEP",
    "SVGPInference",
    "VarGauss",
    "VarDTCMissingData",
    "EPDTC",
    "VarDTC_minibatch",
    "VarDTC_SVI_Multiout",
    "VarDTC_SVI_Multiout_Miss",
    "GaussianGridInference",
]

from .iterative import IterativeGaussianInference  # noqa: E402,F401
