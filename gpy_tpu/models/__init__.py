"""Models zoo (public names mirror GPy/models/__init__.py)."""
from .gp_regression import GPRegression
from .gp_classification import GPClassification, GPClassificationLaplace
from .sparse_gp_regression import SparseGPRegression, SparseGPRegressionMD
from .sparse_gp_classification import (
    SparseGPClassification,
    SparseGPClassificationUncertainInput,
)
from .gplvm import GPLVM, SparseGPLVM, BayesianGPLVM, MRD, BCGPLVM, DPBayesianGPLVM
from .warped_gp import WarpedGP, InputWarpedGP
from .tp_regression import TPRegression
from .gp_coregionalized_regression import (
    GPCoregionalizedRegression,
    SparseGPCoregionalizedRegression,
    GPHeteroscedasticRegression,
    GPOffsetRegression,
)
from .gp_var_gauss import GPVariationalGaussianApproximation
from .one_vs_all_classification import OneVsAllClassification, OneVsAllSparseClassification
from .gp_kronecker_gaussian_regression import GPKroneckerGaussianRegression, GPRegressionGrid
from .multioutput_gp import MultioutputGP
from .sparse_gp_minibatch import SparseGPMiniBatch, BayesianGPLVMMiniBatch
from .state_space import StateSpace
from .gp_multiout_regression import GPMultioutRegression, GPMultioutRegressionMD
from .ss_gplvm import SSGPLVM, SSMRD
from .ibp_lfm import IBPLFM
from ..core.svgp import SVGP

__all__ = [
    "GPRegression",
    "GPClassification",
    "GPClassificationLaplace",
    "SparseGPRegression",
    "SparseGPRegressionMD",
    "SparseGPClassification",
    "SparseGPClassificationUncertainInput",
    "GPLVM",
    "SparseGPLVM",
    "BayesianGPLVM",
    "BCGPLVM",
    "DPBayesianGPLVM",
    "MRD",
    "WarpedGP",
    "InputWarpedGP",
    "TPRegression",
    "GPCoregionalizedRegression",
    "SparseGPCoregionalizedRegression",
    "GPHeteroscedasticRegression",
    "GPOffsetRegression",
    "GPVariationalGaussianApproximation",
    "OneVsAllClassification",
    "OneVsAllSparseClassification",
    "GPKroneckerGaussianRegression",
    "GPRegressionGrid",
    "SVGP",
    "MultioutputGP",
    "SparseGPMiniBatch",
    "BayesianGPLVMMiniBatch",
    "StateSpace",
    "GPMultioutRegression",
    "GPMultioutRegressionMD",
    "SSGPLVM",
    "SSMRD",
    "IBPLFM",
]

from .gradient_checker import GradientChecker, HessianChecker, SkewChecker  # noqa: E402,F401
