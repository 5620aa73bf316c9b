"""Kernel zoo (public names mirror GPy/kern/__init__.py:34-74)."""
from .kern import Kern, CombinationKernel, Add, Prod
from .stationary import (
    Stationary,
    RBF,
    ExpQuad,
    Exponential,
    OU,
    Matern32,
    Matern52,
    Cosine,
    ExpQuadCosine,
    Sinc,
    RatQuad,
)
from .linear import Linear, LinearFull, TruncLinear, TruncLinear_inf
from .static import Static, White, Bias, Fixed, WhiteHeteroscedastic, Precomputed
from .periodic import StdPeriodic, PeriodicExponential, PeriodicMatern32, PeriodicMatern52
from .misc import MLP, Poly, Brownian, Spline
from .coregionalize import Coregionalize, IndependentOutputs, Hierarchical
from .basis_funcs import (
    BasisFuncKernel,
    PolynomialBasisFuncKernel,
    LinearSlopeBasisFuncKernel,
    ChangePointBasisFuncKernel,
    DomainKernel,
    LogisticBasisFuncKernel,
)
from .integral import Integral, Integral_Limits, Multidimensional_Integral_Limits
from .symmetric import Symmetric, SplitKern, DEtime, GridRBF
from .eq_ode1 import EQ_ODE1
from .eq_ode2 import EQ_ODE2
from .ode_uy import ODE_UY, ODE_UYC, ODE_st, ODE_t
from .multioutput_kern import DiffKern, MultioutputKern, MultioutputDerivativeKern
from .psi_comp import PSICOMP_RBF, PSICOMP_Linear
from .symbolic import Symbolic
from . import sde  # attaches sde() to RBF/StdPeriodic/Bias

# GPy exports state-space-ready kernels under sde_* names (kern/__init__.py:65-71,
# each an sde_X(X) subclass adding only .sde()). Here every kernel that has a
# state-space form carries .sde() directly (sde.py attach_sde; stationary.py for
# the Materns/OU), and White is folded exactly into the observation noise by
# models/state_space.py — so the sde_* names are the kernels themselves.
sde_Matern32 = Matern32
sde_Matern52 = Matern52
sde_Exponential = Exponential
sde_RBF = RBF
sde_RatQuad = RatQuad
sde_StdPeriodic = StdPeriodic
sde_Linear = Linear
sde_White = White
sde_Bias = Bias
sde_Brownian = Brownian

# GPy kern/__init__.py:59 — DiffGenomeKern is the DEtime split kernel.
DiffGenomeKern = DEtime

__all__ = [
    "Kern", "CombinationKernel", "Add", "Prod",
    "Stationary", "RBF", "ExpQuad", "Exponential", "OU", "Matern32", "Matern52",
    "Cosine", "ExpQuadCosine", "Sinc", "RatQuad",
    "Linear", "LinearFull", "TruncLinear", "TruncLinear_inf",
    "Static", "White", "Bias", "Fixed", "WhiteHeteroscedastic", "Precomputed",
    "StdPeriodic", "PeriodicExponential", "PeriodicMatern32", "PeriodicMatern52",
    "MLP", "Poly", "Brownian", "Spline",
    "Coregionalize", "IndependentOutputs", "Hierarchical",
    "BasisFuncKernel", "PolynomialBasisFuncKernel", "LinearSlopeBasisFuncKernel",
    "ChangePointBasisFuncKernel", "DomainKernel", "LogisticBasisFuncKernel",
    "Integral", "Integral_Limits", "Multidimensional_Integral_Limits",
    "Symmetric", "SplitKern", "DEtime", "GridRBF",
    "DiffKern", "MultioutputKern", "MultioutputDerivativeKern",
    "EQ_ODE1", "EQ_ODE2", "ODE_UY", "ODE_UYC", "ODE_st", "ODE_t",
    "Symbolic",
    "sde_Matern32", "sde_Matern52", "sde_Exponential", "sde_RBF", "sde_RatQuad",
    "sde_StdPeriodic", "sde_Linear", "sde_White", "sde_Bias", "sde_Brownian",
    "DiffGenomeKern",
]
