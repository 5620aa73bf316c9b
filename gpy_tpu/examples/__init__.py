from . import advanced, regression, classification, dimensionality_reduction, non_gaussian, state_space

__all__ = ["regression", "classification", "dimensionality_reduction", "non_gaussian", "state_space"]
