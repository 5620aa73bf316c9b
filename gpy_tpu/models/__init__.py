"""Models zoo (public names mirror GPy/models/__init__.py)."""
from .gp_regression import GPRegression
from .gp_classification import GPClassification, GPClassificationLaplace

__all__ = ["GPRegression", "GPClassification", "GPClassificationLaplace"]
