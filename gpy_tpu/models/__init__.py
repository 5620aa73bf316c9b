"""Models zoo (public names mirror GPy/models/__init__.py)."""
from .gp_regression import GPRegression

__all__ = ["GPRegression"]
