from . import linalg
from . import normalizer

__all__ = ["linalg", "normalizer"]
