from . import diagnostics
from . import linalg
from . import normalizer
from . import mocap
from . import netpbmfile

__all__ = ["linalg", "normalizer", "mocap", "netpbmfile"]
