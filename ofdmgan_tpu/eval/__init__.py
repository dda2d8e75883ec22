from . import benchmark, equalizers, metrics  # noqa: F401
from .equalizers import compare_equalizers  # noqa: F401
