from .optimize import OptimizeResult, IterationConditionCounter  # noqa: F401
from .exceptions import OptimizationDivergence  # noqa: F401
