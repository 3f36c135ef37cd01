from .grid import HyperparameterGrid  # noqa: F401
from .search import select_best_model, bayesian_model_average, GridSearch  # noqa: F401
