from .base import BayesPRSModel  # noqa: F401
from .viprs import VIPRS  # noqa: F401
from .mix import VIPRSMix  # noqa: F401
from .grid import VIPRSGrid  # noqa: F401
from .mix_grid import VIPRSMixGrid  # noqa: F401
from .ldpred_inf import LDPredInf  # noqa: F401
