from .constants import Constants, DEFAULT_CONSTANTS, P3_CONSTANTS
from .coupler import Coupler, Tracer, hmean
