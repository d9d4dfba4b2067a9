"""P3 (Predicted Particle Properties) microphysics, TPU-native port.

Reference: physics/micro/p3 (Microphysics.h wrapper +
fortran/micro_p3.F90 column scheme + scream_common utilities).
"""

from .microphysics import P3Micro, register, init_state, TRACER_NAMES
from .main import p3_main

__all__ = ["P3Micro", "register", "init_state", "TRACER_NAMES", "p3_main"]
