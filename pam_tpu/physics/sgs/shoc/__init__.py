"""SHOC SGS turbulence scheme, TPU-native port.

Reference: physics/sgs/shoc (SGS.h wrapper + fortran/shoc.F90).
"""

from .sgs import ShocSgs, register, init_state
from .main import shoc_main

__all__ = ["ShocSgs", "register", "init_state", "shoc_main"]
