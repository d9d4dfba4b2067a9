from .geometry import ExtrudedGeometry
from .thermo import (ThermoConstants, IdealGasPottemp,
                     ConstantKappaVirtualPottemp)
from .varset import VariableSet
from .tendencies import SpamTendencies
from .dycore import SpamDycore
from .extruded3d import Tendencies3D
