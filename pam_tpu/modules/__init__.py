from .gcm_forcing import (compute_gcm_forcing_tendencies,
                          apply_gcm_forcing_tendencies, fill_holes)
from .sponge import sponge_layer
from .perturb import perturb_temperature
from .saturation import saturation_adjustment, compute_adjusted_state
from .surface_friction import (surface_friction_init,
                               compute_surface_friction)
from .broadcast import (broadcast_initial_gcm_column,
                        broadcast_initial_gcm_column_dry_density)
