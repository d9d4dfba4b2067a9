"""The coupler: PAM's cross-component data plane, re-designed as a pytree.

The reference couples every component through a string-keyed device-array
registry (pam_core/DataManager.h) owned by a PamCoupler
(pam_core/pam_coupler.h:13). Here that split becomes:

* :class:`Coupler` — the *static* side: grid sizes, domain lengths, physical
  constants, tracer metadata, and runtime options. Hashable, never traced;
  passed to jitted functions as a closure/static argument.
* ``state``: a plain ``dict[str, jax.Array]`` — the *dynamic* side, a pytree
  that flows through jit/vmap/pjit/scan. Field names and shapes mirror the
  canonical registry of ``allocate_coupler_state`` (pam_coupler.h:255-293).

Array layout: 3-D fields are ``(nens, nz, ny, nx)`` (ensemble-leading for
sharding/vmap; x innermost for TPU lane utilization), columns are
``(nens, nz)`` / ``(nens, nz+1)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .constants import Constants, DEFAULT_CONSTANTS


@dataclasses.dataclass(frozen=True)
class Tracer:
    """Tracer metadata (ref: PamCoupler::Tracer, pam_coupler.h:26-31)."""
    name: str
    desc: str = ""
    positive: bool = True
    adds_mass: bool = True


# Canonical 3-D prognostic fields (ref: pam_coupler.h:259-263)
STATE_3D = ("density_dry", "uvel", "vvel", "wvel", "temp")
# GCM column fields (ref: pam_coupler.h:268-281)
GCM_COLS = ("gcm_density_dry", "gcm_uvel", "gcm_vvel", "gcm_wvel", "gcm_temp",
            "gcm_water_vapor", "gcm_cloud_water", "gcm_cloud_ice",
            "gcm_num_liq", "gcm_num_ice", "gcm_num_rain", "gcm_pressure_mid")
# Reference-state columns (ref: pam_coupler.h:283-289)
REF_COLS = ("ref_pres", "ref_density_dry", "ref_density_vapor",
            "ref_density_liq", "ref_density_ice", "ref_temp")


@dataclasses.dataclass(frozen=True, eq=False)
class Coupler:
    """Static configuration & registry. The dynamic state lives in a dict.

    ``options`` plays the role of the reference Options KV store
    (pam_core/Options.h); it is a plain (hashable via id) dict of python
    scalars/strings — never traced values.
    """
    nz: int
    ny: int
    nx: int
    nens: int
    xlen: float
    ylen: float
    const: Constants = DEFAULT_CONSTANTS
    tracers: tuple[Tracer, ...] = ()
    options: dict[str, Any] = dataclasses.field(default_factory=dict)
    dtype: Any = jnp.float32

    # ---- geometry ----
    @property
    def dx(self) -> float:
        return self.xlen / self.nx

    @property
    def dy(self) -> float:
        return self.ylen / self.ny

    @property
    def sim2d(self) -> bool:
        return self.ny == 1

    # ---- tracer registry (ref: pam_coupler.h:206-251) ----
    def add_tracer(self, name: str, desc: str = "", positive: bool = True,
                   adds_mass: bool = True) -> "Coupler":
        if any(t.name == name for t in self.tracers):
            return self
        return dataclasses.replace(
            self, tracers=self.tracers + (Tracer(name, desc, positive, adds_mass),))

    @property
    def num_tracers(self) -> int:
        return len(self.tracers)

    @property
    def tracer_names(self) -> tuple[str, ...]:
        return tuple(t.name for t in self.tracers)

    def tracer_index(self, name: str) -> int:
        return self.tracer_names.index(name)

    @property
    def tracer_positive(self) -> np.ndarray:
        return np.array([t.positive for t in self.tracers])

    @property
    def tracer_adds_mass(self) -> np.ndarray:
        return np.array([t.adds_mass for t in self.tracers])

    @property
    def idWV(self) -> int:
        return self.tracer_index("water_vapor")

    # ---- options ----
    def with_options(self, **kw) -> "Coupler":
        opts = dict(self.options)
        opts.update(kw)
        return dataclasses.replace(self, options=opts)

    def get_option(self, key: str, default=None):
        return self.options.get(key, default)

    # ---- state construction ----
    def zeros3d(self):
        return jnp.zeros((self.nens, self.nz, self.ny, self.nx), self.dtype)

    def zeros_col(self, stag: bool = False):
        return jnp.zeros((self.nens, self.nz + (1 if stag else 0)), self.dtype)

    def allocate_state(self, zint) -> dict[str, jax.Array]:
        """Canonical initial state dict (ref: allocate_coupler_state,
        pam_coupler.h:255-355, plus set_grid, pam_coupler.h:163-202).

        Args:
          zint: vertical interface heights, shape (nz+1,) or (nens, nz+1).
        """
        zint = jnp.asarray(zint, self.dtype)
        if zint.ndim == 1:
            zint = jnp.broadcast_to(zint, (self.nens, self.nz + 1))
        state: dict[str, jax.Array] = {}
        for name in STATE_3D:
            state[name] = self.zeros3d()
        for name in self.tracer_names:
            state[name] = self.zeros3d()
        state["vertical_interface_height"] = zint
        state["vertical_cell_dz"] = zint[:, 1:] - zint[:, :-1]
        state["vertical_midpoint_height"] = 0.5 * (zint[:, 1:] + zint[:, :-1])
        for name in GCM_COLS + REF_COLS:
            state[name] = self.zeros_col()
        state["ref_presi"] = self.zeros_col(stag=True)
        state["gcm_pressure_int"] = self.zeros_col(stag=True)
        # hydrostatic background / variable-gravity balance columns used by
        # the AWFL dycore (ref: Dycore.h:868,983-984)
        state["hy_dens_cells"] = self.zeros_col()
        state["hy_pressure_cells"] = self.zeros_col()
        state["variable_gravity"] = self.zeros_col()
        return state

    # ---- derived quantities ----
    def pressure(self, state) -> jax.Array:
        """Moist pressure from dry density, vapor and temperature
        (ref: PamCoupler::compute_pressure_array, pam_coupler.h:360-393)."""
        c = self.const
        return (state["density_dry"] * c.R_d +
                state["water_vapor"] * c.R_v) * state["temp"]

    def stack_tracers(self, state) -> jax.Array:
        """(ntr, nens, nz, ny, nx) view of all tracers for batched kernels
        (the reference's MultiField pattern, pam_core/MultipleFields.h)."""
        return jnp.stack([state[n] for n in self.tracer_names])

    def unstack_tracers(self, state, stacked) -> dict:
        out = dict(state)
        for i, n in enumerate(self.tracer_names):
            out[n] = stacked[i]
        return out


def hmean(x):
    """Horizontal mean over (ny, nx) of an (nens, nz, ny, nx) field ->
    (nens, nz). Replaces the reference's atomicAdd column averaging
    (e.g. gcm_forcing.h:101-129) with a plain reduction; inside a
    shard_map axis context the mean finishes with a lax.pmean over the
    active horizontal mesh axes."""
    from ..parallel import comm
    return comm.pmean_h(x, (-2, -1))
