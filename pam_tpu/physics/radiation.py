"""Forced radiation: apply an externally computed enthalpy tendency.

Parity reference: physics/radiation/forced/radiation.h — the GCM (or an
external radiation calculation) supplies ``rad_enthalpy_tend`` on a coarse
(rad_ny, rad_nx) grid; each CRM column picks up the tendency of the coarse
cell containing it (:40-44). The "none" variant is a no-op
(physics/radiation/none/radiation.h).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.coupler import Coupler


def register(coupler: Coupler, rad_nx: int = 1, rad_ny: int = 1) -> Coupler:
    """(ref: Radiation::init, radiation.h:16-24)."""
    return coupler.with_options(radiation="forced", rad_nx=rad_nx,
                                rad_ny=rad_ny)


def init_state(coupler: Coupler, state):
    rad_nx = coupler.options.get("rad_nx", 1)
    rad_ny = coupler.options.get("rad_ny", 1)
    out = dict(state)
    out.setdefault("rad_enthalpy_tend",
                   jnp.zeros((coupler.nens, coupler.nz, rad_ny, rad_nx),
                             coupler.dtype))
    return out


@dataclasses.dataclass(frozen=True)
class ForcedRadiation:
    """(analog of Radiation::timeStep, radiation.h:26-45)."""
    coupler: Coupler

    @property
    def name(self) -> str:
        return "forced"

    def timestep(self, state, dt):
        cpl = self.coupler
        rad_nx = cpl.options.get("rad_nx", 1)
        rad_ny = cpl.options.get("rad_ny", 1)
        tend = state["rad_enthalpy_tend"]     # (nens, nz, rad_ny, rad_nx)
        # expand the coarse radiation grid onto the CRM grid (:41-43)
        fx = cpl.nx // rad_nx
        fy = cpl.ny // rad_ny
        tend_full = jnp.repeat(jnp.repeat(tend, fy, axis=2), fx, axis=3)
        out = dict(state)
        out["temp"] = state["temp"] + tend_full / cpl.const.cp_d * dt
        return out
