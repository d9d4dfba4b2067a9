"""Top-of-domain sponge layer: relax toward the horizontal mean.

Parity reference: pam_core/modules/sponge_layer.h — top ``num_layers``
levels relaxed toward their horizontal average (w toward zero) with a
cosine spatial profile and strength dt/time_scale.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.coupler import Coupler, hmean


def sponge_layer(coupler: Coupler, state, dt, num_layers: int = 5,
                 time_scale: float = 60.0):
    """Ref: sponge_layer, sponge_layer.h:9-99. num_layers/time_scale are the
    option defaults (sponge_num_layers=5, sponge_time_scale=60 s)."""
    out = dict(state)
    nz = coupler.nz
    zint = state["vertical_interface_height"]
    zmid = state["vertical_midpoint_height"]
    ztop = zint[:, nz:nz + 1]                         # (nens, 1)
    zref = zmid[:, nz - num_layers:nz - num_layers + 1]
    rel_dist = (ztop - zmid) / (ztop - zref)          # (nens, nz)
    space_factor = (jnp.cos(jnp.pi * rel_dist) + 1.0) / 2.0
    # active only in the top num_layers levels
    k = jnp.arange(nz)
    active = (k >= nz - num_layers)[None, :]
    factor = jnp.where(active, space_factor * (dt / time_scale), 0.0)
    factor = factor[:, :, None, None]

    names = ["density_dry", "uvel", "vvel", "wvel", "temp"] + \
        list(coupler.tracer_names)
    for name in names:
        f = state[name]
        target = jnp.zeros_like(f) if name == "wvel" \
            else hmean(f)[:, :, None, None]  # w relaxes to 0 (WFLD)
        out[name] = f + (target - f) * factor
    return out
