"""GCM↔CRM coupling: relax column-averaged CRM state toward the GCM state.

Parity reference: pam_core/modules/gcm_forcing.h. The atomicAdd column
averages become plain mean-reductions; the data-dependent global hole-filling
fallback (gcm_forcing.h:254-279) is applied unconditionally — when the
per-level pass already balanced, the residual negative mass is zero and the
global pass is an exact no-op, so no `lax.cond` is needed.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.coupler import Coupler, hmean

# species whose forcing is tracked; (crm_field, gcm_field) pairs
_NUM_SPECIES = (("cloud_water_num", "gcm_num_liq", "gcm_forcing_tend_nc"),
                ("ice_num", "gcm_num_ice", "gcm_forcing_tend_ni"),
                ("rain_num", "gcm_num_rain", "gcm_forcing_tend_nr"))


def _get3d(coupler, state, name):
    """Field or zeros if the active microphysics doesn't carry it
    (e.g. Kessler has no ice/number tracers — ref hardcodes P3 names).
    zeros_like (not coupler.zeros3d) so shapes stay local inside a
    manual-sharding region."""
    if name in state:
        return state[name]
    return jnp.zeros_like(state["density_dry"])


def _liq_name(state) -> str:
    """The cloud-liquid tracer alias (P3 registers "cloud_water", Kessler
    "cloud_liquid") — ONE selection shared by compute and apply so the
    forcing is always computed from and applied to the same field."""
    return "cloud_water" if "cloud_water" in state else "cloud_liquid"


def compute_gcm_forcing_tendencies(coupler: Coupler, state, dt_gcm):
    """Store (gcm - colavg(crm))/dt_gcm forcing columns in the state.
    Ref: compute_gcm_forcing_tendencies, gcm_forcing.h:18-204."""
    out = dict(state)
    rho_d = state["density_dry"]
    rho_v = _get3d(coupler, state, "water_vapor")
    rho_l = _get3d(coupler, state, _liq_name(state))
    rho_i = _get3d(coupler, state, "ice")
    r_dt = 1.0 / dt_gcm

    out["gcm_forcing_tend_rho_d"] = (state["gcm_density_dry"] -
                                     hmean(rho_d)) * r_dt
    out["gcm_forcing_tend_uvel"] = (state["gcm_uvel"] -
                                    hmean(state["uvel"])) * r_dt
    out["gcm_forcing_tend_vvel"] = (state["gcm_vvel"] -
                                    hmean(state["vvel"])) * r_dt
    out["gcm_forcing_tend_temp"] = (state["gcm_temp"] -
                                    hmean(state["temp"])) * r_dt
    # moist-air mixing-ratio forcing (ref: gcm_forcing.h:108-113,176-181)
    denom = rho_d + rho_v
    qv = hmean(rho_v / denom)
    ql = hmean(rho_l / denom)
    qi = hmean(rho_i / denom)
    gdenom = state["gcm_density_dry"] + state["gcm_water_vapor"]
    qv_g = state["gcm_water_vapor"] / gdenom
    ql_g = state["gcm_cloud_water"] / gdenom
    qi_g = state["gcm_cloud_ice"] / gdenom
    out["gcm_forcing_tend_qv"] = (qv_g - qv) * r_dt
    out["gcm_forcing_tend_ql"] = (ql_g - ql) * r_dt
    out["gcm_forcing_tend_qi"] = (qi_g - qi) * r_dt
    out["gcm_forcing_tend_qtot"] = (out["gcm_forcing_tend_qv"] +
                                    out["gcm_forcing_tend_ql"] +
                                    out["gcm_forcing_tend_qi"])
    for crm_name, gcm_name, tend_name in _NUM_SPECIES:
        out[tend_name] = (state[gcm_name] -
                          hmean(_get3d(coupler, state, crm_name))) * r_dt
    # diagnostic density forcings are (re)written by apply_...; pre-create
    # them here so the state pytree structure is stable across scan carries
    for name in ("gcm_forcing_tend_rho_v", "gcm_forcing_tend_rho_l",
                 "gcm_forcing_tend_rho_i"):
        out.setdefault(name, jnp.zeros_like(out["gcm_forcing_tend_rho_d"]))
    return out


def fill_holes(rho_x, dz):
    """Multiplicative hole filling: clamp negatives to zero, remove the added
    mass from positive cells proportionally — per level first, then globally
    for any residual. Ref: fill_holes, gcm_forcing.h:207-281.

    Args:
      rho_x: (nens, nz, ny, nx) possibly-negative density.
      dz: (nens, nz) spacings.
    """
    from ..parallel import comm
    dz4 = dz[:, :, None, None]
    neg_mass = comm.psum_h(jnp.where(rho_x < 0, -rho_x, 0.0) * dz4,
                           (-2, -1))  # (nens, nz)
    rho_x = jnp.maximum(rho_x, 0.0)
    pos_mass = comm.psum_h(rho_x * dz4, (-2, -1))
    # per-level proportional removal
    factor = rho_x * dz4 / jnp.where(pos_mass == 0, 1.0, pos_mass)[:, :, None, None]
    take = jnp.where((pos_mass > 0)[:, :, None, None],
                     neg_mass[:, :, None, None] * factor / dz4, 0.0)
    rho_x = jnp.maximum(0.0, rho_x - take)
    # global fallback for levels whose negatives exceeded their positives
    residual = jnp.sum(jnp.maximum(0.0, neg_mass - pos_mass), axis=1)  # (nens,)
    glob_pos = jnp.sum(comm.psum_h(rho_x * dz4, (-2, -1)), axis=1)
    gfactor = rho_x * dz4 / jnp.where(glob_pos == 0, 1.0, glob_pos)[:, None, None, None]
    rho_x = jnp.maximum(0.0, rho_x - residual[:, None, None, None] * gfactor / dz4)
    return rho_x


def apply_gcm_forcing_tendencies(coupler: Coupler, state, dt, dt_gcm):
    """Apply the stored forcing for one CRM step, with mixing-ratio
    bookkeeping and hole filling. Ref: apply_gcm_forcing_tendencies,
    gcm_forcing.h:294-440."""
    out = dict(state)
    dz = state["vertical_cell_dz"]
    col = lambda name: state[name][:, :, None, None]
    rho_d_old = state["density_dry"]
    rho_v = _get3d(coupler, state, "water_vapor")
    liq_name = _liq_name(state)
    rho_l = _get3d(coupler, state, liq_name)
    rho_i = _get3d(coupler, state, "ice")

    rho_d = rho_d_old + col("gcm_forcing_tend_rho_d") * dt
    out["density_dry"] = rho_d
    out["uvel"] = state["uvel"] + col("gcm_forcing_tend_uvel") * dt
    out["vvel"] = state["vvel"] + col("gcm_forcing_tend_vvel") * dt
    out["temp"] = state["temp"] + col("gcm_forcing_tend_temp") * dt

    denom_old = rho_d_old + rho_v
    qv_new = rho_v / denom_old + col("gcm_forcing_tend_qv") * dt
    ql_new = rho_l / denom_old + col("gcm_forcing_tend_ql") * dt
    qi_new = rho_i / denom_old + col("gcm_forcing_tend_qi") * dt
    rho_v_new = qv_new * rho_d / (1.0 - qv_new)
    rho_l_new = ql_new * (rho_d + rho_v_new)
    rho_i_new = qi_new * (rho_d + rho_v_new)

    # diagnostic density forcings (ref: gcm_forcing.h:424-431)
    r_dt_gcm = 1.0 / dt_gcm
    out["gcm_forcing_tend_rho_v"] = (state["gcm_water_vapor"] -
                                     hmean(rho_v_new)) * r_dt_gcm
    out["gcm_forcing_tend_rho_l"] = (state["gcm_cloud_water"] -
                                     hmean(rho_l_new)) * r_dt_gcm
    out["gcm_forcing_tend_rho_i"] = (state["gcm_cloud_ice"] -
                                     hmean(rho_i_new)) * r_dt_gcm

    if "water_vapor" in state:
        out["water_vapor"] = fill_holes(rho_v_new, dz)
    if liq_name in state:
        out[liq_name] = fill_holes(rho_l_new, dz)
    if "ice" in state:
        out["ice"] = fill_holes(rho_i_new, dz)

    for crm_name, gcm_name, tend_name in _NUM_SPECIES:
        if crm_name in state:
            out[crm_name] = jnp.maximum(
                0.0, state[crm_name] + col(tend_name) * dt)
    return out
