"""Instantaneous saturation adjustment (condensation/evaporation).

Parity reference: pam_core/modules/saturation_adjustment.h — bisection on
the condensed/evaporated mass with latent heating feedback. The reference's
per-cell while-loop (tol 1e-6 on the bracket) becomes a fixed-iteration
``fori_loop``; both branches (condense when supersaturated, evaporate when
subsaturated with cloud present) are unified into one signed bisection so
every cell runs the same data-parallel program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.coupler import Coupler
# ONE definition of the Bolton svp formula (also used by the profile
# inits) — re-exported here because the adjustment is its main consumer
from ..core.profiles import saturation_vapor_pressure  # noqa: F401

_N_ITERS = 40  # bisection: bracket shrinks 2^-40 — far below the ref's 1e-6 tol


def latent_heat_condensation(temp):
    tc = temp - 273.15
    return (2500.8 - 2.36 * tc + 0.0016 * tc * tc -
            0.00006 * tc * tc * tc) * 1000.0


def _cp_moist(rho_d, rho_v, rho_c, cp_d, cp_v, cp_l):
    rho = rho_d + rho_v + rho_c
    return (rho_d * cp_d + rho_v * cp_v + rho_c * cp_l) / rho


def compute_adjusted_state(rho, rho_d, rho_v, rho_c, temp, R_v, cp_d, cp_v,
                           cp_l):
    """Vectorized analog of compute_adjusted_state
    (saturation_adjustment.h:28-113). Returns (rho_v, rho_c, temp)."""
    svp = saturation_vapor_pressure(temp)
    pv = rho_v * R_v * temp
    condensing = pv > svp
    evaporating = (pv < svp) & (rho_c > 0)
    active = condensing | evaporating
    sign = jnp.where(condensing, 1.0, -1.0)  # + condense vapor->cloud
    x_max = jnp.where(condensing, rho_v, rho_c)

    def trial(x):
        rv = jnp.maximum(0.0, rho_v - sign * x)
        rc = jnp.maximum(0.0, rho_c + sign * x)
        Lv = latent_heat_condensation(temp)
        cp = _cp_moist(rho_d, rv, rc, cp_d, cp_v, cp_l)
        t = temp + sign * x * Lv / (rho * cp)
        return rv, rc, t

    def body(_, carry):
        lo, hi = carry
        x = 0.5 * (lo + hi)
        rv, rc, t = trial(x)
        need_more = sign * (rv * R_v * t - saturation_vapor_pressure(t)) > 0
        lo = jnp.where(need_more, x, lo)
        hi = jnp.where(need_more, hi, x)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, _N_ITERS, body,
                               (jnp.zeros_like(rho), x_max))
    x = 0.5 * (lo + hi)
    rv, rc, t = trial(x)
    rv = jnp.where(active, rv, rho_v)
    rc = jnp.where(active, rc, rho_c)
    t = jnp.where(active, t, temp)
    return rv, rc, t


def saturation_adjustment(coupler: Coupler, state, cloud_field: str = None):
    """Ref: saturation_adjustment, saturation_adjustment.h:116-151.
    cloud_field defaults to the micro scheme's cloud liquid tracer
    ('cloud_liquid' for kessler, 'cloud_water' for p3)."""
    if cloud_field is None:
        cloud_field = "cloud_liquid" if "cloud_liquid" in state else "cloud_water"
    c = coupler.const
    out = dict(state)
    rho_d = state["density_dry"]
    adds = coupler.tracer_adds_mass
    rho = rho_d
    for t, name in zip(adds, coupler.tracer_names):
        if t:
            rho = rho + state[name]
    rv, rc, temp = compute_adjusted_state(
        rho, rho_d, state["water_vapor"], state[cloud_field], state["temp"],
        c.R_v, c.cp_d, c.cp_v, c.cp_l)
    out["water_vapor"] = rv
    out[cloud_field] = rc
    out["temp"] = temp
    return out
