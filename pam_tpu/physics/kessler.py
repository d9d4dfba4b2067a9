"""Kessler warm-rain microphysics (qv / qc / qr), TPU-native.

Parity reference: physics/micro/kessler/Microphysics.h — the device C++ port
of the Klemp-Wilhelmson (1978) scheme with CFL-sub-cycled upstream rain
sedimentation. The per-column kernel becomes whole-array ops over
``(nens, nz, ny, nx)`` with z-shifts for sedimentation; the data-dependent
``rainsplit`` sub-cycle count runs as a ``lax.while_loop`` under jit.

Registers tracers water_vapor / cloud_liquid / precip_liquid (+ ``precl``
surface precipitation rate), like Microphysics::init (Microphysics.h:69-76).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.constants import Constants
from ..core.coupler import Coupler

TRACER_NAMES = ("water_vapor", "cloud_liquid", "precip_liquid")


def register(coupler: Coupler) -> Coupler:
    """Add Kessler's tracers and set scheme option (ref: init,
    Microphysics.h:58-97)."""
    cpl = coupler
    cpl = cpl.add_tracer("water_vapor", "Water Vapor", True, True)
    cpl = cpl.add_tracer("cloud_liquid", "Cloud liquid", True, True)
    cpl = cpl.add_tracer("precip_liquid", "precip_liquid", True, True)
    return cpl.with_options(micro="kessler")


def init_state(coupler: Coupler, state):
    out = dict(state)
    out.setdefault("precl", jnp.zeros((coupler.nens, coupler.ny, coupler.nx),
                                      coupler.dtype))
    return out


def _terminal_velocity(qr, r, rhalf):
    """Liquid water terminal velocity, KW eq. 2.15
    (ref: Microphysics.h:370)."""
    return 36.34 * jnp.maximum(qr * r, 0.0) ** 0.1364 * rhalf


def kessler_column(theta, qv, qc, qr, rho, z, exner, dt, c: Constants):
    """Advance the Kessler scheme by dt, in COLUMN layout.

    All fields are (nz, ...cols...) with z LEADING (surface at index 0) —
    the analog of the reference's get_lev_col view (DataManager.h:322);
    the wrapper packs columns so the TPU lane dim is the (128-multiple)
    ensemble axis instead of nx (a 2x tile-efficiency win over the
    (nens, nz, ny, nx) coupler layout). rho is DRY density; z is midpoint
    height broadcastable to the fields; exner = (p/p0)^(R/cp). Returns
    (theta, qv, qc, qr, precl) with precl in m/s.
    Ref: Microphysics::kessler, Microphysics.h:346-449.
    """
    # trace-time guard (ref endrun: "kessler.f90 called with nonpositive
    # dt", Microphysics.h:353): dt <= 0 would make rainsplit =
    # ceil(0/0) = int32(NaN), silently NaN-ing precl. (A traced dt
    # cannot be checked here; every in-tree caller passes a python
    # float.)
    try:
        nonpositive = float(dt) <= 0.0
    except TypeError:
        nonpositive = False
    if nonpositive:
        raise ValueError(f"kessler called with nonpositive dt={dt}")
    psl = c.p0 / 100.0
    rhoqr = 1000.0
    lv = 2.5e6
    Rd, cp = c.R_d, c.cp_d

    r = 0.001 * rho
    rhalf = jnp.sqrt(rho[:1] / rho)
    pc = 3.8 / (exner ** (cp / Rd) * psl)
    velqr = _terminal_velocity(qr, r, rhalf)

    # global CFL-limited sub-step (ref: Microphysics.h:372-390); the min
    # must span the ENTIRE horizontal domain — under an explicit shard_map
    # the local jnp.min is followed by a lax.pmin over the active mesh
    # axes (comm.pmin_h), matching the reference's full-array minval.
    # ACCEPTED DEVIATION under explicit *ensemble* sharding: pmin_h spans
    # only x/y, so each ens shard keeps its OWN rainsplit count — the same
    # deviation KesslerMicro.ens_chunk makes deliberately (ensemble members
    # are independent CRMs; only which CRMs share a trip count changes, and
    # each CRM's own CFL bound is always respected). Covered by
    # tests/test_halo.py::test_explicit_kessler_rainsplit_ens_varying.
    from ..parallel import comm
    dz_up = z[1:] - z[:-1]
    dt2d = jnp.where(velqr[:-1] > 1.0e-10,
                     0.8 * dz_up / velqr[:-1], dt)
    dt_max = jnp.minimum(comm.pmin_h(dt2d), dt)
    rainsplit = jnp.ceil(dt / dt_max).astype(jnp.int32)
    dt0 = dt / rainsplit.astype(theta.dtype)

    def subcycle(carry):
        nt, theta, qv, qc, qr, velqr, precl = carry
        # surface precipitation accumulation (ref: :399-401)
        precl = precl + rho[0] * qr[0] * velqr[0] / rhoqr
        # upstream sedimentation (ref: :403-408)
        rqv = r * qr * velqr
        sed_int = dt0 * (rqv[1:] - rqv[:-1]) / (r[:-1] * dz_up)
        sed_top = -dt0 * qr[-1:] * velqr[-1:] / \
            (0.5 * (z[-1:] - z[-2:-1]))
        sed = jnp.concatenate([sed_int, sed_top], axis=0)
        # autoconversion + accretion, KW eq. 2.13 (ref: :413-417)
        qrprod = qc - (qc - dt0 * jnp.maximum(0.001 * (qc - 0.001), 0.0)) / \
            (1.0 + dt0 * 2.2 * jnp.maximum(qr, 0.0) ** 0.875)
        qc = jnp.maximum(qc - qrprod, 0.0)
        qr = jnp.maximum(qr + qrprod + sed, 0.0)
        # saturation adjustment, KW eq. 2.11/3.10 (ref: :419-438)
        tmp = exner * theta - 36.0
        qvs = pc * jnp.exp(17.27 * (exner * theta - 273.0) / tmp)
        prod = (qv - qvs) / (1.0 + qvs * (4093.0 * lv / cp) / (tmp * tmp))
        rq = jnp.maximum(r * qr, 0.0)
        tmp1 = dt0 * (((1.6 + 124.9 * rq ** 0.2046) * rq ** 0.525) /
                      (2550000.0 * pc / (3.8 * qvs) + 540000.0)) * \
            (jnp.maximum(qvs - qv, 0.0) / (r * qvs))
        ern = jnp.minimum(tmp1, jnp.minimum(jnp.maximum(-prod - qc, 0.0), qr))
        theta = theta + lv / (cp * exner) * (jnp.maximum(prod, -qc) - ern)
        qv = jnp.maximum(qv - jnp.maximum(prod, -qc) + ern, 0.0)
        qc = qc + jnp.maximum(prod, -qc)
        qr = qr - ern
        velqr = _terminal_velocity(qr, r, rhalf)
        return nt + 1, theta, qv, qc, qr, velqr, precl

    precl0 = jnp.zeros_like(theta[0])
    carry = (jnp.int32(0), theta, qv, qc, qr, velqr, precl0)
    carry = jax.lax.while_loop(lambda ca: ca[0] < rainsplit, subcycle, carry)
    _, theta, qv, qc, qr, _, precl = carry
    precl = precl / rainsplit.astype(theta.dtype)
    return theta, qv, qc, qr, precl


@dataclasses.dataclass(frozen=True, eq=False)
class KesslerMicro:
    """Coupler-facing wrapper (analog of Microphysics::timeStep,
    Microphysics.h:123-274).

    ens_chunk: if set, the ensemble axis is processed in chunks of this
    size, each with its OWN rainsplit CFL min. The reference's global min
    over the whole batched array (Microphysics.h:385-390) is an artifact
    of batching independent CRMs into one kernel — physically each CRM's
    sub-cycle count is its own — so chunking deviates from the reference
    only in which CRMs share a trip count. Calm chunks stop sub-cycling
    early and the per-chunk working set stays VMEM-resident, recovering
    the large-nens throughput loss (PERF.md "Why not nens scaling").
    Default None = the reference's exact global-min behavior."""
    coupler: Coupler
    ens_chunk: int | None = None

    @property
    def name(self) -> str:
        return "kessler"

    def timestep(self, state, dt):
        cpl, c = self.coupler, self.coupler.const
        out = dict(state)
        nens, nz, ny, nx = state["temp"].shape

        # column layout (nz, ny*nx, nens): lane dim = nens (128-multiple in
        # production) instead of nx=65 — full (8,128) tiles vs the 2x-padded
        # T(1,128) tiling of the coupler layout (the reference's get_lev_col
        # trick, DataManager.h:322, applied for TPU tile efficiency)
        def col(f):
            return jnp.transpose(f, (1, 2, 3, 0)).reshape(nz, ny * nx, nens)

        def uncol(f):
            return jnp.transpose(f.reshape(nz, ny, nx, nens), (3, 0, 1, 2))

        rho_d = col(state["density_dry"])
        temp = col(state["temp"])
        rho_v = col(state["water_vapor"])
        rho_c = col(state["cloud_liquid"])
        rho_r = col(state["precip_liquid"])
        qv, qc, qr = rho_v / rho_d, rho_c / rho_d, rho_r / rho_d
        # moist pressure — Coupler.pressure's formula on the column
        # layout (kept inline: this is the measured hot path, and the
        # coupler helper would compute in the 4-D layout first)
        pressure = c.R_d * rho_d * temp + c.R_v * rho_v * temp
        exner = (pressure / c.p0) ** (c.R_d / c.cp_d)
        theta = temp / exner
        zmid = jnp.transpose(state["vertical_midpoint_height"],
                             (1, 0))[:, None, :]        # (nz, 1, nens)

        ck = self.ens_chunk
        if ck is None or ck >= nens:
            theta, qv, qc, qr, precl = kessler_column(
                theta, qv, qc, qr, rho_d, zmid, exner, dt, c)
        else:
            parts = []
            for s in range(0, nens, ck):
                sl = (slice(None), slice(None), slice(s, s + ck))
                parts.append(kessler_column(
                    theta[sl], qv[sl], qc[sl], qr[sl], rho_d[sl],
                    zmid[:, :, s:s + ck], exner[sl], dt, c))
            theta, qv, qc, qr, precl = (
                jnp.concatenate([p[i] for p in parts], axis=-1)
                for i in range(5))
        out["water_vapor"] = uncol(qv * rho_d)
        out["cloud_liquid"] = uncol(qc * rho_d)
        out["precip_liquid"] = uncol(qr * rho_d)
        # theta is defined wrt the pre-micro exner (ref: Microphysics.h:251-258)
        out["temp"] = uncol(theta * exner)
        out["precl"] = jnp.transpose(precl.reshape(ny, nx, nens), (2, 0, 1))
        return out
