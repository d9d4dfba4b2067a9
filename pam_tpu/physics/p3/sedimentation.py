"""P3 hydrometeor sedimentation with adaptive Courant substepping.

Parity reference: micro_p3.F90 cloud_sedimentation (:3587-3747),
rain_sedimentation (:3749-3870), ice_sedimentation (:3911-4065),
generalized_sedimentation (:4067-4104), calc_first_order_upwind_step
(:4106-4143).

TPU-native design: the reference's per-column ``do while (dt_left>1e-4)``
with a data-dependent substep count becomes one ``lax.while_loop`` over a
whole batch of columns — each column carries its own ``dt_left``; finished
columns take zero-length substeps, and every in-loop state update is gated
on the column still being active so those zero-length substeps are exact
no-ops (matching the reference, where a finished column's do-while body
simply stops executing). The reference's k_qxtop/k_qxbot window
bookkeeping is dropped: with whole-column first-order upwind, cells outside
the occupied window see zero flux divergence, so results are identical.

In-cloud values are carried through the loop exactly as the reference
does: the FIRST substep uses the in-cloud mixing ratios computed by
part2's final calculate_incloud_mixingratios (with its qsmall gating and
INCLOUD/PRECIP limit clamps — micro_p3_utils.F90:238-290), and every
subsequent substep uses the plain cell-average/cld_frac division the
Fortran applies after each generalized_sedimentation call. Callers that
don't pass initial in-cloud values fall back to plain division for the
first substep too.

Each species' substep body lives in ONE module-level helper
(`_cloud_substep` / `_rain_substep` / `_ice_substep`) shared by the
per-species loops and the fused `combined_sedimentation` loop, so the two
paths cannot diverge.

Orientation: (nz, ...batch) with k=0 = TOP and z the LEADING axis (the
TPU-native column layout: the batch/ensemble axis stays minor, so column
arrays tile the 128-lane dimension with no padding and the wrapper's
dycore->column conversion is a layout relabel instead of a transpose).
Falling flux moves k -> k+1; flux above the top cell is zero; the flux
leaving k=nz-1 accumulates as surface precipitation. Per-column scalars
(dt_left, prt) have the batch shape and broadcast naturally against
(nz, ...batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .constants import CONST, QSMALL, NSMALL
from . import tables as tbl
from .main import cloud_dsd, rain_dsd, bulk_rho_rime, _gamma

C = CONST


def _upwind(qs, Vs, rho, inv_rho, inv_dz, dt_sub):
    """First-order upwind update for several species sharing one substep.

    (calc_first_order_upwind_step, micro_p3.F90:4106-4143.)
    Returns updated arrays and the mass flux of the FIRST species (used for
    surface precip accumulation)."""
    outs = []
    flux_q = None
    for q, V in zip(qs, Vs):
        flux = V * q * rho
        if flux_q is None:
            flux_q = flux
        fup = jnp.concatenate([jnp.zeros_like(flux[:1]), flux[:-1]],
                              axis=0)
        outs.append(q + (fup - flux) * inv_dz * dt_sub * inv_rho)
    return outs, flux_q


def _dt_sub(co_max, dt_left):
    """generalized_sedimentation substep length (:4090-4092)."""
    nsub = jnp.floor(co_max + 1.0)
    active = dt_left > 1.0e-4
    return jnp.where(active, jnp.minimum(dt_left, dt_left /
                                         jnp.maximum(nsub, 1.0)), 0.0)


# ---------------------------------------------------------------------------
# shared per-species substep bodies; each takes and returns the carried
# in-cloud values alongside the cell averages
# ---------------------------------------------------------------------------

def _cloud_substep(qc, nc, qc_in, nc_in, dt_left, prt, rho, inv_rho,
                   cld_frac_l, acn, inv_dz, do_predict_nc):
    """One adaptive substep of cloud sedimentation (:3587-3747).
    Returns (qc, nc, qc_in, nc_in, dt_left, prt)."""
    act = dt_left > 1.0e-4
    has = (qc_in > QSMALL) & act
    nc_in2, mu_c, lamc, _, _ = cloud_dsd(qc_in, nc_in, rho)
    nc_new = jnp.where(has, nc_in2 * cld_frac_l, nc)
    dum = 1.0 / jnp.maximum(lamc, 1e-300) ** C.bcn
    v_qc = jnp.where(has, acn * _gamma(4.0 + C.bcn + mu_c) * dum /
                     _gamma(mu_c + 4.0), 0.0)
    v_nc = jnp.where(has, acn * _gamma(1.0 + C.bcn + mu_c) * dum /
                     _gamma(mu_c + 1.0), 0.0)
    co_max = jnp.max(v_qc * dt_left * inv_dz, axis=0)
    dts = _dt_sub(co_max, dt_left)
    if do_predict_nc:
        (qc2, nc2), flux_q = _upwind([qc, nc_new], [v_qc, v_nc],
                                     rho, inv_rho, inv_dz, dts)
    else:
        (qc2,), flux_q = _upwind([qc], [v_qc], rho, inv_rho, inv_dz, dts)
        nc2 = nc_new
    # post-substep in-cloud refresh (:3702-3706); gate on act so finished
    # columns keep their carried values bit-exactly
    qc_in2 = jnp.where(act, qc2 / cld_frac_l, qc_in)
    nc_in2b = jnp.where(act, nc2 / cld_frac_l, nc_in)
    return (qc2, nc2, qc_in2, nc_in2b, dt_left - dts,
            prt + flux_q[-1] * dts)


def _rain_substep(qr, nr, qr_in, nr_in, dt_left, prt, rho, inv_rho,
                  cld_frac_r, rhofacr, inv_dz, vn_t, vm_t):
    """One adaptive substep of rain sedimentation (:3749-3870).
    Returns (qr, nr, qr_in, nr_in, dt_left, prt)."""
    act = dt_left > 1.0e-4
    has = (qr_in > QSMALL) & act
    nr_in2, mu_r, lamr, _, _ = rain_dsd(qr_in, nr_in)
    nr_new = jnp.where(has, nr_in2 * cld_frac_r, nr)
    ii, jj, rii, rjj = tbl.indices_3(mu_r, jnp.maximum(lamr, 1e-300))
    vm_val, vn_val = tbl.access_rain_table_multi((vm_t, vn_t), rii, rjj)
    v_qr = jnp.where(has, vm_val * rhofacr, 0.0)
    v_nr = jnp.where(has, vn_val * rhofacr, 0.0)
    co_max = jnp.max(v_qr * dt_left * inv_dz, axis=0)
    dts = _dt_sub(co_max, dt_left)
    (qr2, nr2), flux_q = _upwind([qr, nr_new], [v_qr, v_nr], rho,
                                 inv_rho, inv_dz, dts)
    qr_in2 = jnp.where(act, qr2 / cld_frac_r, qr_in)
    nr_in2b = jnp.where(act, nr2 / cld_frac_r, nr_in)
    return (qr2, nr2, qr_in2, nr_in2b, dt_left - dts,
            prt + flux_q[-1] * dts)


def _ice_substep(qi, ni, qm, bm, qi_in, ni_in, qm_in, bm_in, dt_left, prt,
                 rho, inv_rho, cld_frac_i, rhofaci, inv_dz, ice_tab):
    """One adaptive substep of ice sedimentation (:3911-4065).
    Returns (qi, ni, qm, bm, qi_in, ni_in, qm_in, bm_in, dt_left, prt)."""
    act = dt_left > 1.0e-4
    has = (qi_in > QSMALL) & act
    ni_in = jnp.maximum(ni_in, NSMALL)
    qm_in2, bm_in2, rhop = bulk_rho_rime(qi_in, qm_in, bm_in)
    qm_new = jnp.where(has, qm_in2 * cld_frac_i, qm)
    bm_new = jnp.where(has, bm_in2 * cld_frac_i, bm)
    di, djj, dii, d1, d4, d5 = tbl.indices_1a(
        jnp.maximum(qi_in, 1e-300), ni_in, qm_in2, rhop)
    # number-weighted + mass-weighted fall speeds and lambda limits at one
    # fractional position -> one batched contraction
    v_n, v_q, lammax, lammin = tbl.access_ice_table_multi(
        ice_tab, (0, 1, 6, 7), d1, d4, d5)
    ni_in = jnp.where(has, jnp.clip(ni_in, lammin * ni_in,
                                    jnp.maximum(lammax * ni_in,
                                                lammin * ni_in)), ni_in)
    ni_new = jnp.where(has, ni_in * cld_frac_i, ni)
    v_qit = jnp.where(has, v_q * rhofaci, 0.0)
    v_nit = jnp.where(has, v_n * rhofaci, 0.0)
    co_max = jnp.max(v_qit * dt_left * inv_dz, axis=0)
    dts = _dt_sub(co_max, dt_left)
    (qi2, ni2, qm2, bm2), flux_q = _upwind(
        [qi, ni_new, qm_new, bm_new],
        [v_qit, v_nit, v_qit, v_qit], rho, inv_rho, inv_dz, dts)
    qi_in2 = jnp.where(act, qi2 / cld_frac_i, qi_in)
    ni_in2 = jnp.where(act, ni2 / cld_frac_i, ni_in)
    qm_in2c = jnp.where(act, qm2 / cld_frac_i, qm_in)
    bm_in2c = jnp.where(act, bm2 / cld_frac_i, bm_in)
    return (qi2, ni2, qm2, bm2, qi_in2, ni_in2, qm_in2c, bm_in2c,
            dt_left - dts, prt + flux_q[-1] * dts)


def _default_inc(pairs):
    """Fallback first-substep in-cloud values: plain division (used when a
    caller doesn't supply part2's calculate_incloud_mixingratios output)."""
    return [q / cld for q, cld in pairs]


# ---------------------------------------------------------------------------
# public per-species loops
# ---------------------------------------------------------------------------

def cloud_sedimentation(qc, nc, rho, inv_rho, cld_frac_l, acn, inv_dz, dt,
                        do_predict_nc=False, qc_in=None, nc_in=None):
    """Stokes-regime cloud droplet sedimentation (:3587-3747).

    One-moment branch (do_predict_nc=False): only qc sediments
    (generalized_sedimentation called with num_arrays=1, :3740).
    qc_in/nc_in: first-substep in-cloud values (part2's
    calculate_incloud_mixingratios output); default = qc/cld_frac_l.
    Returns (qc, nc, precip_liq_surf [m/s])."""
    if qc_in is None:
        qc_in, nc_in = _default_inc([(qc, cld_frac_l), (nc, cld_frac_l)])

    def body(c):
        qc2, nc2, qci, nci, dtl, prt = _cloud_substep(
            c["qc"], c["nc"], c["qc_in"], c["nc_in"], c["dt_left"],
            c["prt"], rho, inv_rho, cld_frac_l, acn, inv_dz,
            do_predict_nc)
        return dict(qc=qc2, nc=nc2, qc_in=qci, nc_in=nci, dt_left=dtl,
                    prt=prt)

    init = dict(qc=qc, nc=nc, qc_in=qc_in, nc_in=nc_in,
                dt_left=jnp.zeros_like(qc[0]) + dt,
                prt=jnp.zeros_like(qc[0]))
    out = jax.lax.while_loop(lambda c: jnp.any(c["dt_left"] > 1.0e-4),
                             body, init)
    return out["qc"], out["nc"], out["prt"] * C.inv_rho_h2o / dt


def rain_sedimentation(qr, nr, rho, inv_rho, rhofacr, cld_frac_r, inv_dz,
                       dt, qr_in=None, nr_in=None):
    """Rain sedimentation with table-interpolated fall speeds (:3749-3870,
    compute_rain_fall_velocity :3872-3909).
    Returns (qr, nr, precip_liq_surf [m/s])."""
    vn_t, vm_t, _ = (jnp.asarray(a) for a in tbl.build_rain_tables())
    if qr_in is None:
        qr_in, nr_in = _default_inc([(qr, cld_frac_r), (nr, cld_frac_r)])

    def body(c):
        qr2, nr2, qri, nri, dtl, prt = _rain_substep(
            c["qr"], c["nr"], c["qr_in"], c["nr_in"], c["dt_left"],
            c["prt"], rho, inv_rho, cld_frac_r, rhofacr, inv_dz, vn_t,
            vm_t)
        return dict(qr=qr2, nr=nr2, qr_in=qri, nr_in=nri, dt_left=dtl,
                    prt=prt)

    init = dict(qr=qr, nr=nr, qr_in=qr_in, nr_in=nr_in,
                dt_left=jnp.zeros_like(qr[0]) + dt,
                prt=jnp.zeros_like(qr[0]))
    out = jax.lax.while_loop(lambda c: jnp.any(c["dt_left"] > 1.0e-4),
                             body, init)
    return out["qr"], out["nr"], out["prt"] * C.inv_rho_h2o / dt


def ice_sedimentation(qi, ni, qm, bm, rho, inv_rho, rhofaci, cld_frac_i,
                      inv_dz, dt, qi_in=None, ni_in=None, qm_in=None,
                      bm_in=None):
    """Ice sedimentation: qi/qm/bm fall at the mass-weighted speed, ni at
    the number-weighted speed (:3911-4065).
    Returns (qi, ni, qm, bm, precip_ice_surf [m/s])."""
    ice_tab = jnp.asarray(tbl.load_ice_tables()[0])
    if qi_in is None:
        qi_in, ni_in, qm_in, bm_in = _default_inc(
            [(qi, cld_frac_i), (ni, cld_frac_i), (qm, cld_frac_i),
             (bm, cld_frac_i)])

    def body(c):
        (qi2, ni2, qm2, bm2, qii, nii, qmi, bmi, dtl, prt) = _ice_substep(
            c["qi"], c["ni"], c["qm"], c["bm"], c["qi_in"], c["ni_in"],
            c["qm_in"], c["bm_in"], c["dt_left"], c["prt"],
            rho, inv_rho, cld_frac_i, rhofaci, inv_dz, ice_tab)
        return dict(qi=qi2, ni=ni2, qm=qm2, bm=bm2, qi_in=qii, ni_in=nii,
                    qm_in=qmi, bm_in=bmi, dt_left=dtl, prt=prt)

    init = dict(qi=qi, ni=ni, qm=qm, bm=bm, qi_in=qi_in, ni_in=ni_in,
                qm_in=qm_in, bm_in=bm_in,
                dt_left=jnp.zeros_like(qi[0]) + dt,
                prt=jnp.zeros_like(qi[0]))
    out = jax.lax.while_loop(lambda c: jnp.any(c["dt_left"] > 1.0e-4),
                             body, init)
    return (out["qi"], out["ni"], out["qm"], out["bm"],
            out["prt"] * C.inv_rho_h2o / dt)


def combined_sedimentation(qc, nc, qr, nr, qi, ni, qm, bm, rho, inv_rho,
                           cld_frac_l, cld_frac_r, cld_frac_i, acn, rhofacr,
                           rhofaci, inv_dz, dt, do_predict_nc=False,
                           inc=None):
    """All three species' adaptive substep loops fused into ONE
    ``lax.while_loop``.

    Each species keeps its own per-column ``dt_left`` and substep length,
    and every in-substep update is gated on that species' column still
    being active, so finished species take exact no-op substeps and the
    updates match running cloud_/rain_/ice_sedimentation separately (the
    bodies are literally the same shared helpers; agreement is ulp-level —
    the two paths are distinct XLA programs, so FMA-contraction choices
    may differ). On TPU this replaces 3 sequential data-dependent loops
    (3 loop-condition syncs per substep round) with one loop whose body
    XLA fuses across species — the substep counts are Courant-driven and
    nearly always 1-2 for all species at CRM dt.

    inc: part2's final (qc_in, qr_in, qi_in, qm_in, nc_in, nr_in, ni_in,
    bm_in) tuple for the first substep; default = plain division.

    Returns (qc, nc, prt_liq_c, qr, nr, prt_liq_r, qi, ni, qm, bm, prt_ice).
    """
    vn_t, vm_t, _ = (jnp.asarray(a) for a in tbl.build_rain_tables())
    ice_tab = jnp.asarray(tbl.load_ice_tables()[0])
    if inc is None:
        qc_in, nc_in = _default_inc([(qc, cld_frac_l), (nc, cld_frac_l)])
        qr_in, nr_in = _default_inc([(qr, cld_frac_r), (nr, cld_frac_r)])
        qi_in, ni_in, qm_in, bm_in = _default_inc(
            [(qi, cld_frac_i), (ni, cld_frac_i), (qm, cld_frac_i),
             (bm, cld_frac_i)])
    else:
        qc_in, qr_in, qi_in, qm_in, nc_in, nr_in, ni_in, bm_in = inc

    def body(c):
        qc2, nc2, qci, nci, dtl_c, prt_c = _cloud_substep(
            c["qc"], c["nc"], c["qc_in"], c["nc_in"], c["dtl_c"],
            c["prt_c"], rho, inv_rho, cld_frac_l, acn, inv_dz,
            do_predict_nc)
        qr2, nr2, qri, nri, dtl_r, prt_r = _rain_substep(
            c["qr"], c["nr"], c["qr_in"], c["nr_in"], c["dtl_r"],
            c["prt_r"], rho, inv_rho, cld_frac_r, rhofacr, inv_dz, vn_t,
            vm_t)
        (qi2, ni2, qm2, bm2, qii, nii, qmi, bmi, dtl_i, prt_i) = \
            _ice_substep(
                c["qi"], c["ni"], c["qm"], c["bm"], c["qi_in"], c["ni_in"],
                c["qm_in"], c["bm_in"], c["dtl_i"], c["prt_i"],
                rho, inv_rho, cld_frac_i, rhofaci, inv_dz, ice_tab)
        return dict(qc=qc2, nc=nc2, qr=qr2, nr=nr2, qi=qi2, ni=ni2,
                    qm=qm2, bm=bm2, qc_in=qci, nc_in=nci, qr_in=qri,
                    nr_in=nri, qi_in=qii, ni_in=nii, qm_in=qmi, bm_in=bmi,
                    dtl_c=dtl_c, dtl_r=dtl_r, dtl_i=dtl_i,
                    prt_c=prt_c, prt_r=prt_r, prt_i=prt_i)

    # zeros_like(qc[0]) (not jnp.full) so the carry inherits qc's
    # varying manual axes under shard_map (scan-vma rule)
    full = jnp.zeros_like(qc[0]) + dt
    zero = jnp.zeros_like(qc[0])
    init = dict(qc=qc, nc=nc, qr=qr, nr=nr, qi=qi, ni=ni, qm=qm, bm=bm,
                qc_in=qc_in, nc_in=nc_in, qr_in=qr_in, nr_in=nr_in,
                qi_in=qi_in, ni_in=ni_in, qm_in=qm_in, bm_in=bm_in,
                dtl_c=full, dtl_r=full, dtl_i=full,
                prt_c=zero, prt_r=zero, prt_i=zero)
    out = jax.lax.while_loop(
        lambda c: jnp.any(jnp.maximum(jnp.maximum(c["dtl_c"], c["dtl_r"]),
                                      c["dtl_i"]) > 1.0e-4), body, init)
    s = C.inv_rho_h2o / dt
    return (out["qc"], out["nc"], out["prt_c"] * s,
            out["qr"], out["nr"], out["prt_r"] * s,
            out["qi"], out["ni"], out["qm"], out["bm"], out["prt_i"] * s)
