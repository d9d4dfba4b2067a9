"""Initial conditions for the AWFL dycore (thermal bubble, supercell).

These are one-time numpy computations (quadrature-projected analytic states),
mirroring dynamics/awfl/Dycore.h init paths:

* thermal: rising moist/dry thermal in a constant-theta hydrostatic
  background (Dycore.h:1021-1088).
* supercell: Weisman-Klemp-like high-CAPE sounding with GLL-quadrature
  hydrostatic pressure integration and RH cap at qv=0.014
  (Dycore.h:1096-1276).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.coupler import Coupler
from ..ops import recon_matrices as rm

NGLL = 9


def _gll():
    return rm.gll_points_weights(NGLL)


def _hydro_const_theta(z, c, theta0=300.0):
    """(rho, theta) for constant-theta hydrostatic background
    (ref: Dycore.h:739-748)."""
    exner = 1.0 - c.grav * z / (c.cp_d * theta0)
    p = c.p0 * exner ** (c.cp_d / c.R_d)
    rt = (p / c.C0) ** (1.0 / c.gamma_d)
    return rt / theta0, np.full_like(np.asarray(z, float), theta0)


def _sample_ellipse_cosine(amp, x, y, z, x0, y0, z0, xr, yr, zr):
    """(ref: Dycore.h:753-766)."""
    d = np.sqrt(((x - x0) / xr) ** 2 + ((y - y0) / yr) ** 2 +
                ((z - z0) / zr) ** 2) * np.pi / 2.0
    return np.where(d <= np.pi / 2.0, amp * np.cos(d) ** 2, 0.0)


def init_thermal(coupler: Coupler, state):
    """Dry rising-thermal bubble; fills coupler state + hydrostatic background.

    Ref: Dycore.h DATA_SPEC_THERMAL branch (1021-1088).
    """
    c = coupler.const
    nz, ny, nx, nens = coupler.nz, coupler.ny, coupler.nx, coupler.nens
    dx, dy = coupler.dx, coupler.dy
    qp, qw = _gll()
    zmid = np.asarray(state["vertical_midpoint_height"])  # (nens, nz)
    dz = np.asarray(state["vertical_cell_dz"])

    # hydrostatic background cell averages by quadrature (ref: 1035-1047)
    zq = zmid[:, :, None] + qp[None, None, :] * dz[:, :, None]  # (nens,nz,q)
    hr, ht = _hydro_const_theta(zq, c)
    hy_dens = np.einsum('ekq,q->ek', hr, qw)
    hy_pres = np.einsum('ekq,q->ek', c.C0 * (hr * ht) ** c.gamma_d, qw)

    # cell-averaged state by 3-D quadrature (ref: 1050-1086)
    xq = (np.arange(nx) + 0.5) * dx + 0.0  # perturb added per quad point below
    # Build full quadrature grids lazily per dimension to keep memory small
    ht_cell = (hy_pres / c.C0) ** (1.0 / c.gamma_d) / hy_dens  # (nens, nz)

    rho = np.broadcast_to(hy_dens[:, :, None, None], (nens, nz, ny, nx)).copy()
    rt = np.zeros((nens, nz, ny, nx))
    for kk in range(NGLL):
        zq1 = zmid + qp[kk] * dz  # (nens, nz)
        for jj in range(NGLL):
            if coupler.sim2d:
                yq1 = np.full((ny,), coupler.ylen / 2.0)
                wjj = qw[jj]
            else:
                yq1 = (np.arange(ny) + 0.5) * dy + qp[jj] * dy
                wjj = qw[jj]
            for ii in range(NGLL):
                xq1 = (np.arange(nx) + 0.5) * dx + qp[ii] * dx
                pert = _sample_ellipse_cosine(
                    2.0,
                    xq1[None, None, None, :], yq1[None, None, :, None],
                    zq1[:, :, None, None],
                    coupler.xlen / 2.0, coupler.ylen / 2.0, 2000.0,
                    2000.0, 2000.0, 2000.0)
                theta = ht_cell[:, :, None, None] + pert
                w = qw[ii] * wjj * qw[kk]
                rt += hy_dens[:, :, None, None] * theta * w
    # dycore state -> coupler conversion (dry: no vapor)
    press = c.C0 * rt ** c.gamma_d
    temp = press / (rho * c.R_d)
    out = dict(state)
    out["density_dry"] = jnp.asarray(rho, coupler.dtype)
    out["uvel"] = jnp.zeros_like(out["density_dry"])
    out["vvel"] = jnp.zeros_like(out["density_dry"])
    out["wvel"] = jnp.zeros_like(out["density_dry"])
    out["temp"] = jnp.asarray(temp, coupler.dtype)
    out["hy_dens_cells"] = jnp.asarray(hy_dens, coupler.dtype)
    out["hy_pressure_cells"] = jnp.asarray(hy_pres, coupler.dtype)
    return out


def supercell_column_profiles(zcol, c, z_trop=12000.0, T_0=300.0, T_trop=213.0,
                              T_top=213.0, p_0=1.0e5, z_top=None):
    """Supercell sounding at arbitrary heights (temperature, dry pressure,
    capped qv). Ref: Dycore.h:778-830 helpers."""
    z_0 = 0.0
    # guard against -eps from quadrature-point rounding on stretched grids:
    # the sounding is defined for z >= 0 and (-eps)**1.25 is NaN
    zcol = np.maximum(zcol, 0.0)
    if z_top is None:
        z_top = zcol.max()
    lapse_lo = -(T_trop - T_0) / (z_trop - z_0)
    T = np.where(zcol <= z_trop, T_0 - lapse_lo * (zcol - z_0), T_trop)
    p_trop = p_0 * (T_trop / T_0) ** (c.grav / (c.R_d * lapse_lo))
    p_dry = np.where(zcol <= z_trop,
                     p_0 * (T / T_0) ** (c.grav / (c.R_d * lapse_lo)),
                     p_trop * np.exp(-c.grav * (zcol - z_trop) / (c.R_d * T_trop)))
    qvs = 380.0 / p_dry * np.exp(17.27 * (T - 273.0) / (T - 36.0))
    relhum = np.where(zcol <= z_trop, 1.0 - 0.75 * (zcol / z_trop) ** 1.25, 0.25)
    relhum = np.where(relhum * qvs > 0.014, 0.014 / qvs, relhum)
    qv = np.minimum(0.014, qvs * relhum)
    return T, p_dry, qv


def init_supercell(coupler: Coupler, state):
    """Supercell initial state with GLL-quadrature hydrostatic integration.

    Ref: Dycore.h init_supercell (1096-1276). Returns updated state with
    hy_dens_cells / hy_pressure_cells filled.
    """
    c = coupler.const
    nz, ny, nx, nens = coupler.nz, coupler.ny, coupler.nx, coupler.nens
    dx, dy = coupler.dx, coupler.dy
    z_trop, T_0, T_trop, T_top, p_0 = 12000.0, 300.0, 213.0, 213.0, 1.0e5
    qp, qw = _gll()
    zmid = np.asarray(state["vertical_midpoint_height"])
    zint = np.asarray(state["vertical_interface_height"])
    dz = np.asarray(state["vertical_cell_dz"])
    z_top = zint[:, -1]  # (nens,)

    # pressure at GLL points by sequential exponential integration
    # (ref: 1146-1184)
    pGLL = np.empty((nens, nz, NGLL))
    for e in range(nens):
        p = p_0
        for k in range(nz):
            pGLL[e, k, 0] = p
            for kk in range(NGLL - 1):
                zb = zmid[e, k] + qp[kk] * dz[e, k]
                zt = zmid[e, k] + qp[kk + 1] * dz[e, k]
                zm = 0.5 * (zb + zt)
                ddz = dz[e, k] * (qp[kk + 1] - qp[kk])
                zq = zm + ddz * qp  # NGLL quadrature points in sub-interval
                T, p_dry, qv = supercell_column_profiles(
                    zq, c, z_trop, T_0, T_trop, T_top, p_0, z_top[e])
                integ = -(1.0 + qv) * c.grav / (c.R_d + qv * c.R_v) / T
                tot = np.dot(integ, qw) * ddz
                p = p * np.exp(tot)
                pGLL[e, k, kk + 1] = p

    # hydrostatic background at GLL points (ref: 1187-1203)
    zq = zmid[:, :, None] + qp[None, None, :] * dz[:, :, None]
    T, p_dry, qv = supercell_column_profiles(zq, c, z_trop, T_0, T_trop,
                                             T_top, p_0)
    dens_dry = pGLL / (c.R_d + qv * c.R_v) / T
    dens_vap = qv * dens_dry
    dens = dens_dry + dens_vap
    dens_theta = (pGLL / c.C0) ** (1.0 / c.gamma_d)

    hy_dens = np.einsum('ekq,q->ek', dens, qw)
    hy_pres = np.einsum('ekq,q->ek', pGLL, qw)
    hy_dens_vap = np.einsum('ekq,q->ek', dens_vap, qw)

    # cell-averaged momentum via quadrature of the shear profile u(z)
    # (ref: 1240-1275); rho is the cell-average hy_dens
    zs, us, uc = 5000.0, 30.0, 15.0
    uq = np.where(zq < zs, us * (zq / zs) - uc, us - uc)  # (nens, nz, q)
    u_cell = np.einsum('ekq,q->ek', uq, qw)

    rho = np.broadcast_to(hy_dens[:, :, None, None], (nens, nz, ny, nx)).copy()
    rho_u = np.broadcast_to((hy_dens * u_cell)[:, :, None, None],
                            (nens, nz, ny, nx)).copy()
    rho_t = np.broadcast_to(((hy_pres / c.C0) ** (1.0 / c.gamma_d))[:, :, None, None],
                            (nens, nz, ny, nx)).copy()
    rho_v = np.broadcast_to(hy_dens_vap[:, :, None, None],
                            (nens, nz, ny, nx)).copy()
    # convert to coupler variables (ref: convert_dynamics_to_coupler)
    rho_d = rho - rho_v
    press = c.C0 * rho_t ** c.gamma_d
    temp = press / (rho_d * c.R_d + rho_v * c.R_v)
    out = dict(state)
    out["density_dry"] = jnp.asarray(rho_d, coupler.dtype)
    out["uvel"] = jnp.asarray(rho_u / rho, coupler.dtype)
    out["vvel"] = jnp.zeros_like(out["density_dry"])
    out["wvel"] = jnp.zeros_like(out["density_dry"])
    out["temp"] = jnp.asarray(temp, coupler.dtype)
    out["water_vapor"] = jnp.asarray(rho_v, coupler.dtype)
    out["hy_dens_cells"] = jnp.asarray(hy_dens, coupler.dtype)
    out["hy_pressure_cells"] = jnp.asarray(hy_pres, coupler.dtype)
    return out
