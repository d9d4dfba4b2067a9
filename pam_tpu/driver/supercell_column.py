"""Supercell initial column for MMF-mode runs.

Parity reference: standalone/mmf_simplified/supercell_init.h — 5-point GLL
hydrostatic integration of the Weisman-Klemp-like sounding producing
(rho_d, u, v, w, T, rho_v) columns, broadcast into the GCM/reference-state
columns by the driver (driver.cpp:19-77).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.constants import Constants
from ..core.coupler import Coupler
from ..dycore.awfl_init import supercell_column_profiles
from ..ops import recon_matrices as rm


def supercell_init_column(zint: np.ndarray, c: Constants, ngll: int = 5):
    """Compute the supercell initial column at cell averages.

    Args:
      zint: (nz+1,) vertical interface heights.
    Returns:
      dict of (nz,) arrays: rho_d, uvel, vvel, wvel, temp, rho_v.
    """
    zint = np.asarray(zint, np.float64)
    nz = len(zint) - 1
    dz = np.diff(zint)
    zmid = 0.5 * (zint[:-1] + zint[1:])
    qp, qw = rm.gll_points_weights(ngll)
    z_top = zint[-1]

    # integrate ln(p) along GLL sub-intervals (ref: supercell_init.h:74-92)
    pGLL = np.empty((nz, ngll))
    p = 1.0e5
    for k in range(nz):
        pGLL[k, 0] = p
        for kk in range(ngll - 1):
            zb = zmid[k] + qp[kk] * dz[k]
            zt = zmid[k] + qp[kk + 1] * dz[k]
            zm = 0.5 * (zb + zt)
            ddz = dz[k] * (qp[kk + 1] - qp[kk])
            zq = zm + ddz * qp
            T, p_dry, qv = supercell_column_profiles(zq, c, z_top=z_top)
            integ = -(1.0 + qv) * c.grav / (c.R_d + qv * c.R_v) / T
            p = p * np.exp(np.dot(integ, qw) * ddz)
            pGLL[k, kk + 1] = p

    # cell averages (ref: supercell_init.h:95-135)
    zq = zmid[:, None] + qp[None, :] * dz[:, None]
    T, p_dry, qv = supercell_column_profiles(zq, c, z_top=z_top)
    rho_d = pGLL / (c.R_d + qv * c.R_v) / T
    rho_v = qv * rho_d
    zs, us, uc = 5000.0, 30.0, 15.0
    u = np.where(zq < zs, us * (zq / zs) - uc, us - uc)
    avg = lambda f: np.einsum('kq,q->k', f, qw)
    return dict(rho_d=avg(rho_d), uvel=avg(u), vvel=np.zeros(nz),
                wvel=np.zeros(nz), temp=avg(T), rho_v=avg(rho_v))


def initialize_from_supercell_column(coupler: Coupler, state, zint):
    """Set gcm_* and ref_* columns from the supercell sounding
    (ref: driver.cpp:18-77 initialize_from_supercell_column)."""
    col = supercell_init_column(np.asarray(zint), coupler.const)
    out = dict(state)
    to = lambda a: jnp.broadcast_to(jnp.asarray(a, coupler.dtype),
                                    (coupler.nens, coupler.nz))
    out["gcm_density_dry"] = to(col["rho_d"])
    out["gcm_uvel"] = to(col["uvel"])
    out["gcm_vvel"] = to(col["vvel"])
    out["gcm_wvel"] = to(col["wvel"])
    out["gcm_temp"] = to(col["temp"])
    out["gcm_water_vapor"] = to(col["rho_v"])
    out["ref_density_dry"] = to(col["rho_d"])
    out["ref_density_vapor"] = to(col["rho_v"])
    out["ref_density_liq"] = to(np.zeros(coupler.nz))
    out["ref_density_ice"] = to(np.zeros(coupler.nz))
    out["ref_temp"] = to(col["temp"])
    return out
