"""SHOC coupler wrapper.

Parity reference: physics/sgs/shoc/SGS.h — registers the ``tke`` tracer and
persistent fields (:103-120), converts coupler densities to SHOC's
wet mixing ratios / thetal / thv / dse inputs with the top-down flip
(`k_shoc = nz-1-k`, :354), runs shoc_main, and maps back with the
constant-volume cv/cp temperature correction (:700-733).

The micro scheme determines which tracers SHOC diffuses (:237-250):
kessler -> [precip_liquid]; p3 -> [cloud_water_num, rain, rain_num, ice,
ice_num, ice_rime, ice_rime_vol]. Cloud mass and vapor ride in qw/ql.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ....core.coupler import Coupler
from .constants import CONST
from .main import shoc_main

C = CONST


def register(coupler: Coupler) -> Coupler:
    """Add the tke tracer (ref: SGS.h:103) and set the sgs option."""
    cpl = coupler.add_tracer("tke", "Turbulent Kinetic Energy (m^2/s^2)",
                             True, False)
    return cpl.with_options(sgs="shoc")


def init_state(coupler: Coupler, state):
    """Persistent SHOC fields (ref: SGS.h:108-120, zeroed at :125-136)."""
    cpl = coupler
    out = dict(state)
    shape = (cpl.nens, cpl.nz, cpl.ny, cpl.nx)
    for name in ("wthv_sec", "tk", "tkh", "cldfrac"):
        out.setdefault(name, jnp.zeros(shape, cpl.dtype))
    out.setdefault("inv_qc_relvar", jnp.ones(shape, cpl.dtype))
    for name in ("sfc_shf", "sfc_lhf", "sfc_mom_flx_u", "sfc_mom_flx_v",
                 "pblh"):
        out.setdefault(name, jnp.zeros((cpl.nens, cpl.ny, cpl.nx),
                                       cpl.dtype))
    return out


def _npbl(pref_mid: np.ndarray) -> int:
    """Max number of PBL levels: count of reference pressures >= 400mb
    (shoc_init, shoc.F90:159-170)."""
    return max(int(np.sum(np.asarray(pref_mid) >= C.pblmaxp)), 1)


def _to_cols(a, nz):
    """(nens, nz, ny, nx) -> (ncol, nz) flipped to top-down."""
    return jnp.moveaxis(a, 1, -1).reshape(-1, nz)[:, ::-1]


def _from_cols(a, shape):
    nens, nz, ny, nx = shape
    return jnp.moveaxis(a[:, ::-1].reshape(nens, ny, nx, nz), -1, 1)


@dataclasses.dataclass(frozen=True)
class ShocSgs:
    """Coupler-facing wrapper (analog of SGS::timeStep, SGS.h:195-760)."""
    coupler: Coupler
    npbl: int

    @classmethod
    def build(cls, coupler: Coupler, pref_mid=None):
        """pref_mid: reference mid-level pressures (nz,), TOP-DOWN, used
        only to bound the PBL search depth; defaults to all levels."""
        npbl = coupler.nz if pref_mid is None else _npbl(pref_mid)
        return cls(coupler=coupler, npbl=min(npbl, coupler.nz))

    @property
    def name(self) -> str:
        return "shoc"

    def _micro_fields(self):
        micro = self.coupler.options.get("micro", "none")
        if micro == "kessler":
            return "cloud_liquid", ["precip_liquid"]
        if micro == "p3":
            return "cloud_water", ["cloud_water_num", "rain", "rain_num",
                                   "ice", "ice_num", "ice_rime",
                                   "ice_rime_vol"]
        raise ValueError(
            "SHOC requires the micro option to be set (SGS.h:194-200); "
            f"got {micro!r}")

    def timestep(self, state, dt):
        cpl = self.coupler
        nz = cpl.nz
        shape = (cpl.nens, nz, cpl.ny, cpl.nx)
        out = dict(state)
        cloud_name, tracer_names = self._micro_fields()

        rho_d = state["density_dry"]
        rho_v = jnp.maximum(state["water_vapor"], 0.0)
        rho_c = jnp.maximum(state[cloud_name], 0.0)
        rho_total = rho_d + rho_v
        temp = state["temp"]

        zint = state["vertical_interface_height"]       # (nens, nz+1)
        zmid = state["vertical_midpoint_height"]        # (nens, nz)
        z0 = zint[:, :1]
        dz = (zint[:, 1:] - zint[:, :-1])
        dx = cpl.xlen / cpl.nx
        dy = dx if cpl.ny == 1 else cpl.ylen / cpl.ny

        pmid = cpl.pressure(state)                       # moist pressure
        qv = rho_v / rho_total
        ql = rho_c / rho_total
        exner = (pmid / 1.0e5) ** (C.rgas / C.cp)
        theta = temp / exner
        theta_v = theta * (1.0 + 0.61 * qv - ql)
        theta_l = theta - (1.0 / exner) * (C.lcond / C.cp) * ql

        bc = lambda a: a[:, :, None, None] * jnp.ones(shape, cpl.dtype)
        ones_col = jnp.ones((cpl.nens * cpl.ny * cpl.nx,), cpl.dtype)
        cols = lambda a: _to_cols(a if a.ndim == 4 else bc(a), nz)

        zt = cols(bc(zmid - z0))
        zi_full = (zint - z0)[:, :, None, None] * \
            jnp.ones((cpl.nens, nz + 1, cpl.ny, cpl.nx), cpl.dtype)
        zi = _to_cols(zi_full, nz + 1)
        pdel = cols(C.ggr * rho_total * dz[:, :, None, None])

        # interface pressure (SGS.h:398-411)
        half = C.ggr * rho_total * dz[:, :, None, None] * 0.5
        p_up = pmid + half      # value extrapolated to lower interface
        p_dn = pmid - half      # value extrapolated to upper interface
        pint_top = p_dn[:, -1:]
        pint_bot = p_up[:, :1]
        pint_mid = 0.5 * (p_dn[:, :-1] + p_up[:, 1:])
        pint_full = jnp.concatenate([pint_bot, pint_mid, pint_top], axis=1)
        presi = _to_cols(pint_full, nz + 1)

        sfc = lambda name: state[name].reshape(-1)
        phis = jnp.repeat(z0[:, 0] * C.ggr, cpl.ny * cpl.nx)

        tke_in = jnp.maximum(0.004, state["tke"] / rho_total)
        qtr = jnp.stack([jnp.maximum(state[n] / rho_total, 0.0)
                         for n in tracer_names], axis=-1)
        qtr_cols = jnp.stack([_to_cols(qtr[..., i], nz)
                              for i in range(qtr.shape[-1])], axis=-1)

        st, diags = shoc_main(
            dtime=dt, nadv=1,
            host_dx=dx * ones_col, host_dy=dy * ones_col,
            thv=cols(theta_v), zt_grid=zt, zi_grid=zi, pres=cols(pmid),
            presi=presi, pdel=pdel,
            wthl_sfc=0.0 * ones_col, wqw_sfc=0.0 * ones_col,
            uw_sfc=sfc("sfc_mom_flx_u"), vw_sfc=sfc("sfc_mom_flx_v"),
            wtracer_sfc=jnp.zeros_like(qtr_cols[:, 0, :]),
            w_field=cols(state["wvel"]), inv_exner=cols(1.0 / exner),
            phis=phis,
            host_dse=cols(C.cp * temp + C.ggr * bc(zmid - z0)) +
            phis[:, None],
            tke=cols(tke_in), thetal=cols(theta_l), qw=cols(qv + ql),
            u_wind=cols(state["uvel"]), v_wind=cols(state["vvel"]),
            qtracers=qtr_cols, wthv_sec=cols(state["wthv_sec"]),
            tkh=cols(state["tkh"]), tk=cols(state["tk"]),
            shoc_ql=cols(ql), shoc_cldfrac=cols(state["cldfrac"]),
            npbl=self.npbl)

        # post-process (SGS.h:700-733)
        back = lambda a: _from_cols(a, shape)
        qw_new = back(st["qw"])
        ql_new = back(st["shoc_ql"])
        qv_new = qw_new - ql_new
        temp_new = back(st["thetal"]) * exner + (C.lcond / C.cp) * ql_new
        out["temp"] = temp + (temp_new - temp) * (C.cp - C.rgas) / C.cp
        rho_v_new = jnp.maximum(qv_new * rho_d / (1.0 - qv_new), 0.0)
        out["water_vapor"] = rho_v_new
        rho_total_new = rho_d + rho_v_new
        out[cloud_name] = jnp.maximum(ql_new * rho_total_new, 0.0)
        out["uvel"] = back(st["u_wind"])
        out["vvel"] = back(st["v_wind"])
        out["tke"] = back(st["tke"]) * rho_total_new
        out["wthv_sec"] = back(st["wthv_sec"])
        out["tk"] = back(st["tk"])
        out["tkh"] = back(st["tkh"])
        out["cldfrac"] = jnp.clip(back(st["shoc_cldfrac"]), 0.0, 1.0)
        for i, n in enumerate(tracer_names):
            out[n] = jnp.maximum(back(st["qtracers"][..., i]) *
                                 rho_total_new, 0.0)
        rcm = ql_new
        rcm2 = back(diags["shoc_ql2"])
        out["inv_qc_relvar"] = jnp.where(
            (rcm != 0.0) & (rcm2 != 0.0),
            jnp.clip(rcm * rcm / jnp.maximum(rcm2, 1e-300), 0.001, 10.0),
            1.0)
        out["pblh"] = diags["pblh"].reshape(cpl.nens, cpl.ny, cpl.nx)
        return out
