"""End-to-end SHOC column oracle test: the JAX shoc_main vs the scalar
numpy transliteration of shoc.F90 (tests/shoc_oracle.py) on diverse
columns (VERDICT r2 item 2): convective, stable, cloudy, sheared, and
surface-flux-driven boundary layers through the FULL scheme — grid,
obklen/pblintd, length scale, TKE advance, implicit diffusion, second +
third moments, assumed-PDF closure, energy fixer — validated at f64.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from pam_tpu.physics.sgs.shoc import main as shm
import shoc_oracle as orc


def _base_column(nlev=40, t_sfc=300.0, lapse=6.5e-3, rh=0.6, ztop=12000.0,
                 ntr=3, seed=0):
    rng = np.random.default_rng(seed)
    zi = np.linspace(ztop, 0.0, nlev + 1)          # k=0 top, surface last
    zt = 0.5 * (zi[:-1] + zi[1:])
    t = np.maximum(t_sfc - lapse * zt, 205.0)
    pres = 1.0e5 * np.exp(-zt / 8500.0)
    presi = 1.0e5 * np.exp(-zi / 8500.0)
    rho = pres / (orc.RGAS * t)
    dz = zi[:-1] - zi[1:]
    pdel = rho * orc.GGR * dz
    exner = (pres / 1.0e5) ** (orc.RGAS / orc.CP)
    qsat = np.array([orc.murphy_koop_liq(tt) for tt in t])
    qsat = 0.622 * qsat / np.maximum(pres - qsat, 1e-3)
    qv = rh * qsat
    ql = np.zeros(nlev)
    thetal = t / exner
    col = dict(
        host_dx=2000.0, host_dy=2000.0, thv=thetal * (1.0 + 0.61 * qv),
        zt_grid=zt, zi_grid=zi, pres=pres, presi=presi, pdel=pdel,
        wthl_sfc=0.0, wqw_sfc=0.0, uw_sfc=0.0, vw_sfc=0.0,
        wtracer_sfc=np.zeros(ntr),
        w_field=np.zeros(nlev), inv_exner=1.0 / exner, phis=0.0,
        host_dse=orc.CP * t + orc.GGR * zt,
        tke=np.full(nlev, 0.004), thetal=thetal, qw=qv + ql,
        u_wind=5.0 + 5e-4 * zt, v_wind=np.full(nlev, -2.0),
        qtracers=1e-6 * (1.0 + rng.random((nlev, ntr))),
        wthv_sec=np.zeros(nlev), tkh=np.full(nlev, 1.0),
        tk=np.full(nlev, 1.0), shoc_ql=ql,
        shoc_cldfrac=np.zeros(nlev))
    return col, t, zt


def _columns():
    cols = []

    # 1: convective boundary layer — strong surface heating + moisture
    col, t, zt = _base_column(t_sfc=303.0, rh=0.7, seed=1)
    col["wthl_sfc"] = 0.12
    col["wqw_sfc"] = 8e-5
    col["uw_sfc"] = -0.08
    col["vw_sfc"] = 0.03
    low = zt < 1500.0
    col["tke"][low] = 0.4
    col["wthv_sec"][low] = 0.05
    cols.append(("convective", col))

    # 2: stable nocturnal boundary layer — negative heat flux, shear
    col, t, zt = _base_column(t_sfc=285.0, lapse=3e-3, rh=0.5, seed=2)
    col["wthl_sfc"] = -0.02
    col["uw_sfc"] = -0.05
    col["u_wind"] = 10.0 + 3e-3 * zt
    col["tke"][zt < 500] = 0.05
    cols.append(("stable", col))

    # 3: stratocumulus — cloud layer, in-cloud liquid, radiative-like flux
    col, t, zt = _base_column(t_sfc=290.0, rh=0.92, seed=3)
    cloud = (zt > 500) & (zt < 1200)
    col["shoc_ql"][cloud] = 3e-4
    col["qw"] = col["qw"] + np.where(cloud, 3e-4, 0.0)
    col["shoc_cldfrac"][cloud] = 0.9
    col["tke"][zt < 1400] = 0.25
    col["wthv_sec"][zt < 1400] = 0.02
    col["wthl_sfc"] = 0.02
    col["wqw_sfc"] = 4e-5
    cols.append(("stratocumulus", col))

    # 4: strongly sheared, dry — momentum-flux dominated
    col, t, zt = _base_column(t_sfc=298.0, rh=0.3, seed=4)
    col["u_wind"] = 25.0 * np.tanh(zt / 3000.0)
    col["v_wind"] = -10.0 * np.exp(-zt / 2000.0)
    col["uw_sfc"] = -0.25
    col["vw_sfc"] = 0.1
    col["tke"][:] = 0.1
    cols.append(("sheared-dry", col))

    # 5: deep convective updraft environment — large w_field + variance
    col, t, zt = _base_column(t_sfc=302.0, rh=0.85, seed=5)
    col["w_field"] = 2.0 * np.exp(-((zt - 5000.0) / 2500.0) ** 2)
    col["tke"] = 0.5 * np.exp(-((zt - 4000.0) / 3000.0) ** 2) + 0.01
    col["wthv_sec"] = 0.08 * np.exp(-((zt - 3000.0) / 2500.0) ** 2)
    col["wthl_sfc"] = 0.2
    col["wqw_sfc"] = 1.5e-4
    col["uw_sfc"] = -0.1
    cols.append(("deep-updraft", col))

    # 6: near-neutral, minimal turbulence (mintke clamps + energy fixer
    # shoctop search)
    col, t, zt = _base_column(t_sfc=295.0, rh=0.4, seed=6)
    col["tke"][:] = orc.MINTKE
    col["tke"][zt < 300] = 0.02
    cols.append(("near-neutral", col))

    return cols


@pytest.mark.parametrize("name,col", _columns(),
                         ids=[n for n, _ in _columns()])
def test_shoc_main_matches_fortran_oracle(name, col):
    dtime, nadv = 20.0, 1
    npbl = max(int(np.sum(np.asarray(col["pres"]) >= 4.0e4)), 1)
    want = orc.shoc_main_oracle(col, dtime, nadv, npbl)

    ntr = col["qtracers"].shape[1]
    j = {}
    for k, v in col.items():
        a = np.asarray(v, np.float64)
        if a.ndim == 0:
            j[k] = jnp.asarray(np.array([v], np.float64))
        elif k == "wtracer_sfc":          # (ntr,) -> (ncol=1, ntr)
            j[k] = jnp.asarray(a)[None, :]
        elif k == "qtracers":             # (nlev, ntr) -> (nlev, 1, ntr)
            j[k] = jnp.asarray(a)[:, None, :]
        else:                             # (nlev[,+1],) -> (nlev, 1)
            j[k] = jnp.asarray(a)[:, None]
    st, diags = shm.shoc_main(
        dtime=dtime, nadv=nadv, host_dx=j["host_dx"], host_dy=j["host_dy"],
        thv=j["thv"], zt_grid=j["zt_grid"], zi_grid=j["zi_grid"],
        pres=j["pres"], presi=j["presi"], pdel=j["pdel"],
        wthl_sfc=j["wthl_sfc"], wqw_sfc=j["wqw_sfc"], uw_sfc=j["uw_sfc"],
        vw_sfc=j["vw_sfc"], wtracer_sfc=j["wtracer_sfc"],
        w_field=j["w_field"], inv_exner=j["inv_exner"], phis=j["phis"],
        host_dse=j["host_dse"], tke=j["tke"], thetal=j["thetal"],
        qw=j["qw"], u_wind=j["u_wind"], v_wind=j["v_wind"],
        qtracers=j["qtracers"], wthv_sec=j["wthv_sec"], tkh=j["tkh"],
        tk=j["tk"], shoc_ql=j["shoc_ql"], shoc_cldfrac=j["shoc_cldfrac"],
        npbl=npbl)

    # absolute floors for PDF-tail quantities: erf/exp tails differ between
    # libm (oracle) and XLA's implementations at ~1e-8 absolute, which is
    # physically irrelevant for O(1) cloud fraction / O(1e-4) liquid
    atol_floor = {"shoc_cldfrac": 1e-7, "shoc_ql": 1e-10,
                  "wthv_sec": 1e-7}
    for key in ("thetal", "qw", "u_wind", "v_wind", "tke", "tk", "tkh",
                "wthv_sec", "shoc_ql", "shoc_cldfrac", "host_dse"):
        got = np.asarray(st[key][:, 0])
        np.testing.assert_allclose(
            got, want[key], rtol=2e-6,
            atol=max(atol_floor.get(key, 0.0),
                     1e-10 * max(1.0, np.abs(want[key]).max())),
            err_msg=f"{name}: field {key}")
    np.testing.assert_allclose(
        np.asarray(st["qtracers"][:, 0, :]), want["qtracers"], rtol=2e-6,
        atol=1e-16, err_msg=f"{name}: qtracers")
    np.testing.assert_allclose(
        np.asarray(diags["shoc_ql2"][:, 0]), want["shoc_ql2"], rtol=2e-6,
        atol=1e-14, err_msg=f"{name}: shoc_ql2")
    np.testing.assert_allclose(
        float(diags["pblh"][0]), want["pblh"], rtol=2e-6,
        err_msg=f"{name}: pblh")
