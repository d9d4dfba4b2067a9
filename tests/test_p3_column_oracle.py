"""End-to-end column oracle test: the JAX p3_main vs the scalar numpy
transliteration of micro_p3.F90 (tests/p3_oracle.py) on diverse columns.

Covers VERDICT r2 item 2(b): ~10 physically distinct columns (warm rain,
convective, mixed-phase, cirrus, supercooled, sub/supersaturated) through
the FULL scheme — part1, part2's whole process chain, the adaptive
sedimentation loops, homogeneous freezing, part3 — validated at f64
against the independently-written Fortran transliteration.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pam_tpu.physics.p3 import main as p3m
import p3_oracle as orc


def _base_column(nz=40, t_sfc=300.0, lapse=6.5e-3, rh=0.8, ztop=14000.0):
    """Hydrostatic-ish column, k=0 = TOP."""
    z = np.linspace(ztop, ztop / (2 * nz), nz)          # cell midpoints
    dz = np.full(nz, ztop / nz)
    t = np.maximum(t_sfc - lapse * z, 200.0)
    pres = 1.0e5 * np.exp(-z / 8500.0)
    rho = pres / (orc.RD * t)
    qsat = np.array([orc.qv_sat(t[k], pres[k], 0) for k in range(nz)])
    qv = rh * qsat
    exner = (pres / 1.0e5) ** (orc.RD / orc.CP)
    col = dict(
        qc=np.zeros(nz), nc=np.full(nz, 1e7), qr=np.zeros(nz),
        nr=np.full(nz, 1e4), qv=qv, th=t / exner, qi=np.zeros(nz),
        qm=np.zeros(nz), ni=np.full(nz, 1e3), bm=np.zeros(nz),
        pres=pres, dz=dz, dpres=rho * orc.GRAV * dz,
        inv_exner=1.0 / exner, qv_prev=qv.copy(),
        t_prev=t.copy(), cld_frac_i=np.ones(nz), cld_frac_l=np.ones(nz),
        cld_frac_r=np.ones(nz), nc_nuceat_tend=np.zeros(nz),
        ni_activated=np.zeros(nz), inv_qc_relvar=np.ones(nz),
        nccn_prescribed=np.zeros(nz))
    return col, t, z


def _columns():
    """~10 diverse columns exercising different process paths."""
    cols = []
    rng = np.random.default_rng(42)

    # 1: warm rain — cloud + rain below freezing level only
    col, t, z = _base_column(t_sfc=302.0, rh=0.95)
    warm = t > 273.15
    col["qc"][warm] = 1.2e-3
    col["nc"][warm] = 8e7
    col["qr"][warm & (z < 3000)] = 0.8e-3
    col["nr"][warm & (z < 3000)] = 2e5
    cols.append(("warm-rain", col))

    # 2: convective mixed-phase — cloud through the freezing level + ice
    col, t, z = _base_column(t_sfc=300.0, rh=0.98)
    col["qc"][(z > 1500) & (z < 9000)] = 2.0e-3
    col["nc"][(z > 1500) & (z < 9000)] = 1.2e8
    col["qr"][(z < 5000)] = 1.5e-3
    col["nr"][(z < 5000)] = 3e5
    ice = (t < 268.0) & (z < 11000)
    col["qi"][ice] = 1.0e-3
    col["ni"][ice] = 5e4
    col["qm"][ice] = 2.0e-4
    col["bm"][ice] = 2.0e-4 / 400.0
    cols.append(("convective-mixed", col))

    # 3: cirrus — cold ice only, supersaturated wrt ice aloft
    col, t, z = _base_column(t_sfc=295.0, rh=0.55)
    hi = t < 235.0
    col["qi"][hi] = 4.0e-4
    col["ni"][hi] = 2e5
    qsi = np.array([orc.qv_sat(t[k], col["pres"][k], 1)
                    for k in range(len(t))])
    col["qv"][hi] = 1.1 * qsi[hi]
    cols.append(("cirrus", col))

    # 4: supercooled drizzle — liquid at -10C (immersion freezing active)
    col, t, z = _base_column(t_sfc=285.0, rh=0.9)
    sc = (t < 271.0) & (t > 255.0)
    col["qc"][sc] = 8e-4
    col["nc"][sc] = 6e7
    col["qr"][sc] = 2e-4
    col["nr"][sc] = 4e4
    cols.append(("supercooled", col))

    # 5: deep frozen — homogeneous freezing threshold crossed
    col, t, z = _base_column(t_sfc=300.0, rh=0.95)
    cold = t < 235.0
    col["qc"][cold] = 5e-4          # liquid colder than -40C -> hom. frz
    col["nc"][cold] = 5e7
    col["qr"][cold] = 1e-4
    col["nr"][cold] = 2e4
    cols.append(("homog-freezing", col))

    # 6: melting — ice falling through the freezing level
    col, t, z = _base_column(t_sfc=298.0, rh=0.85)
    band = (t > 268.0) & (t < 278.0)
    col["qi"][band] = 1.5e-3
    col["ni"][band] = 8e4
    col["qm"][band] = 6e-4
    col["bm"][band] = 6e-4 / 500.0
    cols.append(("melting", col))

    # 7: subsaturated rain shaft — evaporation
    col, t, z = _base_column(t_sfc=303.0, rh=0.45)
    col["qr"][z < 4000] = 1.0e-3
    col["nr"][z < 4000] = 2.5e5
    col["qv_prev"] = col["qv"] * 0.98
    col["t_prev"] = col["t_prev"] + 0.3
    cols.append(("evap-shaft", col))

    # 8: heavy convection — in-cloud limiter regime (qc_incld clamp)
    col, t, z = _base_column(t_sfc=302.0, rh=0.99)
    core = (z > 2000) & (z < 10000)
    col["qc"][core] = 6.0e-3        # exceeds INCLOUD_LIMIT=5.1e-3
    col["nc"][core] = 2e8
    col["qr"][z < 6000] = 4e-3
    col["nr"][z < 6000] = 6e5
    col["qi"][(t < 265) & core] = 3e-3
    col["ni"][(t < 265) & core] = 1e5
    cols.append(("heavy-core", col))

    # 9: partial cloud fractions
    col, t, z = _base_column(t_sfc=299.0, rh=0.9)
    nz = len(t)
    col["cld_frac_l"] = 0.3 + 0.6 * rng.random(nz)
    col["cld_frac_i"] = 0.3 + 0.6 * rng.random(nz)
    col["cld_frac_r"] = np.maximum(col["cld_frac_l"],
                                   0.4 + 0.5 * rng.random(nz))
    mid = (z > 1000) & (z < 8000)
    col["qc"][mid] = 1e-3 * col["cld_frac_l"][mid]
    col["qr"][z < 5000] = 6e-4
    col["nr"][z < 5000] = 1.5e5
    col["qi"][t < 266] = 8e-4
    col["ni"][t < 266] = 6e4
    cols.append(("partial-cldfrac", col))

    # 10: near-empty column (skip paths) with one marginal level
    col, t, z = _base_column(t_sfc=290.0, rh=0.5)
    col["qc"][20] = 2e-14            # just above qsmall
    col["qr"][25] = 5e-15            # below qsmall -> clipped
    cols.append(("near-empty", col))

    return cols


@pytest.mark.parametrize("name,col", _columns(),
                         ids=[n for n, _ in _columns()])
def test_p3_main_matches_fortran_oracle(name, col):
    dt = 20.0
    st_o, prt_liq_o, prt_ice_o, diag_o = orc.p3_main_oracle(col, dt)

    jcol = {k: jnp.asarray(v, jnp.float64)[:, None] for k, v in col.items()}
    st_j, diag_j = p3m.p3_main(
        qc=jcol["qc"], nc=jcol["nc"], qr=jcol["qr"], nr=jcol["nr"],
        qv=jcol["qv"], th=jcol["th"], qi=jcol["qi"], qm=jcol["qm"],
        ni=jcol["ni"], bm=jcol["bm"], pres=jcol["pres"], dz=jcol["dz"],
        nc_nuceat_tend=jcol["nc_nuceat_tend"],
        ni_activated=jcol["ni_activated"],
        inv_qc_relvar=jcol["inv_qc_relvar"], dt=dt, dpres=jcol["dpres"],
        inv_exner=jcol["inv_exner"], qv_prev=jcol["qv_prev"],
        t_prev=jcol["t_prev"], cld_frac_i=jcol["cld_frac_i"],
        cld_frac_l=jcol["cld_frac_l"], cld_frac_r=jcol["cld_frac_r"],
        nccn_prescribed=jcol["nccn_prescribed"])

    for key in ("qv", "th", "qc", "nc", "qr", "nr", "qi", "ni", "qm",
                "bm"):
        got = np.asarray(st_j[key][:, 0])
        want = st_o[key]
        # atol floors: q fields ~1e-18 (values ~1e-3), n fields scale-aware
        scale = max(1.0, np.abs(want).max())
        np.testing.assert_allclose(
            got, want, rtol=2e-6, atol=1e-12 * scale,
            err_msg=f"{name}: field {key}")

    np.testing.assert_allclose(
        float(st_j["precip_liq_surf"][0]), prt_liq_o,
        rtol=2e-6, atol=1e-14, err_msg=f"{name}: precip_liq_surf")
    np.testing.assert_allclose(
        float(st_j["precip_ice_surf"][0]), prt_ice_o,
        rtol=2e-6, atol=1e-14, err_msg=f"{name}: precip_ice_surf")

    # diagnostic outputs (micro_p3.F90:977-1137 diag section + the part2
    # exchange diagnostics; VERDICT r3 item 8). The GCM consumes these.
    if not diag_o:
        return      # no-hydrometeor early exit: scheme skipped part2/3
    diag_tols = {
        "diag_eff_radius_qc": (2e-6, 1e-12),
        "diag_eff_radius_qi": (2e-6, 1e-12),
        "diag_vm_qi": (2e-6, 1e-12),
        "diag_diam_qi": (2e-6, 1e-12),
        "rho_qi": (2e-6, 1e-9),
        # the port floors empty-cell reflectivity at 1e-22 (finite dBZ)
        # where the reference leaves 0 (-inf dBZ): compare ze with that
        # floor as atol, dBZ only where some reflectivity exists
        "ze_rain": (2e-6, 2.5e-22),
        "ze_ice": (2e-6, 2.5e-22),
        "vap_liq_exchange": (2e-6, 1e-14),
        "liq_ice_exchange": (2e-6, 1e-14),
        "vap_ice_exchange": (2e-6, 1e-14),
    }
    for key, (rtol, atol) in diag_tols.items():
        got = np.asarray(diag_j[key][:, 0])
        want = diag_o[key]
        scale = max(1.0, np.abs(want[np.isfinite(want)]).max(initial=0.0))
        np.testing.assert_allclose(got, want, rtol=rtol,
                                   atol=max(atol, 1e-12 * scale * 0),
                                   err_msg=f"{name}: diag {key}")
    # dBZ: the port floors each ze component at 1e-22 (finite dBZ in
    # empty cells) where the reference leaves 0; at reflective cells the
    # floor shifts dBZ by 10*log10(1 + 1e-22/ze) — compare where the
    # floor contributes <1e-4 relative, with a 5e-3 dB allowance
    dbz_o = diag_o["diag_equiv_reflectivity"]
    dbz_j = np.asarray(diag_j["diag_equiv_reflectivity"][:, 0])
    live = np.isfinite(dbz_o) & (diag_o["ze_rain"] + diag_o["ze_ice"] >
                                 1e-18)
    if live.any():
        np.testing.assert_allclose(dbz_j[live], dbz_o[live], rtol=0.0,
                                   atol=5e-3,
                                   err_msg=f"{name}: diag dBZ")
