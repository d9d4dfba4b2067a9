"""P3 microphysics tests: tables, saturation, column scheme conservation,
sedimentation, wrapper round-trip (ref test strategy: SURVEY.md §4 and the
reference's PAM_DEBUG water-mass audit, Microphysics.h:706-719)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.core import Coupler
from pam_tpu.physics import p3
from pam_tpu.physics.p3 import tables as tbl
from pam_tpu.physics.p3.main import (murphy_koop_svp, qv_sat, p3_main,
                                     cloud_dsd, rain_dsd)
from pam_tpu.physics.p3 import sedimentation as sed
from pam_tpu.physics.p3.constants import CONST


def test_tables_load_and_interpolate():
    ice, coll = tbl.load_ice_tables()
    assert ice.shape == (5, 4, 50, 12) and np.isfinite(ice).all()
    assert coll.shape == (5, 4, 50, 30, 2) and np.isfinite(coll).all()
    vn, vm, revap = tbl.build_rain_tables()
    # fall speeds increase with mean size and stay below 9.2 m/s cap
    assert (np.diff(vm[:, 0]) >= -1e-12).all()
    assert vm.max() <= 9.21 and vm.min() > 0
    # batched interpolation matches direct values at grid points
    q = jnp.asarray([1e-4]); n = jnp.asarray([1e5])
    di, djj, dii, d1, d4, d5 = tbl.indices_1a(q, n, 0.0 * q, 0.0 * q)
    v = tbl.access_ice_table(jnp.asarray(ice), djj, dii, di, 1, d1, d4, d5)
    assert np.isfinite(float(v[0])) and float(v[0]) > 0


def test_murphy_koop_saturation():
    # triple point: ~611 Pa, ice == liquid
    t = jnp.asarray([273.16])
    pl = float(murphy_koop_svp(t, False)[0])
    pi = float(murphy_koop_svp(t, True)[0])
    assert abs(pl - 611.0) < 3.0
    assert abs(pi - pl) / pl < 1e-3
    # ice svp < liquid svp below freezing
    t = jnp.asarray([250.0])
    assert float(murphy_koop_svp(t, True)[0]) < \
        float(murphy_koop_svp(t, False)[0])
    # qv_sat increases with temperature
    p = jnp.asarray([9e4, 9e4])
    qs = qv_sat(jnp.asarray([280.0, 290.0]), p, False)
    assert float(qs[1]) > float(qs[0])


def test_dsd_limiters():
    rho = jnp.asarray([1.0])
    nc, mu, lam, _, _ = cloud_dsd(jnp.asarray([1e-3]), jnp.asarray([1e8]),
                                  rho)
    assert 2.0 <= float(mu[0]) <= 15.0
    assert (float(mu[0]) + 1) * 2.5e4 <= float(lam[0]) <= \
        (float(mu[0]) + 1) * 1e6
    nr, mu_r, lamr, _, _ = rain_dsd(jnp.asarray([1e-3]), jnp.asarray([1.0]))
    # lambda limiter kicked in (raw lamr ~232 < lammin=1000) -> nr raised
    assert float(lamr[0]) == (1.0 + 1.0) * 500.0
    assert float(nr[0]) > 1.0


def _column(ncol=2, nz=30):
    zmid = np.linspace(14750, 250, nz)
    T = np.maximum(300.0 - 6.5e-3 * zmid, 200.0)
    p = 1e5 * np.exp(-zmid / 8500.0)
    rho = p / (287.042 * T)
    dz = np.full(nz, 500.0)
    exner = (p / 1e5) ** (287.042 / 1004.64)
    b = lambda a: jnp.asarray(
        np.broadcast_to(np.asarray(a, float)[:, None], (nz, ncol)).copy())
    return zmid, T, p, rho, dz, exner, b


def test_p3_main_conserves_water_and_rains():
    ncol, nz = 2, 30
    zmid, T, p, rho, dz, exner, b = _column(ncol, nz)
    qv = 0.017 * np.exp(-zmid / 2500.0)
    qc = np.where((zmid > 1000) & (zmid < 4000), 1.2e-3, 0.0)
    qr = np.where(zmid < 2000, 4e-4, 0.0)
    qi = np.where((zmid > 6000) & (zmid < 10000), 6e-4, 0.0)
    ones = jnp.ones((nz, ncol))
    dt = 60.0
    st, diag = p3_main(
        qc=b(qc), nc=b(np.full(nz, 1e8) / rho), qr=b(qr),
        nr=b(np.full(nz, 1e5) / rho), qv=b(qv),
        th=b(T / exner), qi=b(qi), qm=b(0.1 * qi),
        ni=b(np.full(nz, 1e5) / rho), bm=b(0.1 * qi / 400.0),
        pres=b(p), dz=b(dz), nc_nuceat_tend=0 * ones,
        ni_activated=0 * ones, inv_qc_relvar=ones, dt=dt,
        dpres=b(rho * 9.80616 * dz), inv_exner=b(1.0 / exner),
        qv_prev=b(qv), t_prev=b(T), cld_frac_i=ones, cld_frac_l=ones,
        cld_frac_r=ones, nccn_prescribed=0 * ones)
    for k in ("qc", "qr", "qi", "qv", "qm", "bm", "nc", "nr", "ni"):
        a = np.asarray(st[k])
        assert np.isfinite(a).all(), k
        assert (a >= 0).all(), k
    # rain fell out
    assert float(st["precip_liq_surf"].min()) > 0
    # column water (vapor+liquid+ice mass per area) conserved incl. precip
    w0 = (np.broadcast_to((qv + qc + qr + qi)[:, None], (nz, ncol)) *
          (rho * dz)[:, None]).sum(0)
    w1 = ((np.asarray(st["qv"]) + np.asarray(st["qc"]) +
           np.asarray(st["qr"]) + np.asarray(st["qi"])) *
          (rho * dz)[:, None]).sum(0)
    w1 = w1 + (np.asarray(st["precip_liq_surf"]) +
               np.asarray(st["precip_ice_surf"])) * 1000.0 * dt
    assert np.abs(w1 - w0).max() / w0.max() < 1e-12
    # diagnostics physical
    assert 1e-6 < float(diag["diag_eff_radius_qc"].max()) < 1e-4
    assert 1e-6 < float(diag["diag_eff_radius_qi"].max()) < 1e-3


def test_homogeneous_freezing_below_minus40():
    ncol, nz = 1, 20
    zmid, T, p, rho, dz, exner, b = _column(ncol, nz)
    Tcold = np.full(nz, 225.0)  # everywhere below -40C
    exn = (p / 1e5) ** (287.042 / 1004.64)
    qc = np.full(nz, 5e-4)
    ones = jnp.ones((nz, ncol))
    st, _ = p3_main(
        qc=b(qc), nc=b(np.full(nz, 1e8) / rho), qr=0 * ones, nr=0 * ones,
        qv=b(np.full(nz, 1e-5)), th=b(Tcold / exn), qi=0 * ones,
        qm=0 * ones, ni=0 * ones, bm=0 * ones, pres=b(p), dz=b(dz),
        nc_nuceat_tend=0 * ones, ni_activated=0 * ones, inv_qc_relvar=ones,
        dt=10.0, dpres=b(rho * 9.80616 * dz), inv_exner=b(1.0 / exn),
        qv_prev=b(np.full(nz, 1e-5)), t_prev=b(Tcold), cld_frac_i=ones,
        cld_frac_l=ones, cld_frac_r=ones, nccn_prescribed=0 * ones)
    # all liquid froze to (rimed) ice, releasing latent heat
    assert float(st["qc"].max()) == 0.0
    assert float(st["qi"].max()) > 1e-4
    assert float(st["qm"].max()) > 1e-4
    assert float((st["th"] * exn).max()) > 225.0


def test_rain_sedimentation_transports_and_conserves():
    ncol, nz = 1, 20
    rho = jnp.ones((nz, ncol))
    inv_dz = jnp.full((nz, ncol), 1.0 / 200.0)
    qr = jnp.zeros((nz, ncol)).at[5].set(1e-3)
    nr = jnp.zeros((nz, ncol)).at[5].set(1e4)
    ones = jnp.ones((nz, ncol))
    dt = 300.0
    qr1, nr1, prt = sed.rain_sedimentation(qr, nr, rho, 1.0 / rho, ones,
                                           ones, inv_dz, dt)
    qr0_col = float(qr.sum() * 200.0)
    qr1_col = float(qr1.sum() * 200.0) + float(prt[0]) * 1000.0 * dt
    assert abs(qr1_col - qr0_col) / qr0_col < 1e-12
    # mass moved downward: center of mass deeper than k=5
    com = float((qr1 * jnp.arange(nz)[:, None]).sum() /
                jnp.maximum(qr1.sum(), 1e-30))
    assert com > 5.0 or float(prt[0]) > 0
    assert float(jnp.min(qr1)) >= 0


def make_cpl(nx=4, ny=1, nz=24, nens=2):
    cpl = Coupler(nz=nz, ny=ny, nx=nx, nens=nens, xlen=4000.0, ylen=4000.0,
                  dtype=jnp.float64)
    return p3.register(cpl)


def test_p3_wrapper_roundtrip():
    cpl = make_cpl()
    zint = np.linspace(0.0, 12000.0, cpl.nz + 1)
    state = dict(cpl.allocate_state(zint))
    shape = (cpl.nens, cpl.nz, cpl.ny, cpl.nx)
    zmid = 0.5 * (zint[1:] + zint[:-1])
    T = np.maximum(300.0 - 6.5e-3 * zmid, 210.0)
    p = 1e5 * np.exp(-zmid / 8500.0)
    rho = p / (287.042 * T)
    state["density_dry"] = jnp.asarray(
        np.broadcast_to(rho[None, :, None, None], shape).copy())
    state["temp"] = jnp.asarray(
        np.broadcast_to(T[None, :, None, None], shape).copy())
    qv = 0.9 * 0.017 * np.exp(-zmid / 2500.0)
    wv = np.broadcast_to((qv * rho)[None, :, None, None], shape).copy()
    wv[0, :6] *= 1.6  # supersaturate member 0 low levels
    state["water_vapor"] = jnp.asarray(wv)
    state = p3.init_state(cpl, state)
    micro = p3.P3Micro(cpl)
    dt = 20.0
    step = jax.jit(lambda s: micro.timestep(s, dt))
    s = state
    for _ in range(10):
        s = step(s)
    # positivity of all tracers
    for name in p3.TRACER_NAMES:
        assert float(jnp.min(s[name])) >= 0.0, name
    # member 0 condensed and rained; member 1 (subsaturated) did not
    assert float(s["cloud_water"][0].max()) > 1e-5
    assert float(s["precip_liq_surf_out"][0].max()) > 0
    assert float(s["precip_liq_surf_out"][1].max()) == 0.0
    # water conservation incl. precip (ref audit: Microphysics.h:706-719)
    names = ("water_vapor", "cloud_water", "rain", "ice")
    dzc = np.diff(zint)[None, :, None, None]
    w0 = sum(np.asarray(state[n]) for n in names) * dzc
    w1 = sum(np.asarray(s[n]) for n in names) * dzc
    drift = abs(w1.sum() - w0.sum()) / w0.sum()
    # the reference audit warns at 1e-13 per step but tolerates clamping;
    # dominant sink here is surface precip (tracked separately)
    prec = (np.asarray(s["precip_liq_surf_out"]).sum()) * 1000.0 * dt * 10
    assert w1.sum() < w0.sum()  # lost only to precip + clamps
    assert drift < 5e-4
    # temperature responded to condensation in member 0
    assert float(s["temp"][0].max()) > float(state["temp"][0].max()) - 1.0


def test_combined_sedimentation_matches_separate():
    """The fused single-while_loop sedimentation must reproduce the three
    per-species adaptive loops (zero-length substeps are exact no-ops)."""
    from pam_tpu.physics.p3 import sedimentation as sed
    rng = np.random.default_rng(2)
    ncol, nz = 16, 40
    f = lambda s=1.0: jnp.asarray(s * rng.random((nz, ncol)))
    qc, nc, qr, nr = f(1e-3), f(1e8), f(2e-3), f(1e6)
    qi, ni, qm, bm = f(1e-3), f(1e5), f(5e-4), f(1e-6)
    rho = 1.2 + f(0.2)
    inv_rho = 1.0 / rho
    ones = jnp.ones((nz, ncol))
    acn, rhofacr, rhofaci = f(1e-2), 1.0 + f(0.3), 1.0 + f(0.3)
    inv_dz = 1.0 / (200.0 + f(300.0))
    dt = 20.0
    a = sed.cloud_sedimentation(qc, nc, rho, inv_rho, ones, acn, inv_dz,
                                dt, do_predict_nc=True)
    b = sed.rain_sedimentation(qr, nr, rho, inv_rho, rhofacr, ones,
                               inv_dz, dt)
    c = sed.ice_sedimentation(qi, ni, qm, bm, rho, inv_rho, rhofaci, ones,
                              inv_dz, dt)
    comb = sed.combined_sedimentation(
        qc, nc, qr, nr, qi, ni, qm, bm, rho, inv_rho, ones, ones, ones,
        acn, rhofacr, rhofaci, inv_dz, dt, do_predict_nc=True)
    for x, y in zip(list(a) + list(b) + list(c), comb):
        assert np.allclose(np.asarray(x), np.asarray(y), rtol=1e-10)


def test_combined_sedimentation_divergent_substeps():
    """Fused vs separate loops must agree at ulp level even when the species
    take different substep counts and cloud fractions are < 1 — the regime
    where a finished species sits through other species' extra substeps.
    The in-substep DSD/limiter reassignments are gated on the column still
    being active, so those extra substeps are exact no-ops; the remaining
    tolerance covers only cross-program FMA-contraction differences (the
    separate and fused loops are distinct XLA programs)."""
    from pam_tpu.physics.p3 import sedimentation as sed
    rng = np.random.default_rng(7)
    ncol, nz = 16, 40
    f = lambda s=1.0: jnp.asarray(s * rng.random((nz, ncol)))
    qc, nc, qr, nr = f(1e-3), f(1e8), f(4e-3), f(1e6)
    qi, ni, qm, bm = f(2e-3), f(1e5), f(5e-4), f(1e-6)
    rho = 1.2 + f(0.2)
    inv_rho = 1.0 / rho
    # non-unit, non-uniform cloud fractions (exercise the /cld*cld paths)
    cl = 0.3 + 0.7 * f()
    cr = 0.3 + 0.7 * f()
    ci = 0.3 + 0.7 * f()
    acn, rhofacr, rhofaci = f(1e-2), 1.0 + f(0.3), 1.0 + f(0.3)
    # thin layers + large dt: rain/ice fall fast -> multiple substeps, while
    # Stokes-regime cloud usually finishes in one
    inv_dz = 1.0 / (20.0 + f(30.0))
    dt = 120.0
    a = sed.cloud_sedimentation(qc, nc, rho, inv_rho, cl, acn, inv_dz,
                                dt, do_predict_nc=True)
    b = sed.rain_sedimentation(qr, nr, rho, inv_rho, rhofacr, cr,
                               inv_dz, dt)
    c = sed.ice_sedimentation(qi, ni, qm, bm, rho, inv_rho, rhofaci, ci,
                              inv_dz, dt)
    comb = sed.combined_sedimentation(
        qc, nc, qr, nr, qi, ni, qm, bm, rho, inv_rho, cl, cr, ci,
        acn, rhofacr, rhofaci, inv_dz, dt, do_predict_nc=True)
    for x, y in zip(list(a) + list(b) + list(c), comb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-14, atol=0)
