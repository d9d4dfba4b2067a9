"""Independent-oracle validation of P3 and SHOC against the reference
Fortran (VERDICT r1 item 4, adapted: this image has NO Fortran compiler —
`which gfortran` is empty, only libgfortran runtime is present — so instead
of executing micro_p3.F90/shoc.F90 for golden columns, the oracles below
are FRESH numpy transliterations made directly from the Fortran sources
(file:line cited per test), written independently of pam_tpu's JAX port.
A silent factor error in the port fails these even though both derive from
the same paper formulas.

P3:  get_cloud_dsd2 / get_rain_dsd2 (micro_p3.F90:1774-1893), KK2000
     autoconversion + accretion process rates exercised THROUGH p3_main in
     isolating configurations (micro_p3.F90:2655-2784).
SHOC: adv_sgs_tke -> isotropic_ts -> eddy_diffusivities chain
     (shoc.F90:3132-3373).
"""

import math

import numpy as np
import jax.numpy as jnp

from pam_tpu.physics.p3 import main as p3m
from pam_tpu.physics.sgs.shoc import main as shm
from pam_tpu.physics.sgs.shoc.constants import CONST as SHC


# ---------------------------------------------------------------------------
# P3 DSD oracles (micro_p3.F90:1774-1893)
# ---------------------------------------------------------------------------

def _oracle_cloud_dsd2(qc, nc, rho):
    """Fresh transliteration of get_cloud_dsd2 (iparam=3)."""
    qsmall, nsmall = 1e-14, 1e-16
    pi, rho_h2o = math.pi, 1000.0
    cons1 = pi / 6.0 * rho_h2o
    if qc < qsmall:
        return nc, 0.0, 0.0, 0.0, 0.0
    nc = max(nc, nsmall)
    mu_c = 0.0005714 * (nc * 1e-6 * rho) + 0.2714
    mu_c = 1.0 / (mu_c * mu_c) - 1.0
    mu_c = min(max(mu_c, 2.0), 15.0)
    lamc = (cons1 * nc * (mu_c + 3) * (mu_c + 2) * (mu_c + 1) / qc) ** (1 / 3)
    lammin = (mu_c + 1) * 2.5e4
    lammax = (mu_c + 1) * 1.0e6
    if lamc < lammin:
        lamc = lammin
        nc = 6.0 * lamc ** 3 * qc / (pi * rho_h2o * (mu_c + 3) * (mu_c + 2) *
                                     (mu_c + 1))
    elif lamc > lammax:
        lamc = lammax
        nc = 6.0 * lamc ** 3 * qc / (pi * rho_h2o * (mu_c + 3) * (mu_c + 2) *
                                     (mu_c + 1))
    cdist = nc * (mu_c + 1) / lamc
    cdist1 = nc / math.gamma(mu_c + 1)
    return nc, mu_c, lamc, cdist, cdist1


def _oracle_rain_dsd2(qr, nr, mu_r_constant):
    """Fresh transliteration of get_rain_dsd2 (v4 tables: constant mu_r)."""
    qsmall, nsmall = 1e-14, 1e-16
    cons1 = math.pi / 6.0 * 1000.0
    if qr < qsmall:
        return nr, 0.0, 0.0, 0.0, 0.0
    nr = max(nr, nsmall)
    mu_r = mu_r_constant
    lamr = (cons1 * nr * (mu_r + 3) * (mu_r + 2) * (mu_r + 1) / qr) ** (1 / 3)
    lammax = (mu_r + 1) * 1.0e5
    lammin = (mu_r + 1) * 500.0
    if lamr < lammin or lamr > lammax:
        lamr = min(max(lamr, lammin), lammax)
        nr = math.exp(3 * math.log(lamr) + math.log(qr) +
                      math.log(math.gamma(mu_r + 1)) -
                      math.log(math.gamma(mu_r + 4))) / cons1
    cdistr = nr / math.gamma(mu_r + 1)
    logn0r = math.log10(nr) + (mu_r + 1) * math.log10(lamr) - \
        math.log10(math.gamma(mu_r + 1))
    return nr, mu_r, lamr, cdistr, logn0r


def test_cloud_dsd_matches_fortran_oracle():
    rng = np.random.RandomState(0)
    qcs = 10 ** rng.uniform(-8, -2.3, 40)
    ncs = 10 ** rng.uniform(4, 9, 40)     # #/kg
    rhos = rng.uniform(0.4, 1.3, 40)
    got = p3m.cloud_dsd(jnp.asarray(qcs), jnp.asarray(ncs),
                        jnp.asarray(rhos))
    for i in range(40):
        exp = _oracle_cloud_dsd2(qcs[i], ncs[i], rhos[i])
        for g, e, name in zip(got, exp, ("nc", "mu", "lamc", "cdist",
                                         "cdist1")):
            np.testing.assert_allclose(float(g[i]), e, rtol=1e-10,
                                       err_msg=f"{name} @ {i}")


def test_rain_dsd_matches_fortran_oracle():
    from pam_tpu.physics.p3.main import MU_R_CONSTANT
    rng = np.random.RandomState(1)
    qrs = 10 ** rng.uniform(-9, -2.2, 40)
    nrs = 10 ** rng.uniform(1, 7, 40)
    got = p3m.rain_dsd(jnp.asarray(qrs), jnp.asarray(nrs))
    for i in range(40):
        exp = _oracle_rain_dsd2(qrs[i], nrs[i], MU_R_CONSTANT)
        for g, e, name in zip(got, exp, ("nr", "mu_r", "lamr", "cdistr",
                                         "logn0r")):
            np.testing.assert_allclose(float(g[i]), e, rtol=1e-10,
                                       err_msg=f"{name} @ {i}")


# ---------------------------------------------------------------------------
# Warm-rain process rates through p3_main (micro_p3.F90:2655-2784)
# ---------------------------------------------------------------------------

def _warm_column(qc0, qr0, nc0, dt):
    """Uniform warm saturated column: no ice, no cond/evap (qv == qvs),
    so the only qc/qr sources are autoconversion + accretion."""
    nz = 6
    T0, p0 = 288.0, 9.0e4
    T = np.full(nz, T0)
    p = np.full(nz, p0)
    rho = p / (287.042 * T0)
    dz = np.full(nz, 500.0)
    exner = (p / 1.0e5) ** (287.042 / 1004.64)
    qvs = np.asarray(p3m.qv_sat(jnp.asarray(T), jnp.asarray(p), False))
    ones = jnp.ones((nz, 1))
    b = lambda a: jnp.asarray(np.broadcast_to(np.asarray(a, float).reshape(-1, 1),
                                              (nz, 1)), jnp.float64)
    st, diag = p3m.p3_main(
        qc=b(qc0), nc=b(nc0), qr=b(qr0), nr=b(1e5 / rho), qv=b(qvs),
        th=b(T / exner), qi=0 * ones, qm=0 * ones, ni=0 * ones,
        bm=0 * ones, pres=b(p), dz=b(dz), nc_nuceat_tend=0 * ones,
        ni_activated=0 * ones, inv_qc_relvar=ones, dt=dt,
        dpres=b(rho * 9.80616 * dz), inv_exner=b(1.0 / exner),
        qv_prev=b(qvs), t_prev=b(T), cld_frac_i=ones, cld_frac_l=ones,
        cld_frac_r=ones, nccn_prescribed=0 * ones)
    return st, rho[0]


def test_autoconversion_rate_through_p3_main():
    """qr=0, qv=qvs: the qc sink over one small step is the KK2000
    autoconversion rate 1350 qc^2.47 (nc 1e-6 rho)^-1.79
    (cloud_water_autoconversion, micro_p3.F90:2772)."""
    dt = 0.5
    qc0, nc0 = 1.0e-3, 6.0e7
    st, rho = _warm_column(qc0, 0.0, nc0, dt)
    # oracle (nc after DSD limiting = nc0 here; verified unclamped)
    nc_dsd = _oracle_cloud_dsd2(qc0, nc0, rho)[0]
    assert abs(nc_dsd - nc0) < 1e-6 * nc0
    rate = 1350.0 * qc0 ** 2.47 * (nc0 * 1e-6 * rho) ** (-1.79)
    dqc = qc0 - float(np.asarray(st["qc"])[2, 0])   # interior level
    np.testing.assert_allclose(dqc / dt, rate, rtol=0.02)


def test_accretion_rate_through_p3_main():
    """qr>0: additional qc sink = KK2000 accretion 67 (qc qr)^1.15
    (cloud_rain_accretion, micro_p3.F90:2695)."""
    dt = 0.5
    qc0, qr0, nc0 = 1.0e-3, 5.0e-4, 6.0e7
    st, rho = _warm_column(qc0, qr0, nc0, dt)
    auto = 1350.0 * qc0 ** 2.47 * (nc0 * 1e-6 * rho) ** (-1.79)
    accr = 67.0 * (qc0 * qr0) ** 1.15
    dqc = qc0 - float(np.asarray(st["qc"])[2, 0])
    np.testing.assert_allclose(dqc / dt, auto + accr, rtol=0.02)


# ---------------------------------------------------------------------------
# SHOC TKE chain oracle (shoc.F90:3132-3373)
# ---------------------------------------------------------------------------

def _oracle_shoc_tke_chain(dtime, wthv, mix, tke0, brunt, brunt_int,
                           zt_bot, obklen, zt, pblh):
    """adv_sgs_tke + isotropic_ts + eddy_diffusivities with zero shear,
    transliterated from shoc.F90:3132-3373 (parameters :62-112,3324-3327)."""
    ggr, basetemp = 9.80616, 300.0
    mintke, maxtke = 0.0004, 50.0
    Cs, Ck = 0.15, 0.1
    Ce = Ck ** 3 / Cs ** 4
    Ce1, Ce2 = Ce / 0.7 * 0.19, Ce / 0.7 * 0.51
    Cee = Ce1 + Ce2
    lambda_low, lambda_high = 0.001, 0.04
    lambda_slope, lambda_thresh = 2.65, 0.02
    Ckh = Ckm = 0.1

    a_prod_bu = (ggr / basetemp) * wthv
    tke = max(0.0, tke0)
    a_diss = Cee / mix * tke ** 1.5
    tke = max(mintke, tke + dtime * (max(0.0, a_prod_bu) - a_diss))
    tke = min(tke, maxtke)

    tscale = 2.0 * tke / a_diss
    lam = lambda_low + (brunt_int / ggr - lambda_thresh) * lambda_slope
    lam = max(lambda_low, min(lambda_high, lam))
    if brunt <= 0.0:
        lam = 0.0
    isotropy = min(20000.0, tscale / (1.0 + lam * brunt * tscale ** 2))

    z_over_L = zt_bot / obklen
    if z_over_L > 0.0 and zt < pblh + 200.0:
        tkh = tk = 0.1 * mix ** 2 * 0.0   # sqrt(sterm)=0 with zero shear
    else:
        tkh = Ckh * isotropy * tke
        tk = Ckm * isotropy * tke
    return tke, tk, tkh, isotropy


def test_shoc_tke_chain_matches_fortran_oracle():
    nz = 5
    rng = np.random.RandomState(3)
    wthv = rng.uniform(-0.05, 0.1, nz)
    mix = rng.uniform(30.0, 900.0, nz)
    tke0 = rng.uniform(0.001, 2.0, nz)
    brunt = rng.uniform(-1e-4, 3e-4, nz)
    pres = np.linspace(5e4, 1e5, nz)      # k=0 top
    dz_zt = np.full(nz, 300.0)
    zt = np.linspace(1350.0, 150.0, nz)
    zi = np.linspace(1500.0, 0.0, nz + 1)
    dz_zi = np.full(nz + 1, 300.0)
    u = v = np.zeros(nz)
    obklen, pblh = -50.0, 800.0           # unstable: no stable-PBL branch

    b = lambda a: jnp.asarray(a, jnp.float64)[:, None]
    tke, tk, tkh, iso = shm.shoc_tke(
        1.0, b(wthv), b(mix), b(dz_zi), b(dz_zt), b(pres), b(u), b(v),
        b(brunt), jnp.asarray([obklen]), b(zt), b(zi),
        jnp.asarray([pblh]), b(tke0), b(tke0), b(tke0))
    brunt_int = float(np.sum(np.where(pres > SHC.troppres, dz_zt * brunt,
                                      0.0)))
    for k in range(nz):
        e_tke, e_tk, e_tkh, e_iso = _oracle_shoc_tke_chain(
            1.0, wthv[k], mix[k], tke0[k], brunt[k], brunt_int,
            zt[-1], obklen, zt[k], pblh)
        np.testing.assert_allclose(float(tke[k, 0]), e_tke, rtol=1e-10)
        np.testing.assert_allclose(float(iso[k, 0]), e_iso, rtol=1e-10)
        np.testing.assert_allclose(float(tk[k, 0]), e_tk, rtol=1e-10)
        np.testing.assert_allclose(float(tkh[k, 0]), e_tkh, rtol=1e-10)


# ---------------------------------------------------------------------------
# Table interpolation: algebraic-identity tolerance (VERDICT r3 item 8).
# The hat-weight contraction (pam_tpu/physics/p3/tables.py) claims EXACT
# algebraic equivalence to the reference's nested scalar lerps
# (access_lookup_table, micro_p3.F90:1508-1615) — so it is held to 1e-12,
# not the 2e-6 mask-reassociation budget of the process chains.
# ---------------------------------------------------------------------------

def test_table_contractions_match_scalar_lerps_tightly():
    import p3_oracle as orc
    from pam_tpu.physics.p3 import tables as tbl

    ice_tab, coll_tab = (np.asarray(a) for a in tbl.load_ice_tables())
    vn_t, vm_t, revap_t = (np.asarray(a) for a in tbl.build_rain_tables())
    rng = np.random.default_rng(17)
    n = 64
    qi = 10.0 ** rng.uniform(-9, -3, n)
    ni = 10.0 ** rng.uniform(2, 7, n)
    qm = qi * rng.uniform(0.0, 1.0, n)
    rhop = rng.uniform(50.0, 900.0, n)
    qr = 10.0 ** rng.uniform(-9, -3, n)
    nr = 10.0 ** rng.uniform(2, 7, n)
    mu_r = np.full(n, float(p3m.MU_R_CONSTANT))
    lamr = 10.0 ** rng.uniform(2.3, 5.0, n)

    di, djj, dii, d1, d4, d5 = (np.asarray(a) for a in tbl.indices_1a(
        jnp.asarray(qi), jnp.asarray(ni), jnp.asarray(qm),
        jnp.asarray(rhop)))
    dj, d3 = (np.asarray(a) for a in tbl.indices_1b(jnp.asarray(qr),
                                                    jnp.asarray(nr)))
    ii3, jj3, rii3, rjj3 = (np.asarray(a) for a in tbl.indices_3(
        jnp.asarray(mu_r), jnp.asarray(lamr)))

    # ice table: all 12 entries, single + batched contraction forms
    for idx0 in range(12):
        got = np.asarray(tbl.access_ice_table(
            jnp.asarray(ice_tab), djj, dii, di, idx0, jnp.asarray(d1),
            jnp.asarray(d4), jnp.asarray(d5)))
        want = np.array([orc.access_ice(ice_tab, djj[p] + 1, dii[p] + 1,
                                        di[p] + 1, idx0 + 1, d1[p] + 1,
                                        d4[p] + 1, d5[p] + 1)
                         for p in range(n)])
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   err_msg=f"ice entry {idx0}")
    multi = tbl.access_ice_table_multi(jnp.asarray(ice_tab), (1, 6, 9),
                                       jnp.asarray(d1), jnp.asarray(d4),
                                       jnp.asarray(d5))
    for m, idx0 in zip(multi, (1, 6, 9)):
        want = np.array([orc.access_ice(ice_tab, djj[p] + 1, dii[p] + 1,
                                        di[p] + 1, idx0 + 1, d1[p] + 1,
                                        d4[p] + 1, d5[p] + 1)
                         for p in range(n)])
        np.testing.assert_allclose(np.asarray(m), want, rtol=1e-12,
                                   err_msg=f"ice multi entry {idx0}")

    # collection table, both entries
    for idx0 in range(2):
        got = np.asarray(tbl.access_collect_table(
            jnp.asarray(coll_tab), djj, dii, dj, di, idx0,
            jnp.asarray(d1), jnp.asarray(d3), jnp.asarray(d4),
            jnp.asarray(d5)))
        want = np.array([orc.access_coll(coll_tab, djj[p] + 1, dii[p] + 1,
                                         dj[p] + 1, di[p] + 1, idx0 + 1,
                                         d1[p] + 1, d3[p] + 1, d4[p] + 1,
                                         d5[p] + 1) for p in range(n)])
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   err_msg=f"coll entry {idx0}")

    # rain tables
    for tab, nm in ((vn_t, "vn"), (vm_t, "vm"), (revap_t, "revap")):
        got = np.asarray(tbl.access_rain_table(
            jnp.asarray(tab), ii3, jj3, jnp.asarray(rii3),
            jnp.asarray(rjj3)))
        want = np.array([orc.access_rain(tab, ii3[p] + 1, jj3[p] + 1,
                                         rii3[p] + 1, rjj3[p] + 1)
                         for p in range(n)])
        np.testing.assert_allclose(got, want, rtol=1e-12,
                                   err_msg=f"rain table {nm}")
