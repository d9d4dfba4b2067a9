"""Scalar/loop numpy oracle of the full SHOC step (shoc.F90 shoc_main).

A FRESH transliteration of the reference Fortran
(physics/sgs/shoc/fortran/shoc.F90), written independently of pam_tpu's
JAX port as an executable golden reference (VERDICT r2 item 2): it keeps
the Fortran's sequential structures — the factorized-LU tridiagonal
diffusion solve, pblintd's short-circuiting downward Richardson search,
the energy fixer's shoctop while-loop with its EXACT tke==mintke test —
precisely where the JAX port uses batched solves and masked scans.

Columns are (nlev,) arrays with k=0 = model top, k=nlev-1 = surface
(the Fortran's own orientation: thetal(:,nlev) is the surface level).
All operations are per-column; level-local arithmetic is vectorized
numpy (bitwise-equivalent to the Fortran's k loops), order-dependent
pieces are explicit python loops.

Host constants: the PAM wrapper's shoc_init call (SGS.h:181-185).
"""

import math

import numpy as np

# host constants (SGS.h:75-77, 181-185)
GGR = 9.80616
RGAS = 287.042
RV = 461.505
CP = 1004.64
LCOND = 2501000.0
LICE = 333700.0
VK = 0.4
EPS = RV / RGAS - 1.0          # zvir

# module parameters (shoc.F90:40-100)
PI = 3.14159265
LARGENEG = -99999999.99
THL2TUNE = QW2TUNE = QWTHL2TUNE = W2TUNE = 1.0
LENGTH_FAC = 0.5
C_DIAG_3RD_MOM = 7.0
LAMBDA_LOW, LAMBDA_HIGH = 0.001, 0.04
LAMBDA_SLOPE, LAMBDA_THRESH = 2.65, 0.02
CKH = CKM = 0.1
CKH_S_MIN = CKM_S_MIN = CKH_S_MAX = CKM_S_MAX = 0.1
DOTHETAL_SKEW = False
BASETEMP = 300.0
BASEPRES = 100000.0
TROPPRES = 80000.0
USTAR_MIN = 0.01
W3CLIP = 1.2
MAXLEN, MINLEN = 20000.0, 20.0
MAXTKE, MINTKE = 50.0, 0.0004
TINYW = 1.0e-36
FAC = 100.0
RICR = 0.3
# diag_second_moments_srf/lbycond (shoc.F90:1237, 1328-1329)
Z_CONST = 1.0
A_CONST = 1.8
UFMIN = 0.01


def murphy_koop_liq(t):
    """MurphyKoop_svp liquid branch (wv_sat_scream.F90)."""
    logt = math.log(t)
    tmp = (54.842763 - 6763.22 / t - 4.210 * logt + 0.000367 * t +
           math.tanh(0.0415 * (t - 218.8)) *
           (53.878 - 1331.22 / t - 9.44523 * logt + 0.014025 * t))
    return math.exp(tmp)


def linear_interp(x1, x2, y1, minthresh):
    """(shoc.F90:4576-4659, the '#if 1' structured branch). x1,y1 (km1,),
    x2 (km2,), |km1-km2| == 1."""
    km1, km2 = len(x1), len(x2)
    y2 = np.zeros(km2)
    if km1 == km2 + 1:                     # zi -> zt (mid levels)
        for k2 in range(km2):
            k1 = k2 + 1                    # 1-based k1 = k2+1 -> 0-based
            y2[k2] = y1[k1 - 1] + (y1[k1] - y1[k1 - 1]) * \
                (x2[k2] - x1[k1 - 1]) / (x1[k1] - x1[k1 - 1])
    elif km2 == km1 + 1:                   # zt -> zi (interfaces)
        y2[0] = y1[0] + (y1[1] - y1[0]) * (x2[0] - x1[0]) / (x1[1] - x1[0])
        for k2 in range(1, km2 - 1):
            k1 = k2                        # 1-based k1=k2 -> 0-based same
            y2[k2] = y1[k1 - 1] + (y1[k1] - y1[k1 - 1]) * \
                (x2[k2] - x1[k1 - 1]) / (x1[k1] - x1[k1 - 1])
        y2[km2 - 1] = y1[km1 - 2] + (y1[km1 - 1] - y1[km1 - 2]) * \
            (x2[km2 - 1] - x1[km1 - 2]) / (x1[km1 - 1] - x1[km1 - 2])
    else:
        raise ValueError((km1, km2))
    return np.maximum(y2, minthresh)


# ---------------------------------------------------------------------------
# grid / vapor / surface
# ---------------------------------------------------------------------------
def shoc_grid(zt, zi, pdel):
    """(:567-640). Returns (dz_zt, dz_zi, rho_zt)."""
    nlev = len(zt)
    dz_zt = zi[:nlev] - zi[1:]
    dz_zi = np.zeros(nlev + 1)
    dz_zi[0] = 0.0
    dz_zi[1:nlev] = zt[:-1] - zt[1:]
    dz_zi[nlev] = zt[nlev - 1]
    rho_zt = (1.0 / GGR) * (pdel / dz_zt)
    return dz_zt, dz_zi, rho_zt


def shoc_diag_obklen(uw, vw, wthl, wqw, thl_sfc, ql_sfc, qv_sfc):
    """(:3889-3918)."""
    th_sfc = thl_sfc + (LCOND / CP) * ql_sfc
    thv_sfc = th_sfc * (1.0 + EPS * qv_sfc - ql_sfc)
    ustar = max(math.sqrt(uw * uw + vw * vw), USTAR_MIN)
    kbfs = wthl + EPS * th_sfc * wqw
    obklen = -thv_sfc * ustar ** 3 / \
        (GGR * VK * (kbfs + math.copysign(1e-10, kbfs)))
    return ustar, kbfs, obklen


def pblintd(z, zi, thl, ql, q, u, v, ustar, obklen, kbfs, cldn, npbl):
    """(:3920-4574). Returns pblh (scalar). Sequential downward search."""
    nlev = len(z)
    # init_pot
    th = thl + (LCOND / CP) * ql
    thv = th * (1.0 + EPS * q - ql)
    # init
    check = True
    rino = np.zeros(nlev)
    pblh = z[nlev - 1]

    def height_search(thv_ref, pblh, check):
        # do k = nlev-1, nlev-npbl+1, -1 (1-based) -> 0-based nlev-2 down
        for k in range(nlev - 2, nlev - npbl - 1, -1):
            if check:
                vvk = (u[k] - u[nlev - 1]) ** 2 + \
                    (v[k] - v[nlev - 1]) ** 2 + FAC * ustar ** 2
                vvk = max(vvk, TINYW)
                rino[k] = GGR * (thv[k] - thv_ref) * \
                    (z[k] - z[nlev - 1]) / (thv[nlev - 1] * vvk)
                if rino[k] >= RICR:
                    pblh = z[k + 1] + (RICR - rino[k + 1]) / \
                        (rino[k] - rino[k + 1]) * (z[k] - z[k + 1])
                    check = False
        return pblh, check

    pblh, check = height_search(thv[nlev - 1], pblh, check)
    # surf_temp (:4362-4398)
    binm = 15.0 * 0.1
    if check:
        pblh = z[nlev - npbl]          # z(i,nlevi-npbl) 1-based
    check = kbfs > 0.0
    tlv = thv[nlev - 1]
    if check:
        phiminv = (1.0 - binm * pblh / obklen) ** (1.0 / 3.0)
        rino[nlev - 1] = 0.0
        tlv = thv[nlev - 1] + kbfs * 8.5 / (ustar * phiminv)
    if check:
        pblh, check = height_search(tlv, pblh, check)
    # check_pblh (:4400-4420)
    if check:
        pblh = z[nlev - npbl]
    pblh = max(pblh, 700.0 * ustar)
    # cldcheck (:4422-4446): 1-based zi(i,nlev) = the interface ABOVE the
    # lowest layer (0-based zi[nlev-1]), not the surface interface
    if cldn[nlev - 1] >= 0.0:
        pblh = max(pblh, zi[nlev - 1] + 50.0)
    return pblh


# ---------------------------------------------------------------------------
# length scale
# ---------------------------------------------------------------------------
def shoc_length(host_dx, host_dy, zt, zi, dz_zt, tke, thv):
    """(:4448-3497 family). Returns (brunt, shoc_mix)."""
    nlev = len(zt)
    thv_zi = linear_interp(zt, zi, thv, 0.0)
    brunt = (GGR / thv) * (thv_zi[:nlev] - thv_zi[1:]) / dz_zt
    tkes = np.sqrt(tke)
    numer = float(np.sum(tkes * zt * dz_zt))
    denom = float(np.sum(tkes * dz_zt))
    l_inf = 0.1 * (numer / denom)
    brunt2 = np.where(brunt >= 0.0, brunt, 0.0)
    tscale = 400.0
    shoc_mix = np.minimum(
        MAXLEN, 2.8284 * np.sqrt(1.0 / (
            1.0 / (tscale * tkes * VK * zt) +
            1.0 / (tscale * tkes * l_inf) +
            0.01 * (brunt2 / tke)))) / LENGTH_FAC
    shoc_mix = np.minimum(MAXLEN, shoc_mix)
    shoc_mix = np.maximum(MINLEN, shoc_mix)
    shoc_mix = np.minimum(math.sqrt(host_dx * host_dy), shoc_mix)
    return brunt, shoc_mix


# ---------------------------------------------------------------------------
# tke
# ---------------------------------------------------------------------------
def shoc_tke(dtime, wthv_sec, shoc_mix, dz_zi, dz_zt, pres, u, v, brunt,
             obklen, zt, zi, pblh, tke, tk, tkh):
    """(:2853-3373 family). Returns (tke, tk, tkh, isotropy)."""
    nlev = len(tke)
    # integ_column_stability
    brunt_int = float(np.sum(np.where(pres > TROPPRES, dz_zt * brunt,
                                      0.0)))
    # compute_shr_prod on interfaces
    sterm = np.zeros(nlev + 1)
    for k in range(1, nlev):
        gdz = 1.0 / dz_zi[k]
        ug = gdz * (u[k - 1] - u[k])
        vg = gdz * (v[k - 1] - v[k])
        sterm[k] = 0.1 * (ug * ug + vg * vg)
    sterm[0] = 0.0
    sterm[nlev] = 0.0
    sterm_zt = linear_interp(zi, zt, sterm, 0.0)
    # adv_sgs_tke
    Cs, Ck = 0.15, 0.1
    Ce = Ck ** 3 / Cs ** 4
    Cee = Ce / 0.7 * 0.19 + Ce / 0.7 * 0.51
    a_prod_bu = (GGR / BASETEMP) * wthv_sec
    tke = np.maximum(0.0, tke)
    a_prod_sh = tk * sterm_zt
    a_diss = Cee / shoc_mix * tke ** 1.5
    tke = np.maximum(MINTKE, tke + dtime *
                     (np.maximum(0.0, a_prod_sh + a_prod_bu) - a_diss))
    tke = np.minimum(tke, MAXTKE)
    # isotropic_ts
    tscale = (2.0 * tke) / a_diss
    lam = LAMBDA_LOW + (brunt_int / GGR - LAMBDA_THRESH) * LAMBDA_SLOPE
    lam = max(LAMBDA_LOW, min(LAMBDA_HIGH, lam))
    lam_arr = np.where(brunt <= 0.0, 0.0, lam)
    isotropy = np.minimum(20000.0, tscale /
                          (1.0 + lam_arr * brunt * tscale ** 2))
    # eddy_diffusivities
    z_over_L = zt[nlev - 1] / obklen
    tkh_out = np.empty(nlev)
    tk_out = np.empty(nlev)
    for k in range(nlev):
        if z_over_L > 0.0 and zt[k] < pblh + 200.0:
            Ckh_s = max(CKH_S_MIN, min(CKH_S_MAX, z_over_L / 100.0))
            Ckm_s = max(CKM_S_MIN, min(CKM_S_MAX, z_over_L / 100.0))
            tkh_out[k] = Ckh_s * shoc_mix[k] ** 2 * math.sqrt(sterm_zt[k])
            tk_out[k] = Ckm_s * shoc_mix[k] ** 2 * math.sqrt(sterm_zt[k])
        else:
            tkh_out[k] = CKH * isotropy[k] * tke[k]
            tk_out[k] = CKM * isotropy[k] * tke[k]
    return tke, tk_out, tkh_out, isotropy


# ---------------------------------------------------------------------------
# implicit diffusion update (:697-1000)
# ---------------------------------------------------------------------------
def vd_shoc_decomp(kv_term, tmpi, rdp_zt, dtime, flux):
    """(:3504-3579): factorized-LU coefficients. Returns (du, dl, d)."""
    nlev = len(rdp_zt)
    du = np.zeros(nlev)
    dl = np.zeros(nlev)
    d = np.zeros(nlev)
    for k in range(nlev - 1):
        du[k] = -kv_term[k + 1] * tmpi[k + 1] * rdp_zt[k]
        dl[k + 1] = -kv_term[k + 1] * tmpi[k + 1] * rdp_zt[k + 1]
    du[nlev - 1] = 0.0
    dl[0] = 0.0
    d[0] = 1.0 - du[0]
    for k in range(1, nlev - 1):
        d[k] = 1.0 - du[k] - dl[k]
        dl[k] = dl[k] / d[k - 1]
        d[k] = d[k] - dl[k] * du[k - 1]
    d[nlev - 1] = 1.0 - dl[nlev - 1] + flux * dtime * GGR * rdp_zt[nlev - 1]
    dl[nlev - 1] = dl[nlev - 1] / d[nlev - 2]
    d[nlev - 1] = d[nlev - 1] - dl[nlev - 1] * du[nlev - 2]
    return du, dl, d


def vd_shoc_solve(du, dl, d, var):
    """(:3581-3610)."""
    nlev = len(var)
    var = var.copy()
    for k in range(1, nlev):
        var[k] = var[k] - dl[k] * var[k - 1]
    var[nlev - 1] = var[nlev - 1] / d[nlev - 1]
    for k in range(nlev - 1, 0, -1):
        var[k - 1] = (var[k - 1] - du[k - 1] * var[k]) / d[k - 1]
    return var


def update_prognostics_implicit(dtime, dz_zt, dz_zi, rho_zt, zt, zi, tk,
                                tkh, uw_sfc, vw_sfc, wthl_sfc, wqw_sfc,
                                wtracer_sfc, thetal, qw, tracers, tke, u,
                                v):
    """(:697-849)."""
    nlev = len(thetal)
    tkh_zi = linear_interp(zt, zi, tkh, 0.0)
    tk_zi = linear_interp(zt, zi, tk, 0.0)
    rho_zi = linear_interp(zt, zi, rho_zt, 0.0)
    tmpi = np.zeros(nlev + 1)
    tmpi[1:] = dtime * (GGR * rho_zi[1:]) / dz_zi[1:]
    rdp_zt = 1.0 / (GGR * rho_zt * dz_zt)
    # impli_srf_stress_term
    rho = rho_zi[nlev]
    taux, tauy = rho * uw_sfc, rho * vw_sfc
    ws = max(math.sqrt(u[nlev - 1] ** 2 + v[nlev - 1] ** 2), 1.0)
    tau = math.sqrt(taux ** 2 + tauy ** 2)
    ksrf = max(tau / ws, 1.0e-4)
    # tke_srf_flux_term
    ustar = max(math.sqrt(math.sqrt(uw_sfc ** 2 + vw_sfc ** 2)), 0.01)
    wtke_sfc = ustar ** 3
    # sfc_fluxes
    cmnfac = dtime * (GGR * rho_zi[nlev] * rdp_zt[nlev - 1])
    thetal = thetal.copy()
    qw = qw.copy()
    tke = tke.copy()
    tracers = tracers.copy()
    thetal[nlev - 1] += cmnfac * wthl_sfc
    qw[nlev - 1] += cmnfac * wqw_sfc
    tke[nlev - 1] += cmnfac * wtke_sfc
    for p in range(tracers.shape[1]):
        tracers[nlev - 1, p] += cmnfac * wtracer_sfc[p]
    # momentum solve (with ksrf surface-stress term)
    du, dl, d = vd_shoc_decomp(tk_zi, tmpi, rdp_zt, dtime, ksrf)
    u = vd_shoc_solve(du, dl, d, u)
    v = vd_shoc_solve(du, dl, d, v)
    # thermo solve (zero flux)
    du, dl, d = vd_shoc_decomp(tkh_zi, tmpi, rdp_zt, dtime, 0.0)
    thetal = vd_shoc_solve(du, dl, d, thetal)
    qw = vd_shoc_solve(du, dl, d, qw)
    tke = vd_shoc_solve(du, dl, d, tke)
    for p in range(tracers.shape[1]):
        tracers[:, p] = vd_shoc_solve(du, dl, d, tracers[:, p])
    return thetal, qw, tracers, tke, u, v


# ---------------------------------------------------------------------------
# second moments (:1061-1710)
# ---------------------------------------------------------------------------
def diag_second_shoc_moments(thetal, qw, u, v, tke, isotropy, tkh, tk,
                             dz_zi, zt, zi, shoc_mix, wthl_sfc, wqw_sfc,
                             uw_sfc, vw_sfc):
    nlev = len(thetal)
    # srf
    ustar2 = math.sqrt(uw_sfc * uw_sfc + vw_sfc * vw_sfc)
    wstar = ((1.0 / BASETEMP) * GGR * wthl_sfc * Z_CONST) ** (1.0 / 3.0) \
        if wthl_sfc > 0.0 else 0.0
    out = {n: np.zeros(nlev + 1) for n in
           ("thl_sec", "qw_sec", "qwthl_sec", "wthl_sec", "wqw_sec",
            "uw_sec", "vw_sec", "wtke_sec")}
    # lower boundary (surface interface = index nlev)
    uf = max(UFMIN, math.sqrt(ustar2 + 0.3 * wstar * wstar))
    out["thl_sec"][nlev] = 0.4 * A_CONST * (wthl_sfc / uf) ** 2
    out["qw_sec"][nlev] = 0.4 * A_CONST * (wqw_sfc / uf) ** 2
    out["qwthl_sec"][nlev] = 0.2 * A_CONST * (wthl_sfc / uf) * \
        (wqw_sfc / uf)
    out["wthl_sec"][nlev] = wthl_sfc
    out["wqw_sec"][nlev] = wqw_sfc
    out["uw_sec"][nlev] = uw_sfc
    out["vw_sec"][nlev] = vw_sfc
    out["wtke_sec"][nlev] = max(math.sqrt(ustar2), 0.01) ** 3
    # interior (diag_second_moments): interfaces k=2..nlev (1-based)
    iso_zi = linear_interp(zt, zi, isotropy, 0.0)
    tkh_zi = linear_interp(zt, zi, tkh, 0.0)
    tk_zi = linear_interp(zt, zi, tk, 0.0)
    w_sec = W2TUNE * (2.0 / 3.0) * tke

    def varorcovar(tunefac, a, b, dest):
        for k in range(1, nlev):       # 1-based 2..nlev -> interior ifaces
            gd2 = (1.0 / dz_zi[k]) ** 2
            sm = iso_zi[k] * tkh_zi[k]
            dest[k] = tunefac * sm * gd2 * (a[k - 1] - a[k]) * \
                (b[k - 1] - b[k])

    def vertflux(kv_zi, a, dest):
        for k in range(1, nlev):
            dest[k] = -kv_zi[k] * (1.0 / dz_zi[k]) * (a[k - 1] - a[k])

    varorcovar(THL2TUNE, thetal, thetal, out["thl_sec"])
    varorcovar(QW2TUNE, qw, qw, out["qw_sec"])
    varorcovar(QWTHL2TUNE, thetal, qw, out["qwthl_sec"])
    vertflux(tkh_zi, thetal, out["wthl_sec"])
    vertflux(tkh_zi, qw, out["wqw_sec"])
    vertflux(tkh_zi, tke, out["wtke_sec"])
    vertflux(tk_zi, u, out["uw_sec"])
    vertflux(tk_zi, v, out["vw_sec"])
    # upper boundary: zeros
    for n in out:
        out[n][0] = 0.0
    out["w_sec"] = w_sec
    return out


# ---------------------------------------------------------------------------
# third moment (:1715-2145)
# ---------------------------------------------------------------------------
def diag_third_shoc_moments(w_sec, thl_sec, wthl_sec, isotropy, brunt,
                            thetal, tke, dz_zt, dz_zi, zt, zi):
    nlev = len(thetal)
    iso_zi = linear_interp(zt, zi, isotropy, 0.0)
    brunt_zi = linear_interp(zt, zi, brunt, LARGENEG)
    w_sec_zi = linear_interp(zt, zi, w_sec, (2.0 / 3.0) * MINTKE)
    thetal_zi = linear_interp(zt, zi, thetal, 0.0)
    w3 = np.zeros(nlev + 1)
    c = C_DIAG_3RD_MOM
    a4 = 2.4 / (3.0 * c + 5.0)
    a5 = 0.6 / (c * (3.0 + 5.0 * c))
    a0 = (0.52 * (1.0 / c ** 2)) / (c - 2.0)
    a1 = 0.87 / c ** 2
    a2 = 0.5 / c
    a3 = 0.6 / (c * (c - 2.0))
    for k in range(1, nlev):               # 1-based 2..nlev
        kb, kc = k + 1, k - 1
        thedz = 1.0 / dz_zi[k]
        thedz2 = 1.0 / (dz_zt[k] + dz_zt[kc])
        iso = iso_zi[k]
        isosqrd = iso * iso
        buoy_sgs2 = isosqrd * brunt_zi[k]
        bet2 = GGR / thetal_zi[k]
        thl_d = thl_sec[kc] - thl_sec[kb]
        wthl_d = wthl_sec[kc] - wthl_sec[kb]
        wsec_d = w_sec[kc] - w_sec[k]
        tke_d = tke[kc] - tke[k]
        f0 = thedz2 * bet2 ** 3 * iso ** 4 * wthl_sec[k] * thl_d
        f1 = thedz2 * bet2 ** 2 * iso ** 3 * \
            (wthl_sec[k] * wthl_d + 0.5 * w_sec_zi[k] * thl_d)
        f2 = thedz * bet2 * isosqrd * wthl_sec[k] * wsec_d + \
            2.0 * thedz2 * bet2 * isosqrd * w_sec_zi[k] * wthl_d
        f3 = thedz2 * bet2 * isosqrd * w_sec_zi[k] * wthl_d + \
            thedz * bet2 * isosqrd * (wthl_sec[k] * tke_d)
        f4 = thedz * iso * w_sec_zi[k] * (wsec_d + tke_d)
        f5 = thedz * iso * w_sec_zi[k] * wsec_d
        omega0 = a4 / (1.0 - a5 * buoy_sgs2)
        omega1 = omega0 / (2.0 * c)
        omega2 = omega1 * f3 + (5.0 / 4.0) * omega0 * f4
        x0 = (a2 * buoy_sgs2 * (1.0 - a3 * buoy_sgs2)) / \
            (1.0 - (a1 + a3) * buoy_sgs2)
        y0 = (2.0 * a2 * buoy_sgs2 * x0) / (1.0 - a3 * buoy_sgs2)
        x1 = (a0 * f0 + a1 * f1 + a2 * (1.0 - a3 * buoy_sgs2) * f2) / \
            (1.0 - (a1 + a3) * buoy_sgs2)
        y1 = (2.0 * a2 * (buoy_sgs2 * x1 + (a0 / a1) * f0 + f1)) / \
            (1.0 - a3 * buoy_sgs2)
        aa0 = omega0 * x0 + omega1 * y0
        aa1 = omega0 * x1 + omega1 * y1 + omega2
        w3[k] = (aa1 - 1.2 * x1 - 1.5 * f5) / (c - 1.2 * x0 + aa0)
    w3[0] = 0.0
    w3[nlev] = 0.0
    # clipping (:2099-2145) — note the Fortran sets the CLIPPED value to
    # +0.02 regardless of sign
    for k in range(nlev + 1):
        tsign = -1.0 if w3[k] < 0 else 1.0
        cond = W3CLIP * math.sqrt(2.0 * w_sec_zi[k] ** 3)
        if tsign * w3[k] > cond:
            w3[k] = 0.02
    return w3


# ---------------------------------------------------------------------------
# assumed PDF (:2150-2790)
# ---------------------------------------------------------------------------
def shoc_assumed_pdf(thetal, qw, w_field, thl_sec, qw_sec, wthl_sec,
                     w_sec, wqw_sec, qwthl_sec, w3, pres, zt, zi):
    nlev = len(thetal)
    epsterm = RGAS / RV
    thl_tol, rt_tol = 1e-2, 1e-4
    w_tol_sqd = (2e-2) ** 2
    w_thresh = 0.0
    cldfrac = np.zeros(nlev)
    ql_out = np.zeros(nlev)
    ql2_out = np.zeros(nlev)
    wqls_out = np.zeros(nlev)
    wthv_out = np.zeros(nlev)
    w3_zt = linear_interp(zi, zt, w3, LARGENEG)
    thl_sec_zt = linear_interp(zi, zt, thl_sec, 0.0)
    wthl_sec_zt = linear_interp(zi, zt, wthl_sec, LARGENEG)
    qwthl_sec_zt = linear_interp(zi, zt, qwthl_sec, LARGENEG)
    wqw_sec_zt = linear_interp(zi, zt, wqw_sec, LARGENEG)
    qw_sec_zt = linear_interp(zi, zt, qw_sec, 0.0)
    sqrt2 = math.sqrt(2.0)
    sqrt2pi = math.sqrt(2.0 * PI)

    for k in range(nlev):
        pval = pres[k]
        thl_first, w_first, qw_first = thetal[k], w_field[k], qw[k]
        w3var = w3_zt[k]
        thlsec, qwsec = thl_sec_zt[k], qw_sec_zt[k]
        qwthlsec, wqwsec, wthlsec = (qwthl_sec_zt[k], wqw_sec_zt[k],
                                     wthl_sec_zt[k])
        sqrtw2 = math.sqrt(w_sec[k])
        sqrtthl = max(thl_tol, math.sqrt(thlsec))
        sqrtqt = max(rt_tol, math.sqrt(qwsec))

        # vv parameters
        skew_w = w3var / math.sqrt(w_sec[k] ** 3)
        if w_sec[k] <= w_tol_sqd:
            skew_w = 0.0
            w1_1 = w1_2 = w_first
            w2_1 = w2_2 = 0.0
            a = 0.5
        else:
            w2_1 = w2_2 = 0.4
            a = max(0.01, min(0.5 * (1.0 - skew_w * math.sqrt(
                1.0 / (4.0 * (1.0 - w2_1) ** 3 + skew_w ** 2))), 0.99))
            sqrtw2t = math.sqrt(1.0 - w2_1)
            w1_1 = math.sqrt((1.0 - a) / a) * sqrtw2t
            w1_2 = -math.sqrt(a / (1.0 - a)) * sqrtw2t
            w2_1 = w2_1 * w_sec[k]
            w2_2 = w2_2 * w_sec[k]

        # thl parameters
        corrtest1 = max(-1.0, min(1.0, wthlsec / (sqrtw2 * sqrtthl)))
        if thlsec <= thl_tol ** 2 or abs(w1_2 - w1_1) <= w_thresh:
            thl1_1 = thl1_2 = thl_first
            thl2_1 = thl2_2 = 0.0
            sqrtthl2_1 = sqrtthl2_2 = 0.0
        else:
            thl1_1 = -corrtest1 / w1_2
            thl1_2 = -corrtest1 / w1_1
            skew_thl = 0.0                   # dothetal_skew = .false.
            thl2_1 = min(100.0, max(0.0, (
                3.0 * thl1_2 * (1.0 - a * thl1_1 ** 2 -
                                (1.0 - a) * thl1_2 ** 2) -
                (skew_thl - a * thl1_1 ** 3 -
                 (1.0 - a) * thl1_2 ** 3)) /
                (3.0 * a * (thl1_2 - thl1_1)))) * thlsec
            thl2_2 = min(100.0, max(0.0, (
                -3.0 * thl1_1 * (1.0 - a * thl1_1 ** 2 -
                                 (1.0 - a) * thl1_2 ** 2) +
                (skew_thl - a * thl1_1 ** 3 -
                 (1.0 - a) * thl1_2 ** 3)) /
                (3.0 * (1.0 - a) * (thl1_2 - thl1_1)))) * thlsec
            thl1_1 = thl1_1 * sqrtthl + thl_first
            thl1_2 = thl1_2 * sqrtthl + thl_first
            sqrtthl2_1 = math.sqrt(thl2_1)
            sqrtthl2_2 = math.sqrt(thl2_2)

        # qw parameters
        corrtest2 = max(-1.0, min(1.0, wqwsec / (sqrtw2 * sqrtqt)))
        if qwsec <= rt_tol ** 2 or abs(w1_2 - w1_1) <= w_thresh:
            qw1_1 = qw1_2 = qw_first
            qw2_1 = qw2_2 = 0.0
            sqrtqw2_1 = sqrtqw2_2 = 0.0
        else:
            qw1_1 = -corrtest2 / w1_2
            qw1_2 = -corrtest2 / w1_1
            tsign = abs(qw1_2 - qw1_1)
            if tsign > 0.4:
                skew_qw = 1.2 * skew_w
            elif tsign <= 0.2:
                skew_qw = 0.0
            else:
                skew_qw = ((1.2 * skew_w) / 0.2) * (tsign - 0.2)
            qw2_1 = min(100.0, max(0.0, (
                3.0 * qw1_2 * (1.0 - a * qw1_1 ** 2 -
                               (1.0 - a) * qw1_2 ** 2) -
                (skew_qw - a * qw1_1 ** 3 -
                 (1.0 - a) * qw1_2 ** 3)) /
                (3.0 * a * (qw1_2 - qw1_1)))) * qwsec
            qw2_2 = min(100.0, max(0.0, (
                -3.0 * qw1_1 * (1.0 - a * qw1_1 ** 2 -
                                (1.0 - a) * qw1_2 ** 2) +
                (skew_qw - a * qw1_1 ** 3 -
                 (1.0 - a) * qw1_2 ** 3)) /
                (3.0 * (1.0 - a) * (qw1_2 - qw1_1)))) * qwsec
            qw1_1 = qw1_1 * sqrtqt + qw_first
            qw1_2 = qw1_2 * sqrtqt + qw_first
            sqrtqw2_1 = math.sqrt(qw2_1)
            sqrtqw2_2 = math.sqrt(qw2_2)

        # tilde to real
        w1_1 = w1_1 * sqrtw2 + w_first
        w1_2 = w1_2 * sqrtw2 + w_first

        # in-plume correlation
        testvar = a * sqrtqw2_1 * sqrtthl2_1 + \
            (1.0 - a) * sqrtqw2_2 * sqrtthl2_2
        if testvar == 0.0:
            r_qwthl_1 = 0.0
        else:
            r_qwthl_1 = max(-1.0, min(1.0, (
                qwthlsec - a * (qw1_1 - qw_first) * (thl1_1 - thl_first) -
                (1.0 - a) * (qw1_2 - qw_first) * (thl1_2 - thl_first)) /
                testvar))

        # temperatures
        Tl1_1 = thl1_1 / ((BASEPRES / pval) ** (RGAS / CP))
        Tl1_2 = thl1_2 / ((BASEPRES / pval) ** (RGAS / CP))

        # qs
        esval1_1 = murphy_koop_liq(Tl1_1)
        qs1 = 0.622 * esval1_1 / max(esval1_1, pval - esval1_1)
        beta1 = (RGAS / RV) * (LCOND / (RGAS * Tl1_1)) * \
            (LCOND / (CP * Tl1_1))
        if Tl1_1 == Tl1_2:
            qs2, beta2 = qs1, beta1
        else:
            esval1_2 = murphy_koop_liq(Tl1_2)
            qs2 = 0.622 * esval1_2 / max(esval1_2, pval - esval1_2)
            beta2 = (RGAS / RV) * (LCOND / (RGAS * Tl1_2)) * \
                (LCOND / (CP * Tl1_2))

        def compute_s(qw1, qs, beta, thl2, qw2, sqthl2, sqqw2):
            s = qw1 - qs * ((1.0 + beta * qw1) / (1.0 + beta * qs))
            cthl = ((1.0 + beta * qw1) / (1.0 + beta * qs) ** 2) * \
                (CP / LCOND) * beta * qs * (pval / BASEPRES) ** (RGAS / CP)
            cqt = 1.0 / (1.0 + beta * qs)
            tmp = max(0.0, cthl ** 2 * thl2 + cqt ** 2 * qw2 -
                      2.0 * cthl * sqthl2 * cqt * sqqw2 * r_qwthl_1)
            std_s = math.sqrt(tmp)
            qn = 0.0
            C = 0.0
            if std_s > math.sqrt(np.finfo(np.float64).tiny) * 100:
                C = 0.5 * (1.0 + math.erf(s / (sqrt2 * std_s)))
                if C != 0.0:
                    qn = s * C + (std_s / sqrt2pi) * \
                        math.exp(-0.5 * (s / std_s) ** 2)
            elif s > 0.0:
                C = 1.0
                qn = s
            if qn <= 0.0:
                C = 0.0
                qn = 0.0
            return s, std_s, qn, C

        s1, std_s1, qn1, C1 = compute_s(qw1_1, qs1, beta1, thl2_1, qw2_1,
                                        sqrtthl2_1, sqrtqw2_1)
        if qw1_1 == qw1_2 and thl2_1 == thl2_2 and qs1 == qs2:
            s2, std_s2, qn2, C2 = s1, std_s1, qn1, C1
        else:
            s2, std_s2, qn2, C2 = compute_s(qw1_2, qs2, beta2, thl2_2,
                                            qw2_2, sqrtthl2_2, sqrtqw2_2)
        ql1 = min(qn1, qw1_1)
        ql2 = min(qn2, qw1_2)
        cldfrac[k] = min(1.0, a * C1 + (1.0 - a) * C2)
        ql_out[k] = max(0.0, a * ql1 + (1.0 - a) * ql2)
        ql2_out[k] = max(0.0, a * (s1 * ql1 + C1 * std_s1 ** 2) +
                         (1.0 - a) * (s2 * ql2 + C2 * std_s2 ** 2) -
                         ql_out[k] ** 2)
        wqls_out[k] = a * ((w1_1 - w_first) * ql1) + \
            (1.0 - a) * ((w1_2 - w_first) * ql2)
        wthv_out[k] = wthlsec + ((1.0 - epsterm) / epsterm) * BASETEMP * \
            wqwsec + ((LCOND / CP) * (BASEPRES / pval) ** (RGAS / CP) -
                      (1.0 / epsterm) * BASETEMP) * wqls_out[k]
    # note: the Fortran pre-zeroes shoc_ql(:,1) but the k-loop then
    # assigns every level, so no boundary override remains (:2245, 2270)
    return cldfrac, ql_out, wqls_out, wthv_out, ql2_out


# ---------------------------------------------------------------------------
# energy bookkeeping (:3612-3887)
# ---------------------------------------------------------------------------
def shoc_energy_integrals(host_dse, pdel, rtm, rcm, u, v):
    rvm = rtm - rcm
    se = float(np.sum(host_dse * pdel / GGR))
    ke = float(np.sum(0.5 * (u ** 2 + v ** 2) * pdel / GGR))
    wv = float(np.sum(rvm * pdel / GGR))
    wl = float(np.sum(rcm * pdel / GGR))
    return se, ke, wv, wl


def shoc_main_oracle(col, dtime, nadv, npbl):
    """col: dict of (nlev,)/(nlev+1,)/scalar f64 inputs with the Fortran
    argument names. Returns dict of final state + pblh + shoc_ql2."""
    nlev = len(col["thetal"])
    zt, zi = col["zt_grid"], col["zi_grid"]
    pdel = col["pdel"]
    thetal = np.array(col["thetal"], np.float64)
    qw = np.array(col["qw"], np.float64)
    u = np.array(col["u_wind"], np.float64)
    v = np.array(col["v_wind"], np.float64)
    tke = np.array(col["tke"], np.float64)
    tk = np.array(col["tk"], np.float64)
    tkh = np.array(col["tkh"], np.float64)
    wthv_sec = np.array(col["wthv_sec"], np.float64)
    tracers = np.array(col["qtracers"], np.float64)   # (nlev, ntr)
    shoc_ql = np.array(col["shoc_ql"], np.float64)
    cldfrac = np.array(col["shoc_cldfrac"], np.float64)
    host_dse = np.array(col["host_dse"], np.float64)
    wthl_sfc, wqw_sfc = col["wthl_sfc"], col["wqw_sfc"]
    uw_sfc, vw_sfc = col["uw_sfc"], col["vw_sfc"]
    wtracer_sfc = np.asarray(col["wtracer_sfc"], np.float64)

    se_b, ke_b, wv_b, wl_b = shoc_energy_integrals(host_dse, pdel, qw,
                                                   shoc_ql, u, v)
    shoc_ql2 = np.zeros(nlev)
    for _ in range(nadv):
        tke = np.maximum(MINTKE, tke)
        dz_zt, dz_zi, rho_zt = shoc_grid(zt, zi, pdel)
        qv = qw - shoc_ql
        ustar, kbfs, obklen = shoc_diag_obklen(
            uw_sfc, vw_sfc, wthl_sfc, wqw_sfc, thetal[nlev - 1],
            shoc_ql[nlev - 1], qv[nlev - 1])
        pblh = pblintd(zt, zi, thetal, shoc_ql, qv, u, v, ustar, obklen,
                       kbfs, cldfrac, npbl)
        brunt, shoc_mix = shoc_length(col["host_dx"], col["host_dy"], zt,
                                      zi, dz_zt, tke, col["thv"])
        tke, tk, tkh, isotropy = shoc_tke(
            dtime, wthv_sec, shoc_mix, dz_zi, dz_zt, col["pres"], u, v,
            brunt, obklen, zt, zi, pblh, tke, tk, tkh)
        thetal, qw, tracers, tke, u, v = update_prognostics_implicit(
            dtime, dz_zt, dz_zi, rho_zt, zt, zi, tk, tkh, uw_sfc, vw_sfc,
            wthl_sfc, wqw_sfc, wtracer_sfc, thetal, qw, tracers, tke, u, v)
        mom = diag_second_shoc_moments(
            thetal, qw, u, v, tke, isotropy, tkh, tk, dz_zi, zt, zi,
            shoc_mix, wthl_sfc, wqw_sfc, uw_sfc, vw_sfc)
        w3 = diag_third_shoc_moments(
            mom["w_sec"], mom["thl_sec"], mom["wthl_sec"], isotropy,
            brunt, thetal, tke, dz_zt, dz_zi, zt, zi)
        cldfrac, shoc_ql, wqls, wthv_sec, shoc_ql2 = shoc_assumed_pdf(
            thetal, qw, col["w_field"], mom["thl_sec"], mom["qw_sec"],
            mom["wthl_sec"], mom["w_sec"], mom["wqw_sec"],
            mom["qwthl_sec"], w3, col["pres"], zt, zi)
        tke = np.maximum(MINTKE, tke)

    # update_host_dse
    temp = thetal / col["inv_exner"] + (LCOND / CP) * shoc_ql
    host_dse = CP * temp + GGR * zt + col["phis"]
    se_a, ke_a, wv_a, wl_a = shoc_energy_integrals(host_dse, pdel, qw,
                                                   shoc_ql, u, v)
    # energy fixer
    dz_zt, dz_zi, rho_zt = shoc_grid(zt, zi, pdel)
    rho_zi = linear_interp(zt, zi, rho_zt, 0.0)
    hdtime = dtime * float(nadv)
    shf = wthl_sfc * CP * rho_zi[nlev]
    lhf = wqw_sfc * rho_zi[nlev]
    te_a = se_a + ke_a + (LCOND + LICE) * wv_a + LICE * wl_a
    te_b = se_b + ke_b + (LCOND + LICE) * wv_b + LICE * wl_b
    te_b = te_b + (shf + lhf * (LCOND + LICE)) * hdtime
    shoctop = 0                           # 1-based 1 -> 0-based 0
    while tke[shoctop] == MINTKE and shoctop < nlev - 2:
        shoctop += 1
    se_dis = (te_a - te_b) / (col["presi"][nlev] - col["presi"][shoctop])
    for k in range(shoctop, nlev):
        host_dse[k] -= se_dis * GGR

    # final PBL diagnosis
    qv = qw - shoc_ql
    ustar, kbfs, obklen = shoc_diag_obklen(
        uw_sfc, vw_sfc, wthl_sfc, wqw_sfc, thetal[nlev - 1],
        shoc_ql[nlev - 1], qv[nlev - 1])
    pblh = pblintd(zt, zi, thetal, shoc_ql, qv, u, v, ustar, obklen, kbfs,
                   cldfrac, npbl)

    return dict(host_dse=host_dse, tke=tke, thetal=thetal, qw=qw,
                u_wind=u, v_wind=v, qtracers=tracers, wthv_sec=wthv_sec,
                tk=tk, tkh=tkh, shoc_ql=shoc_ql, shoc_cldfrac=cldfrac,
                pblh=pblh, shoc_ql2=shoc_ql2)
