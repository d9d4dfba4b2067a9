"""Scalar numpy oracle of the full P3 column step (micro_p3.F90 p3_main).

A FRESH per-column, per-level transliteration of the reference Fortran
(physics/micro/p3/fortran/micro_p3.F90 + scream_common/micro_p3_utils.F90 +
scream_common/wv_sat_scream.F90), written independently of pam_tpu's JAX
port to serve as an executable golden reference (VERDICT r2 item 2): it
keeps the Fortran's scalar control flow — goto-style level skips, the
moving k_qxbot sedimentation window, nested-lerp table walks — precisely
where the JAX port replaced them with masks, whole-column upwinding and
hat-weight contractions, so any inequivalence in those redesigns shows up
as a mismatch here.

Configuration modeled: the PAM wrapper's flags (Microphysics.h:412-413)
do_predict_nc = .true., do_prescribed_CCN = .true. (== the port's
ccn_mode="prescribed").

Orientation: (nz,) arrays with k=0 = model top, surface = nz-1 (kdir=-1
in the Fortran's kts/kte indexing).
"""

import math
import os

import numpy as np

# ---------------------------------------------------------------------------
# constants: micro_p3_utils_init (micro_p3_utils.F90:83-185) with the host
# values the PAM wrapper passes (Microphysics.h:75-88, 172-183)
# ---------------------------------------------------------------------------
CP = 1004.64
RD = 287.042
RV = 461.505
RHO_H2O = 1000.0
MW_H2O = 18.016
MW_DRY = 28.966
GRAV = 9.80616
LATVAP = 2501000.0
LATICE = 333700.0
CPLIQ = 4188.0
TMELT = 273.15
PI = 3.14159265

INV_CP = 1.0 / CP
EP_2 = MW_H2O / MW_DRY
THRD = 1.0 / 3.0
SXTH = 1.0 / 6.0
PIOV3 = PI * THRD
PIOV6 = PI * SXTH
MAX_TOTAL_NI = 500.0e3
NCCNST = 200.0e6
T_ZERODEGC = TMELT
T_HOMOGFRZ = TMELT - 40.0
T_ICENUC = TMELT - 15.0
T_RAINFRZ = TMELT - 4.0
RHO_1000MB = 100000.0 / (RD * T_ZERODEGC)
RHO_600MB = 60000.0 / (RD * 253.15)
F1R = 0.78
F2R = 0.32
CPW = CPLIQ
INV_RHO_H2O = 1.0 / RHO_H2O
DROPMASS = 5.2e-7
INV_DROPMASS = 1.0 / DROPMASS
LV = LATVAP                      # latent_heat_vapor
LS = LATVAP + LATICE             # latent_heat_sublim
LF = LATICE                      # latent_heat_fusion
RHO_RIMEMIN = 50.0
RHO_RIMEMAX = 900.0
INV_RHO_RIMEMAX = 1.0 / RHO_RIMEMAX
BIMM = 2.0
AIMM = 0.65
MI0 = 4.0 * PIOV3 * 900.0 * 1.0e-18
ECI = 0.5
ERI = 1.0
BCN = 2.0
NMLTRATIO = 1.0
CONS1 = PIOV6 * RHO_H2O
CONS2 = 4.0 * PIOV3 * RHO_H2O
CONS3 = 1.0 / (CONS2 * 1.5625e-14)
CONS5 = PIOV6 * BIMM
CONS6 = PIOV6 ** 2 * RHO_H2O * BIMM

QSMALL = 1.0e-14
NSMALL = 1.0e-16
MU_R_CONSTANT = 1.0
LOOKUP_TABLE_1A_DUM1_C = 4.135985029041767
ISIZE, DENSIZE, RIMSIZE, RCOLLSIZE = 50, 5, 4, 30
MINCLD = 1.0e-4
INCLOUD_LIMIT = 5.1e-3
PRECIP_LIMIT = 1.0e-2

_TABLE_FILE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "pam_tpu", "physics", "p3", "tables",
    "p3_lookup_table_1.dat-v4")


# ---------------------------------------------------------------------------
# tables (p3_init_a :163-199, p3_init_b :236-361) — independent parse/build
# ---------------------------------------------------------------------------
_CACHE = {}


def ice_tables():
    if "ice" not in _CACHE:
        ice = np.zeros((DENSIZE, RIMSIZE, ISIZE, 12))
        coll = np.zeros((DENSIZE, RIMSIZE, ISIZE, RCOLLSIZE, 2))
        with open(_TABLE_FILE) as f:
            rows = (ln.split() for ln in f
                    if ln.strip() and not ln.lstrip().startswith("VERSION"))
            for jj in range(DENSIZE):
                for ii in range(RIMSIZE):
                    for i in range(ISIZE):
                        # read dumi,dumi,dum,dum,k(1:8),dum,k(9:12)
                        v = [float(x) for x in next(rows)]
                        ice[jj, ii, i, 0:8] = v[4:12]
                        ice[jj, ii, i, 8:12] = v[13:17]
                    for i in range(ISIZE):
                        for j in range(RCOLLSIZE):
                            # read dumi,dumi,dum,dum,dum,k1,k2,dum
                            v = [float(x) for x in next(rows)]
                            coll[jj, ii, i, j, 0] = math.log10(v[5])
                            coll[jj, ii, i, j, 1] = math.log10(v[6])
        _CACHE["ice"] = (ice, coll)
    return _CACHE["ice"]


def rain_tables():
    """(vn, vm, revap) each (300, 10) — p3_init_b PSD integration."""
    if "rain" not in _CACHE:
        vn = np.zeros((300, 10))
        vm = np.zeros((300, 10))
        revap = np.zeros((300, 10))
        mu_r = MU_R_CONSTANT
        kk = np.arange(1, 10001, dtype=np.float64)
        dd = 2.0
        dia = (kk * dd - dd * 0.5) * 1e-6
        amg = PIOV6 * 997.0 * dia ** 3 * 1000.0
        du = dia * 1e6
        vt = np.where(du <= 134.43, 4.5795e3 * amg ** (2.0 * THRD),
                      np.where(du < 1511.64, 4.962e1 * amg ** THRD,
                               np.where(du < 3477.84, 1.732e1 * amg ** SXTH,
                                        9.17)))
        l10d = np.log10(dia)
        for jj in range(1, 301):
            dm = ((jj * 10.0 - 5.0) * 1e-6 if jj <= 20
                  else ((jj - 20) * 30.0 + 195.0) * 1e-6)
            lamr = (mu_r + 1.0) / dm
            e = np.exp(-lamr * dia) * dd * 1e-6
            w_n = 10.0 ** (mu_r * l10d + 4.0 * mu_r) * e
            w_m = 10.0 ** ((mu_r + 3.0) * l10d + 4.0 * mu_r) * e
            d1 = (vt * w_n).sum()
            d2 = max(w_n.sum(), 1e-30)
            d3 = (vt * w_m).sum()
            d4 = max(w_m.sum(), 1e-30)
            d5 = max(((vt * dia) ** 0.5 *
                      10.0 ** ((mu_r + 1.0) * l10d + 3.0 * mu_r) * e).sum(),
                     1e-30)
            vn[jj - 1, :] = d1 / d2
            vm[jj - 1, :] = d3 / d4
            revap[jj - 1, :] = 10.0 ** (math.log10(d5) +
                                        (mu_r + 1.0) * math.log10(lamr) -
                                        3.0 * mu_r)
        _CACHE["rain"] = (vn, vm, revap)
    return _CACHE["rain"]


# ---------------------------------------------------------------------------
# scalar table index walks + nested-lerp accesses (:1508-1770)
# ---------------------------------------------------------------------------
def indices_1a(qi, ni, qm, rhop):
    """find_lookupTable_indices_1a — 1-BASED dumi/dumii/dumjj like Fortran."""
    dum1 = (math.log10(qi / ni) + 18.0) * LOOKUP_TABLE_1A_DUM1_C - 10.0
    dumi = int(dum1)
    dum1 = max(min(dum1, float(ISIZE)), 1.0)
    dumi = min(max(dumi, 1), ISIZE - 1)
    dum4 = (qm / qi) * 3.0 + 1.0
    dumii = int(dum4)
    dum4 = max(min(dum4, float(RIMSIZE)), 1.0)
    dumii = min(max(dumii, 1), RIMSIZE - 1)
    if rhop <= 650.0:
        dum5 = (rhop - 50.0) * 0.005 + 1.0
    else:
        dum5 = (rhop - 650.0) * 0.004 + 4.0
    dumjj = int(dum5)
    dum5 = max(min(dum5, float(DENSIZE)), 1.0)
    dumjj = min(max(dumjj, 1), DENSIZE - 1)
    return dumi, dumjj, dumii, dum1, dum4, dum5


def indices_1b(qr, nr):
    if qr >= QSMALL and nr > 0.0:
        dumlr = (qr / (PI * RHO_H2O * nr)) ** THRD
        dum3 = (math.log10(dumlr) + 5.0) * 10.70415
        dumj = int(dum3)
        dum3 = max(min(dum3, float(RCOLLSIZE)), 1.0)
        dumj = min(max(dumj, 1), RCOLLSIZE - 1)
    else:
        dumj, dum3 = 1, 1.0
    return dumj, dum3


def indices_3(mu_r, lamr):
    dum1 = (mu_r + 1.0) / lamr
    if dum1 <= 195.0e-6:
        rdumii = (dum1 * 1e6 + 5.0) * 0.1
        rdumii = min(max(rdumii, 1.0), 20.0)
        dumii = min(max(int(rdumii), 1), 20)
    else:
        rdumii = (dum1 * 1e6 - 195.0) * THRD * 0.1 + 20.0
        rdumii = min(max(rdumii, 20.0), 300.0)
        dumii = min(max(int(rdumii), 20), 299)
    rdumjj = min(max(mu_r + 1.0, 1.0), 10.0)
    dumjj = min(max(int(rdumjj), 1), 9)
    return dumii, dumjj, rdumii, rdumjj


def access_ice(tab, dumjj, dumii, dumi, index, dum1, dum4, dum5):
    """access_lookup_table (:1508-1545): nested lerps, 1-based in, 1-based
    Fortran table axes -> 0-based numpy offsets."""
    t = tab[..., index - 1]

    def at(jj, ii, i):
        return t[jj - 1, ii - 1, i - 1]

    ip1 = at(dumjj, dumii, dumi) + (dum1 - dumi) * (
        at(dumjj, dumii, dumi + 1) - at(dumjj, dumii, dumi))
    gp1 = at(dumjj, dumii + 1, dumi) + (dum1 - dumi) * (
        at(dumjj, dumii + 1, dumi + 1) - at(dumjj, dumii + 1, dumi))
    tmp1 = ip1 + (dum4 - dumii) * (gp1 - ip1)
    ip1 = at(dumjj + 1, dumii, dumi) + (dum1 - dumi) * (
        at(dumjj + 1, dumii, dumi + 1) - at(dumjj + 1, dumii, dumi))
    gp1 = at(dumjj + 1, dumii + 1, dumi) + (dum1 - dumi) * (
        at(dumjj + 1, dumii + 1, dumi + 1) - at(dumjj + 1, dumii + 1, dumi))
    tmp2 = ip1 + (dum4 - dumii) * (gp1 - ip1)
    return tmp1 + (dum5 - dumjj) * (tmp2 - tmp1)


def access_coll(tab, dumjj, dumii, dumj, dumi, index, dum1, dum3, dum4,
                dum5):
    """access_lookup_table_coll (:1548-1615)."""
    t = tab[..., index - 1]

    def at(jj, ii, i, j):
        return t[jj - 1, ii - 1, i - 1, j - 1]

    def pair(jj, ii):
        d1 = at(jj, ii, dumi, dumj) + (dum1 - dumi) * (
            at(jj, ii, dumi + 1, dumj) - at(jj, ii, dumi, dumj))
        d2 = at(jj, ii, dumi, dumj + 1) + (dum1 - dumi) * (
            at(jj, ii, dumi + 1, dumj + 1) - at(jj, ii, dumi, dumj + 1))
        return d1 + (dum3 - dumj) * (d2 - d1)

    tmp1 = pair(dumjj, dumii) + (dum4 - dumii) * (
        pair(dumjj, dumii + 1) - pair(dumjj, dumii))
    tmp2 = pair(dumjj + 1, dumii) + (dum4 - dumii) * (
        pair(dumjj + 1, dumii + 1) - pair(dumjj + 1, dumii))
    return tmp1 + (dum5 - dumjj) * (tmp2 - tmp1)


def access_rain(tab, dumii, dumjj, rdumii, rdumjj):
    """2-D lerp as in compute_rain_fall_velocity (:3893-3907)."""
    def at(i, j):
        return tab[i - 1, j - 1]
    d1 = at(dumii, dumjj) + (rdumii - dumii) * (at(dumii + 1, dumjj) -
                                                at(dumii, dumjj))
    d2 = at(dumii, dumjj + 1) + (rdumii - dumii) * (
        at(dumii + 1, dumjj + 1) - at(dumii, dumjj + 1))
    return d1 + (rdumjj - dumjj) * (d2 - d1)


# ---------------------------------------------------------------------------
# saturation (wv_sat_scream.F90)
# ---------------------------------------------------------------------------
def murphy_koop(t, i_type):
    logt = math.log(t)
    if i_type == 1 and t < T_ZERODEGC:
        return math.exp(9.550426 - 5723.265 / t + 3.53068 * logt -
                        0.00728332 * t)
    tmp = (54.842763 - 6763.22 / t - 4.210 * logt + 0.000367 * t +
           math.tanh(0.0415 * (t - 218.8)) *
           (53.878 - 1331.22 / t - 9.44523 * logt + 0.014025 * t))
    return math.exp(tmp)


def qv_sat(t, p, i_wrt):
    e = murphy_koop(t, i_wrt)
    return EP_2 * e / max(1.0e-3, p - e)


# ---------------------------------------------------------------------------
# DSD / rime helpers (:1774-1969)
# ---------------------------------------------------------------------------
def get_cloud_dsd2(qc, nc, rho):
    """Returns (nc, mu_c, lamc, cdist, cdist1)."""
    if qc < QSMALL:
        return nc, 0.0, 0.0, 0.0, 0.0
    nc = max(nc, NSMALL)
    mu_c = 0.0005714 * (nc * 1e-6 * rho) + 0.2714
    mu_c = 1.0 / (mu_c * mu_c) - 1.0
    mu_c = min(max(mu_c, 2.0), 15.0)
    lamc = (CONS1 * nc * (mu_c + 3.0) * (mu_c + 2.0) * (mu_c + 1.0) /
            qc) ** THRD
    lammin = (mu_c + 1.0) * 2.5e4
    lammax = (mu_c + 1.0) * 1.0e6
    if lamc < lammin:
        lamc = lammin
        nc = 6.0 * lamc ** 3 * qc / (PI * RHO_H2O * (mu_c + 3.0) *
                                     (mu_c + 2.0) * (mu_c + 1.0))
    elif lamc > lammax:
        lamc = lammax
        nc = 6.0 * lamc ** 3 * qc / (PI * RHO_H2O * (mu_c + 3.0) *
                                     (mu_c + 2.0) * (mu_c + 1.0))
    cdist = nc * (mu_c + 1.0) / lamc
    cdist1 = nc / math.gamma(mu_c + 1.0)
    return nc, mu_c, lamc, cdist, cdist1


def get_rain_dsd2(qr, nr):
    """Returns (nr, mu_r, lamr, cdistr, logn0r)."""
    if qr < QSMALL:
        return nr, 0.0, 0.0, 0.0, 0.0
    nr = max(nr, NSMALL)
    mu_r = MU_R_CONSTANT
    lamr = (CONS1 * nr * (mu_r + 3.0) * (mu_r + 2.0) * (mu_r + 1.0) /
            qr) ** THRD
    lammax = (mu_r + 1.0) * 1.0e5
    lammin = (mu_r + 1.0) * 500.0
    if lamr < lammin:
        lamr = lammin
        nr = math.exp(3.0 * math.log(lamr) + math.log(qr) +
                      math.log(math.gamma(mu_r + 1.0)) -
                      math.log(math.gamma(mu_r + 4.0))) / CONS1
    elif lamr > lammax:
        lamr = lammax
        nr = math.exp(3.0 * math.log(lamr) + math.log(qr) +
                      math.log(math.gamma(mu_r + 1.0)) -
                      math.log(math.gamma(mu_r + 4.0))) / CONS1
    cdistr = nr / math.gamma(mu_r + 1.0)
    logn0r = math.log10(nr) + (mu_r + 1.0) * math.log10(lamr) - \
        math.log10(math.gamma(mu_r + 1.0))
    return nr, mu_r, lamr, cdistr, logn0r


def calc_bulk_rho_rime(qi_tot, qi_rim, bi_rim):
    """Returns (qi_rim, bi_rim, rho_rime) (:1897-1943)."""
    if bi_rim >= 1.0e-15:
        rho_rime = qi_rim / bi_rim
        if rho_rime < RHO_RIMEMIN:
            rho_rime = RHO_RIMEMIN
            bi_rim = qi_rim / rho_rime
        elif rho_rime > RHO_RIMEMAX:
            rho_rime = RHO_RIMEMAX
            bi_rim = qi_rim / rho_rime
    else:
        qi_rim = 0.0
        bi_rim = 0.0
        rho_rime = 0.0
    if qi_rim > qi_tot and rho_rime > 0.0:
        qi_rim = qi_tot
        bi_rim = qi_rim / rho_rime
    if qi_rim < QSMALL:
        qi_rim = 0.0
        bi_rim = 0.0
    return qi_rim, bi_rim, rho_rime


def impose_max_total_ni(ni_local, inv_rho_local):
    if ni_local >= 1.0e-20:
        dum = MAX_TOTAL_NI * inv_rho_local / ni_local
        ni_local = ni_local * min(dum, 1.0)
    return ni_local


def calc_incloud(qc, qr, qi, qm, nc, nr, ni, bm, icl, ici, icr):
    """calculate_incloud_mixingratios (micro_p3_utils.F90:238-290)."""
    if qc >= QSMALL:
        qc_in, nc_in = qc * icl, max(nc * icl, 0.0)
    else:
        qc_in, nc_in = 0.0, 0.0
    if qi >= QSMALL:
        qi_in, ni_in = qi * ici, max(ni * ici, 0.0)
    else:
        qi_in, ni_in = 0.0, 0.0
    if qm >= QSMALL and qi >= QSMALL:
        qm_in, bm_in = qm * ici, max(bm * icl, 0.0)
    else:
        qm_in, bm_in = 0.0, 0.0
    if qr >= QSMALL:
        qr_in, nr_in = qr * icr, max(nr * icr, 0.0)
    else:
        qr_in, nr_in = 0.0, 0.0
    if (qc_in > INCLOUD_LIMIT or qi_in > INCLOUD_LIMIT or
            qr_in > PRECIP_LIMIT or bm_in > INCLOUD_LIMIT):
        qc_in = min(qc_in, INCLOUD_LIMIT)
        qi_in = min(qi_in, INCLOUD_LIMIT)
        bm_in = min(bm_in, INCLOUD_LIMIT)
        qr_in = min(qr_in, PRECIP_LIMIT)
    return qc_in, qr_in, qi_in, qm_in, nc_in, nr_in, ni_in, bm_in


# ---------------------------------------------------------------------------
# p3_main_part1 (:363-481) — arrays are mutated in place
# ---------------------------------------------------------------------------
def part1(c, dt):
    nz = len(c["qc"])
    is_nucleat_possible = False
    is_hydromet_present = False
    for k in range(nz - 1, -1, -1):          # kbot..ktop, kdir=-1
        c["rho"][k] = c["dpres"][k] / c["dz"][k] / GRAV
        c["inv_rho"][k] = 1.0 / c["rho"][k]
        c["qv_sat_l"][k] = qv_sat(c["t"][k], c["pres"][k], 0)
        c["qv_sat_i"][k] = qv_sat(c["t"][k], c["pres"][k], 1)
        c["sup_i"][k] = c["qv"][k] / c["qv_sat_i"][k] - 1.0
        c["rhofacr"][k] = (RHO_1000MB * c["inv_rho"][k]) ** 0.54
        c["rhofaci"][k] = (RHO_600MB * c["inv_rho"][k]) ** 0.54
        dum = 1.496e-6 * c["t"][k] ** 1.5 / (c["t"][k] + 120.0)
        c["acn"][k] = GRAV * RHO_H2O / (18.0 * dum)
        if c["t"][k] < T_ZERODEGC and c["sup_i"][k] >= -0.05:
            is_nucleat_possible = True
        if c["qc"][k] < QSMALL:
            c["qv"][k] += c["qc"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qc"][k] * LV * INV_CP
            c["qc"][k] = 0.0
            c["nc"][k] = 0.0
        else:
            is_hydromet_present = True
            # do_prescribed_CCN branch (:430-432)
            c["nc"][k] = max(c["nc"][k], c["nccn_prescribed"][k])
        if c["qr"][k] < QSMALL:
            c["qv"][k] += c["qr"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qr"][k] * LV * INV_CP
            c["qr"][k] = 0.0
            c["nr"][k] = 0.0
        else:
            is_hydromet_present = True
        if c["qi"][k] < QSMALL or (c["qi"][k] < 1e-8 and
                                   c["sup_i"][k] < -0.1):
            c["qv"][k] += c["qi"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qi"][k] * LS * INV_CP
            c["qi"][k] = 0.0
            c["ni"][k] = 0.0
            c["qm"][k] = 0.0
            c["bm"][k] = 0.0
        else:
            is_hydromet_present = True
        if QSMALL <= c["qi"][k] < 1e-8 and c["t"][k] >= T_ZERODEGC:
            c["qr"][k] += c["qi"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qi"][k] * LF * INV_CP
            c["qi"][k] = 0.0
            c["ni"][k] = 0.0
            c["qm"][k] = 0.0
            c["bm"][k] = 0.0
        c["t"][k] = c["th"][k] * c["exner"][k]
        (c["qc_in"][k], c["qr_in"][k], c["qi_in"][k], c["qm_in"][k],
         c["nc_in"][k], c["nr_in"][k], c["ni_in"][k], c["bm_in"][k]) = \
            calc_incloud(c["qc"][k], c["qr"][k], c["qi"][k], c["qm"][k],
                         c["nc"][k], c["nr"][k], c["ni"][k], c["bm"][k],
                         c["icl"][k], c["ici"][k], c["icr"][k])
    return is_nucleat_possible, is_hydromet_present


# ---------------------------------------------------------------------------
# p3_main_part2 (:483-975)
# ---------------------------------------------------------------------------
def part2(c, dt):
    inv_dt = 1.0 / dt
    ice_tab, coll_tab = ice_tables()
    _, _, revap_tab = rain_tables()
    nz = len(c["qc"])
    for k in range(nz - 1, -1, -1):
        # 555-skip (:590-596)
        if (c["qc"][k] < QSMALL and c["qr"][k] < QSMALL and
                c["qi"][k] < QSMALL and c["t"][k] < T_ZERODEGC and
                c["sup_i"][k] < -0.05):
            continue

        rho, inv_rho = c["rho"][k], c["inv_rho"][k]
        t = c["t"][k]

        qc2qr_accret = qr2qv_evap = qc2qr_auto = 0.0
        nc_accret = nc_selfcollect = nc2nr_auto = nr_selfcollect = 0.0
        nr_evap = ncautr = 0.0
        qi2qv_sublim = nr_ice_shed = qc2qi_hetero = qrcol = 0.0
        qc2qr_ice_shed = qi2qr_melt = qccol = qr2qi_immers = qinuc = 0.0
        ni2nr_melt = nc_collect = ncshdc = nc2ni_immers = nr_collect = 0.0
        ni_selfcollect = ni_nucleat = qidep = qiberg = nr2ni_immers = 0.0
        ni_sublim = qwgrth = 0.0
        rho_qm_cloud = 400.0
        log_wetgrowth = False
        epsi_tot = 0.0
        epsi = 0.0

        skip_to_nucleation = (c["qc_in"][k] < QSMALL and
                              c["qr_in"][k] < QSMALL and
                              c["qi_in"][k] < QSMALL)

        if not skip_to_nucleation:
            # get_time_space_phys_variables (:3538-3585)
            mu = 1.496e-6 * t ** 1.5 / (t + 120.0)
            dv = 8.794e-5 * t ** 1.81 / c["pres"][k]
            sc = mu / (rho * dv)
            dum = 1.0 / (RV * t * t)
            dqsdt = LV * c["qv_sat_l"][k] * dum
            dqsidt = LS * c["qv_sat_i"][k] * dum
            ab = 1.0 + dqsdt * LV * INV_CP
            abi = 1.0 + dqsidt * LS * INV_CP
            kap = 1.414e3 * mu
            if t < 253.15:
                eii = 0.001
            elif t < 273.15:
                eii = 0.001 + (t - 253.15) * (0.3 - 0.001) / 20.0
            else:
                eii = 0.3

            (c["nc_in"][k], mu_c, lamc, cdist, cdist1) = get_cloud_dsd2(
                c["qc_in"][k], c["nc_in"][k], rho)
            c["nc"][k] = c["nc_in"][k] * c["cld_frac_l"][k]
            (c["nr_in"][k], mu_r, lamr, cdistr, logn0r) = get_rain_dsd2(
                c["qr_in"][k], c["nr_in"][k])
            c["nr"][k] = c["nr_in"][k] * c["cld_frac_r"][k]

            c["ni_in"][k] = impose_max_total_ni(c["ni_in"][k], inv_rho)

            tv_fall = tv_self = tv_qccol = tv_melt = 0.0
            tv_lammax = tv_lammin = tv_vent = 0.0
            tv_nrcol = tv_qrcol = 0.0
            if c["qi_in"][k] >= QSMALL:
                c["ni_in"][k] = max(c["ni_in"][k], NSMALL)
                c["nr_in"][k] = max(c["nr_in"][k], NSMALL)
                (c["qm_in"][k], c["bm_in"][k], rhop) = calc_bulk_rho_rime(
                    c["qi_in"][k], c["qm_in"][k], c["bm_in"][k])
                c["qm"][k] = c["qm_in"][k] * c["cld_frac_i"][k]
                c["bm"][k] = c["bm_in"][k] * c["cld_frac_i"][k]
                dumi, dumjj, dumii, dum1, dum4, dum5 = indices_1a(
                    c["qi_in"][k], c["ni_in"][k], c["qm_in"][k], rhop)
                dumj, dum3 = indices_1b(c["qr_in"][k], c["nr_in"][k])
                tv_fall = access_ice(ice_tab, dumjj, dumii, dumi, 2,
                                     dum1, dum4, dum5)
                tv_self = access_ice(ice_tab, dumjj, dumii, dumi, 3,
                                     dum1, dum4, dum5)
                tv_qccol = access_ice(ice_tab, dumjj, dumii, dumi, 4,
                                      dum1, dum4, dum5)
                tv_melt = access_ice(ice_tab, dumjj, dumii, dumi, 5,
                                     dum1, dum4, dum5)
                tv_lammax = access_ice(ice_tab, dumjj, dumii, dumi, 7,
                                       dum1, dum4, dum5)
                tv_lammin = access_ice(ice_tab, dumjj, dumii, dumi, 8,
                                       dum1, dum4, dum5)
                tv_vent = access_ice(ice_tab, dumjj, dumii, dumi, 10,
                                     dum1, dum4, dum5)
                if c["qr_in"][k] >= QSMALL:
                    tv_nrcol = access_coll(coll_tab, dumjj, dumii, dumj,
                                           dumi, 1, dum1, dum3, dum4, dum5)
                    tv_qrcol = access_coll(coll_tab, dumjj, dumii, dumj,
                                           dumi, 2, dum1, dum3, dum4, dum5)
                c["ni_in"][k] = min(c["ni_in"][k],
                                    tv_lammax * c["ni_in"][k])
                c["ni_in"][k] = max(c["ni_in"][k],
                                    tv_lammin * c["ni_in"][k])

            qi_in, ni_in = c["qi_in"][k], c["ni_in"][k]
            qc_in, nc_in = c["qc_in"][k], c["nc_in"][k]
            qr_in, nr_in = c["qr_in"][k], c["nr_in"][k]
            qm_in = c["qm_in"][k]
            rhofaci = c["rhofaci"][k]

            # ice_cldliq_collection (:2054-2100)
            if qi_in >= QSMALL and qc_in >= QSMALL:
                if t <= T_ZERODEGC:
                    qccol = rhofaci * tv_qccol * qc_in * ECI * rho * ni_in
                    nc_collect = rhofaci * tv_qccol * nc_in * ECI * rho * \
                        ni_in
                else:
                    qc2qr_ice_shed = rhofaci * tv_qccol * qc_in * ECI * \
                        rho * ni_in
                    nc_collect = rhofaci * tv_qccol * nc_in * ECI * rho * \
                        ni_in
                    ncshdc = qc2qr_ice_shed * INV_DROPMASS

            # ice_rain_collection (:2103-2157)
            if qi_in >= QSMALL and qr_in >= QSMALL:
                if t <= T_ZERODEGC:
                    qrcol = 10.0 ** (tv_qrcol + logn0r) * rho * rhofaci * \
                        ERI * ni_in
                    nr_collect = 10.0 ** (tv_nrcol + logn0r) * rho * \
                        rhofaci * ERI * ni_in
                else:
                    nr_collect = 10.0 ** (tv_nrcol + logn0r) * rho * \
                        rhofaci * ERI * ni_in

            # ice_self_collection (:2159-2207)
            if qi_in >= QSMALL:
                if qm_in > 0.0:
                    fr = qm_in / qi_in
                    if fr < 0.6:
                        eii_fact = 1.0
                    elif fr < 0.9:
                        eii_fact = 1.0 - (fr - 0.6) / 0.3
                    else:
                        eii_fact = 0.0
                else:
                    eii_fact = 1.0
                ni_selfcollect = tv_self * rho * eii * eii_fact * \
                    rhofaci * ni_in * ni_in

            # ice_melting (:2211-2256)
            if qi_in >= QSMALL and t > T_ZERODEGC:
                qsat0 = qv_sat(T_ZERODEGC, c["pres"][k], 0)
                qi2qr_melt = ((tv_melt + tv_vent * sc ** THRD *
                               math.sqrt(rhofaci * rho / mu)) *
                              ((t - T_ZERODEGC) * kap - rho * LV * dv *
                               (qsat0 - c["qv"][k])) * 2.0 * PI / LF) * \
                    ni_in
                qi2qr_melt = max(qi2qr_melt, 0.0)
                ni2nr_melt = qi2qr_melt * (ni_in / qi_in)

            # ice_cldliq_wet_growth (:2259-2319)
            if qi_in >= QSMALL and qc_in + qr_in >= 1e-6 and \
                    t < T_ZERODEGC:
                qsat0 = qv_sat(T_ZERODEGC, c["pres"][k], 0)
                qwgrth = ((tv_melt + tv_vent * sc ** THRD *
                           math.sqrt(rhofaci * rho / mu)) * 2.0 * PI *
                          (rho * LV * dv * (qsat0 - c["qv"][k]) -
                           (t - T_ZERODEGC) * kap) /
                          (LF + CPW * (t - T_ZERODEGC))) * ni_in
                qwgrth = max(qwgrth, 0.0)
                dum_w = max(0.0, (qccol + qrcol) - qwgrth)
                if dum_w >= 1e-10:
                    nr_ice_shed += dum_w * 1.923e6
                    if (qccol + qrcol) >= 1e-10:
                        dum1w = 1.0 / (qccol + qrcol)
                        qc2qr_ice_shed += dum_w * qccol * dum1w
                        qccol = max(0.0, qccol - dum_w * qccol * dum1w)
                        qrcol = max(0.0, qrcol - dum_w * qrcol * dum1w)
                    log_wetgrowth = True

            # calc_ice_relaxation_timescale (:2322-2355)
            if qi_in >= QSMALL and t < T_ZERODEGC:
                epsi = ((tv_melt + tv_vent * sc ** THRD *
                         math.sqrt(rhofaci * rho / mu)) * 2.0 * PI *
                        rho * dv) * ni_in
                epsi_tot += epsi
            else:
                epsi = 0.0

            # calc_rime_density (:2413-2490)
            if qccol >= QSMALL and t < T_ZERODEGC:
                vtrmi1 = tv_fall * rhofaci
                iTc = 1.0 / min(-0.001, t - T_ZERODEGC)
                if qc_in >= QSMALL:
                    vt_qc = c["acn"][k] * math.gamma(4.0 + BCN + mu_c) / \
                        (lamc ** BCN * math.gamma(mu_c + 4.0))
                    d_c = (mu_c + 4.0) / lamc
                    v_imp = abs(vtrmi1 - vt_qc)
                    Ri = -0.5e6 * d_c * v_imp * iTc
                    Ri = max(1.0, min(Ri, 12.0))
                    if Ri <= 8.0:
                        rho_qm_cloud = (0.051 + 0.114 * Ri -
                                        0.0055 * Ri * Ri) * 1000.0
                    else:
                        rho_qm_cloud = 611.0 + 72.25 * (Ri - 8.0)
                else:
                    rho_qm_cloud = 400.0
            else:
                rho_qm_cloud = 400.0

            # cldliq_immersion_freezing (:2504-2538)
            if qc_in >= QSMALL and t <= T_RAINFRZ:
                dum1f = math.exp(AIMM * (T_ZERODEGC - t))
                dum2f = (1.0 / lamc) ** 3
                qc2qi_hetero = CONS6 * cdist1 * math.gamma(7.0 + mu_c) * \
                    dum1f * dum2f ** 2
                nc2ni_immers = CONS5 * cdist1 * math.gamma(mu_c + 4.0) * \
                    dum1f * dum2f

            # rain_immersion_freezing (:2540-2573)
            if qr_in >= QSMALL and t <= T_RAINFRZ:
                dum1f = math.exp(AIMM * (T_ZERODEGC - t))
                qr2qi_immers = CONS6 * math.exp(
                    math.log(cdistr) + math.log(math.gamma(7.0 + mu_r)) -
                    6.0 * math.log(lamr)) * dum1f
                nr2ni_immers = CONS5 * math.exp(
                    math.log(cdistr) + math.log(math.gamma(mu_r + 4.0)) -
                    3.0 * math.log(lamr)) * dum1f

            # calc_liq_relaxation_timescale (:2358-2410)
            if qr_in >= QSMALL:
                dumii3, dumjj3, rdumii3, rdumjj3 = indices_3(mu_r, lamr)
                rv_val = access_rain(revap_tab, dumii3, dumjj3, rdumii3,
                                     rdumjj3)
                epsr = 2.0 * PI * cdistr * rho * dv * \
                    (F1R * math.gamma(mu_r + 2.0) / lamr +
                     F2R * math.sqrt(rho / mu) * sc ** THRD * rv_val)
            else:
                epsr = 0.0

            # evaporate_rain (:3383-3536)
            ssat_r = c["qv"][k] - c["qv_sat_l"][k]
            if qc_in + qi_in < 1e-6:
                cld_frac = 0.0
            else:
                cld_frac = c["cld_frac_l"][k]
            if (c["cld_frac_r"][k] > cld_frac and ssat_r < 0.0 and
                    qr_in >= QSMALL):
                if t < 273.15:
                    eps_eff = epsr + epsi_tot * \
                        (1.0 + LS * INV_CP * dqsdt) / abi
                else:
                    eps_eff = epsr
                eps_eff = max(1e-20, eps_eff)
                tau_eff = 1.0 / eps_eff
                if t < 273.15:
                    A_c = (c["qv"][k] - c["qv_prev"][k]) * inv_dt - \
                        dqsdt * (t - c["t_prev"][k]) * inv_dt - \
                        (c["qv_sat_l"][k] - c["qv_sat_i"][k]) * \
                        (1.0 + LS * INV_CP * dqsdt) / abi * epsi_tot
                else:
                    A_c = (c["qv"][k] - c["qv_prev"][k]) * inv_dt - \
                        dqsdt * (t - c["t_prev"][k]) * inv_dt
                if qr_in < 1e-12 and \
                        c["qv"][k] / c["qv_sat_l"][k] < 0.999:
                    qr2qv_evap = qr_in * inv_dt
                else:
                    dt_tau = dt / tau_eff
                    tscale_w = -math.expm1(-dt_tau) / dt_tau
                    tau_r = 1.0 / epsr
                    equil = -A_c / ab * tau_eff / tau_r
                    instant = -ssat_r / (ab * tau_r)
                    qr2qv_evap = instant * tscale_w + \
                        equil * (1.0 - tscale_w)
                qr2qv_evap = min(qr2qv_evap, -ssat_r * inv_dt / ab)
                qr2qv_evap = max(0.0, qr2qv_evap)
                qr2qv_evap = min(qr2qv_evap, qr_in * inv_dt)
                qr2qv_evap = qr2qv_evap * (c["cld_frac_r"][k] - cld_frac) \
                    / c["cld_frac_r"][k]
                nr_evap = qr2qv_evap * (nr_in / qr_in)

            # ice_deposition_sublimation (:3268-3333)
            if qi_in > QSMALL:
                qi_tend = min(epsi / abi, inv_dt) * \
                    (c["qv"][k] - c["qv_sat_i"][k])
                if qi_tend < 0.0:
                    qi2qv_sublim = -qi_tend
                    ni_sublim = qi2qv_sublim * (ni_in / qi_in)
                if t < T_ZERODEGC:
                    if qi_tend >= 0.0:
                        qidep = qi_tend
                    qiberg = max(epsi / abi * (c["qv_sat_l"][k] -
                                               c["qv_sat_i"][k]), 0.0)

        # 444: ice_nucleation (:2576-2618; prescribed-CCN -> Cooper branch)
        if t < T_ICENUC and c["sup_i"][k] >= 0.05:
            dum_n = 0.005 * math.exp(0.304 * (T_ZERODEGC - t)) * 1000.0 * \
                c["inv_rho"][k]
            dum_n = min(dum_n, 100.0e3 * c["inv_rho"][k])
            N_nuc = max(0.0, (dum_n - c["ni"][k]) * inv_dt)
            if N_nuc >= 1e-20:
                qinuc = max(0.0, (dum_n - c["ni"][k]) * MI0 * inv_dt)
                ni_nucleat = N_nuc

        # cloud_water_autoconversion (:2750-2784)
        if c["qc_in"][k] >= 1e-8:
            qc2qr_auto = 1350.0 * c["qc_in"][k] ** 2.47 * \
                (c["nc_in"][k] * 1e-6 * c["rho"][k]) ** (-1.79)
            ncautr = qc2qr_auto * CONS3
            nc2nr_auto = qc2qr_auto * c["nc_in"][k] / c["qc_in"][k]
            if qc2qr_auto == 0.0:
                nc2nr_auto = 0.0
            if nc2nr_auto == 0.0:
                qc2qr_auto = 0.0

        # droplet_self_collection: iparam=3 -> 0 (:2646-2648)

        # cloud_rain_accretion (:2655-2703)
        if c["qr_in"][k] >= QSMALL and c["qc_in"][k] >= QSMALL:
            qc2qr_accret = 67.0 * (c["qc_in"][k] * c["qr_in"][k]) ** 1.15
            nc_accret = qc2qr_accret * c["nc_in"][k] / c["qc_in"][k]
            if qc2qr_accret == 0.0:
                nc_accret = 0.0
            if nc_accret == 0.0:
                qc2qr_accret = 0.0

        # rain_self_collection (:2705-2747)
        if c["qr_in"][k] >= QSMALL:
            dum2r = (c["qr_in"][k] / (PI * RHO_H2O *
                                      c["nr_in"][k])) ** THRD
            if dum2r < 280e-6:
                dumr = 1.0
            else:
                dumr = 2.0 - math.exp(2300.0 * (dum2r - 280e-6))
            nr_selfcollect = dumr * 5.78 * c["nr_in"][k] * \
                c["qr_in"][k] * c["rho"][k]

        # back_to_cell_average (:2786-2854)
        cl, cr, ci = (c["cld_frac_l"][k], c["cld_frac_r"][k],
                      c["cld_frac_i"][k])
        ir, il, lr = min(ci, cr), min(ci, cl), min(cl, cr)
        qc2qr_accret *= lr
        qr2qv_evap *= cr
        qc2qr_auto *= cl
        nc_accret *= lr
        nc_selfcollect *= cl
        nc2nr_auto *= cl
        nr_selfcollect *= cr
        nr_evap *= cr
        ncautr *= lr
        qi2qv_sublim *= ci
        nr_ice_shed *= il
        qc2qi_hetero *= il
        qrcol *= ir
        qc2qr_ice_shed *= il
        qi2qr_melt *= ci
        qccol *= il
        qr2qi_immers *= cr
        ni2nr_melt *= ci
        nc_collect *= il
        ncshdc *= il
        nc2ni_immers *= cl
        nr_collect *= ir
        ni_selfcollect *= ci
        qidep *= ci
        nr2ni_immers *= cr
        ni_sublim *= ci
        qiberg *= il

        # cloud_water_conservation (:3028-3061)
        sinks = (qc2qr_auto + qc2qr_accret + qccol + qc2qi_hetero +
                 qc2qr_ice_shed + qiberg) * dt
        if sinks > c["qc"][k] and sinks >= 1e-20:
            ratio = c["qc"][k] / sinks
            qc2qr_auto *= ratio
            qc2qr_accret *= ratio
            qccol *= ratio
            qc2qi_hetero *= ratio
            qc2qr_ice_shed *= ratio
            qiberg *= ratio
        else:
            ratio = 1.0
        if c["qc"][k] > 1e-20:
            qidep *= (1.0 - ratio)
            qi2qv_sublim *= (1.0 - ratio)

        # rain_water_conservation (:3063-3082)
        sinks = (qr2qv_evap + qrcol + qr2qi_immers) * dt
        sources = c["qr"][k] + (qc2qr_auto + qc2qr_accret + qi2qr_melt +
                                qc2qr_ice_shed) * dt
        if sinks > sources and sinks >= 1e-20:
            ratio = sources / sinks
            qr2qv_evap *= ratio
            qrcol *= ratio
            qr2qi_immers *= ratio

        # ice_water_conservation (:3084-3102)
        sinks = (qi2qv_sublim + qi2qr_melt) * dt
        sources = c["qi"][k] + (qidep + qinuc + qrcol + qccol +
                                qr2qi_immers + qc2qi_hetero + qiberg) * dt
        if sinks > sources and sinks >= 1e-20:
            ratio = sources / sinks
            qi2qv_sublim *= ratio
            qi2qr_melt *= ratio

        # nc/nr/ni_conservation (:2957-3026)
        sink_nc = (nc_collect + nc2ni_immers + nc_accret + nc2nr_auto) * dt
        source_nc = c["nc"][k] + nc_selfcollect * dt
        if sink_nc > source_nc:
            ratio = source_nc / sink_nc
            nc_collect *= ratio
            nc2ni_immers *= ratio
            nc_accret *= ratio
            nc2nr_auto *= ratio
        sink_nr = (nr_collect + nr2ni_immers + nr_selfcollect +
                   nr_evap) * dt
        source_nr = c["nr"][k] + (ni2nr_melt * NMLTRATIO + nr_ice_shed +
                                  ncshdc + nc2nr_auto) * dt
        if sink_nr > source_nr:
            ratio = source_nr / sink_nr
            nr_collect *= ratio
            nr2ni_immers *= ratio
            nr_selfcollect *= ratio
            nr_evap *= ratio
        sink_ni = (ni2nr_melt + ni_sublim + ni_selfcollect) * dt
        source_ni = c["ni"][k] + (ni_nucleat + nr2ni_immers +
                                  nc2ni_immers) * dt
        if sink_ni > source_ni:
            ratio = source_ni / sink_ni
            ni2nr_melt *= ratio
            ni_sublim *= ratio
            ni_selfcollect *= ratio

        # ice_supersat_conservation (:2856-2886)
        qv_sink = qidep + qinuc
        if qv_sink > QSMALL and ci > 1e-20:
            T_here = c["th"][k] / c["inv_exner"][k]
            qv_avail = (c["qv"][k] + (qi2qv_sublim + qr2qv_evap) * dt -
                        c["qv_sat_i"][k]) / \
                (1.0 + LS ** 2 * c["qv_sat_i"][k] /
                 (CP * RV * T_here * T_here)) / dt
            qv_avail = max(qv_avail, 0.0)
            if qv_sink > qv_avail:
                fract = qv_avail / qv_sink
                qinuc *= fract
                qidep *= fract

        # prevent_liq_supersaturation (:2888-2955)
        qv_sources = qi2qv_sublim + qr2qv_evap
        if qv_sources >= QSMALL:
            qv_sinks = qidep + qinuc
            qv_end = c["qv"][k] - qv_sinks * dt + qv_sources * dt
            T_end = t + ((qv_sinks - qi2qv_sublim) * LS * INV_CP -
                         qr2qv_evap * LV * INV_CP) * dt
            qsl = qv_sat(T_end, c["pres"][k], 0)
            A = LV * qsl * dt * INV_CP / (RV * T_end * T_end) * \
                (LS * qi2qv_sublim + LV * qr2qv_evap)
            frac = (qsl - c["qv"][k] + qv_sinks * dt + A) / \
                (qv_sources * dt + A)
            frac = min(1.0, max(0.0, frac))
            qi2qv_sublim *= frac
            qr2qv_evap *= frac

        # update_prognostic_ice (:3105-3214)
        c["qc"][k] += (-qc2qi_hetero - qccol - qc2qr_ice_shed -
                       qiberg) * dt
        c["nc"][k] += (-nc_collect - nc2ni_immers) * dt  # do_predict_nc
        c["qr"][k] += (-qrcol + qi2qr_melt - qr2qi_immers +
                       qc2qr_ice_shed) * dt
        c["nr"][k] += (-nr_collect - nr2ni_immers +
                       NMLTRATIO * ni2nr_melt + nr_ice_shed + ncshdc) * dt
        if c["qi"][k] >= QSMALL:
            decay = (qi2qv_sublim + qi2qr_melt) / c["qi"][k] * dt
            c["bm"][k] -= decay * c["bm"][k]
            c["qm"][k] -= decay * c["qm"][k]
            c["qi"][k] -= (qi2qv_sublim + qi2qr_melt) * dt
        dum_i = (qrcol + qccol + qr2qi_immers + qc2qi_hetero) * dt
        c["qi"][k] += (qidep + qinuc + qiberg) * dt + dum_i
        c["qm"][k] += dum_i
        c["bm"][k] += (qrcol * INV_RHO_RIMEMAX + qccol / rho_qm_cloud +
                       (qr2qi_immers + qc2qi_hetero) *
                       INV_RHO_RIMEMAX) * dt
        c["ni"][k] += (ni_nucleat - ni2nr_melt - ni_sublim -
                       ni_selfcollect + nr2ni_immers + nc2ni_immers) * dt
        if c["qm"][k] < 0.0:
            c["qm"][k] = 0.0
            c["bm"][k] = 0.0
        if log_wetgrowth:
            c["qm"][k] = c["qi"][k]
            c["bm"][k] = c["qm"][k] * INV_RHO_RIMEMAX
        c["qv"][k] += (-qidep + qi2qv_sublim - qinuc) * dt
        c["th"][k] += c["inv_exner"][k] * (
            (qidep - qi2qv_sublim + qinuc) * LS * INV_CP +
            (qrcol + qccol + qc2qi_hetero + qr2qi_immers - qi2qr_melt +
             qiberg) * LF * INV_CP) * dt

        # update_prognostic_liquid (:3216-3266)
        c["qc"][k] += (-qc2qr_accret - qc2qr_auto) * dt
        c["qr"][k] += (qc2qr_accret + qc2qr_auto - qr2qv_evap) * dt
        c["nc"][k] += (-nc_accret - nc2nr_auto + nc_selfcollect) * dt
        c["nr"][k] += (ncautr - nr_selfcollect - nr_evap) * dt
        c["qv"][k] += qr2qv_evap * dt
        c["th"][k] += c["inv_exner"][k] * (-qr2qv_evap * LV * INV_CP) * dt

        # diagnostics (:883-889)
        c["liq_ice_exchange"][k] = qc2qi_hetero + qr2qi_immers - \
            qi2qr_melt + qiberg + qccol + qrcol
        c["vap_liq_exchange"][k] = -qr2qv_evap
        c["vap_ice_exchange"][k] = qidep - qi2qv_sublim + qinuc

        # clipping (:892-919)
        if c["qc"][k] < QSMALL:
            c["qv"][k] += c["qc"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qc"][k] * LV * INV_CP
            c["qc"][k] = 0.0
            c["nc"][k] = 0.0
        if c["qr"][k] < QSMALL:
            c["qv"][k] += c["qr"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qr"][k] * LV * INV_CP
            c["qr"][k] = 0.0
            c["nr"][k] = 0.0
        if c["qi"][k] < QSMALL:
            c["qv"][k] += c["qi"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qi"][k] * LS * INV_CP
            c["qi"][k] = 0.0
            c["ni"][k] = 0.0
            c["qm"][k] = 0.0
            c["bm"][k] = 0.0

        # impose_max_total_ni on recomputed incld (:921-925)
        ni_in2 = c["ni"][k] / c["cld_frac_i"][k]
        ni_in2 = impose_max_total_ni(ni_in2, c["inv_rho"][k])
        c["ni"][k] = ni_in2 * c["cld_frac_i"][k]

        # recalc in-cloud for sedimentation (:968-972)
        (c["qc_in"][k], c["qr_in"][k], c["qi_in"][k], c["qm_in"][k],
         c["nc_in"][k], c["nr_in"][k], c["ni_in"][k], c["bm_in"][k]) = \
            calc_incloud(c["qc"][k], c["qr"][k], c["qi"][k], c["qm"][k],
                         c["nc"][k], c["nr"][k], c["ni"][k], c["bm"][k],
                         c["icl"][k], c["ici"][k], c["icr"][k])


# ---------------------------------------------------------------------------
# sedimentation (:3587-4143): faithful moving-window do-while loops
# ---------------------------------------------------------------------------
def _upwind_window(q_list, v_list, rho, inv_rho, inv_dz, dt_sub, k_low,
                   k_top):
    """calc_first_order_upwind_step for cells k_top..k_low (k increases
    downward). Returns the surface-most computed flux of species 0."""
    nz = len(rho)
    fluxes = [v * q * rho for q, v in zip(q_list, v_list)]
    for i, q in enumerate(q_list):
        f = fluxes[i]
        q[k_top] += -f[k_top] * inv_dz[k_top] * dt_sub * inv_rho[k_top]
        for k in range(k_top + 1, k_low + 1):
            fluxdiv = (f[k - 1] - f[k]) * inv_dz[k]
            q[k] += fluxdiv * dt_sub * inv_rho[k]
    return fluxes[0]


def _generalized_sed(co_max, dt_left, k_qxbot, kbot):
    nsub = int(co_max + 1.0)
    dt_sub = min(dt_left, dt_left / float(nsub))
    if k_qxbot == kbot:
        k_temp = k_qxbot
    else:
        k_temp = k_qxbot + 1
    return dt_sub, k_temp


def cloud_sed(c, dt):
    """cloud_sedimentation, do_predict_nc branch (:3665-3723)."""
    nz = len(c["qc"])
    kbot = nz - 1
    k_qxtop = None
    for k in range(nz):
        if c["qc"][k] >= QSMALL:
            k_qxtop = k
            break
    if k_qxtop is None:
        return 0.0
    k_qxbot = kbot
    for k in range(kbot, k_qxtop - 1, -1):
        if c["qc"][k] >= QSMALL:
            k_qxbot = k
            break
    dt_left = dt
    prt_accum = 0.0
    V_qc = np.zeros(nz)
    V_nc = np.zeros(nz)
    while dt_left > 1e-4:
        co_max = 0.0
        V_qc[:] = 0.0
        V_nc[:] = 0.0
        for k in range(k_qxtop, k_qxbot + 1):
            if c["qc_in"][k] > QSMALL:
                (c["nc_in"][k], mu_c, lamc, _, _) = get_cloud_dsd2(
                    c["qc_in"][k], c["nc_in"][k], c["rho"][k])
                c["nc"][k] = c["nc_in"][k] * c["cld_frac_l"][k]
                dum = 1.0 / lamc ** BCN
                V_qc[k] = c["acn"][k] * math.gamma(4.0 + BCN + mu_c) * \
                    dum / math.gamma(mu_c + 4.0)
                V_nc[k] = c["acn"][k] * math.gamma(1.0 + BCN + mu_c) * \
                    dum / math.gamma(mu_c + 1.0)
            co_max = max(co_max, V_qc[k] * dt_left * c["inv_dz"][k])
        dt_sub, k_temp = _generalized_sed(co_max, dt_left, k_qxbot, kbot)
        flux_q = _upwind_window([c["qc"], c["nc"]], [V_qc, V_nc],
                                c["rho"], c["inv_rho"], c["inv_dz"],
                                dt_sub, k_temp, k_qxtop)
        if k_qxbot == kbot:
            prt_accum += flux_q[kbot] * dt_sub
        dt_left -= dt_sub
        if k_qxbot != kbot:
            k_qxbot += 1
        c["qc_in"] = c["qc"] / c["cld_frac_l"]
        c["nc_in"] = c["nc"] / c["cld_frac_l"]
    return prt_accum * INV_RHO_H2O / dt


def rain_sed(c, dt):
    """rain_sedimentation (:3749-3870)."""
    vn_tab, vm_tab, _ = rain_tables()
    nz = len(c["qr"])
    kbot = nz - 1
    k_qxtop = None
    for k in range(nz):
        if c["qr"][k] >= QSMALL:
            k_qxtop = k
            break
    if k_qxtop is None:
        return 0.0
    k_qxbot = kbot
    for k in range(kbot, k_qxtop - 1, -1):
        if c["qr"][k] >= QSMALL:
            k_qxbot = k
            break
    dt_left = dt
    prt_accum = 0.0
    V_qr = np.zeros(nz)
    V_nr = np.zeros(nz)
    while dt_left > 1e-4:
        co_max = 0.0
        V_qr[:] = 0.0
        V_nr[:] = 0.0
        for k in range(k_qxtop, k_qxbot + 1):
            if c["qr_in"][k] > QSMALL:
                (c["nr_in"][k], mu_r, lamr, _, _) = get_rain_dsd2(
                    c["qr_in"][k], c["nr_in"][k])
                dumii, dumjj, rdumii, rdumjj = indices_3(mu_r, lamr)
                V_qr[k] = access_rain(vm_tab, dumii, dumjj, rdumii,
                                      rdumjj) * c["rhofacr"][k]
                V_nr[k] = access_rain(vn_tab, dumii, dumjj, rdumii,
                                      rdumjj) * c["rhofacr"][k]
                c["nr"][k] = c["nr_in"][k] * c["cld_frac_r"][k]
            co_max = max(co_max, V_qr[k] * dt_left * c["inv_dz"][k])
        dt_sub, k_temp = _generalized_sed(co_max, dt_left, k_qxbot, kbot)
        flux_q = _upwind_window([c["qr"], c["nr"]], [V_qr, V_nr],
                                c["rho"], c["inv_rho"], c["inv_dz"],
                                dt_sub, k_temp, k_qxtop)
        if k_qxbot == kbot:
            prt_accum += flux_q[kbot] * dt_sub
        dt_left -= dt_sub
        if k_qxbot != kbot:
            k_qxbot += 1
        c["qr_in"] = c["qr"] / c["cld_frac_r"]
        c["nr_in"] = c["nr"] / c["cld_frac_r"]
    return prt_accum * INV_RHO_H2O / dt


def ice_sed(c, dt):
    """ice_sedimentation (:3911-4065)."""
    ice_tab, _ = ice_tables()
    nz = len(c["qi"])
    kbot = nz - 1
    k_qxtop = None
    for k in range(nz):
        if c["qi"][k] >= QSMALL:
            k_qxtop = k
            break
    if k_qxtop is None:
        return 0.0
    k_qxbot = kbot
    for k in range(kbot, k_qxtop - 1, -1):
        if c["qi"][k] >= QSMALL:
            k_qxbot = k
            break
    dt_left = dt
    prt_accum = 0.0
    V_qit = np.zeros(nz)
    V_nit = np.zeros(nz)
    while dt_left > 1e-4:
        co_max = 0.0
        V_qit[:] = 0.0
        V_nit[:] = 0.0
        for k in range(k_qxtop, k_qxbot + 1):
            if c["qi_in"][k] > QSMALL:
                c["ni_in"][k] = max(c["ni_in"][k], NSMALL)
                (c["qm_in"][k], c["bm_in"][k], rhop) = calc_bulk_rho_rime(
                    c["qi_in"][k], c["qm_in"][k], c["bm_in"][k])
                c["qm"][k] = c["qm_in"][k] * c["cld_frac_i"][k]
                c["bm"][k] = c["bm_in"][k] * c["cld_frac_i"][k]
                dumi, dumjj, dumii, dum1, dum4, dum5 = indices_1a(
                    c["qi_in"][k], c["ni_in"][k], c["qm_in"][k], rhop)
                tv_nfall = access_ice(ice_tab, dumjj, dumii, dumi, 1,
                                      dum1, dum4, dum5)
                tv_qfall = access_ice(ice_tab, dumjj, dumii, dumi, 2,
                                      dum1, dum4, dum5)
                tv_lammax = access_ice(ice_tab, dumjj, dumii, dumi, 7,
                                       dum1, dum4, dum5)
                tv_lammin = access_ice(ice_tab, dumjj, dumii, dumi, 8,
                                       dum1, dum4, dum5)
                c["ni_in"][k] = min(c["ni_in"][k],
                                    tv_lammax * c["ni_in"][k])
                c["ni_in"][k] = max(c["ni_in"][k],
                                    tv_lammin * c["ni_in"][k])
                c["ni"][k] = c["ni_in"][k] * c["cld_frac_i"][k]
                V_qit[k] = tv_qfall * c["rhofaci"][k]
                V_nit[k] = tv_nfall * c["rhofaci"][k]
            co_max = max(co_max, V_qit[k] * dt_left * c["inv_dz"][k])
        dt_sub, k_temp = _generalized_sed(co_max, dt_left, k_qxbot, kbot)
        flux_q = _upwind_window(
            [c["qi"], c["ni"], c["qm"], c["bm"]],
            [V_qit, V_nit, V_qit, V_qit],
            c["rho"], c["inv_rho"], c["inv_dz"], dt_sub, k_temp, k_qxtop)
        if k_qxbot == kbot:
            prt_accum += flux_q[kbot] * dt_sub
        dt_left -= dt_sub
        if k_qxbot != kbot:
            k_qxbot += 1
        c["qi_in"] = c["qi"] / c["cld_frac_i"]
        c["ni_in"] = c["ni"] / c["cld_frac_i"]
        c["qm_in"] = c["qm"] / c["cld_frac_i"]
        c["bm_in"] = c["bm"] / c["cld_frac_i"]
    return prt_accum * INV_RHO_H2O / dt


# ---------------------------------------------------------------------------
# homogeneous freezing (:4147-4203) + part3 (:977-1137)
# ---------------------------------------------------------------------------
def homogeneous(c):
    nz = len(c["qc"])
    for k in range(nz - 1, -1, -1):
        if c["qc"][k] >= QSMALL and c["t"][k] < T_HOMOGFRZ:
            Q_nuc = c["qc"][k]
            N_nuc = max(c["nc"][k], NSMALL)
            c["qm"][k] += Q_nuc
            c["qi"][k] += Q_nuc
            c["bm"][k] += Q_nuc * INV_RHO_RIMEMAX
            c["ni"][k] += N_nuc
            c["th"][k] += c["inv_exner"][k] * Q_nuc * LF * INV_CP
            c["qc"][k] = 0.0
            c["nc"][k] = 0.0
        if c["qr"][k] >= QSMALL and c["t"][k] < T_HOMOGFRZ:
            Q_nuc = c["qr"][k]
            N_nuc = max(c["nr"][k], NSMALL)
            c["qm"][k] += Q_nuc
            c["qi"][k] += Q_nuc
            c["bm"][k] += Q_nuc * INV_RHO_RIMEMAX
            c["ni"][k] += N_nuc
            c["th"][k] += c["inv_exner"][k] * Q_nuc * LF * INV_CP
            c["qr"][k] = 0.0
            c["nr"][k] = 0.0


def part3(c):
    """p3_main_part3 (:977-1137) incl. the diagnostic outputs: effective
    radii, radar reflectivities (ze_rain/ze_ice/dBZ), mass-weighted ice
    fall speed / mean diameter / bulk density, and the vap_liq_exchange
    updates of the clipping branches (:1030-1032, 1056-1058)."""
    ice_tab, _ = ice_tables()
    nz = len(c["qc"])
    for name, init in (("diag_eff_radius_qc", 10.0e-6),
                       ("diag_eff_radius_qi", 25.0e-6),
                       ("ze_rain", 0.0), ("ze_ice", 0.0),
                       ("diag_vm_qi", 0.0), ("diag_diam_qi", 0.0),
                       ("rho_qi", 0.0), ("diag_equiv_reflectivity", 0.0)):
        c[name] = np.full(nz, init)
    for k in range(nz - 1, -1, -1):
        # cloud
        if c["qc"][k] >= QSMALL:
            qc_in = c["qc"][k] / c["cld_frac_l"][k]
            nc_in = c["nc"][k] / c["cld_frac_l"][k]
            nc_in, mu_c, lamc, _, _ = get_cloud_dsd2(qc_in, nc_in,
                                                     c["rho"][k])
            c["diag_eff_radius_qc"][k] = 0.5 * (mu_c + 3.0) / lamc
            c["nc"][k] = nc_in * c["cld_frac_l"][k]
        else:
            c["qv"][k] += c["qc"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qc"][k] * LV * INV_CP
            c["vap_liq_exchange"][k] -= c["qc"][k]
            c["qc"][k] = 0.0
            c["nc"][k] = 0.0
        # rain
        if c["qr"][k] >= QSMALL:
            qr_in = c["qr"][k] / c["cld_frac_r"][k]
            nr_in = c["nr"][k] / c["cld_frac_r"][k]
            nr_in, mu_r, lamr, _, _ = get_rain_dsd2(qr_in, nr_in)
            c["nr"][k] = nr_in * c["cld_frac_r"][k]
            ze = (c["nr"][k] * (mu_r + 6.0) * (mu_r + 5.0) * (mu_r + 4.0) *
                  (mu_r + 3.0) * (mu_r + 2.0) * (mu_r + 1.0) / lamr ** 6)
            c["ze_rain"][k] = max(ze, 1e-22)
        else:
            c["qv"][k] += c["qr"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qr"][k] * LV * INV_CP
            c["vap_liq_exchange"][k] -= c["qr"][k]
            c["qr"][k] = 0.0
            c["nr"][k] = 0.0
        # ice
        if c["qi"][k] >= QSMALL:
            c["ni"][k] = max(c["ni"][k], NSMALL)
            qi_in = c["qi"][k] / c["cld_frac_i"][k]
            ni_in = c["ni"][k] / c["cld_frac_i"][k]
            qm_in = c["qm"][k] / c["cld_frac_i"][k]
            bm_in = c["bm"][k] / c["cld_frac_i"][k]
            qm_in, bm_in, rhop = calc_bulk_rho_rime(qi_in, qm_in, bm_in)
            c["qm"][k] = qm_in * c["cld_frac_i"][k]
            c["bm"][k] = bm_in * c["cld_frac_i"][k]
            ni_in = impose_max_total_ni(ni_in, c["inv_rho"][k])
            dumi, dumjj, dumii, dum1, dum4, dum5 = indices_1a(
                qi_in, max(ni_in, NSMALL), qm_in, rhop)
            tv_fallspd = access_ice(ice_tab, dumjj, dumii, dumi, 2,
                                    dum1, dum4, dum5)
            tv_eff_rad = access_ice(ice_tab, dumjj, dumii, dumi, 6,
                                    dum1, dum4, dum5)
            tv_lammax = access_ice(ice_tab, dumjj, dumii, dumi, 7,
                                   dum1, dum4, dum5)
            tv_lammin = access_ice(ice_tab, dumjj, dumii, dumi, 8,
                                   dum1, dum4, dum5)
            tv_refl = access_ice(ice_tab, dumjj, dumii, dumi, 9,
                                 dum1, dum4, dum5)
            tv_diam = access_ice(ice_tab, dumjj, dumii, dumi, 11,
                                 dum1, dum4, dum5)
            tv_bulk = access_ice(ice_tab, dumjj, dumii, dumi, 12,
                                 dum1, dum4, dum5)
            ni_in = min(ni_in, tv_lammax * ni_in)
            ni_in = max(ni_in, tv_lammin * ni_in)
            c["ni"][k] = ni_in * c["cld_frac_i"][k]
            if c["qm"][k] < QSMALL:
                c["qm"][k] = 0.0
                c["bm"][k] = 0.0
            c["diag_vm_qi"][k] = tv_fallspd * c["rhofaci"][k]
            c["diag_eff_radius_qi"][k] = tv_eff_rad
            c["diag_diam_qi"][k] = tv_diam
            c["rho_qi"][k] = tv_bulk
            ze_i = c["ze_ice"][k] + 0.1892 * tv_refl * ni_in * c["rho"][k]
            ze_i = max(ze_i, 1e-22)
            c["ze_ice"][k] = ze_i * c["cld_frac_i"][k]
        else:
            c["qv"][k] += c["qi"][k]
            c["th"][k] -= c["inv_exner"][k] * c["qi"][k] * LS * INV_CP
            c["qi"][k] = 0.0
            c["ni"][k] = 0.0
            c["qm"][k] = 0.0
            c["bm"][k] = 0.0
            c["diag_diam_qi"][k] = 0.0
        with np.errstate(divide="ignore"):
            c["diag_equiv_reflectivity"][k] = 10.0 * np.log10(
                (c["ze_rain"][k] + c["ze_ice"][k]) * 1e18)
        if c["qr"][k] < QSMALL:
            c["nr"][k] = 0.0


# ---------------------------------------------------------------------------
# full p3_main (:1140-1507)
# ---------------------------------------------------------------------------
def p3_main_oracle(col, dt):
    """col: dict of (nz,) f64 arrays: qc nc qr nr qv th qi qm ni bm pres dz
    dpres inv_exner qv_prev t_prev cld_frac_i cld_frac_l cld_frac_r
    nc_nuceat_tend ni_activated inv_qc_relvar nccn_prescribed.
    Returns (state dict, precip_liq_surf, precip_ice_surf)."""
    nz = len(col["qc"])
    c = {k: np.array(v, dtype=np.float64) for k, v in col.items()}
    c["exner"] = 1.0 / c["inv_exner"]
    c["t"] = c["th"] * c["exner"]
    c["qv"] = np.maximum(c["qv"], 0.0)
    c["inv_dz"] = 1.0 / c["dz"]
    c["icl"] = 1.0 / c["cld_frac_l"]
    c["ici"] = 1.0 / c["cld_frac_i"]
    c["icr"] = 1.0 / c["cld_frac_r"]
    for name in ("rho", "inv_rho", "qv_sat_l", "qv_sat_i", "sup_i",
                 "rhofacr", "rhofaci", "acn", "qc_in", "qr_in", "qi_in",
                 "qm_in", "nc_in", "nr_in", "ni_in", "bm_in",
                 "liq_ice_exchange", "vap_liq_exchange",
                 "vap_ice_exchange"):
        c[name] = np.zeros(nz)

    is_nucleat_possible, is_hydromet_present = part1(c, dt)
    prt_liq = prt_ice = 0.0
    if is_nucleat_possible or is_hydromet_present:
        part2(c, dt)
        # (the Fortran re-checks is_hydromet_present after part2; running
        # sedimentation/part3 with no hydrometeors is a no-op either way)
        prt_liq = cloud_sed(c, dt)
        prt_liq += rain_sed(c, dt)
        prt_ice = ice_sed(c, dt)
        homogeneous(c)
        part3(c)
    state = {k: c[k] for k in ("qc", "nc", "qr", "nr", "qv", "th", "qi",
                               "ni", "qm", "bm")}
    diag_keys = ("diag_eff_radius_qc", "diag_eff_radius_qi", "ze_rain",
                 "ze_ice", "diag_vm_qi", "diag_diam_qi", "rho_qi",
                 "diag_equiv_reflectivity", "vap_liq_exchange",
                 "liq_ice_exchange", "vap_ice_exchange")
    diag = {k: c[k] for k in diag_keys if k in c}
    return state, prt_liq, prt_ice, diag
