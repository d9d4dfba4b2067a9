"""Scalar/loop numpy oracle of the SPAM extruded model's SI step.

Independent golden reference for the PAM-C dycore (VERDICT r3 item 2): a
fresh per-(cell,edge,vertex) scalar transliteration of the reference
kernels for the x-z slab (ndims=1), uniform vertical grid, WENOFUNC
order-5 reconstructions, HEAVISIDE upwinding, EC PV fluxes, Zalesak FCT,
zero Coriolis — the compile-time defaults (spam/src/common.h:62-126) in
the coupled MCE_rho + ConstantKappa_VirtualPottemp configuration:

* functional derivatives (F, FW, K, B):
  extrudedmodel.h:1996-2084, kinetic_energy.h compute_he_U_and_K:306-395
  + compute_dKddens:397-411, compressible_euler.h Hamiltonian_MCE_Hs
  compute_dHsdx:306-395, thermo.h ConstantKappa_VirtualPottemp:342-470
* Hodge stars (2nd order): hodge_star_extruded.h H10/H01/Hn1bar diagonals
* apply_symplectic chain: extrudedmodel.h:2173-2486 —
  compute_dens0 (:379-417), FT/FTW wedges (wedge.h Wxz_u/Wxz_w ± boundary
  :811-905), PV q (functionals.h compute_qhzfhz ± top/bottom :104-430,
  R/Rbnd, D1_ext), edge reconstructions (recon.h
  compute_twisted_{,vert_}edge_recon + compute_straight_hz_{,vert_}
  edge_recon, weno_func_recon.h), upwinded recons + he/hew scaling +
  reference-state addition (extrudedmodel.h compute_recons:1000-1174),
  Zalesak FCT (fct.h compute_edgefluxes/Mfext/apply_Phi{,vert}),
  tendencies (extrudedmodel.h compute_tendencies:1645-1921 with
  ext_deriv.h wD0/wD0_vert/wDnm1bar{,_vert} and wedge.h
  compute_Qxz_{w,u}_EC ± top/bottom)
* the semi-implicit velocity linear solve: extrudedmodel.h
  CompressibleVelocityLinearSystem:2531-3165 (Blin coefficients, fourier
  symbols ext_deriv.h:929-985, complex vertical tridiagonal, density
  recovery), with numpy's FFT standing in for the packed yakl RealFFT1D
* the quasi-Newton SI step: SI_Newton.h step_forward:31-149 with the
  quadrature discrete gradient (time_integrator.h) — NOTE the reference
  iterations call apply_symplectic with needs_to_recompute_F=true, i.e.
  the recon/FT upwind fluxes are he(xm)*u(xm) while FCT edge fluxes and
  the final tendencies use the discrete-gradient-averaged F/FW
  (extrudedmodel.h:2188-2204 F2VAR/FW2VAR vs :2338-2460 FVAR/FWVAR)

exactly as tests/{p3,shoc,awfl}_oracle.py serve their components:
test-only executable golden data, never imported by ``pam_tpu``. The
WENO limiter core and its matrices are shared with tests/awfl_oracle.py
(the reference's WENOFUNC is the same published algorithm with the same
"new tunings from Matt", weno_func_recon.h:63-124 == WenoLimiter.h).

Array shapes follow the port (z-index conventions proven by the port's
conservation/GW tests): dens (ndens, nens, nz, nx) dual layers;
v (nens, nz, nx) primal interface levels; w (nens, nz-1, nx) primal
layers; F (nens, nz, nx); FW/qhz (nens, nz+1, nx); B/K (.., nens, nz, nx).
"""

from __future__ import annotations

import numpy as np

from awfl_oracle import compute_weno_coefs


# --------------------------------------------------------------- helpers
def _mirror_layer_idx(k, n):
    """Index map for layer-field mirror halos (exchange.h:571-585):
    halo below: [-1-kk] -> [kk]; above: [n+kk] -> [n-kk-1]."""
    if k < 0:
        return -k - 1
    if k >= n:
        return 2 * n - k - 1
    return k


def _mirror_iface_idx(k, n):
    """Index map for interface-field mirror halos (exchange.h:589-602):
    below: [-1-kk] -> [kk+1]; above: [n+kk] -> [n-kk-2]."""
    if k < 0:
        return -k
    if k >= n:
        return 2 * n - k - 2
    return k


def _weno_edges(sten, mats, s2c=None, wrl=None):
    """Both edge values (left, right) of the WENOFUNC polynomial. s2c/wrl
    override mats' uniform matrices with per-level variable-grid ones
    (weno_func_recon_variable.h path; the matrices themselves are
    validated independently by polynomial exactness on stretched grids,
    tests/test_recon.py::test_variable_grid_exact_on_stretched)."""
    aw = compute_weno_coefs(mats["wrl"] if wrl is None else wrl,
                            mats["s2c"] if s2c is None else s2c,
                            sten, mats["idl"], mats["sigma"])
    c2g = mats["c2g"]
    left = sum(c2g[s, 0] * aw[s] for s in range(len(sten)))
    right = sum(c2g[s, 1] * aw[s] for s in range(len(sten)))
    return left, right


def _heav(flux):
    """upwind_recon's parameter (recon.h:309-323): copysign(1,0) = +1."""
    up = np.copysign(1.0, flux)
    return 0.5 * (up + abs(up))


# --------------------------------------------------- thermo (ConstantKappa)
def thermo_U(cst, alpha, sv, qd, qv, ql, qi):
    Rstar = qd * cst.Rd + qv * cst.Rv
    return (cst.Cvd * sv ** cst.gamma_d *
            (cst.Rd / (alpha * cst.pr)) ** cst.delta_d -
            cst.Cvd * Rstar / cst.Rd * cst.Tr - qv * cst.Rv * cst.Tr +
            qv * (cst.Lvr + cst.Lfr) + ql * cst.Lfr)


def thermo_dUdalpha(cst, alpha, sv, qd, qv, ql, qi):
    return -cst.pr * (sv * cst.Rd / (alpha * cst.pr)) ** cst.gamma_d


def thermo_dUdentropic_var(cst, alpha, sv, qd, qv, ql, qi):
    return cst.Cpd * (sv * cst.Rd / (alpha * cst.pr)) ** cst.delta_d


def thermo_dUdq(cst, alpha, sv, qd, qv, ql, qi):
    mu_d = -cst.Cvd * cst.Tr
    mu_v = (-cst.Cvd * cst.Rv / cst.Rd * cst.Tr + cst.Lvr + cst.Lfr -
            cst.Rv * cst.Tr)
    mu_l = cst.Lfr
    mu_i = 0.0
    return mu_d, mu_v, mu_l, mu_i


# ------------------------------------------------- functional derivatives
def fd_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst, moist=True,
              ids=None):
    """F, FW, K, B (extrudedmodel.h:1996-2084). dens ids: 0 = total mass
    n-form, 1 = entropic density; ``ids`` maps the moist species to dens
    rows (variableset.h dens_id_vap/liq/ice — tracers NOT in the map,
    e.g. Kessler's precip_liquid, are thermodynamically passive)."""
    if ids is None:
        ids = {"vap": 2, "liq": None, "ice": None}
    ndens, nens, nz, nx = dens.shape
    F = np.zeros((nens, nz, nx))
    FW = np.zeros((nens, nz + 1, nx))
    K = np.zeros((nens, nz, nx))
    B = np.zeros((2, nens, nz, nx))

    for e in range(nens):
        area = dx * dy * dz_d[e]                       # (nz,)
        rho0 = dens[0, e] / area[:, None]              # Hn1bar(total dens)
        u = v[e] * (dy * dz_d[e][:, None] / dx)        # H10 diagonal
        uw = np.zeros((nz + 1, nx))
        for k in range(1, nz):
            uw[k] = w[e, k - 1] * (dx * dy / dz_p[e][k - 1])  # H01

        for k in range(nz):
            km1 = _mirror_layer_idx(k - 1, nz)
            for i in range(nx):
                im1 = (i - 1) % nx
                ip1 = (i + 1) % nx
                he = 0.5 * (rho0[k, i] + rho0[k, im1])
                F[e, k, i] = he * u[k, i]
                # K2 (kinetic_energy.h:383-394); boundary uw terms vanish
                Kh = 0.5 * (v[e, k, i] * u[k, i] + v[e, k, ip1] * u[k, ip1])
                w_km1 = w[e, k - 1, i] if k - 1 >= 0 else w[e, 0, i]
                w_k = w[e, k, i] if k < nz - 1 else w[e, nz - 2, i]
                Kv = 0.5 * (w_km1 * uw[k, i] + w_k * uw[k + 1, i])
                K[e, k, i] = 0.5 * (Kh + Kv)
        for k in range(nz + 1):
            km1 = _mirror_layer_idx(k - 1, nz)
            kk = _mirror_layer_idx(k, nz)
            for i in range(nx):
                hew = 0.5 * (rho0[kk, i] + rho0[km1, i])
                FW[e, k, i] = hew * uw[k, i]

        # B (Hs.compute_dHsdx + Hk.compute_dKddens)
        for k in range(nz):
            for i in range(nx):
                a = area[k]
                alpha = a / dens[0, e, k, i]
                sv = dens[1, e, k, i] / dens[0, e, k, i]
                qv_ = dens[ids["vap"], e, k, i] / dens[0, e, k, i] \
                    if moist else 0.0
                ql_ = dens[ids["liq"], e, k, i] / dens[0, e, k, i] \
                    if moist and ids.get("liq") is not None else 0.0
                qi_ = dens[ids["ice"], e, k, i] / dens[0, e, k, i] \
                    if moist and ids.get("ice") is not None else 0.0
                qd_ = 1.0 - qv_ - ql_ - qi_ if moist else 1.0
                geop0 = geop[e, k, i] / a
                U = thermo_U(cst, alpha, sv, qd_, qv_, ql_, qi_)
                p = -thermo_dUdalpha(cst, alpha, sv, qd_, qv_, ql_, qi_)
                gex = thermo_dUdentropic_var(cst, alpha, sv, qd_, qv_, ql_,
                                             qi_)
                b_mass = geop0 + U + p * alpha - sv * gex
                if moist:
                    mu_d, mu_v, mu_l, mu_i = thermo_dUdq(
                        cst, alpha, sv, qd_, qv_, ql_, qi_)
                    b_mass += (qv_ * (mu_d - mu_v) + ql_ * (mu_d - mu_l) +
                               qi_ * (mu_d - mu_i))
                b_mass += K[e, k, i] / a                 # dKddens (Hn1bar K)
                B[0, e, k, i] = b_mass
                B[1, e, k, i] = gex
    return F, FW, K, B


# --------------------------------------------------------- apply_symplectic
def apply_symplectic_oracle(dens, v, w, F, FW, B, dt, dz_d, dz_p, dx, dy,
                            mats, ref, dens_pos, Frec=None, FWrec=None,
                            vmats=None, anelastic=False):
    """(extrudedmodel.h apply_symplectic:2173-2486). F/FW/B are the
    (possibly discrete-gradient-averaged) functional derivatives used for
    the FCT edge fluxes and the final tendencies; Frec/FWrec (default
    F/FW — the needs_to_recompute_F=false path of compute_rhs) are the
    he(x)*u(x) fluxes that drive FT/FTW and every recon upwinding when
    the SI iterations pass needs_to_recompute_F=true."""
    ndens, nens, nz, nx = dens.shape
    if Frec is None:
        Frec, FWrec = F, FW
    hs = (len(mats["idl"]) - 2)            # (ord-1)/2

    denstend = np.zeros_like(dens)
    vtend = np.zeros_like(v)
    wtend = np.zeros_like(w)

    for e in range(nens):
        area = dx * dy * dz_d[e]
        rho0 = dens[0, e] / area[:, None]

        # ---- FT (v-levels) and FTW (w-layers) wedges (wedge.h:811-905)
        FT = np.zeros((nz, nx))
        FTW = np.zeros((nz - 1, nx))
        for i in range(nx):
            im1 = (i - 1) % nx
            ip1 = (i + 1) % nx
            for k in range(1, nz - 1):
                FT[k, i] = -0.25 * (FWrec[e, k, i] + FWrec[e, k, im1] +
                                    FWrec[e, k + 1, i] + FWrec[e, k + 1, im1])
            FT[0, i] = -0.5 * (FWrec[e, 0, i] + FWrec[e, 0, im1])
            FT[nz - 1, i] = -0.5 * (FWrec[e, nz, i] + FWrec[e, nz, im1])
            for k in range(1, nz - 2):
                FTW[k, i] = 0.25 * (Frec[e, k, i] + Frec[e, k, ip1] +
                                    Frec[e, k + 1, i] + Frec[e, k + 1, ip1])
            FTW[0, i] = 0.25 * (Frec[e, 1, i] + Frec[e, 1, ip1])
            if nz - 2 > 0:
                FTW[nz - 2, i] = 0.25 * (Frec[e, nz - 2, i] +
                                         Frec[e, nz - 2, ip1])

        # ---- qhz at dual vertices (functionals.h:104-430); rows 0/nz zero
        qhz = np.zeros((nz + 1, nx))
        D = dens[0, e]
        for kv in range(1, nz):
            for i in range(nx):
                im1 = (i - 1) % nx
                zeta = (v[e, kv - 1, i] - v[e, kv, i] +
                        w[e, kv - 1, i] - w[e, kv - 1, im1])
                if kv == 1:
                    hv = 0.25 * (D[1, i] + D[1, im1]) + \
                        0.5 * (D[0, i] + D[0, im1])
                elif kv == nz - 1:
                    hv = 0.25 * (D[nz - 2, i] + D[nz - 2, im1]) + \
                        0.5 * (D[nz - 1, i] + D[nz - 1, im1])
                else:
                    hv = 0.25 * (D[kv - 1, i] + D[kv - 1, im1] +
                                 D[kv, i] + D[kv, im1])
                qhz[kv, i] = zeta / hv

        # ---- dens0 (:379-417) and its edge recons
        dens0 = np.empty((ndens, nz, nx))
        for l in range(ndens):
            dens0[l] = (dens[l, e] - ref["refdens"][l, e][:, None]) / \
                area[:, None]

        # twisted x edge recon per dual layer (periodic x)
        dl_edge = np.empty((ndens, nz, nx))    # left edge of cell i
        dr_edge = np.empty((ndens, nz, nx))    # right edge of cell i
        for l in range(ndens):
            for k in range(nz):
                for i in range(nx):
                    sten = np.array([dens0[l, k, (i + p - hs) % nx]
                                     for p in range(2 * hs + 1)])
                    dl_edge[l, k, i], dr_edge[l, k, i] = _weno_edges(sten,
                                                                     mats)
        # twisted vertical edge recon per dens0 cell (mirror-iface halos)
        db_edge = np.empty((ndens, nz, nx))    # bottom edge of cell k
        dt_edge = np.empty((ndens, nz, nx))    # top edge of cell k
        for l in range(ndens):
            for k in range(nz):
                for i in range(nx):
                    sten = np.array([
                        dens0[l, _mirror_iface_idx(k + p - hs, nz), i]
                        for p in range(2 * hs + 1)])
                    if vmats is None:
                        db_edge[l, k, i], dt_edge[l, k, i] = _weno_edges(
                            sten, mats)
                    else:
                        db_edge[l, k, i], dt_edge[l, k, i] = _weno_edges(
                            sten, mats, s2c=vmats["dens"][0][e, k],
                            wrl=vmats["dens"][1][e, k])

        # ---- densrecon at x-edges (compute_recons:1032-1087)
        densrecon = np.empty((ndens, nz, nx))
        for k in range(nz):
            for i in range(nx):
                im1 = (i - 1) % nx
                he = 0.5 * (rho0[k, i] + rho0[k, im1])
                up = _heav(Frec[e, k, i])
                for l in range(ndens):
                    r = dl_edge[l, k, i] * (1.0 - up) + \
                        dr_edge[l, k, im1] * up
                    r += ref["rho_pi"][e, k] * ref["q_pi"][l, e, k]
                    densrecon[l, k, i] = r / he
        # ---- densvertrecon at dual interfaces (:1089-1127)
        densvertrecon = np.zeros((ndens, nz + 1, nx))
        for kv in range(1, nz):
            km1 = _mirror_layer_idx(kv - 1, nz)
            for i in range(nx):
                hew = 0.5 * (rho0[kv if kv < nz else nz - 1, i] +
                             rho0[km1, i]) if kv < nz else None
                hew = 0.5 * (rho0[kv, i] + rho0[kv - 1, i])
                up = _heav(FWrec[e, kv, i])
                for l in range(ndens):
                    r = db_edge[l, kv, i] * (1.0 - up) + \
                        dt_edge[l, kv - 1, i] * up
                    r += ref["rho_di"][e, kv] * ref["q_di"][l, e, kv]
                    densvertrecon[l, kv, i] = r / hew

        if anelastic:
            densrecon[0] = 1.0
            densvertrecon[0] = 1.0

        # ---- qhz recons (straight, the +1 twist; recon.h:176-290,545-600)
        nl_p = nz - 1
        ql_edge = np.empty((nl_p, nx))
        qr_edge = np.empty((nl_p, nx))
        qb_edge = np.empty((nl_p, nx))
        qt_edge = np.empty((nl_p, nx))
        for k in range(nl_p):
            for i in range(nx):
                sten = np.array([qhz[k + 1, (i + p - hs) % nx]
                                 for p in range(2 * hs + 1)])
                ql_edge[k, i], qr_edge[k, i] = _weno_edges(sten, mats)
                sten = np.array([
                    qhz[_mirror_iface_idx(k + 1 + p - hs, nz + 1), i]
                    for p in range(2 * hs + 1)])
                if vmats is None:
                    qb_edge[k, i], qt_edge[k, i] = _weno_edges(sten, mats)
                else:
                    qb_edge[k, i], qt_edge[k, i] = _weno_edges(
                        sten, mats, s2c=vmats["q"][0][e, k],
                        wrl=vmats["q"][1][e, k])

        qhzrecon = np.empty((nl_p, nx))        # straight x edges per w-layer
        for k in range(nl_p):
            for i in range(nx):
                ip1 = (i + 1) % nx
                up = _heav(FTW[k, i])
                qhzrecon[k, i] = ql_edge[k, ip1] * (1.0 - up) + \
                    qr_edge[k, i] * up
        qhzvertrecon = np.empty((nz, nx))      # straight vert per v-level
        for k in range(nz):
            for i in range(nx):
                up = _heav(-FT[k, i])          # the d=0 "twist"
                e1 = qb_edge[k, i] if k < nl_p else \
                    qb_edge[_mirror_layer_idx(k, nl_p), i]
                e0 = qt_edge[k - 1, i] if k - 1 >= 0 else \
                    qt_edge[_mirror_layer_idx(k - 1, nl_p), i]
                qhzvertrecon[k, i] = e1 * (1.0 - up) + e0 * up

        # ---- FCT (fct.h; eps=1e-8; q ratio = prognostic dens / Mf)
        eps = 1.0e-8
        ef = np.zeros((ndens, nz, nx))
        vef = np.zeros((ndens, nz + 1, nx))
        for l in range(ndens):
            if not dens_pos[l]:
                continue
            ef[l] = densrecon[l] * F[e]
            for kv in range(1, nz):
                vef[l, kv] = densvertrecon[l, kv] * FW[e, kv]
        Mf = np.zeros((ndens, nz, nx))
        for l in range(ndens):
            if not dens_pos[l]:
                continue
            for k in range(nz):
                for i in range(nx):
                    ip1 = (i + 1) % nx
                    Mf[l, k, i] = dt * (
                        max(ef[l, k, ip1], 0.0) - min(ef[l, k, i], 0.0) +
                        max(vef[l, k + 1, i], 0.0) - min(vef[l, k, i], 0.0)
                    ) + eps
        for l in range(ndens):
            if not dens_pos[l]:
                continue
            newrec = densrecon[l].copy()
            for k in range(nz):
                for i in range(nx):
                    im1 = (i - 1) % nx
                    up = _heav(ef[l, k, i])
                    phi = min(1.0, dens[l, e, k, i] / Mf[l, k, i]) * \
                        (1.0 - up) + \
                        min(1.0, dens[l, e, k, im1] / Mf[l, k, im1]) * up
                    newrec[k, i] = densrecon[l, k, i] * phi
            densrecon[l] = newrec
            for kv in range(1, nz):
                for i in range(nx):
                    up = _heav(vef[l, kv, i])
                    phi = min(1.0, dens[l, e, kv, i] / Mf[l, kv, i]) * \
                        (1.0 - up) + \
                        min(1.0, dens[l, e, kv - 1, i] / Mf[l, kv - 1, i]) * up
                    densvertrecon[l, kv, i] *= phi

        # ---- tendencies (:1645-1921); coriolis terms vanish (f == 0)
        nact = 2
        for k in range(nz - 1):                # Wtend at w-layers
            for i in range(nx):
                ip1 = (i + 1) % nx
                t = 0.0
                for l in range(nact):
                    t += densvertrecon[l, k + 1, i] * \
                        (B[l, e, k + 1, i] - B[l, e, k, i])
                if ref.get("B_ref") is not None:
                    # force_refstate_hydrostatic_balance: + wD0_vert of the
                    # reference q_di against the reference B profile
                    # (extrudedmodel.h:1684-1688, all w-layers incl. bnd)
                    for l in range(nact):
                        t += ref["q_di"][l, e, k + 1] * \
                            (ref["B_ref"][l, e, k + 1] - ref["B_ref"][l, e, k])
                if k == 0:
                    t += 0.25 * (
                        F[e, 1, i] * 0.5 * (qhzvertrecon[1, i] +
                                            qhzrecon[0, i]) +
                        F[e, 1, ip1] * 0.5 * (qhzvertrecon[1, ip1] +
                                              qhzrecon[0, i]))
                elif k == nz - 2:
                    t += 0.25 * (
                        F[e, k, i] * 0.5 * (qhzvertrecon[k, i] +
                                            qhzrecon[k, i]) +
                        F[e, k, ip1] * 0.5 * (qhzvertrecon[k, ip1] +
                                              qhzrecon[k, i]))
                else:
                    t += 0.25 * (
                        F[e, k, i] * 0.5 * (qhzvertrecon[k, i] +
                                            qhzrecon[k, i]) +
                        F[e, k, ip1] * 0.5 * (qhzvertrecon[k, ip1] +
                                              qhzrecon[k, i]) +
                        F[e, k + 1, i] * 0.5 * (qhzvertrecon[k + 1, i] +
                                                qhzrecon[k, i]) +
                        F[e, k + 1, ip1] * 0.5 * (qhzvertrecon[k + 1, ip1] +
                                                  qhzrecon[k, i]))
                wtend[e, k, i] = t
        for k in range(nz):                    # Vtend at v-levels
            for i in range(nx):
                im1 = (i - 1) % nx
                t = 0.0
                for l in range(nact):
                    t += densrecon[l, k, i] * \
                        (B[l, e, k, i] - B[l, e, k, im1])
                if k == 0:
                    t += -0.5 * (FW[e, 0, i] + FW[e, 0, im1]) * \
                        qhzvertrecon[0, i]          # == 0 (FW bnd)
                elif k == nz - 1:
                    t += -0.5 * (FW[e, nz, i] + FW[e, nz, im1]) * \
                        qhzvertrecon[nz - 1, i]     # == 0
                else:
                    t += -0.25 * (
                        FW[e, k, i] * 0.5 * (qhzrecon[k - 1, i] +
                                             qhzvertrecon[k, i]) +
                        FW[e, k, im1] * 0.5 * (qhzrecon[k - 1, im1] +
                                               qhzvertrecon[k, i]) +
                        FW[e, k + 1, i] * 0.5 * (qhzrecon[k, i] +
                                                 qhzvertrecon[k, i]) +
                        FW[e, k + 1, im1] * 0.5 * (qhzrecon[k, im1] +
                                                   qhzvertrecon[k, i]))
                vtend[e, k, i] = t
        for l in range(ndens):                 # dens tend at dual layers
            for k in range(nz):
                for i in range(nx):
                    ip1 = (i + 1) % nx
                    denstend[l, e, k, i] = (
                        F[e, k, ip1] * densrecon[l, k, ip1] -
                        F[e, k, i] * densrecon[l, k, i] +
                        FW[e, k + 1, i] * densvertrecon[l, k + 1, i] -
                        FW[e, k, i] * densvertrecon[l, k, i])
    return denstend, vtend, wtend


# ------------------------------------------------------ compute_rhs / SI
def compute_rhs_oracle(dens, v, w, geop, dt, dz_d, dz_p, dx, dy, cst, mats,
                       ref, dens_pos, vmats=None):
    """model.h Tendencies::compute_rhs:275-284 (needs_to_recompute_F=false:
    the recon fluxes ARE the functional-derivative F/FW)."""
    F, FW, K, B = fd_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst,
                            ids=ref.get("ids"))
    return apply_symplectic_oracle(dens, v, w, F, FW, B, dt, dz_d, dz_p,
                                   dx, dy, mats, ref, dens_pos, vmats=vmats)


def velocity_solve_oracle(rhs_dens, rhs_v, rhs_w, dt, dz_d, dz_p, dx, dy,
                          cst, ref, zint_p):
    """CompressibleVelocityLinearSystem compute_coefficients + solve
    (extrudedmodel.h:2605-3165), per x-wavenumber with numpy's FFT.
    Returns (sol_dens, sol_v, sol_w)."""
    ndens, nens, nz, nx = rhs_dens.shape
    dtf = dt / 2.0
    dtf2 = dt * dt / 4.0
    nd = 2                                     # ndensity_dycore
    rho_pi, q_pi = ref["rho_pi"], ref["q_pi"]  # (nens,nz), (ndens,nens,nz)
    rho_di, q_di = ref["rho_di"], ref["q_di"]
    Nsq_pi = ref["Nsq_pi"]                     # (nens, nz)
    grav = ref["grav"]

    sol_dens = np.zeros_like(rhs_dens)
    sol_v = np.zeros_like(rhs_v)
    sol_w = np.zeros_like(rhs_w)

    for e in range(nens):
        area = dx * dy * dz_d[e]
        fH2bar = 1.0 / area                    # Hn1bar diagonal per level
        fH1 = dy * dz_d[e] / dx                # H10 diagonal per level

        def h01_diag(k):
            # H01_diagonal: d_area_n0 / p_area_01(k-1); index clamped — the
            # out-of-range rows are always multiplied by w == 0
            kk = min(max(k - 1, 0), nz - 2)
            return dx * dy / dz_p[e][kk]

        # Blin coefficients (extrudedmodel.h:2644-2689)
        Blin = np.zeros((nd, nd, nz))
        for k in range(nz):
            rho_ref = rho_pi[e, k]
            alpha_ref = 1.0 / rho_ref
            s_ref = q_pi[1, e, k]
            p_ref = cst.pr * (s_ref * rho_ref * cst.Rd / cst.pr) ** \
                cst.gamma_d
            dpds = cst.gamma_d * p_ref / s_ref
            Nref2 = Nsq_pi[e, k]
            cref2 = cst.gamma_d * p_ref * alpha_ref
            rho2 = rho_ref * rho_ref
            b0_rho = (cref2 * rho_ref - dpds * s_ref) / rho2
            b0_s = (dpds / rho_ref - dpds ** 2 * s_ref / (cref2 * rho2) -
                    dpds ** 2 * grav * grav * s_ref /
                    (Nref2 * cref2 * cref2 * rho2))
            b0_S = b0_s / rho_ref
            b0_rho -= s_ref / rho_ref * b0_s
            b1_rho = dpds / rho2
            b1_s = dpds ** 2 * (Nref2 * cref2 + grav * grav) / \
                (Nref2 * cref2 * cref2 * rho2)
            b1_S = b1_s / rho_ref
            b1_rho -= s_ref / rho_ref * b1_s
            Blin[0, 0, k] = b0_rho
            Blin[0, 1, k] = b0_S
            Blin[1, 0, k] = b1_rho
            Blin[1, 1, k] = b1_S

        # rhs preparation (solve:2909-2950)
        bvar = np.zeros((nd, nz, nx))
        for k in range(nz):
            rhs0 = [rhs_dens[d, e, k] * fH2bar[k] for d in range(nd)]
            for d1 in range(nd):
                acc = np.zeros(nx)
                for d2 in range(nd):
                    acc -= dtf * Blin[d1, d2, k] * rhs0[d2]
                bvar[d1, k] = acc
        v_t = np.zeros((nz, nx))
        w_t = np.zeros((nz - 1, nx))
        for k in range(nz):
            for i in range(nx):
                im1 = (i - 1) % nx
                mod_v = sum(q_pi[l, e, k] * (bvar[l, k, i] - bvar[l, k, im1])
                            for l in range(nd))
                v_t[k, i] = rhs_v[e, k, i] + mod_v
                if k < nz - 1:
                    mod_w = sum(q_di[l, e, k + 1] *
                                (bvar[l, k + 1, i] - bvar[l, k, i])
                                for l in range(nd))
                    w_t[k, i] = rhs_w[e, k, i] + mod_w

        vhat = np.fft.fft(v_t, axis=-1)        # symbols use exp(-i 2pi x/nx)
        what = np.fft.fft(w_t, axis=-1)

        for ik in range(nx):
            th = 2.0 * np.pi * ik / nx
            fD0 = 1.0 - np.exp(-1j * th)
            fDnm1bar = np.exp(1j * th) - 1.0
            fD0Dbar = 2.0 * (np.cos(th) - 1.0)

            # vcoeff (compute_coefficients:2691-2729)
            c1 = np.ones(nz)
            for k in range(nz):
                for d1 in range(nd):
                    for d2 in range(nd):
                        c1[k] -= (dtf2 * fH2bar[k] * fH1[k] * fD0Dbar *
                                  rho_pi[e, k] * q_pi[d1, e, k] *
                                  q_pi[d2, e, k] * Blin[d1, d2, k])
            vc0 = 1.0 / c1
            vcd = np.zeros((nd, nz), complex)
            for k in range(nz):
                for d1 in range(nd):
                    cd1 = 0.0
                    for d2 in range(nd):
                        cd1 += (fD0 * dtf2 * fH2bar[k] * q_pi[d2, e, k] *
                                Blin[d2, d1, k])
                    vcd[d1, k] = cd1 / c1[k]

            # vertical tridiagonal (:2731-2845)
            tri_u = np.zeros(nz - 1, complex)
            tri_d = np.ones(nz - 1, complex)
            tri_l = np.zeros(nz - 1, complex)
            for k in range(nz - 1):
                gam_kp2 = rho_di[e, k + 2] * h01_diag(k + 2) \
                    if k + 2 <= nz else 0.0
                gam_kp1 = rho_di[e, k + 1] * h01_diag(k + 1)
                gam_k = rho_di[e, k] * h01_diag(k)
                for d1 in range(nd):
                    al = q_di[d1, e, k + 1]
                    for d2 in range(nd):
                        b_kp1 = fH2bar[k + 1] * Blin[d1, d2, k + 1]
                        b_k = fH2bar[k] * Blin[d1, d2, k]
                        tri_u[k] += -dtf2 * al * b_kp1 * gam_kp2 * \
                            q_di[d2, e, k + 2]
                        tri_d[k] += dtf2 * al * (b_kp1 + b_k) * gam_kp1 * \
                            q_di[d2, e, k + 1]
                        tri_l[k] += -dtf2 * al * b_k * gam_k * \
                            q_di[d2, e, k]
                for d1 in range(nd):
                    al = dtf2 * q_di[d1, e, k + 1]
                    for d2 in range(nd):
                        for d3 in range(nd):
                            b_kp1 = (fH2bar[k + 1] * Blin[d1, d2, k + 1] *
                                     q_pi[d2, e, k + 1] * fDnm1bar *
                                     rho_pi[e, k + 1] * fH1[k + 1])
                            b_k = (fH2bar[k] * Blin[d1, d2, k] *
                                   q_pi[d2, e, k] * fDnm1bar *
                                   rho_pi[e, k] * fH1[k])
                            gam_kp2 = rho_di[e, k + 2] * h01_diag(k + 2) * \
                                q_di[d3, e, k + 2] if k + 2 <= nz else 0.0
                            gam_kp1 = rho_di[e, k + 1] * h01_diag(k + 1) * \
                                q_di[d3, e, k + 1]
                            gam_k = rho_di[e, k] * h01_diag(k) * \
                                q_di[d3, e, k]
                            tri_u[k] += -al * b_kp1 * vcd[d3, k + 1] * \
                                gam_kp2
                            tri_d[k] += al * (b_kp1 * vcd[d3, k + 1] +
                                              b_k * vcd[d3, k]) * gam_kp1
                            tri_l[k] += -al * b_k * vcd[d3, k] * gam_k

            # modify wrhs (:2971-3026)
            wk = what[:, ik].copy()
            for k in range(nz - 1):
                vc0_kp1 = vc0[k + 1] * vhat[k + 1, ik]
                vc0_k = vc0[k] * vhat[k, ik]
                for d1 in range(nd):
                    al = dtf2 * q_di[d1, e, k + 1]
                    for d2 in range(nd):
                        b_kp1 = (fH2bar[k + 1] * Blin[d1, d2, k + 1] *
                                 q_pi[d2, e, k + 1] * fDnm1bar *
                                 rho_pi[e, k + 1] * fH1[k + 1])
                        b_k = (fH2bar[k] * Blin[d1, d2, k] *
                               q_pi[d2, e, k] * fDnm1bar *
                               rho_pi[e, k] * fH1[k])
                        wk[k] += al * (b_kp1 * vc0_kp1 - b_k * vc0_k)

            # complex Thomas (:3028-3055)
            nw = nz - 1
            tri_c = np.zeros(nw, complex)
            tri_c[0] = tri_u[0] / tri_d[0]
            for k in range(1, nw - 1):
                tri_c[k] = tri_u[k] / (tri_d[k] - tri_l[k] * tri_c[k - 1])
            wk[0] = wk[0] / tri_d[0]
            for k in range(1, nw):
                wk[k] = (wk[k] - tri_l[k] * wk[k - 1]) / \
                    (tri_d[k] - tri_l[k] * tri_c[k - 1])
            for k in range(nw - 2, -1, -1):
                wk[k] -= tri_c[k] * wk[k + 1]
            what[:, ik] = wk

            # vhat recovery (:3057-3084)
            for k in range(nz):
                w_kp1 = wk[k] if k < nz - 1 else 0.0
                w_km = wk[k - 1] if k > 0 else 0.0
                gam_kp1 = rho_di[e, k + 1] * h01_diag(k + 1)
                gam_k = rho_di[e, k] * h01_diag(k)
                acc = vc0[k] * vhat[k, ik]
                for d1 in range(nd):
                    acc += vcd[d1, k] * (gam_kp1 * q_di[d1, e, k + 1] *
                                         w_kp1 - gam_k * q_di[d1, e, k] *
                                         w_km)
                vhat[k, ik] = acc

        sol_v[e] = np.real(np.fft.ifft(vhat, axis=-1))
        sol_w[e] = np.real(np.fft.ifft(what, axis=-1))

        # density recovery (:3120-3160)
        Fs = np.zeros((nz, nx))
        FWs = np.zeros((nz + 1, nx))
        for k in range(nz):
            Fs[k] = sol_v[e, k] * fH1[k] * rho_pi[e, k]
        for k in range(1, nz):
            FWs[k] = sol_w[e, k - 1] * (dx * dy / dz_p[e][k - 1]) * \
                rho_di[e, k]
        for l in range(ndens):
            for k in range(nz):
                for i in range(nx):
                    ip1 = (i + 1) % nx
                    dd = (q_pi[l, e, k] * (Fs[k, ip1] - Fs[k, i]) +
                          q_di[l, e, k + 1] * FWs[k + 1, i] -
                          q_di[l, e, k] * FWs[k, i])
                    sol_dens[l, e, k, i] = rhs_dens[l, e, k, i] - \
                        dd * dt / 2.0
    return sol_dens, sol_v, sol_w


def si_step_oracle(dens, v, w, geop, dt, dz_d, dz_p, dx, dy, cst, mats, ref,
                   dens_pos, zint_p, max_iters=3, quad_pts=None,
                   quad_wts=None, vmats=None):
    """SI_Newton.h step_forward:31-149 with the quadrature discrete
    gradient; the final iteration is solve-only (the port's structural
    DCE of the dead last gradient evaluation — SI_Newton.h:91-93)."""
    x = (dens, v, w)
    td, tv, tw = compute_rhs_oracle(dens, v, w, geop, dt, dz_d, dz_p, dx,
                                    dy, cst, mats, ref, dens_pos,
                                    vmats=vmats)
    xn = tuple(a.copy() for a in x)
    res = (-dt * td, -dt * tv, -dt * tw)
    for it in range(max_iters - 1):
        sol = velocity_solve_oracle(*res, dt, dz_d, dz_p, dx, dy, cst, ref,
                                    zint_p)
        xn = tuple(a + b for a, b in zip(xn, sol))
        # quadrature-averaged F/FW/B between x and xn
        Fa = FWa = Ba = None
        for p, wq in zip(quad_pts, quad_wts):
            xm_p = tuple((1.0 - p) * a + p * b for a, b in zip(x, xn))
            Fp, FWp, _, Bp = fd_oracle(xm_p[0], xm_p[1], xm_p[2], geop,
                                       dz_d, dz_p, dx, dy, cst,
                                       ids=ref.get("ids"))
            Fa = wq * Fp if Fa is None else Fa + wq * Fp
            FWa = wq * FWp if FWa is None else FWa + wq * FWp
            Ba = wq * Bp if Ba is None else Ba + wq * Bp
        xm = tuple(0.5 * (a + b) for a, b in zip(x, xn))
        # needs_to_recompute_F=true: F2/FW2 from xm drive FT + upwinding
        F2, FW2, _, _ = fd_oracle(xm[0], xm[1], xm[2], geop, dz_d, dz_p,
                                  dx, dy, cst, ids=ref.get("ids"))
        td, tv, tw = apply_symplectic_oracle(
            xm[0], xm[1], xm[2], Fa, FWa, Ba, dt, dz_d, dz_p, dx, dy, mats,
            ref, dens_pos, Frec=F2, FWrec=FW2, vmats=vmats)
        res = (x[0] - xn[0] - dt * td, x[1] - xn[1] - dt * tv,
               x[2] - xn[2] - dt * tw)
    sol = velocity_solve_oracle(*res, dt, dz_d, dz_p, dx, dy, cst, ref,
                                zint_p)
    return tuple(a + b for a, b in zip(xn, sol))


# ---------------------------------------------------------------------------
# Pressure-based linear systems (the reference's YAML-default
# linear_system == "pressure" and the gravity-aware variant)
# ---------------------------------------------------------------------------

def _thomas(tri_l, tri_d, tri_u, rhs):
    """Reference Thomas recurrence (solve_for_pressure,
    extrudedmodel.h:3806-3830): tri_* are (n,) or (n, nxr) stacks, rhs is
    (n, ...) with matching trailing shape."""
    n = rhs.shape[0]
    x = np.array(rhs, dtype=rhs.dtype)
    c = np.zeros(tri_u.shape, dtype=np.result_type(tri_u, rhs))
    c[0] = tri_u[0] / tri_d[0]
    for k in range(1, n - 1):
        c[k] = tri_u[k] / (tri_d[k] - tri_l[k] * c[k - 1])
    x[0] = x[0] / tri_d[0]
    for k in range(1, n):
        x[k] = (x[k] - tri_l[k] * x[k - 1]) / \
            (tri_d[k] - tri_l[k] * c[k - 1])
    for k in range(n - 2, -1, -1):
        x[k] = x[k] - c[k] * x[k + 1]
    return x


def pressure_solve_oracle(rhs_dens, rhs_v, rhs_w, dt, dz_d, dz_p, dx, dy,
                          cst, ref, gravity=False):
    """CompressiblePressure[Gravity]LinearSystem: compute_coefficients +
    prepare_pressure_rhs + solve_for_pressure + update_velocity +
    update_densities (extrudedmodel.h:3530-3970; gravity variant
    :3970-4580), scalar transliteration per x-wavenumber with numpy's
    rfft (slab, diff_ord=2 so every Hodge star is its diagonal). Thermo:
    ConstantKappa_VirtualPottemp closed forms (thermo.h:150-200), the
    coupled-configuration potential. Returns (sol_dens, sol_v, sol_w)."""
    ndens, nens, nz, nx = rhs_dens.shape
    al = dt / 2.0
    nact = 2
    nl = nz - 1
    nxr = nx // 2 + 1
    rho_pi, q_pi = ref["rho_pi"], ref["q_pi"]
    rho_di, q_di = ref["rho_di"], ref["q_di"]
    pres_pi = ref["pres_pi"]
    sol_dens = np.zeros_like(rhs_dens)
    sol_v = np.zeros_like(rhs_v)
    sol_w = np.zeros_like(rhs_w)
    for e in range(nens):
        fHn1bar = 1.0 / (dx * dy * dz_d[e])          # (nz,)
        fH1 = dz_d[e] * dy / dx

        def h01(k):
            # H01_diagonal at interface k. The reference evaluates its
            # geometry formula at every k; rows 0 and nz only ever reach
            # the tridiagonal through terms the boundary branches exclude
            # (tri_d at k==0/nz-1) or rows never read (tri_l[0]/tri_u[-1]),
            # so zeroing them is equivalent (see the build loop,
            # extrudedmodel.h:3648-3659).
            if k <= 0 or k >= nz:
                return 0.0
            return dx * dy / dz_p[e][k - 1]

        # linear pressure coefficients + omega (variableset.h
        # linear_pressure_coeffs VS_MCE_rho:1576-1591; the
        # ConstantKappa_VirtualPottemp soundspeed/dpds ignore qd/qv)
        linp = np.zeros((nact, nz))
        omega = np.zeros(nz)
        for k in range(nz):
            rho_ref = rho_pi[e, k]
            alpha_ref = 1.0 / rho_ref
            s_ref = q_pi[1, e, k]
            p_ref = cst.pr * (s_ref * rho_ref * cst.Rd / cst.pr) ** \
                cst.gamma_d
            dpds = cst.gamma_d * p_ref / s_ref
            cs2 = cst.gamma_d * p_ref * alpha_ref
            linp[0, k] = cs2 - s_ref * alpha_ref * dpds
            linp[1, k] = alpha_ref * dpds
            omega[k] = linp[0, k] + linp[1, k] * q_pi[1, e, k]

        # horizontal factor per rfft bin (the gravity variant's Fhorz,
        # :4155-4180 — identical to the plain tri_d before vertical terms)
        Fhorz = np.zeros((nz, nxr))
        for ik in range(nxr):
            th = 2.0 * np.pi * ik / nx
            fDD = 2.0 * (np.cos(th) - 1.0)
            for k in range(nz):
                f = 1.0
                for dd in range(nact):
                    f -= al * al * linp[dd, k] * fHn1bar[k] * fH1[k] * \
                        fDD * q_pi[dd, e, k]
                Fhorz[k, ik] = f

        if not gravity:
            # plain pressure tridiagonal (:3636-3659)
            tri_l = np.zeros((nz, nxr))
            tri_d = np.array(Fhorz)
            tri_u = np.zeros((nz, nxr))
            for ik in range(nxr):
                for k in range(nz):
                    for d in range(nact):
                        rp1 = rho_pi[e, k + 1] if k + 1 < nz else \
                            rho_pi[e, k]      # halo read; killed by h01
                        rm1 = rho_pi[e, k - 1] if k - 1 >= 0 else \
                            rho_pi[e, k]
                        rhofac_kp1 = rho_di[e, k + 1] * 0.5 * \
                            (1.0 / rp1 + 1.0 / rho_pi[e, k])
                        rhofac_k = rho_di[e, k] * 0.5 * \
                            (1.0 / rho_pi[e, k] + 1.0 / rm1)
                        beta_kp1 = q_di[d, e, k + 1] * rhofac_kp1 * \
                            h01(k + 1)
                        beta_k = q_di[d, e, k] * rhofac_k * h01(k)
                        alpha_k = -al * al * fHn1bar[k] * linp[d, k]
                        tri_u[k, ik] += alpha_k * beta_kp1
                        tri_l[k, ik] += alpha_k * beta_k
                        if k == 0:
                            tri_d[k, ik] += -alpha_k * beta_kp1
                        elif k == nz - 1:
                            tri_d[k, ik] += -alpha_k * beta_k
                        else:
                            tri_d[k, ik] += -alpha_k * (beta_kp1 + beta_k)
        else:
            # gravity variant coefficients (:4067-4243)
            dp = pres_pi[e, 1:] - pres_pi[e, :-1]    # (nl,)
            Dmod_u = np.zeros(nl)
            Dmod_d = np.zeros(nl)
            for k in range(nl):
                inv_rho_mid = 0.5 * (1.0 / rho_pi[e, k + 1] +
                                     1.0 / rho_pi[e, k])
                c_k = 1.0 / (rho_pi[e, k] ** 2 * omega[k])
                c_kp1 = 1.0 / (rho_pi[e, k + 1] ** 2 * omega[k + 1])
                Dmod_u[k] = inv_rho_mid - 0.5 * c_kp1 * dp[k]
                Dmod_d[k] = -inv_rho_mid - 0.5 * c_k * dp[k]
            A_l = np.zeros(nl)
            A_d = np.ones(nl)
            A_u = np.zeros(nl)
            for k in range(nl):
                for d in range(1, nact):
                    gamma_kp1 = 0.0 if k == nl - 1 else \
                        rho_di[e, k + 2] * h01(k + 2) * \
                        (q_pi[1, e, k + 2] - q_pi[1, e, k + 1])
                    gamma_k = rho_di[e, k + 1] * h01(k + 1) * \
                        (q_pi[1, e, k + 1] - q_pi[1, e, k])
                    gamma_km1 = 0.0 if k == 0 else \
                        rho_di[e, k] * h01(k) * \
                        (q_pi[1, e, k] - q_pi[1, e, k - 1])
                    beta_kp1 = fHn1bar[k + 1] * linp[d, k + 1] / \
                        (rho_pi[e, k + 1] ** 2 * omega[k + 1])
                    beta_k = fHn1bar[k] * linp[d, k] / \
                        (rho_pi[e, k] ** 2 * omega[k])
                    alpha_k = -al * al / 4.0 * dp[k]
                    A_u[k] += alpha_k * beta_kp1 * gamma_kp1
                    A_d[k] += alpha_k * (beta_kp1 + beta_k) * gamma_k
                    A_l[k] += alpha_k * beta_k * gamma_km1
            tri_l = np.zeros((nl, nxr))
            tri_d = np.zeros((nl, nxr))
            tri_u = np.zeros((nl, nxr))
            for ik in range(nxr):
                for k in range(nl):
                    u_ = A_u[k]
                    d_ = A_d[k]
                    l_ = A_l[k]
                    gamma_kp1 = 0.0 if k == nl - 1 else \
                        rho_di[e, k + 2] * h01(k + 2)
                    gamma_k = rho_di[e, k + 1] * h01(k + 1)
                    gamma_km1 = 0.0 if k == 0 else rho_di[e, k] * h01(k)
                    for d in range(nact):
                        beta_k = fHn1bar[k] * linp[d, k] / Fhorz[k, ik] * \
                            Dmod_d[k]
                        beta_kp1 = fHn1bar[k + 1] * linp[d, k + 1] / \
                            Fhorz[k + 1, ik] * Dmod_u[k]
                        u_ -= al * al * beta_kp1 * gamma_kp1 * \
                            q_di[d, e, k + 2]
                        d_ -= al * al * (beta_k - beta_kp1) * gamma_k * \
                            q_di[d, e, k + 1]
                        l_ -= -al * al * beta_k * gamma_km1 * q_di[d, e, k]
                    tri_u[k, ik] = u_
                    tri_d[k, ik] = d_
                    tri_l[k, ik] = l_

        def fluxes(vv, ww):
            F = vv * (dz_d[e][:, None] * dy / dx) * rho_pi[e][:, None]
            FW = np.zeros((nz + 1, nx))
            for k in range(1, nz):
                FW[k] = ww[k - 1] * (dx * dy / dz_p[e][k - 1]) * \
                    rho_di[e, k]
            return F, FW

        def wdiv(F, FW, nd_):
            out = np.zeros((nd_, nz, nx))
            for d in range(nd_):
                for k in range(nz):
                    out[d, k] = (q_pi[d, e, k] *
                                 (np.roll(F[k], -1) - F[k]) +
                                 q_di[d, e, k + 1] * FW[k + 1] -
                                 q_di[d, e, k] * FW[k])
            return out

        rw = np.array(rhs_w[e])                      # (nl, nx)
        if gravity:
            # prepare: modify rhs_w in place (:4279-4349)
            Bv = np.zeros((nact, nz, nx))
            for d in range(nact):
                for k in range(nz):
                    Bv[d, k] = fHn1bar[k] * (rhs_dens[d, e, k] -
                                             q_pi[d, e, k] *
                                             rhs_dens[0, e, k])
            B0 = np.zeros((nz, nx))
            for k in range(nz):
                acc = np.zeros(nx)
                for d in range(nact):
                    acc += linp[d, k] * Bv[d, k]
                B0[k] = acc / (omega[k] * rho_pi[e, k] ** 2)
            for k in range(nl):
                rw[k] = rw[k] - al * 0.5 * (B0[k + 1] + B0[k]) * dp[k]
            rw = _thomas(A_l, A_d, A_u, rw)

        # common rhs preparation (:3694-3763) with the (possibly modified)
        # rhs_w
        F, FW = fluxes(rhs_v[e], rw)
        mf = rhs_dens[:nact, e] - al * wdiv(F, FW, nact)
        Bq = mf * fHn1bar[None, :, None]
        prhs = np.einsum('dk,dkx->kx', linp, Bq)
        phat = np.fft.rfft(prhs, axis=-1)            # (nz, nxr)

        if gravity:
            qt = np.zeros((nl, nxr), complex)
            for k in range(nl):
                qt[k] = Dmod_u[k] * phat[k + 1] / Fhorz[k + 1] + \
                    Dmod_d[k] * phat[k] / Fhorz[k]
            qt = _thomas(tri_l, tri_d, tri_u, qt)
            for k in range(nz):
                for d in range(nact):
                    f_k = 0.0 if k == 0 else \
                        rho_di[e, k] * q_di[d, e, k] * h01(k) * qt[k - 1]
                    f_kp1 = 0.0 if k == nz - 1 else \
                        rho_di[e, k + 1] * q_di[d, e, k + 1] * \
                        h01(k + 1) * qt[k]
                    phat[k] += al * al * linp[d, k] * fHn1bar[k] * \
                        (f_kp1 - f_k)
                phat[k] /= Fhorz[k]
        else:
            phat = _thomas(tri_l, tri_d, tri_u, phat)
        p = np.fft.irfft(phat, nx, axis=-1)

        # update_velocity (:3860-3917 / gravity :4500-4575)
        if gravity:
            dpdz = np.zeros((nl, nx))
            for k in range(nl):
                dpdz[k] = Dmod_u[k] * p[k + 1] + Dmod_d[k] * p[k]
            sw = _thomas(A_l, A_d, A_u, -al * dpdz)
            sw = sw + rw          # rhs_w as modified by prepare
        else:
            sw = np.zeros((nl, nx))
            for k in range(nl):
                sw[k] = rw[k] - al * (p[k + 1] - p[k]) / rho_di[e, k + 1]
        sv_ = np.zeros((nz, nx))
        for k in range(nz):
            sv_[k] = rhs_v[e, k] - al * (p[k] - np.roll(p[k], 1)) / \
                rho_pi[e, k]

        # update_densities over ALL prognostic densities (:3919-3969)
        F2, FW2 = fluxes(sv_, sw)
        sol_dens[:, e] = rhs_dens[:, e] - al * wdiv(F2, FW2, ndens)
        sol_v[e] = sv_
        sol_w[e] = sw
    return sol_dens, sol_v, sol_w


# ---------------------------------------------------------------------------
# Anelastic (AN) variant: Hamiltonian, pressure projection, compute_rhs
# ---------------------------------------------------------------------------

def fd_an_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst, ref):
    """F/FW/K as the compressible fd (Hk is shared) with B from
    Hamiltonian_AN_Hs::compute_dHsdx (anelastic.h:83-115): enthalpy at the
    REFERENCE pressure, thermo = IdealGas_Pottemp closed forms
    (thermo.h:70-200)."""
    F, FW, K, _ = fd_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst,
                            moist=False)
    ndens, nens, nz, nx = dens.shape
    B = np.zeros((2, nens, nz, nx))
    for e in range(nens):
        area = dx * dy * dz_d[e]
        for k in range(nz):
            refrho = ref["rho_pi"][e, k]
            refs = ref["q_pi"][1, e, k]
            refp = cst.pr * (refs * refrho * cst.Rd / cst.pr) ** cst.gamma_d
            piref = (refp / cst.pr) ** cst.kappa_d
            for i in range(nx):
                sv = dens[1, e, k, i] / dens[0, e, k, i]
                H = cst.Cpd * sv * piref
                gex = cst.Cpd * piref
                geop0 = geop[e, k, i] / area[k]
                B[0, e, k, i] = geop0 + H - sv * gex + K[e, k, i] / area[k]
                B[1, e, k, i] = gex
    return F, FW, K, B


def anelastic_project_oracle(v, w, dz_d, dz_p, dx, ref):
    """AnelasticLinearSystem (extrudedmodel.h:3245-3520): solve
    div(rho_ref grad p) = -div(rho_ref u) per x-wavenumber (numpy FFT +
    scalar Thomas), the formally singular Neumann system pinned by fixing
    the (m=0, kfix=nz//2) pressure; returns the velocity corrections
    (dv, dw) = (D0 p, D0_vert p) (:3486-3503)."""
    nens, nz, nx = v.shape
    rho_pi, rho_di = ref["rho_pi"], ref["rho_di"]
    kfix = nz // 2
    dv = np.zeros_like(v)
    dw = np.zeros_like(w)
    for e in range(nens):
        fH1 = dz_d[e] / dx                           # (nz,)
        h = np.zeros(nz + 1)
        for k in range(1, nz):
            h[k] = rho_di[e, k] * (dx / dz_p[e][k - 1])   # rho_di * H01
        F = v[e] * fH1[:, None] * rho_pi[e][:, None]
        FW = np.zeros((nz + 1, nx))
        for k in range(1, nz):
            FW[k] = w[e, k - 1] * (dx / dz_p[e][k - 1]) * rho_di[e, k]
        mf = (np.roll(F, -1, axis=-1) - F) + (FW[1:] - FW[:-1])
        rhs = np.fft.fft(-mf, axis=-1)
        rhs[kfix, 0] = 0.0
        phat = np.zeros((nz, nx), complex)
        for ik in range(nx):
            th = 2.0 * np.pi * ik / nx
            fDD = 2.0 * (np.cos(th) - 1.0)
            tri_d = np.empty(nz)
            tri_u = np.empty(nz)
            tri_l = np.empty(nz)
            for k in range(nz):
                d_ = fH1[k] * rho_pi[e, k] * fDD
                if k == 0:
                    d_ += -h[k + 1]
                elif k == nz - 1:
                    d_ += -h[k]
                else:
                    d_ += -(h[k + 1] + h[k])
                tri_d[k] = d_
                tri_u[k] = h[k + 1]
                tri_l[k] = h[k]
            if ik == 0:
                tri_d[kfix] = 1.0
                tri_u[kfix] = 0.0
                tri_l[kfix] = 0.0
            phat[:, ik] = _thomas(tri_l, tri_d, tri_u, rhs[:, ik])
        p = np.real(np.fft.ifft(phat, axis=-1))
        dv[e] = p - np.roll(p, 1, axis=-1)           # D0: p[i]-p[i-1]
        dw[e] = p[1:] - p[:-1]                       # D0_vert
    return dv, dw


def anelastic_rhs_oracle(dens, v, w, geop, dt, dz_d, dz_p, dx, dy, cst,
                         mats, ref, dens_pos):
    """AN compute_rhs: AN Hamiltonian fd + apply_symplectic with the AN
    mass-recon branch + rho tendency zeroed (VS_AN
    ndensity_dycore_prognostic=1) + the anelastic tendency projection
    (add_pressure_perturbation, extrudedmodel.h:2496-2503)."""
    F, FW, K, B = fd_an_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst,
                               ref)
    td, tv, tw = apply_symplectic_oracle(dens, v, w, F, FW, B, dt, dz_d,
                                         dz_p, dx, dy, mats, ref, dens_pos,
                                         anelastic=True)
    td[0] = 0.0
    dv, dw = anelastic_project_oracle(-tv, -tw, dz_d, dz_p, dx, ref)
    return td, tv - dv, tw - dw
