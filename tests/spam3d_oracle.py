"""Scalar transliteration of the reference 3-D (ndims=2) extruded SPAM
tendencies — the y-varying oracle (VERDICT r4 item 3a).

TEST-ONLY executable golden reference: loop-level numpy transliterations
of the reference kernels with the ndims=2 branches, used to validate the
independently-written port (pam_tpu/spam/extruded3d.py) on genuinely
y-varying data — the regime the x/y-degenerate slab reductions cannot
probe (a sign error in qxy/Qyz/W2D or a y-recon that cancels in
degenerate configs would survive them).

Sources transliterated (cited per function):
* ext_deriv.h D1_ext:800-845 (ndims=2: zeta_xz NEGATED), compute_D1:725-760
* hamiltonians/functionals.h compute_hvxz/hvyz/hvxy:180-240,
  compute_qhz:277-300, compute_qxyfxy:416-428
* operators/wedge.h Q2D:52-72, compute_Q_EC:45-92,
  Qxz_w_EC (sgn=-1 for ndims=2):130-230, Qyz_w_EC (+):313-408,
  Qxz_u_EC (sgn=+1):478-600, Qyz_v_EC (-):635-700,
  W2D/compute_W:780-807, Wxz_u (-):809-856, Wxz_w:858-905,
  Wyz_u (+):907-955, Wyz_w:957-1005
* operators/recon.h compute_straight_recon:433-470 (the d==ndims-2
  "twist" sign on uvar), compute_twisted_recon / upwind_recon
* extrudedmodel.h compute_edge_reconstructions_uniform / compute_recons
  / fct / compute_tendencies, ndims=2 branches
* kinetic_energy.h compute_he_U_and_K:306-395 (ndims=2 y terms)
* hamiltonians/thermo.h IdealGas_Pottemp:70-200

Never imported by pam_tpu.
"""

import numpy as np

from spam_oracle import (_weno_edges, _heav, _mirror_layer_idx,
                         _mirror_iface_idx)


def _idealgas_B(cst, alpha, sv, geop0, K0):
    """B rows for IdealGas_Pottemp CE (thermo.h:70-200):
    B_mass = geop0 + U + p*alpha - sv*gexner + K0, B_entr = gexner."""
    U = cst.Cvd * sv ** cst.gamma_d * \
        (cst.Rd / (alpha * cst.pr)) ** cst.delta_d
    p = cst.pr * (sv * cst.Rd / (alpha * cst.pr)) ** cst.gamma_d
    gex = cst.Cpd * (sv * cst.Rd / (alpha * cst.pr)) ** cst.delta_d
    return geop0 + U + p * alpha - sv * gex + K0, gex


def fd_3d_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst):
    """F (2 comps), FW, K, B (extrudedmodel.h:1996-2084 +
    kinetic_energy.h:306-395, ndims=2). dens: (ndens, nens, nz, ny, nx);
    v: (2, nens, nz, ny, nx); w: (nens, nz-1, ny, nx). CE (total density
    = dens[0]); thermo IdealGas_Pottemp."""
    ndens, nens, nz, ny, nx = dens.shape
    F = np.zeros((2, nens, nz, ny, nx))
    FW = np.zeros((nens, nz + 1, ny, nx))
    K = np.zeros((nens, nz, ny, nx))
    B = np.zeros((2, nens, nz, ny, nx))
    for e in range(nens):
        area = dx * dy * dz_d[e]
        rho0 = dens[0, e] / area[:, None, None]
        u0 = v[0, e] * (dy * dz_d[e][:, None, None] / dx)    # H10 x
        u1 = v[1, e] * (dx * dz_d[e][:, None, None] / dy)    # H10 y
        uw = np.zeros((nz + 1, ny, nx))
        for k in range(1, nz):
            uw[k] = w[e, k - 1] * (dx * dy / dz_p[e][k - 1])  # H01
        for k in range(nz):
            for j in range(ny):
                jm1, jp1 = (j - 1) % ny, (j + 1) % ny
                for i in range(nx):
                    im1, ip1 = (i - 1) % nx, (i + 1) % nx
                    he0 = 0.5 * (rho0[k, j, i] + rho0[k, j, im1])
                    he1 = 0.5 * (rho0[k, j, i] + rho0[k, jm1, i])
                    F[0, e, k, j, i] = he0 * u0[k, j, i]
                    F[1, e, k, j, i] = he1 * u1[k, j, i]
                    Kh = 0.5 * (v[0, e, k, j, i] * u0[k, j, i] +
                                v[0, e, k, j, ip1] * u0[k, j, ip1]) + \
                        0.5 * (v[1, e, k, j, i] * u1[k, j, i] +
                               v[1, e, k, jp1, i] * u1[k, jp1, i])
                    w_km1 = w[e, k - 1, j, i] if k - 1 >= 0 else w[e, 0, j, i]
                    w_k = w[e, k, j, i] if k < nz - 1 else w[e, nz - 2, j, i]
                    Kv = 0.5 * (w_km1 * uw[k, j, i] + w_k * uw[k + 1, j, i])
                    K[e, k, j, i] = 0.5 * (Kh + Kv)
        for k in range(nz + 1):
            km1 = _mirror_layer_idx(k - 1, nz)
            kk = _mirror_layer_idx(k, nz)
            for j in range(ny):
                for i in range(nx):
                    hew = 0.5 * (rho0[kk, j, i] + rho0[km1, j, i])
                    FW[e, k, j, i] = hew * uw[k, j, i]
        for k in range(nz):
            a = area[k]
            for j in range(ny):
                for i in range(nx):
                    alpha = a / dens[0, e, k, j, i]
                    sv = dens[1, e, k, j, i] / dens[0, e, k, j, i]
                    b0, b1 = _idealgas_B(cst, alpha, sv,
                                         geop[e, k, j, i] / a,
                                         K[e, k, j, i] / a)
                    B[0, e, k, j, i] = b0
                    B[1, e, k, j, i] = b1
    return F, FW, K, B


def q_3d_oracle(dens, v, w):
    """qhz (2 comps at hz vertices, rows 0/nz zero) and qxy (dual layers)
    (functionals.h compute_qhz:277-300 with the D1_ext ndims=2 sign flip
    — ext_deriv.h:800-845 — and compute_qxyfxy:416-428 /
    compute_D1:725-760)."""
    ndens, nens, nz, ny, nx = dens.shape
    qhz = np.zeros((2, nens, nz + 1, ny, nx))
    qxy = np.zeros((nens, nz, ny, nx))
    D = dens[0]
    for e in range(nens):
        for kv in range(1, nz):
            for j in range(ny):
                jm1 = (j - 1) % ny
                for i in range(nx):
                    im1 = (i - 1) % nx
                    # R/Rbnd along x and along y (compute_hvxz/hvyz)
                    if kv == 1:
                        hv0 = 0.25 * (D[e, 1, j, i] + D[e, 1, j, im1]) + \
                            0.5 * (D[e, 0, j, i] + D[e, 0, j, im1])
                        hv1 = 0.25 * (D[e, 1, j, i] + D[e, 1, jm1, i]) + \
                            0.5 * (D[e, 0, j, i] + D[e, 0, jm1, i])
                    elif kv == nz - 1:
                        hv0 = 0.25 * (D[e, nz - 2, j, i] +
                                      D[e, nz - 2, j, im1]) + \
                            0.5 * (D[e, nz - 1, j, i] + D[e, nz - 1, j, im1])
                        hv1 = 0.25 * (D[e, nz - 2, j, i] +
                                      D[e, nz - 2, jm1, i]) + \
                            0.5 * (D[e, nz - 1, j, i] + D[e, nz - 1, jm1, i])
                    else:
                        hv0 = 0.25 * (D[e, kv - 1, j, i] + D[e, kv - 1, j, im1] +
                                      D[e, kv, j, i] + D[e, kv, j, im1])
                        hv1 = 0.25 * (D[e, kv - 1, j, i] + D[e, kv - 1, jm1, i] +
                                      D[e, kv, j, i] + D[e, kv, jm1, i])
                    # D1_ext at k = kv-1 (the "-1 since d00(i,k) = p11(i,k)")
                    # d=0 (ndims=2): NEGATED (ext_deriv.h:806-812)
                    zeta_xz = -((v[0, e, kv - 1, j, i] - v[0, e, kv, j, i]) +
                                (w[e, kv - 1, j, i] - w[e, kv - 1, j, im1]))
                    zeta_yz = (w[e, kv - 1, j, i] - w[e, kv - 1, jm1, i]) + \
                        (v[1, e, kv - 1, j, i] - v[1, e, kv, j, i])
                    qhz[0, e, kv, j, i] = zeta_xz / hv0
                    qhz[1, e, kv, j, i] = zeta_yz / hv1
        for k in range(nz):
            for j in range(ny):
                jm1 = (j - 1) % ny
                for i in range(nx):
                    im1 = (i - 1) % nx
                    hvxy = 0.25 * (D[e, k, j, i] + D[e, k, j, im1] +
                                   D[e, k, jm1, i] + D[e, k, jm1, im1])
                    # compute_D1: v1[i]-v0[j... ] (ext_deriv.h:725-736)
                    zeta_xy = (v[1, e, k, j, i] - v[1, e, k, j, im1]) - \
                        (v[0, e, k, j, i] - v[0, e, k, jm1, i])
                    qxy[e, k, j, i] = zeta_xy / hvxy
    return qhz, qxy


def tangent_fluxes_3d_oracle(F, FW):
    """FT=(Wxz_u -, Wyz_u +), FTW=(Wxz_w, Wyz_w), FTxy=W2D(F)
    (wedge.h:780-1005 + boundary variants reading the interior-shifted
    rows)."""
    _, nens, nz, ny, nx = F.shape
    FT = np.zeros((2, nens, nz, ny, nx))
    FTW = np.zeros((2, nens, nz - 1, ny, nx))
    FTxy = np.zeros((2, nens, nz, ny, nx))
    for e in range(nens):
        for j in range(ny):
            jm1, jp1 = (j - 1) % ny, (j + 1) % ny
            for i in range(nx):
                im1, ip1 = (i - 1) % nx, (i + 1) % nx
                for k in range(nz):
                    if k == 0:
                        FT[0, e, k, j, i] = -0.5 * (FW[e, 0, j, i] +
                                                    FW[e, 0, j, im1])
                        FT[1, e, k, j, i] = 0.5 * (FW[e, 0, j, i] +
                                                   FW[e, 0, jm1, i])
                    elif k == nz - 1:
                        FT[0, e, k, j, i] = -0.5 * (FW[e, nz, j, i] +
                                                    FW[e, nz, j, im1])
                        FT[1, e, k, j, i] = 0.5 * (FW[e, nz, j, i] +
                                                   FW[e, nz, jm1, i])
                    else:
                        FT[0, e, k, j, i] = -0.25 * (
                            FW[e, k, j, i] + FW[e, k, j, im1] +
                            FW[e, k + 1, j, i] + FW[e, k + 1, j, im1])
                        FT[1, e, k, j, i] = 0.25 * (
                            FW[e, k, j, i] + FW[e, k, jm1, i] +
                            FW[e, k + 1, j, i] + FW[e, k + 1, jm1, i])
                    # FTxy = W2D (wedge.h:782-805)
                    FTxy[0, e, k, j, i] = -0.25 * (
                        F[1, e, k, j, i] + F[1, e, k, j, im1] +
                        F[1, e, k, jp1, i] + F[1, e, k, jp1, im1])
                    FTxy[1, e, k, j, i] = 0.25 * (
                        F[0, e, k, j, i] + F[0, e, k, j, ip1] +
                        F[0, e, k, jm1, i] + F[0, e, k, jm1, ip1])
                for k in range(nz - 1):
                    if k == 0:
                        FTW[0, e, k, j, i] = 0.25 * (F[0, e, 1, j, i] +
                                                     F[0, e, 1, j, ip1])
                        FTW[1, e, k, j, i] = 0.25 * (F[1, e, 1, j, i] +
                                                     F[1, e, 1, jp1, i])
                    elif k == nz - 2:
                        FTW[0, e, k, j, i] = 0.25 * (F[0, e, k, j, i] +
                                                     F[0, e, k, j, ip1])
                        FTW[1, e, k, j, i] = 0.25 * (F[1, e, k, j, i] +
                                                     F[1, e, k, jp1, i])
                    else:
                        FTW[0, e, k, j, i] = 0.25 * (
                            F[0, e, k, j, i] + F[0, e, k, j, ip1] +
                            F[0, e, k + 1, j, i] + F[0, e, k + 1, j, ip1])
                        FTW[1, e, k, j, i] = 0.25 * (
                            F[1, e, k, j, i] + F[1, e, k, jp1, i] +
                            F[1, e, k + 1, j, i] + F[1, e, k + 1, jp1, i])
    return FT, FTW, FTxy


def apply_symplectic_3d_oracle(dens, v, w, F, FW, B, dt, dz_d, dz_p, dx,
                               dy, mats, ref, dens_pos, fct_avail=None):
    """Full 3-D apply_symplectic (extrudedmodel.h:2173-2486, ndims=2):
    tangent fluxes, all PV components + recons, 3-D Zalesak FCT, EC flux
    assembly with the ndims=2 wedge signs. needs_to_recompute_F=false
    (the compute_rhs path: recon fluxes ARE F/FW). fct_avail: optional
    availability override for the FCT ratio (test hook proving the
    limiters fire; default = dens itself, the reference behavior)."""
    ndens, nens, nz, ny, nx = dens.shape
    hs = (len(mats["idl"]) - 2)
    FT, FTW, FTxy = tangent_fluxes_3d_oracle(F, FW)
    qhz, qxy = q_3d_oracle(dens, v, w)
    avail = dens if fct_avail is None else fct_avail

    denstend = np.zeros_like(dens)
    vtend = np.zeros_like(v)
    wtend = np.zeros_like(w)
    for e in range(nens):
        area = dx * dy * dz_d[e]
        rho0 = dens[0, e] / area[:, None, None]
        dens0 = np.empty((ndens, nz, ny, nx))
        for l in range(ndens):
            dens0[l] = (dens[l, e] - ref["refdens"][l, e][:, None, None]) / \
                area[:, None, None]

        # ---- twisted dens edge recons along x, y, z ----
        dl_e = np.empty((ndens, nz, ny, nx))
        dr_e = np.empty((ndens, nz, ny, nx))
        db_y = np.empty((ndens, nz, ny, nx))
        dt_y = np.empty((ndens, nz, ny, nx))
        db_z = np.empty((ndens, nz, ny, nx))
        dt_z = np.empty((ndens, nz, ny, nx))
        for l in range(ndens):
            for k in range(nz):
                for j in range(ny):
                    for i in range(nx):
                        sten = np.array([dens0[l, k, j, (i + p - hs) % nx]
                                         for p in range(2 * hs + 1)])
                        dl_e[l, k, j, i], dr_e[l, k, j, i] = \
                            _weno_edges(sten, mats)
                        sten = np.array([dens0[l, k, (j + p - hs) % ny, i]
                                         for p in range(2 * hs + 1)])
                        db_y[l, k, j, i], dt_y[l, k, j, i] = \
                            _weno_edges(sten, mats)
                        sten = np.array([
                            dens0[l, _mirror_iface_idx(k + p - hs, nz), j, i]
                            for p in range(2 * hs + 1)])
                        db_z[l, k, j, i], dt_z[l, k, j, i] = \
                            _weno_edges(sten, mats)

        # ---- densrecon at x- and y-edges (compute_recons) ----
        densrecon0 = np.empty((ndens, nz, ny, nx))
        densrecon1 = np.empty((ndens, nz, ny, nx))
        for k in range(nz):
            for j in range(ny):
                jm1 = (j - 1) % ny
                for i in range(nx):
                    im1 = (i - 1) % nx
                    he0 = 0.5 * (rho0[k, j, i] + rho0[k, j, im1])
                    he1 = 0.5 * (rho0[k, j, i] + rho0[k, jm1, i])
                    up0 = _heav(F[0, e, k, j, i])
                    up1 = _heav(F[1, e, k, j, i])
                    for l in range(ndens):
                        r0 = dl_e[l, k, j, i] * (1.0 - up0) + \
                            dr_e[l, k, j, im1] * up0
                        r1 = db_y[l, k, j, i] * (1.0 - up1) + \
                            dt_y[l, k, jm1, i] * up1
                        radd = ref["rho_pi"][e, k] * ref["q_pi"][l, e, k]
                        densrecon0[l, k, j, i] = (r0 + radd) / he0
                        densrecon1[l, k, j, i] = (r1 + radd) / he1
        # ---- densvertrecon at dual interfaces ----
        densvertrecon = np.zeros((ndens, nz + 1, ny, nx))
        for kv in range(1, nz):
            for j in range(ny):
                for i in range(nx):
                    hew = 0.5 * (rho0[kv, j, i] + rho0[kv - 1, j, i])
                    up = _heav(FW[e, kv, j, i])
                    for l in range(ndens):
                        r = db_z[l, kv, j, i] * (1.0 - up) + \
                            dt_z[l, kv - 1, j, i] * up
                        r += ref["rho_di"][e, kv] * ref["q_di"][l, e, kv]
                        densvertrecon[l, kv, j, i] = r / hew

        # ---- qhz recons: dof0 straight along x (upw FTW0), dof1 along y
        # (upw FTW1); stencil for primal layer k centered at interface k+1
        nl_p = nz - 1
        q0l = np.empty((nl_p, ny, nx))
        q0r = np.empty((nl_p, ny, nx))
        q1b = np.empty((nl_p, ny, nx))
        q1t = np.empty((nl_p, ny, nx))
        q0zb = np.empty((nl_p, ny, nx))
        q0zt = np.empty((nl_p, ny, nx))
        q1zb = np.empty((nl_p, ny, nx))
        q1zt = np.empty((nl_p, ny, nx))
        for k in range(nl_p):
            for j in range(ny):
                for i in range(nx):
                    sten = np.array([qhz[0, e, k + 1, j, (i + p - hs) % nx]
                                     for p in range(2 * hs + 1)])
                    q0l[k, j, i], q0r[k, j, i] = _weno_edges(sten, mats)
                    sten = np.array([qhz[1, e, k + 1, (j + p - hs) % ny, i]
                                     for p in range(2 * hs + 1)])
                    q1b[k, j, i], q1t[k, j, i] = _weno_edges(sten, mats)
                    sten = np.array([
                        qhz[0, e, _mirror_iface_idx(k + 1 + p - hs, nz + 1),
                            j, i] for p in range(2 * hs + 1)])
                    q0zb[k, j, i], q0zt[k, j, i] = _weno_edges(sten, mats)
                    sten = np.array([
                        qhz[1, e, _mirror_iface_idx(k + 1 + p - hs, nz + 1),
                            j, i] for p in range(2 * hs + 1)])
                    q1zb[k, j, i], q1zt[k, j, i] = _weno_edges(sten, mats)
        qhzrecon0 = np.empty((nl_p, ny, nx))
        qhzrecon1 = np.empty((nl_p, ny, nx))
        for k in range(nl_p):
            for j in range(ny):
                jp1 = (j + 1) % ny
                for i in range(nx):
                    ip1 = (i + 1) % nx
                    up = _heav(FTW[0, e, k, j, i])
                    qhzrecon0[k, j, i] = q0l[k, j, ip1] * (1.0 - up) + \
                        q0r[k, j, i] * up
                    up = _heav(FTW[1, e, k, j, i])
                    qhzrecon1[k, j, i] = q1b[k, jp1, i] * (1.0 - up) + \
                        q1t[k, j, i] * up
        # vertical qhz recons at v-points: dof0 upwound by -FT0 (the d=0
        # "twist", recon.h:236-240), dof1 by +FT1
        qhzvertrecon0 = np.empty((nz, ny, nx))
        qhzvertrecon1 = np.empty((nz, ny, nx))
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    e1_0 = q0zb[k, j, i] if k < nl_p else \
                        q0zb[_mirror_layer_idx(k, nl_p), j, i]
                    e0_0 = q0zt[k - 1, j, i] if k - 1 >= 0 else \
                        q0zt[_mirror_layer_idx(k - 1, nl_p), j, i]
                    up = _heav(-FT[0, e, k, j, i])
                    qhzvertrecon0[k, j, i] = e1_0 * (1.0 - up) + e0_0 * up
                    e1_1 = q1zb[k, j, i] if k < nl_p else \
                        q1zb[_mirror_layer_idx(k, nl_p), j, i]
                    e0_1 = q1zt[k - 1, j, i] if k - 1 >= 0 else \
                        q1zt[_mirror_layer_idx(k - 1, nl_p), j, i]
                    up = _heav(FT[1, e, k, j, i])
                    qhzvertrecon1[k, j, i] = e1_1 * (1.0 - up) + e0_1 * up

        # ---- qxy recons (straight per level; recon.h:433-470: d=1 along
        # x upwound by +FTxy1, d=0 along y by -FTxy0 — uvar(d==ndims-2)
        # negated, "corrects for the twist in 2D")
        xl = np.empty((nz, ny, nx))
        xr = np.empty((nz, ny, nx))
        yl = np.empty((nz, ny, nx))
        yr = np.empty((nz, ny, nx))
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    sten = np.array([qxy[e, k, j, (i + p - hs) % nx]
                                     for p in range(2 * hs + 1)])
                    xl[k, j, i], xr[k, j, i] = _weno_edges(sten, mats)
                    sten = np.array([qxy[e, k, (j + p - hs) % ny, i]
                                     for p in range(2 * hs + 1)])
                    yl[k, j, i], yr[k, j, i] = _weno_edges(sten, mats)
        qxyrecon0 = np.empty((nz, ny, nx))   # d=0: y-direction edges
        qxyrecon1 = np.empty((nz, ny, nx))   # d=1: x-direction edges
        for k in range(nz):
            for j in range(ny):
                jp1 = (j + 1) % ny
                for i in range(nx):
                    ip1 = (i + 1) % nx
                    up = _heav(FTxy[1, e, k, j, i])
                    qxyrecon1[k, j, i] = xl[k, j, ip1] * (1.0 - up) + \
                        xr[k, j, i] * up
                    up = _heav(-FTxy[0, e, k, j, i])
                    qxyrecon0[k, j, i] = yl[k, jp1, i] * (1.0 - up) + \
                        yr[k, j, i] * up

        # ---- 3-D Zalesak FCT (fct.h, ndims=2) ----
        eps = 1.0e-8
        ef0 = np.zeros((ndens, nz, ny, nx))
        ef1 = np.zeros((ndens, nz, ny, nx))
        vef = np.zeros((ndens, nz + 1, ny, nx))
        for l in range(ndens):
            if not dens_pos[l]:
                continue
            ef0[l] = densrecon0[l] * F[0, e]
            ef1[l] = densrecon1[l] * F[1, e]
            for kv in range(1, nz):
                vef[l, kv] = densvertrecon[l, kv] * FW[e, kv]
        Mf = np.zeros((ndens, nz, ny, nx))
        for l in range(ndens):
            if not dens_pos[l]:
                continue
            for k in range(nz):
                for j in range(ny):
                    jp1 = (j + 1) % ny
                    for i in range(nx):
                        ip1 = (i + 1) % nx
                        Mf[l, k, j, i] = dt * (
                            max(ef0[l, k, j, ip1], 0.0) -
                            min(ef0[l, k, j, i], 0.0) +
                            max(ef1[l, k, jp1, i], 0.0) -
                            min(ef1[l, k, j, i], 0.0) +
                            max(vef[l, k + 1, j, i], 0.0) -
                            min(vef[l, k, j, i], 0.0)) + eps
        for l in range(ndens):
            if not dens_pos[l]:
                continue
            new0 = densrecon0[l].copy()
            new1 = densrecon1[l].copy()
            for k in range(nz):
                for j in range(ny):
                    jm1 = (j - 1) % ny
                    for i in range(nx):
                        im1 = (i - 1) % nx
                        up = _heav(ef0[l, k, j, i])
                        phi = min(1.0, avail[l, e, k, j, i] /
                                  Mf[l, k, j, i]) * (1.0 - up) + \
                            min(1.0, avail[l, e, k, j, im1] /
                                Mf[l, k, j, im1]) * up
                        new0[k, j, i] = densrecon0[l, k, j, i] * phi
                        up = _heav(ef1[l, k, j, i])
                        phi = min(1.0, avail[l, e, k, j, i] /
                                  Mf[l, k, j, i]) * (1.0 - up) + \
                            min(1.0, avail[l, e, k, jm1, i] /
                                Mf[l, k, jm1, i]) * up
                        new1[k, j, i] = densrecon1[l, k, j, i] * phi
            densrecon0[l] = new0
            densrecon1[l] = new1
            for kv in range(1, nz):
                for j in range(ny):
                    for i in range(nx):
                        up = _heav(vef[l, kv, j, i])
                        phi = min(1.0, avail[l, e, kv, j, i] /
                                  Mf[l, kv, j, i]) * (1.0 - up) + \
                            min(1.0, avail[l, e, kv - 1, j, i] /
                                Mf[l, kv - 1, j, i]) * up
                        densvertrecon[l, kv, j, i] *= phi

        # ---- tendencies assembly (compute_tendencies, ndims=2) ----
        nact = 2
        for k in range(nz - 1):                # Wtend at w-layers
            for j in range(ny):
                jp1 = (j + 1) % ny
                for i in range(nx):
                    ip1 = (i + 1) % nx
                    t = 0.0
                    for l in range(nact):
                        t += densvertrecon[l, k + 1, j, i] * \
                            (B[l, e, k + 1, j, i] - B[l, e, k, j, i])
                    if ref.get("B_ref") is not None:
                        for l in range(nact):
                            t += ref["q_di"][l, e, k + 1] * \
                                (ref["B_ref"][l, e, k + 1] -
                                 ref["B_ref"][l, e, k])
                    # Qxz_w_EC, sgn=-1 for ndims=2 (wedge.h:154)
                    if k == 0:
                        t += -0.25 * (
                            F[0, e, 1, j, i] * 0.5 * (qhzvertrecon0[1, j, i] +
                                                      qhzrecon0[0, j, i]) +
                            F[0, e, 1, j, ip1] * 0.5 *
                            (qhzvertrecon0[1, j, ip1] + qhzrecon0[0, j, i]))
                        t += 0.25 * (
                            F[1, e, 1, j, i] * 0.5 * (qhzvertrecon1[1, j, i] +
                                                      qhzrecon1[0, j, i]) +
                            F[1, e, 1, jp1, i] * 0.5 *
                            (qhzvertrecon1[1, jp1, i] + qhzrecon1[0, j, i]))
                    elif k == nz - 2:
                        t += -0.25 * (
                            F[0, e, k, j, i] * 0.5 * (qhzvertrecon0[k, j, i] +
                                                      qhzrecon0[k, j, i]) +
                            F[0, e, k, j, ip1] * 0.5 *
                            (qhzvertrecon0[k, j, ip1] + qhzrecon0[k, j, i]))
                        t += 0.25 * (
                            F[1, e, k, j, i] * 0.5 * (qhzvertrecon1[k, j, i] +
                                                      qhzrecon1[k, j, i]) +
                            F[1, e, k, jp1, i] * 0.5 *
                            (qhzvertrecon1[k, jp1, i] + qhzrecon1[k, j, i]))
                    else:
                        t += -0.25 * (
                            F[0, e, k, j, i] * 0.5 * (qhzvertrecon0[k, j, i] +
                                                      qhzrecon0[k, j, i]) +
                            F[0, e, k, j, ip1] * 0.5 *
                            (qhzvertrecon0[k, j, ip1] + qhzrecon0[k, j, i]) +
                            F[0, e, k + 1, j, i] * 0.5 *
                            (qhzvertrecon0[k + 1, j, i] + qhzrecon0[k, j, i]) +
                            F[0, e, k + 1, j, ip1] * 0.5 *
                            (qhzvertrecon0[k + 1, j, ip1] +
                             qhzrecon0[k, j, i]))
                        t += 0.25 * (
                            F[1, e, k, j, i] * 0.5 * (qhzvertrecon1[k, j, i] +
                                                      qhzrecon1[k, j, i]) +
                            F[1, e, k, jp1, i] * 0.5 *
                            (qhzvertrecon1[k, jp1, i] + qhzrecon1[k, j, i]) +
                            F[1, e, k + 1, j, i] * 0.5 *
                            (qhzvertrecon1[k + 1, j, i] + qhzrecon1[k, j, i]) +
                            F[1, e, k + 1, jp1, i] * 0.5 *
                            (qhzvertrecon1[k + 1, jp1, i] +
                             qhzrecon1[k, j, i]))
                    wtend[e, k, j, i] = t
        for k in range(nz):                    # Vtend x and y components
            for j in range(ny):
                jm1 = (j - 1) % ny
                jp1 = (j + 1) % ny
                for i in range(nx):
                    im1 = (i - 1) % nx
                    ip1 = (i + 1) % nx
                    t0 = 0.0
                    t1 = 0.0
                    for l in range(nact):
                        t0 += densrecon0[l, k, j, i] * \
                            (B[l, e, k, j, i] - B[l, e, k, j, im1])
                        t1 += densrecon1[l, k, j, i] * \
                            (B[l, e, k, j, i] - B[l, e, k, jm1, i])
                    # Qxz_u_EC, sgn=+1 for ndims=2 (wedge.h:506); qr at
                    # k-1 (the UW extra-boundary-dof shift)
                    if k == 0:
                        t0 += 0.5 * (FW[e, 0, j, i] + FW[e, 0, j, im1]) * \
                            qhzvertrecon0[0, j, i]       # FW bnd == 0
                        t1 += -0.5 * (FW[e, 0, j, i] + FW[e, 0, jm1, i]) * \
                            qhzvertrecon1[0, j, i]
                    elif k == nz - 1:
                        t0 += 0.5 * (FW[e, nz, j, i] + FW[e, nz, j, im1]) * \
                            qhzvertrecon0[nz - 1, j, i]
                        t1 += -0.5 * (FW[e, nz, j, i] + FW[e, nz, jm1, i]) * \
                            qhzvertrecon1[nz - 1, j, i]
                    else:
                        qr0km1 = qhzrecon0[k - 1, j, i]
                        qr0k = qhzrecon0[k, j, i]
                        t0 += 0.25 * (
                            FW[e, k, j, i] * 0.5 * (qr0km1 +
                                                    qhzvertrecon0[k, j, i]) +
                            FW[e, k, j, im1] * 0.5 *
                            (qhzrecon0[k - 1, j, im1] +
                             qhzvertrecon0[k, j, i]) +
                            FW[e, k + 1, j, i] * 0.5 *
                            (qr0k + qhzvertrecon0[k, j, i]) +
                            FW[e, k + 1, j, im1] * 0.5 *
                            (qhzrecon0[k, j, im1] + qhzvertrecon0[k, j, i]))
                        # Qyz_v_EC, sgn=-1 (wedge.h:635-700)
                        t1 += -0.25 * (
                            FW[e, k, j, i] * 0.5 * (qhzrecon1[k - 1, j, i] +
                                                    qhzvertrecon1[k, j, i]) +
                            FW[e, k, jm1, i] * 0.5 *
                            (qhzrecon1[k - 1, jm1, i] +
                             qhzvertrecon1[k, j, i]) +
                            FW[e, k + 1, j, i] * 0.5 *
                            (qhzrecon1[k, j, i] + qhzvertrecon1[k, j, i]) +
                            FW[e, k + 1, jm1, i] * 0.5 *
                            (qhzrecon1[k, jm1, i] + qhzvertrecon1[k, j, i]))
                    # horizontal Q_EC per level (wedge.h:45-92 + Q2D:52-72)
                    f00 = F[1, e, k, j, i]
                    f01 = F[1, e, k, j, im1]
                    f02 = F[1, e, k, jp1, i]
                    f03 = F[1, e, k, jp1, im1]
                    t0 += -0.125 * (f00 * qxyrecon1[k, j, i] +
                                    f01 * qxyrecon1[k, j, im1] +
                                    f02 * qxyrecon1[k, jp1, i] +
                                    f03 * qxyrecon1[k, jp1, im1] +
                                    (f00 + f01 + f02 + f03) *
                                    qxyrecon0[k, j, i])
                    f10 = F[0, e, k, j, i]
                    f11 = F[0, e, k, j, ip1]
                    f12 = F[0, e, k, jm1, i]
                    f13 = F[0, e, k, jm1, ip1]
                    t1 += 0.125 * (f10 * qxyrecon0[k, j, i] +
                                   f11 * qxyrecon0[k, j, ip1] +
                                   f12 * qxyrecon0[k, jm1, i] +
                                   f13 * qxyrecon0[k, jm1, ip1] +
                                   (f10 + f11 + f12 + f13) *
                                   qxyrecon1[k, j, i])
                    vtend[0, e, k, j, i] = t0
                    vtend[1, e, k, j, i] = t1
        for l in range(ndens):                 # dens tendencies
            for k in range(nz):
                for j in range(ny):
                    jp1 = (j + 1) % ny
                    for i in range(nx):
                        ip1 = (i + 1) % nx
                        denstend[l, e, k, j, i] = (
                            F[0, e, k, j, ip1] * densrecon0[l, k, j, ip1] -
                            F[0, e, k, j, i] * densrecon0[l, k, j, i] +
                            F[1, e, k, jp1, i] * densrecon1[l, k, jp1, i] -
                            F[1, e, k, j, i] * densrecon1[l, k, j, i] +
                            FW[e, k + 1, j, i] *
                            densvertrecon[l, k + 1, j, i] -
                            FW[e, k, j, i] * densvertrecon[l, k, j, i])
    return denstend, vtend, wtend


def compute_rhs_3d_oracle(dens, v, w, geop, dt, dz_d, dz_p, dx, dy, cst,
                          mats, ref, dens_pos, fct_avail=None):
    """Tendencies::compute_rhs for ndims=2 (fd + apply_symplectic)."""
    F, FW, K, B = fd_3d_oracle(dens, v, w, geop, dz_d, dz_p, dx, dy, cst)
    return apply_symplectic_3d_oracle(dens, v, w, F, FW, B, dt, dz_d, dz_p,
                                      dx, dy, mats, ref, dens_pos,
                                      fct_avail=fct_avail)
