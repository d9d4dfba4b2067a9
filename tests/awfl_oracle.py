"""Scalar/loop numpy oracle of one AWFL ``compute_tendencies`` evaluation.

Independent golden reference for the PAM-A dycore's semi-discrete RHS
(VERDICT r3 item 2): a fresh per-(cell,face) scalar transliteration of the
reference CUDA/YAKL kernels —

* halo exchange + vertical BCs: dynamics/awfl/Dycore.h:608-711
  (periodic x/y, zero-w / zero-gradient / hydrostatic-rho vertical halos)
* WENO limiter: dynamics/awfl/WenoLimiter.h:98-181 (compute_weno_coefs
  incl. convexify + map_weights) with the reference's own truncated
  total-variation polynomials (TransformMatrices.h coefs_to_tv, sizes 3/5)
* reconstruct: Dycore.h:591-604
* flux build (acoustic characteristic split + advective upwind):
  Dycore.h:332-521 (x), :389-445 (y), :447-521 (z, per-level matrices,
  rigid-lid mass-flux zeroing)
* FCT positivity + flux divergence + gravity source: Dycore.h:525-584

exactly as the Fortran transliterations in p3_oracle.py / shoc_oracle.py
serve the physics: test-only executable golden data, never imported by
``pam_tpu``. The reconstruction MATRICES (sten_to_coefs, coefs_to_gll,
weno_recon_lower, ideal weights, per-level vertical stacks) come from
``pam_tpu.ops.recon_matrices``, which is itself independently validated
against the reference's regular/irregular recon unit tests
(tests/test_recon.py) — the oracle exercises everything the port
VECTORIZES on top of them (stencil windows, upwind select, masks, FCT,
seam handling, halo assembly).

Array layout: reference-style ``state[var, k, j, i, iens]`` with hs halo
cells in k/j/i. Only ``grav_balance=False`` (the default and benched
configuration) is implemented.

FCT seam rule: the reference reconciles the duplicated periodic wrap face
with a post-hoc ``min()`` (Dycore.h:574-579); the port applies the
uniform interior rule at the seam instead (required for
sharding-invariant results — pam_tpu/dycore/awfl.py ``limit``). The
oracle implements BOTH (``seam_rule="uniform" | "reference"``); the two
differ only when a positivity limiter fires at a periodic seam face with
inflow there.
"""

from __future__ import annotations

import numpy as np

EPS = 1.0e-20


# --------------------------------------------------------------------- WENO
def coefs_to_tv(a):
    """Truncated Jiang-Shu TV (TransformMatrices.h coefs_to_tv, sizes 3/5)."""
    if len(a) == 3:
        return a[1] * a[1] + (13.0 / 3.0) * a[2] * a[2]
    if len(a) == 5:
        return (a[1] * a[1] + (13.0 / 3.0) * a[2] * a[2] +
                0.5 * a[1] * a[3] + 39.1125 * a[3] * a[3] +
                4.2 * a[2] * a[4] + 625.8 * a[4] * a[4])
    raise NotImplementedError(len(a))


def convexify(w):
    s = np.sum(w) + EPS
    return w / s


def map_weights(idl, w):
    """(WenoLimiter.h:11-19)."""
    out = np.empty_like(w)
    for i in range(len(w)):
        out[i] = w[i] * (idl[i] + idl[i] * idl[i] - 3.0 * idl[i] * w[i] +
                         w[i] * w[i]) / \
            (idl[i] * idl[i] + w[i] * (1.0 - 2.0 * idl[i]))
    return out


def compute_weno_coefs(wrl, s2c, u, idl, sigma):
    """(WenoLimiter.h:98-181). wrl: (hs, hs, hs) [i, s, c]; s2c: (ord, ord)
    [c, s]; u: (ord,) stencil. Returns limited coefs (ord,)."""
    ord = len(u)
    hs = (ord - 1) // 2 + 1
    nlo = (ord - 1) // 2 + 1          # number of low-order stencils
    # low-order and high-order candidate polynomials
    a_lo = np.empty((nlo, nlo))
    for i in range(nlo):
        for c in range(nlo):
            a_lo[i, c] = sum(wrl[i, s, c] * u[i + s] for s in range(nlo))
    a_hi = np.array([sum(s2c[c, s] * u[s] for s in range(ord))
                     for c in range(ord)])
    # bridge polynomial
    a_br = a_hi.copy()
    for i in range(nlo):
        for c in range(nlo):
            a_br[c] -= idl[i] * a_lo[i, c]
    a_br /= idl[nlo]
    # total variations
    tv = np.empty(nlo + 1)
    for i in range(nlo):
        tv[i] = coefs_to_tv(a_lo[i])
    tv[nlo] = coefs_to_tv(a_br)
    lo_avg = np.mean(tv[:nlo])
    tv[nlo] = lo_avg + (tv[nlo] - lo_avg) * sigma
    w = np.array([idl[i] / (tv[i] * tv[i] + EPS) for i in range(nlo + 1)])
    w = convexify(w)
    w = map_weights(idl, w)
    w = convexify(w)
    aw = w[nlo] * a_br
    for i in range(nlo):
        for c in range(nlo):
            aw[c] += w[i] * a_lo[i, c]
    return aw


def reconstruct(sten, c2g, s2c, wrl, idl, sigma, ind):
    """(Dycore.h:591-604): limited coefs evaluated at edge ``ind``
    (0 = left edge, 1 = right edge of the stencil's central cell)."""
    aw = compute_weno_coefs(wrl, s2c, sten, idl, sigma)
    return sum(c2g[s, ind] * aw[s] for s in range(len(sten)))


# ------------------------------------------------------------ halo exchange
def halo_exchange(state, tracers, pressure, dz, hs, C):
    """(Dycore.h:608-711). state[5, nzh, nyh, nxh, nens] holds rho and
    DE-DENSITIZED u/v/w/theta; mutates the halo cells in place."""
    _, nzh, nyh, nxh, nens = state.shape
    nz, ny, nx = nzh - 2 * hs, nyh - 2 * hs, nxh - 2 * hs
    sim2d = ny == 1
    gamma, C0, grav = C["gamma_d"], C["C0"], C["grav"]

    for arr in list(state) + list(tracers) + [pressure]:
        # periodic x
        arr[:, :, nx + hs:nx + 2 * hs, :] = arr[:, :, hs:2 * hs, :]
        arr[:, :, 0:hs, :] = arr[:, :, nx:nx + hs, :]
        if not sim2d:
            arr[:, ny + hs:ny + 2 * hs, :, :] = arr[:, hs:2 * hs, :, :]
            arr[:, 0:hs, :, :] = arr[:, ny:ny + hs, :, :]
        else:
            # edge-pad y so stencil reads are defined (the port pads
            # mode='edge'; y fluxes are zeroed in 2-D so values are unused)
            for jj in range(hs):
                arr[:, jj, :, :] = arr[:, hs, :, :]
                arr[:, ny + hs + jj, :, :] = arr[:, ny + hs - 1, :, :]

    idR, idU, idV, idW, idT = range(5)
    for kk in range(hs):
        for j in range(ny):
            for i in range(nx):
                for e in range(nens):
                    jj, ii = hs + j, hs + i
                    for l in (idU, idV, idT):
                        state[l, kk, jj, ii, e] = state[l, hs, jj, ii, e]
                        state[l, hs + nz + kk, jj, ii, e] = \
                            state[l, hs + nz - 1, jj, ii, e]
                    state[idW, kk, jj, ii, e] = 0.0
                    state[idW, hs + nz + kk, jj, ii, e] = 0.0
                    for tr in range(len(tracers)):
                        tracers[tr, kk, jj, ii, e] = \
                            tracers[tr, hs, jj, ii, e]
                        tracers[tr, hs + nz + kk, jj, ii, e] = \
                            tracers[tr, hs + nz - 1, jj, ii, e]
                    pressure[kk, jj, ii, e] = pressure[hs, jj, ii, e]
                    pressure[hs + nz + kk, jj, ii, e] = \
                        pressure[hs + nz - 1, jj, ii, e]
                    # hydrostatic rho halos (Dycore.h:682-709)
                    rho0 = state[idR, hs, jj, ii, e]
                    th0 = state[idT, hs, jj, ii, e]
                    state[idR, hs - 1 - kk, jj, ii, e] = (
                        rho0 ** (gamma - 1.0) + grav * (gamma - 1.0) *
                        dz[0, e] * (kk + 1) / (gamma * C0 * th0 ** gamma)
                    ) ** (1.0 / (gamma - 1.0))
                    rho0 = state[idR, hs + nz - 1, jj, ii, e]
                    th0 = state[idT, hs + nz - 1, jj, ii, e]
                    state[idR, hs + nz + kk, jj, ii, e] = (
                        rho0 ** (gamma - 1.0) - grav * (gamma - 1.0) *
                        dz[nz - 1, e] * (kk + 1) / (gamma * C0 * th0 ** gamma)
                    ) ** (1.0 / (gamma - 1.0))


# ------------------------------------------------------------- tendencies
def compute_tendencies_oracle(dyn, tracers_in, tracers_start, dt, dx, dy,
                              dz, hy_dens, hy_pres, tracer_positive, C,
                              mats, seam_rule="uniform"):
    """One semi-discrete RHS evaluation (Dycore.h:262-584).

    Args:
      dyn: (5, nz, ny, nx, nens) CONSERVED state (rho, rho*u, rho*v,
        rho*w, rho*theta) — interior only, no halos.
      tracers_in: (ntr, nz, ny, nx, nens) tracer densities.
      tracers_start: same shape — the RK stage-start tracers the FCT
        mass-availability check reads (the reference passes them in
        ``tracers_tend``, Dycore.h:539).
      dz: (nz, nens); hy_dens/hy_pres: (nz, nens).
      mats: dict with s2c (ord,ord), wrl (hs,hs,hs), c2g (ord,2),
        idl (hs+1,), sigma, vert_s2c (nens, nz+2, ord, ord),
        vert_wrl (nens, nz+2, hs, hs, hs).
    Returns (state_tend, tracers_tend) with the input interior shapes.
    """
    num_state, nz, ny, nx, nens = dyn.shape
    ntr = tracers_in.shape[0]
    sim2d = ny == 1
    idR, idU, idV, idW, idT = range(5)
    gamma, C0, grav = C["gamma_d"], C["C0"], C["grav"]
    cs = 350.0
    ord = mats["s2c"].shape[0]
    hs = (ord + 1) // 2        # HALO size (Dycore.h:23); the WENO-internal
    #                            sub-stencil count is (ord-1)//2+1
    s2c, wrl, c2g = mats["s2c"], mats["wrl"], mats["c2g"]
    idl, sigma = mats["idl"], mats["sigma"]
    v_s2c, v_wrl = mats["vert_s2c"], mats["vert_wrl"]

    # halo arrays; de-densitize + pressure perturbation (Dycore.h:310-321)
    nzh, nyh, nxh = nz + 2 * hs, ny + 2 * hs, nx + 2 * hs
    state = np.zeros((5, nzh, nyh, nxh, nens))
    tracers = np.zeros((ntr, nzh, nyh, nxh, nens))
    pressure = np.zeros((nzh, nyh, nxh, nens))
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                for e in range(nens):
                    r = dyn[idR, k, j, i, e]
                    state[idR, hs + k, hs + j, hs + i, e] = r
                    for l in (idU, idV, idW, idT):
                        state[l, hs + k, hs + j, hs + i, e] = \
                            dyn[l, k, j, i, e] / r
                    pressure[hs + k, hs + j, hs + i, e] = \
                        C0 * dyn[idT, k, j, i, e] ** gamma - hy_pres[k, e]
                    for tr in range(ntr):
                        tracers[tr, hs + k, hs + j, hs + i, e] = \
                            tracers_in[tr, k, j, i, e] / r

    halo_exchange(state, tracers, pressure, dz, hs, C)

    sfx = np.zeros((5, nz, ny, nx + 1, nens))
    sfy = np.zeros((5, nz, ny + 1, nx, nens))
    sfz = np.zeros((5, nz + 1, ny, nx, nens))
    tfx = np.zeros((ntr, nz, ny, nx + 1, nens))
    tfy = np.zeros((ntr, nz, ny + 1, nx, nens))
    tfz = np.zeros((ntr, nz + 1, ny, nx, nens))

    def rec_x(fld, k, j, i, e, upw):
        sten = np.array([fld(hs + k, hs + j, i + upw + s, e)
                         for s in range(ord)])
        return reconstruct(sten, c2g, s2c, wrl, idl, sigma, 1 - upw)

    def rec_y(fld, k, j, i, e, upw):
        sten = np.array([fld(hs + k, j + upw + s, hs + i, e)
                         for s in range(ord)])
        return reconstruct(sten, c2g, s2c, wrl, idl, sigma, 1 - upw)

    def rec_z(fld, k, j, i, e, upw):
        sten = np.array([fld(k + upw + s, hs + j, hs + i, e)
                         for s in range(ord)])
        return reconstruct(sten, c2g, v_s2c[e, k + upw], v_wrl[e, k + upw],
                           idl, sigma, 1 - upw)

    sv = lambda l: (lambda k, j, i, e: state[l, k, j, i, e])
    pv = lambda k, j, i, e: pressure[k, j, i, e]
    ruv = lambda k, j, i, e: state[idR, k, j, i, e] * state[idU, k, j, i, e]
    rvv = lambda k, j, i, e: state[idR, k, j, i, e] * state[idV, k, j, i, e]
    rwv = lambda k, j, i, e: state[idR, k, j, i, e] * state[idW, k, j, i, e]
    trv = lambda t: (lambda k, j, i, e: tracers[t, k, j, i, e])

    for e in range(nens):
        # X faces (Dycore.h:336-386)
        for k in range(nz):
            for j in range(ny):
                for i in range(nx + 1):
                    ru_L = rec_x(ruv, k, j, i, e, 0)
                    ru_R = rec_x(ruv, k, j, i, e, 1)
                    pp_L = rec_x(pv, k, j, i, e, 0)
                    pp_R = rec_x(pv, k, j, i, e, 1)
                    w1 = 0.5 * (pp_R - cs * ru_R)
                    w2 = 0.5 * (pp_L + cs * ru_L)
                    pp = w1 + w2
                    ru = (w2 - w1) / cs
                    sfx[idR, k, j, i, e] = ru
                    upw = 0 if ru > 0 else 1
                    sfx[idU, k, j, i, e] = \
                        ru * rec_x(sv(idU), k, j, i, e, upw) + pp
                    sfx[idV, k, j, i, e] = ru * rec_x(sv(idV), k, j, i, e, upw)
                    sfx[idW, k, j, i, e] = ru * rec_x(sv(idW), k, j, i, e, upw)
                    sfx[idT, k, j, i, e] = ru * rec_x(sv(idT), k, j, i, e, upw)
                    for t in range(ntr):
                        tfx[t, k, j, i, e] = \
                            ru * rec_x(trv(t), k, j, i, e, upw)
        # Y faces (Dycore.h:389-445); zero in 2-D
        if not sim2d:
            for k in range(nz):
                for j in range(ny + 1):
                    for i in range(nx):
                        rv_L = rec_y(rvv, k, j, i, e, 0)
                        rv_R = rec_y(rvv, k, j, i, e, 1)
                        pp_L = rec_y(pv, k, j, i, e, 0)
                        pp_R = rec_y(pv, k, j, i, e, 1)
                        w1 = 0.5 * (pp_R - cs * rv_R)
                        w2 = 0.5 * (pp_L + cs * rv_L)
                        pp = w1 + w2
                        rv = (w2 - w1) / cs
                        sfy[idR, k, j, i, e] = rv
                        upw = 0 if rv > 0 else 1
                        sfy[idU, k, j, i, e] = \
                            rv * rec_y(sv(idU), k, j, i, e, upw)
                        sfy[idV, k, j, i, e] = \
                            rv * rec_y(sv(idV), k, j, i, e, upw) + pp
                        sfy[idW, k, j, i, e] = \
                            rv * rec_y(sv(idW), k, j, i, e, upw)
                        sfy[idT, k, j, i, e] = \
                            rv * rec_y(sv(idT), k, j, i, e, upw)
                        for t in range(ntr):
                            tfy[t, k, j, i, e] = \
                                rv * rec_y(trv(t), k, j, i, e, upw)
        # Z faces (Dycore.h:447-521): per-level matrices, rigid lid/ground
        for k in range(nz + 1):
            for j in range(ny):
                for i in range(nx):
                    rw_L = rec_z(rwv, k, j, i, e, 0)
                    rw_R = rec_z(rwv, k, j, i, e, 1)
                    if k == 0 or k == nz:
                        rw_L = 0.0
                        rw_R = 0.0
                    pp_L = rec_z(pv, k, j, i, e, 0)
                    pp_R = rec_z(pv, k, j, i, e, 1)
                    w1 = 0.5 * (pp_R - cs * rw_R)
                    w2 = 0.5 * (pp_L + cs * rw_L)
                    pp = w1 + w2
                    rw = (w2 - w1) / cs
                    if k == 0 or k == nz:
                        rw = 0.0
                    sfz[idR, k, j, i, e] = rw
                    upw = 0 if rw > 0 else 1
                    sfz[idU, k, j, i, e] = rw * rec_z(sv(idU), k, j, i, e, upw)
                    sfz[idV, k, j, i, e] = rw * rec_z(sv(idV), k, j, i, e, upw)
                    sfz[idW, k, j, i, e] = \
                        rw * rec_z(sv(idW), k, j, i, e, upw) + pp
                    sfz[idT, k, j, i, e] = rw * rec_z(sv(idT), k, j, i, e, upw)
                    for t in range(ntr):
                        tfz[t, k, j, i, e] = \
                            rw * rec_z(trv(t), k, j, i, e, upw)

    # FCT positivity (Dycore.h:525-550)
    for t in range(ntr):
        if not tracer_positive[t]:
            continue
        mult = np.ones((nz, ny, nx, nens))
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    for e in range(nens):
                        vol = dx * dy * dz[k, e]
                        avail = max(tracers_start[t, k, j, i, e], 0.0) * vol
                        fx_out = (max(tfx[t, k, j, i + 1, e], 0.0) -
                                  min(tfx[t, k, j, i, e], 0.0)) / dx
                        fy_out = (max(tfy[t, k, j + 1, i, e], 0.0) -
                                  min(tfy[t, k, j, i, e], 0.0)) / dy
                        fz_out = (max(tfz[t, k + 1, j, i, e], 0.0) -
                                  min(tfz[t, k, j, i, e], 0.0)) / dz[k, e]
                        out_m = (fx_out + fy_out + fz_out) * dt * vol
                        if out_m > avail:
                            mult[k, j, i, e] = avail / out_m
        # scatter the exiting-cell multiplier onto faces
        new_tfx = tfx[t].copy()
        new_tfy = tfy[t].copy()
        new_tfz = tfz[t].copy()
        for k in range(nz):
            for j in range(ny):
                for i in range(nx):
                    for e in range(nens):
                        m = mult[k, j, i, e]
                        if m == 1.0:
                            continue
                        if tfx[t, k, j, i + 1, e] > 0:
                            new_tfx[k, j, i + 1, e] = tfx[t, k, j, i + 1, e] * m
                        if tfx[t, k, j, i, e] < 0:
                            new_tfx[k, j, i, e] = tfx[t, k, j, i, e] * m
                        if not sim2d:
                            if tfy[t, k, j + 1, i, e] > 0:
                                new_tfy[k, j + 1, i, e] = \
                                    tfy[t, k, j + 1, i, e] * m
                            if tfy[t, k, j, i, e] < 0:
                                new_tfy[k, j, i, e] = tfy[t, k, j, i, e] * m
                        if tfz[t, k + 1, j, i, e] > 0:
                            new_tfz[k + 1, j, i, e] = tfz[t, k + 1, j, i, e] * m
                        if tfz[t, k, j, i, e] < 0:
                            new_tfz[k, j, i, e] = tfz[t, k, j, i, e] * m
        if seam_rule == "uniform":
            # the port's sharding-invariant seam rule: the wrap faces are
            # ONE face — face 0 (== face nx) takes the exiting cell's
            # multiplier periodically: >0 exits cell nx-1, <0 exits cell 0
            for k in range(nz):
                for j in range(ny):
                    for e in range(nens):
                        f = tfx[t, k, j, 0, e]
                        if f > 0:
                            v = f * mult[k, j, nx - 1, e]
                        elif f < 0:
                            v = f * mult[k, j, 0, e]
                        else:
                            v = f
                        new_tfx[k, j, 0, e] = v
                        new_tfx[k, j, nx, e] = v
                    if not sim2d:
                        pass  # (y seam handled only in 3-D tests via x rule)
            if not sim2d:
                for k in range(nz):
                    for i in range(nx):
                        for e in range(nens):
                            f = tfy[t, k, 0, i, e]
                            if f > 0:
                                v = f * mult[k, ny - 1, i, e]
                            elif f < 0:
                                v = f * mult[k, 0, i, e]
                            else:
                                v = f
                            new_tfy[k, 0, i, e] = v
                            new_tfy[k, ny, i, e] = v
        tfx[t], tfy[t], tfz[t] = new_tfx, new_tfy, new_tfz

    # flux divergence + gravity (Dycore.h:553-584)
    s_tend = np.zeros_like(dyn)
    t_tend = np.zeros_like(tracers_in)
    for k in range(nz):
        for j in range(ny):
            for i in range(nx):
                for e in range(nens):
                    for l in range(5):
                        s_tend[l, k, j, i, e] = (
                            -(sfx[l, k, j, i + 1, e] - sfx[l, k, j, i, e]) / dx
                            - (sfy[l, k, j + 1, i, e] - sfy[l, k, j, i, e]) / dy
                            - (sfz[l, k + 1, j, i, e] - sfz[l, k, j, i, e]) /
                            dz[k, e])
                    s_tend[idW, k, j, i, e] += -grav * (
                        dyn[idR, k, j, i, e] - hy_dens[k, e])
                    if sim2d:
                        s_tend[idV, k, j, i, e] = 0.0
                    for t in range(ntr):
                        fx = tfx[t, k, j, i, e]
                        fxp1 = tfx[t, k, j, i + 1, e]
                        fy = tfy[t, k, j, i, e]
                        fyp1 = tfy[t, k, j + 1, i, e]
                        if seam_rule == "reference":
                            # (Dycore.h:574-579)
                            if i == 0:
                                fx = min(fx, tfx[t, k, j, nx, e])
                            if i == nx - 1:
                                fxp1 = min(fxp1, tfx[t, k, j, 0, e])
                            if not sim2d:
                                if j == 0:
                                    fy = min(fy, tfy[t, k, ny, i, e])
                                if j == ny - 1:
                                    fyp1 = min(fyp1, tfy[t, k, 0, i, e])
                        t_tend[t, k, j, i, e] = (
                            -(fxp1 - fx) / dx - (fyp1 - fy) / dy
                            - (tfz[t, k + 1, j, i, e] - tfz[t, k, j, i, e]) /
                            dz[k, e])
    return s_tend, t_tend


# ------------------------------------------------------------ full timeStep
def compute_time_step_oracle(rho_d, uvel, vvel, wvel, temp, rho_v, dx, dy,
                             dz2, C, cfl=0.8):
    """(Dycore.h compute_time_step:65-102): global min of the per-cell
    acoustic CFL limits. Inputs in coupler layout (nens, nz, ny, nx);
    dz2: (nz, nens)."""
    rho = rho_d + rho_v
    p = (rho_d * C["R_d"] + rho_v * C["R_v"]) * temp
    cs = np.sqrt(C["gamma_d"] * p / rho)
    dz = np.transpose(dz2)[:, :, None, None]      # (nens, nz, 1, 1)
    dtx = cfl * dx / (np.abs(uvel) + cs)
    dty = cfl * dy / (np.abs(vvel) + cs)
    dtz = cfl * dz / (np.abs(wvel) + cs)
    return float(np.min(np.minimum(np.minimum(dtx, dty), dtz)))


def time_step_oracle(dyn, tracers, dt_phys, dt_dyn, dx, dy, dz2, hy_dens,
                     hy_pres, tracer_positive, C, mats,
                     seam_rule="uniform"):
    """Dycore::timeStep (Dycore.h:107-255) minus the coupler conversions:
    the tracer positivity pre-clamp, ncycles = ceil(dt_phys/dt_dyn)
    acoustic sub-cycles, and per cycle the 3-stage SSPRK3 with the
    reference's per-stage FCT starting-point bookkeeping (tracers_tend
    seeded with the NEXT stage's convex starting combination before each
    compute_tendencies call) and the machine-precision positivity clamps
    after every stage. dyn/tracers in oracle layout (v, nz, ny, nx, e)."""
    pos = np.asarray(tracer_positive, bool)[:, None, None, None, None]
    tracers = np.where(pos, np.maximum(tracers, 0.0), tracers)
    ncycles = int(np.ceil(dt_phys / dt_dyn))
    dt = dt_phys / ncycles

    def clamp(tr):
        return np.where(pos, np.maximum(tr, 0.0), tr)

    def tend(d, t, ts, dtt):
        return compute_tendencies_oracle(d, t, ts, dtt, dx, dy, dz2,
                                         hy_dens, hy_pres, tracer_positive,
                                         C, mats, seam_rule=seam_rule)

    for _ in range(ncycles):
        # Stage 1 (:157-180)
        st, tt = tend(dyn, tracers, tracers, dt)
        dyn1 = dyn + dt * st
        trac1 = clamp(tracers + dt * tt)
        start2 = 0.75 * tracers + 0.25 * trac1
        # Stage 2 (:181-204)
        st, tt = tend(dyn1, trac1, start2, 0.25 * dt)
        dyn2 = 0.75 * dyn + 0.25 * dyn1 + 0.25 * dt * st
        trac2 = clamp(0.75 * tracers + 0.25 * trac1 + 0.25 * dt * tt)
        start3 = (1.0 / 3.0) * tracers + (2.0 / 3.0) * trac2
        # Stage 3 (:205-221)
        st, tt = tend(dyn2, trac2, start3, (2.0 / 3.0) * dt)
        dyn = (1.0 / 3.0) * dyn + (2.0 / 3.0) * dyn2 + \
            (2.0 / 3.0) * dt * st
        tracers = clamp((1.0 / 3.0) * tracers + (2.0 / 3.0) * trac2 +
                        (2.0 / 3.0) * dt * tt)
    return dyn, tracers
