"""Semi-implicit time integration for the SPAM extruded dycore.

Parity reference:
* ReferenceState + setup — hamiltonians/refstate.h:47-85 and
  EulerTestCase::set_reference_state (models/extrudedmodel.h:5413-5540).
* CompressibleVelocityLinearSystem — models/extrudedmodel.h:2531-3162:
  FFT in x + per-wavenumber complex vertical tridiagonal for the implicit
  acoustic/buoyancy system (I + dt^2/4 L).
* SI (quasi-Newton) integrator — timesteppers/SI_Newton.h:13-150 with the
  discrete gradient of time_integrator.h:49-90 (Gauss quadrature between
  the old and new states); PAM-coupled defaults si_max_iters=3, si_nquad=2
  (core/params.h:148-158).

TPU-native design: the reference's yakl pocketfft calls become matmul
DFTs along x (MXU-tiled, batch-shardable — ops/dft.py; under x-sharding
the forward transform is a local contraction + psum and the inverse is
comm-free); the per-column scalar Thomas recurrence becomes a ``lax.scan``
over levels batched across (ens, wavenumber); the fixed quasi-Newton
iteration count unrolls under jit (no convergence branch).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import operators as op
from ..ops import dft
from .operators import AXZ
from ..parallel import comm


def gauss_01(n: int):
    """Gauss-Legendre points/weights on [0,1] (set_ref_quad_pts_wts)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


# ---------------------------------------------------------------------------
# tridiagonal solvers: sequential Thomas (lax.scan) or parallel cyclic
# reduction — shared implementation in ops/tridiag.py (also used by SHOC's
# implicit diffusion solve). Local aliases kept for existing callers/tests.
# ---------------------------------------------------------------------------

from ..ops.tridiag import use_pcr as _use_pcr, shift0 as _shift0, pcr as _pcr  # noqa: E402,F401


def flat_geop(z, g):
    """(models/extrudedmodel.h flat_geop)."""
    return g * z


def profile_n1form(f, geom, nquad: int = 5):
    """Integrate a z-profile over each dual layer * dx (dual n1-form
    profile values; geometry.h set_profile_n1form_values). -> (nens, nz)."""
    pts, wts = gauss_01(nquad)
    zint = geom.zint_d                     # (nens, nz+1)
    z0, z1 = zint[:, :-1], zint[:, 1:]
    dz = z1 - z0
    vals = sum(w * f(z0 + p * dz) for p, w in zip(pts, wts))
    return jnp.asarray(vals * dz * geom.dx * geom.dy)


def build_reference_state(geom, thermo, varset, refrho_f,
                          refentropicdensity_f, refnsq_f, grav):
    """Build the SI reference-state columns (EulerTestCase::
    set_reference_state, extrudedmodel.h:5413-5540). Returns a dict with
    numpy/jnp arrays keyed like the reference's ReferenceState."""
    nz = geom.nz
    ndens = varset.ndensity
    # dual n-form profiles
    dens = np.zeros((ndens, geom.nens, nz))
    dens[varset.dens_id_mass] = np.asarray(profile_n1form(refrho_f, geom))
    dens[varset.dens_id_entr] = np.asarray(
        profile_n1form(refentropicdensity_f, geom))
    geop = np.asarray(profile_n1form(lambda z: flat_geop(z, grav), geom))

    # rho_pi / unscaled q_pi at primal levels = Hn1bar (diagonal) of dens
    dzd = np.asarray(geom.dz_d)            # (nens, nz)
    dens0 = dens / (geom.dx * geom.dy * dzd)   # (ndens, nens, nz)
    rho_pi = dens0[varset.dens_id_mass]
    q_pi = dens0.copy()
    # rho_di / q_di at dual interfaces (boundary copy + interior average)
    def to_di(a):
        mid = 0.5 * (a[..., 1:] + a[..., :-1])
        return np.concatenate([a[..., :1], mid, a[..., -1:]], axis=-1)
    rho_di = to_di(rho_pi)
    q_di = to_di(q_pi)
    q_pi = q_pi / rho_pi
    q_di = q_di / rho_di
    # Nsq at primal levels (pointwise)
    Nsq_pi = np.asarray(refnsq_f(np.asarray(geom.zint_p)))
    if Nsq_pi.shape != rho_pi.shape:
        Nsq_pi = np.broadcast_to(Nsq_pi, rho_pi.shape).copy()
    # ref B (fac=-1; compressible_euler.h compute_dHsdx:77-112)
    geop0 = geop / (geom.dx * geom.dy * dzd)
    alpha = 1.0 / rho_pi
    sv = q_pi[varset.dens_id_entr]
    U = np.asarray(thermo.compute_U(alpha, sv))
    p = -np.asarray(thermo.compute_dUdalpha(alpha, sv))
    gexner = np.asarray(thermo.compute_dUdentropic_var(alpha, sv))
    B = np.zeros((varset.ndensity_active, geom.nens, nz))
    B[varset.dens_id_mass] = -(geop0 + U + p * alpha - sv * gexner)
    B[varset.dens_id_entr] = -gexner
    pres_pi = np.asarray(thermo.solve_p(rho_pi, sv))
    sv_di = q_di[varset.dens_id_entr]
    pres_di = np.asarray(thermo.solve_p(rho_di, sv_di))
    return dict(dens=dens, geop=geop, rho_pi=rho_pi, q_pi=q_pi,
                rho_di=rho_di, q_di=q_di, Nsq_pi=Nsq_pi, B=B,
                pres_pi=pres_pi, pres_di=pres_di)


def build_moist_reference_state(geom, thermo, varset, refdens, refnsq_f,
                                grav):
    """SI reference state from prescribed moist reference-density columns
    (MoistEulerTestCase::set_reference_state, extrudedmodel.h:5624-5765):
    rho/q at primal levels via diagonal Hn1bar, plain midpoint averaging to
    dual interfaces, B with fac=-1 and moist chemical potentials.

    refdens: (ndens, nens, nz) twisted n-forms with mass/entr/vap rows set.
    """
    nz, nens = geom.nz, geom.nens
    refdens = np.asarray(refdens, np.float64)
    vol = geom.dx * geom.dy * np.asarray(geom.dz_d)
    geop = np.asarray(profile_n1form(lambda z: flat_geop(z, grav), geom))

    q_pi = refdens / vol                       # unscaled (Hn1bar diagonal)
    rho_pi = q_pi[varset.dens_id_mass].copy()

    def to_di(a):                              # boundary copy + midpoint avg
        mid = 0.5 * (a[..., 1:] + a[..., :-1])
        return np.concatenate([a[..., :1], mid, a[..., -1:]], axis=-1)

    q_di = to_di(q_pi)
    rho_di = to_di(rho_pi)
    q_pi = q_pi / rho_pi
    q_di = q_di / rho_di

    Nsq_pi = np.asarray(refnsq_f(np.asarray(geom.zint_p)))
    if Nsq_pi.shape != rho_pi.shape:
        Nsq_pi = np.broadcast_to(Nsq_pi, rho_pi.shape).copy()

    # B with fac=-1 (compressible_euler.h compute_dHsdx:304-350)
    geop0 = geop / vol
    sv_pi = q_pi[varset.dens_id_entr]
    qv_pi = q_pi[varset.dens_id_vap]
    qd_pi = 1.0 - qv_pi
    z0 = np.zeros_like(qv_pi)
    alpha_pi = 1.0 / rho_pi
    U = np.asarray(thermo.compute_U(alpha_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    p = -np.asarray(thermo.compute_dUdalpha(alpha_pi, sv_pi, qd_pi, qv_pi,
                                            z0, z0))
    gexner = np.asarray(thermo.compute_dUdentropic_var(
        alpha_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    mu_d, mu_v, mu_l, mu_i = (np.asarray(m) for m in thermo.compute_dUdq(
        alpha_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    B = np.zeros((varset.ndensity_active, nens, nz))
    B[varset.active_id_mass] = -(geop0 + U + p * alpha_pi - sv_pi * gexner +
                                 qv_pi * (mu_d - mu_v))
    B[varset.active_id_entr] = -gexner

    pres_pi = np.asarray(thermo.solve_p(rho_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    qv_di = q_di[varset.dens_id_vap]
    pres_di = np.asarray(thermo.solve_p(
        rho_di, q_di[varset.dens_id_entr], 1.0 - qv_di, qv_di,
        np.zeros_like(qv_di), np.zeros_like(qv_di)))

    return dict(dens=refdens, geop=geop, rho_pi=rho_pi, q_pi=q_pi,
                rho_di=rho_di, q_di=q_di, Nsq_pi=Nsq_pi, B=B,
                pres_pi=pres_pi, pres_di=pres_di)


def build_coupled_reference_state(state, geom, thermo, varset, grav):
    """SI reference state from the coupler's ``ref_*`` columns
    (CoupledTestCase::set_reference_state, extrudedmodel.h:5800-6056).

    state: coupler state dict with ref_density_dry/vapor/liq/ice, ref_temp
    columns of shape (nens, nz). Returns the same dict layout as
    :func:`build_reference_state` with moist q_pi/q_di rows populated.
    """
    from .testcases import saturation_vapor_pressure

    nz, nens, ndens = geom.nz, geom.nens, varset.ndensity
    rho_d = np.asarray(state["ref_density_dry"], np.float64)   # (nens, nz)
    rho_v = np.asarray(state["ref_density_vapor"], np.float64)
    rho_l = np.asarray(state["ref_density_liq"], np.float64)
    rho_i = np.asarray(state["ref_density_ice"], np.float64)
    temp = np.asarray(state["ref_temp"], np.float64)
    rho = rho_d + rho_v
    qd, qv = rho_d / rho, rho_v / rho
    ql, qi = rho_l / rho, rho_i / rho
    alpha = 1.0 / rho
    sv = np.asarray(thermo.compute_entropic_var_from_alpha_T(
        alpha, temp, qd, qv, ql, qi))

    vol = geom.dx * geom.dy * np.asarray(geom.dz_d)                       # (nens, nz)
    dens = np.zeros((ndens, nens, nz))
    dens[varset.dens_id_mass] = rho * vol
    dens[varset.dens_id_entr] = sv * rho * vol
    dens[varset.dens_id_vap] = rho_v * vol
    geop = np.asarray(profile_n1form(lambda z: flat_geop(z, grav), geom))

    # unscaled q at primal levels ("Coupled reference state 1", :5850-5882)
    q_pi = np.zeros((ndens, nens, nz))
    q_pi[varset.dens_id_mass] = rho
    q_pi[varset.dens_id_entr] = rho * sv
    q_pi[varset.dens_id_vap] = rho_v
    rho_pi = dens[varset.dens_id_mass] / vol                    # Hn1bar diag

    # interface interpolation with the reference's grid weights
    # ("compute unscaled q_di", :5884-5906): q_di(k) = q(k-1) +
    # (q(k)-q(k-1)) * (zint_d(k)-zint_p(k-1))/dz_p(k-1), boundaries copied
    wgt = ((geom.zint_d[:, 1:nz] - geom.zint_p[:, :nz - 1]) /
           geom.dz_p)                                           # (nens, nz-1)

    def to_di(a):
        mid = a[..., :-1] + (a[..., 1:] - a[..., :-1]) * wgt
        return np.concatenate([a[..., :1], mid, a[..., -1:]], axis=-1)

    q_di = to_di(q_pi)
    rho_di = to_di(rho_pi)
    q_pi = q_pi / rho_pi
    q_di = q_di / rho_di

    # moist Brunt-Väisälä frequency ("compute Nsq", :5975-6031)
    c = thermo.cst
    eta = c.Rv / c.Rd
    rv = rho_v / rho_d
    idx_m = np.concatenate([[0], np.arange(nz - 1)])        # k-1 clamped
    idx_p = np.concatenate([np.arange(1, nz), [nz - 1]])    # k+1 clamped
    T_km, T_kp = temp[:, idx_m], temp[:, idx_p]
    rv_km, rv_kp = rv[:, idx_m], rv[:, idx_p]
    dzp = np.asarray(geom.dz_p)                              # (nens, nz-1)
    dz = np.empty((nens, nz))
    dz[:, 0] = dzp[:, 0]
    dz[:, -1] = dzp[:, -1]
    dz[:, 1:-1] = dzp[:, 1:] + dzp[:, :-1]
    dTdz = (T_kp - T_km) / dz
    drvdz = (rv_kp - rv_km) / dz
    T = temp
    Tv = T * (1 + eta * rv) / (1 + rv)
    es = saturation_vapor_pressure(T)
    rsw = (es / (c.Rd * T) - 1) * c.Rd / c.Rv
    qsw = rsw / (1 + rsw)
    D1w = 1 + (1 + eta * rsw) * c.Lvr * qsw / (c.Rd * Tv)
    D2w = 1 + (1 + eta * rsw) * c.Lvr * c.Lvr * qsw / (c.Cpd * c.Rv * T * T)
    gamma_m = grav / c.Cpd * D1w / D2w
    Nsq_pi = grav / T * D1w * (dTdz + gamma_m) - grav / (1 + rv) * drvdz

    # ref B with fac=-1 (compute_dHsdx, compressible_euler.h:304-350)
    geop0 = geop / vol
    sv_pi = q_pi[varset.dens_id_entr]
    qv_pi = q_pi[varset.dens_id_vap]
    qd_pi = 1.0 - qv_pi
    z0 = np.zeros_like(qv_pi)
    alpha_pi = 1.0 / rho_pi
    U = np.asarray(thermo.compute_U(alpha_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    p = -np.asarray(thermo.compute_dUdalpha(alpha_pi, sv_pi, qd_pi, qv_pi,
                                            z0, z0))
    gexner = np.asarray(thermo.compute_dUdentropic_var(
        alpha_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    mu_d, mu_v, mu_l, mu_i = (np.asarray(m) for m in thermo.compute_dUdq(
        alpha_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    B = np.zeros((varset.ndensity_active, nens, nz))
    B[varset.active_id_mass] = -(geop0 + U + p * alpha_pi - sv_pi * gexner +
                                 qv_pi * (mu_d - mu_v))
    B[varset.active_id_entr] = -gexner

    # reference pressure profiles (":Compute refstate pres_pi/di", :6033-6056)
    pres_pi = np.asarray(thermo.solve_p(rho_pi, sv_pi, qd_pi, qv_pi, z0, z0))
    qv_di = q_di[varset.dens_id_vap]
    pres_di = np.asarray(thermo.solve_p(
        rho_di, q_di[varset.dens_id_entr], 1.0 - qv_di, qv_di,
        np.zeros_like(qv_di), np.zeros_like(qv_di)))

    return dict(dens=dens, geop=geop, rho_pi=rho_pi, q_pi=q_pi,
                rho_di=rho_di, q_di=q_di, Nsq_pi=Nsq_pi, B=B,
                pres_pi=pres_pi, pres_di=pres_di)


# ---------------------------------------------------------------------------
# Compressible velocity linear system
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True, eq=False)
class CompressibleVelocityLinearSystem:
    """(I + dt^2/4 L)^-1 for the linearized compressible system
    (extrudedmodel.h:2531-3162). Coefficients are precomputed in numpy for
    a fixed dt; solve() is jittable."""
    geom: Any
    varset: Any
    dt: float
    # precomputed (complex128 numpy promoted to jnp on use)
    Blin: np.ndarray          # (2, 2, nens, ni_p)
    vcoeff0: np.ndarray       # (nens, ni_p, nx) complex
    vcoeff_d: np.ndarray      # (2, nens, ni_p, nx) complex
    tri_l: np.ndarray         # (nens, nl_p, nx) complex
    tri_d: np.ndarray
    tri_u: np.ndarray
    a_kp1: np.ndarray         # (nens, nl_p, nx) complex  (w-rhs coupling)
    a_k: np.ndarray
    g_up: np.ndarray          # (nens, ni_p, nx) complex  (vhat recovery)
    g_dn: np.ndarray
    q_pi: np.ndarray          # (ndens, nens, ni_p)
    q_di: np.ndarray          # (ndens, nens, ni_d)
    rho_pi: np.ndarray
    rho_di: np.ndarray

    @staticmethod
    def build(geom, thermo, varset, refstate, dt, grav=9.80616):
        """compute_coefficients (extrudedmodel.h:2605-2844)."""
        nz, nx, nens = geom.nz, geom.nx, geom.nens
        ni, nl = nz, nz - 1                 # primal levels / layers
        dtf2 = dt * dt / 4.0

        rho_pi = refstate["rho_pi"]         # (nens, ni)
        q_pi = refstate["q_pi"][:2]         # dycore densities only
        rho_di = refstate["rho_di"]
        q_di = refstate["q_di"][:2]
        Nsq = refstate["Nsq_pi"]

        # Blin_coeff (:2643-2696)
        alpha = 1.0 / rho_pi
        s_ref = q_pi[1]
        dpds = np.asarray(thermo.compute_dpdentropic_var(alpha, s_ref))
        cref = np.asarray(thermo.compute_soundspeed(alpha, s_ref))
        cref2 = cref ** 2
        g2 = grav * grav
        rho2 = rho_pi ** 2
        dpds2 = dpds ** 2
        b0_s = dpds / rho_pi - dpds2 * s_ref / (cref2 * rho2) - \
            dpds2 * g2 * s_ref / (Nsq * cref2 * cref2 * rho2)
        b0_rho = (cref2 * rho_pi - dpds * s_ref) / rho2 - \
            s_ref / rho_pi * b0_s
        b0_S = b0_s / rho_pi
        b1_s = dpds2 * (Nsq * cref2 + g2) / (Nsq * cref2 * cref2 * rho2)
        b1_rho = dpds / rho2 - s_ref / rho_pi * b1_s
        b1_S = b1_s / rho_pi
        Blin = np.stack([np.stack([b0_rho, b0_S]),
                         np.stack([b1_rho, b1_S])])   # (2,2,nens,ni)

        # fourier symbols (ext_deriv.h:929-979), m over full fft bins
        th = 2.0 * np.pi * np.arange(nx) / nx
        fD0 = 1.0 - np.exp(-1j * th)                   # (nx,)
        fDnm1bar = np.exp(1j * th) - 1.0
        fD0Dnm1bar = 2.0 * (np.cos(th) - 1.0)

        dzd = np.asarray(geom.dz_d)                    # (nens, nz)
        dzp = np.asarray(geom.dz_p)                    # (nens, nz-1)
        fH2bar = 1.0 / (geom.dx * dzd)                 # (nens, ni)
        fH1h = dzd / geom.dx                           # (nens, ni)
        # H01 diagonal at dual interfaces k=1..nz-1; boundaries unused -> 0
        H01d = np.zeros((nens, nz + 1))
        H01d[:, 1:nz] = geom.dx / dzp
        gamma_fac = rho_di * H01d                      # (nens, ni_d)

        # vcoeff (:2698-2740)
        he = rho_pi
        qBq = np.einsum('aek,abek,bek->ek', q_pi, Blin, q_pi)  # (nens, ni)
        c1 = 1.0 - dtf2 * (fH2bar * fH1h * he * qBq)[:, :, None] * \
            fD0Dnm1bar[None, None, :]                  # (nens, ni, nx)
        vcoeff0 = 1.0 / c1
        # vcoeff_{1+d1} = fD0 * dtf2 * fH2bar * sum_d2 q_pi(d2) Blin(d2,d1) / c1
        qB = np.einsum('bek,baek->aek', q_pi, Blin)    # (2, nens, ni)
        vcoeff_d = (dtf2 * (fH2bar[None] * qB)[:, :, :, None] *
                    fD0[None, None, None, :]) / c1[None]

        # vertical tridiagonal (:2742-2786), k = 0..nl-1
        k = np.arange(nl)
        tri_u = np.zeros((nens, nl, nx), np.complex128)
        tri_d = np.ones((nens, nl, nx), np.complex128)
        tri_l = np.zeros((nens, nl, nx), np.complex128)
        # sum over d1, d2 of alpha*beta*gamma products (x-independent part)
        A_kp1 = q_di[:, :, k + 1]                      # (2, nens, nl)
        beta = np.einsum('abek->abek', Blin) * fH2bar[None, None]
        b_kp1 = beta[:, :, :, k + 1]                   # (2,2,nens,nl)
        b_k = beta[:, :, :, k]
        g_kp2 = gamma_fac[:, k + 2] * q_di[:, :, k + 2]  # (2, nens, nl)
        g_kp1 = gamma_fac[:, k + 1] * q_di[:, :, k + 1]
        g_k = gamma_fac[:, k] * q_di[:, :, k]
        tri_u += (-dtf2 * np.einsum('aek,abek,bek->ek', A_kp1, b_kp1,
                                    g_kp2))[..., None]
        tri_d += (dtf2 * np.einsum('aek,abek,bek->ek', A_kp1, b_kp1 + b_k,
                                   g_kp1))[..., None]
        tri_l += (-dtf2 * np.einsum('aek,abek,bek->ek', A_kp1, b_k,
                                    g_k))[..., None]

        # horizontal contribution (:2788-2843); beta' includes q_pi,
        # fDnm1bar(m), he, fH1h and couples through vcoeff
        def beta_h(kidx):
            # (2, nens, len(kidx), nx) complex: beta'(d1, k, m)
            core = np.einsum('abek,bek->aek', Blin[:, :, :, kidx],
                             q_pi[:, :, kidx]) * \
                (fH2bar * he * fH1h)[None, :, kidx]
            return core[..., None] * fDnm1bar[None, None, None, :]

        bh_kp1 = beta_h(k + 1)
        bh_k = beta_h(k)
        vc_kp1 = vcoeff_d[:, :, k + 1, :]              # (2, nens, nl, nx)
        vc_k = vcoeff_d[:, :, k, :]
        alpha_kp1 = dtf2 * q_di[:, :, k + 1]           # (2, nens, nl)
        # sum over d1 (alpha), d2 (inside beta_h), d3 (vcoeff/gamma)
        tri_u += -np.einsum('aek,aekm,cekm,cek->ekm', alpha_kp1, bh_kp1,
                            vc_kp1, g_kp2)
        tri_d += np.einsum('aek,aekm,cekm,cek->ekm', alpha_kp1, bh_kp1,
                           vc_kp1, g_kp1) + \
            np.einsum('aek,aekm,cekm,cek->ekm', alpha_kp1, bh_k, vc_k,
                      g_kp1)
        tri_l += -np.einsum('aek,aekm,cekm,cek->ekm', alpha_kp1, bh_k,
                            vc_k, g_k)

        # w-rhs coupling terms (solve:2970-3023): what(k) +=
        #   a_kp1(k,m)*vhat(k+1) - a_k(k,m)*vhat(k)
        a_kp1 = np.einsum('aek,aekm->ekm', dtf2 * q_di[:, :, k + 1],
                          bh_kp1) * vcoeff0[:, k + 1, :]
        a_k = np.einsum('aek,aekm->ekm', dtf2 * q_di[:, :, k + 1],
                        bh_k) * vcoeff0[:, k, :]

        # vhat recovery (solve:3052-3077): vhat(k) = vcoeff0*vhat +
        #   g_up(k,m)*w(k) - g_dn(k,m)*w(k-1)
        ki = np.arange(ni)
        g_up = np.einsum('aekm,aek->ekm', vcoeff_d,
                         gamma_fac[:, ki + 1] * q_di[:, :, ki + 1])
        g_dn = np.einsum('aekm,aek->ekm', vcoeff_d,
                         gamma_fac[:, ki] * q_di[:, :, ki])

        return CompressibleVelocityLinearSystem(
            geom=geom, varset=varset, dt=dt, Blin=Blin, vcoeff0=vcoeff0,
            vcoeff_d=vcoeff_d, tri_l=tri_l, tri_d=tri_d, tri_u=tri_u,
            a_kp1=a_kp1, a_k=a_k, g_up=g_up, g_dn=g_dn,
            q_pi=refstate["q_pi"], q_di=refstate["q_di"],
            rho_pi=rho_pi, rho_di=rho_di)

    # ------------------------------------------------------------------
    def _tridiag(self, rhs, tri_l, tri_d, tri_u):
        """Complex tridiagonal solve batched over (nens, nx): Thomas scan
        over nl levels (extrudedmodel.h:3025-3050) or PCR on TPU."""
        # move level axis front: (nl, nens, nx)
        L = jnp.moveaxis(tri_l, 1, 0)
        D = jnp.moveaxis(tri_d, 1, 0)
        U = jnp.moveaxis(tri_u, 1, 0)
        R = jnp.moveaxis(rhs, 1, 0)
        if _use_pcr(rhs):
            return jnp.moveaxis(_pcr(L, D, U, R), 0, 1)

        def fwd(carry, x):
            c_prev, y_prev = carry
            lk, dk, uk, rk = x
            denom = dk - lk * c_prev
            ck = uk / denom
            yk = (rk - lk * y_prev) / denom
            return (ck, yk), (ck, yk)

        zero = jnp.zeros_like(R[0])
        _, (cs, ys) = jax.lax.scan(fwd, (zero, zero), (L, D, U, R))

        def bwd(w_next, x):
            ck, yk = x
            wk = yk - ck * w_next
            return wk, wk

        _, ws = jax.lax.scan(bwd, zero, (cs[::-1], ys[::-1]))
        return jnp.moveaxis(ws[::-1], 0, 1)

    def solve(self, rhs_dens, rhs_v, rhs_w):
        """(extrudedmodel.h solve:2846-3161). rhs_dens (ndens,nens,nz,nx),
        rhs_v (nens,nz,nx), rhs_w (nens,nz-1,nx). Returns solutions of the
        same shapes."""
        g = self.geom
        nz = g.nz
        dt = self.dt
        dtf = dt / 2.0
        cdtype = jnp.complex64 if rhs_v.dtype == jnp.float32 else \
            jnp.complex128

        q_pi = jnp.asarray(self.q_pi, rhs_v.dtype)     # (ndens, nens, nz)
        q_di = jnp.asarray(self.q_di, rhs_v.dtype)
        Blin = jnp.asarray(self.Blin, rhs_v.dtype)

        # rhs 1 - B (:2909-2926)
        rhs0 = op.Hn1bar(rhs_dens[:2], g)              # (2, nens, nz, nx)
        bvar = -dtf * jnp.einsum('abek,bekx->aekx', Blin, rhs0)
        # rhs 2 - v/w transforms (:2930-2946)
        mod_v = jnp.einsum('aek,aekx->ekx', q_pi[:2],
                           bvar - comm.proll(bvar, -1))
        v_t = rhs_v + mod_v
        mod_w = jnp.einsum('aek,aekx->ekx', q_di[:2, :, 1:nz],
                           bvar[:, :, 1:, :] - bvar[:, :, :-1, :])
        w_t = rhs_w + mod_w

        # spectral solve: under x-sharding the forward DFT is a local
        # contraction + psum over the x mesh axis (spectral space comes out
        # replicated per device; the tridiagonal runs redundantly — nx is
        # small — and the inverse needs no communication; ops/dft.py).
        # The reference can only run this with x rank-local
        # (extrudedmodel.h:2948).
        vhat = dft.fft_sh(v_t).astype(cdtype)
        what = dft.fft_sh(w_t).astype(cdtype)

        # modify wrhs (:2970-3023)
        a_kp1 = jnp.asarray(self.a_kp1, cdtype)
        a_k = jnp.asarray(self.a_k, cdtype)
        what = what + a_kp1 * vhat[:, 1:, :] - a_k * vhat[:, :-1, :]

        what = self._tridiag(what, jnp.asarray(self.tri_l, cdtype),
                             jnp.asarray(self.tri_d, cdtype),
                             jnp.asarray(self.tri_u, cdtype))

        # compute vhat (:3052-3077)
        zrow = jnp.zeros_like(what[:, :1, :])
        w_up = jnp.concatenate([what, zrow], axis=1)  # w(k) for k<ni-1
        w_dn = jnp.concatenate([zrow, what], axis=1)  # w(k-1) for k>0
        vhat = jnp.asarray(self.vcoeff0, cdtype) * vhat + \
            jnp.asarray(self.g_up, cdtype) * w_up - \
            jnp.asarray(self.g_dn, cdtype) * w_dn

        sol_v = dft.ifft_real_sh(vhat).astype(rhs_v.dtype)
        sol_w = dft.ifft_real_sh(what).astype(rhs_w.dtype)

        # recover densities (:3085-3159)
        rho_pi = jnp.asarray(self.rho_pi, rhs_v.dtype)[:, :, None]
        rho_di = jnp.asarray(self.rho_di, rhs_v.dtype)
        F = op.H10(sol_v, g) * rho_pi                  # (nens, nz, nx)
        dzp = jnp.asarray(g.dz_p, rhs_w.dtype)[:, :, None]
        FW_in = sol_w * (g.dx / dzp) * rho_di[:, 1:nz, None]
        zr = jnp.zeros_like(FW_in[:, :1, :])
        FW = jnp.concatenate([zr, FW_in, zr], axis=1)  # (nens, nz+1, nx)
        ddens = jnp.einsum('aek,ekx->aekx', q_pi,
                           comm.proll(F, 1) - F) + \
            jnp.einsum('aek,ekx->aekx', q_di[:, :, 1:],
                       FW[:, 1:, :]) - \
            jnp.einsum('aek,ekx->aekx', q_di[:, :, :-1], FW[:, :-1, :])
        sol_dens = rhs_dens - (dt / 2.0) * ddens
        return sol_dens, sol_v, sol_w


# ---------------------------------------------------------------------------
# SI (quasi-Newton) time integrator
# ---------------------------------------------------------------------------

def gamma_avg(a, b, gamma):
    """Exact discrete-gradient average of x^(gamma-1):
    (a^g - b^g)/(g (a-b)), with the series expansion near a == b
    (compressible_euler.h gamma_avg:10-23)."""
    f = (a - b) / (a + b)
    v = f * f
    c1 = (gamma - 1.0) * (gamma - 2.0) / 6.0
    c2 = (gamma - 3.0) * (gamma - 4.0) / 20.0
    c3 = (gamma - 5.0) * (gamma - 6.0) / 42.0
    x = (0.5 * (a + b)) ** (gamma - 1.0)
    series = x * (1.0 + c1 * v * (1.0 + c2 * v * (1.0 + c3 * v)))
    denom = jnp.where(v < 1e-4, 1.0, gamma * (a - b))
    exact = (a ** gamma - b ** gamma) / denom
    return jnp.where(v < 1e-4, series, exact)


def two_point_discrete_gradient(tend, x1, x2, geop):
    """EXACT two-point discrete gradient for the CE/MCE Hamiltonians with
    pottemp-family thermodynamics (compute_two_point_discrete_gradient,
    extrudedmodel.h:2086-2172 + compressible_euler.h:114-157, 260-304):

      F  = 1/4 (he1 + he2)(u1 + u2);  FW likewise;  K = (K1 + K2)/2
      B_mass = Hn1bar(geop) + Hn1bar(K)   (U + p alpha - sv Pi == 0 for
               these potentials; moist species decouple)
      B_entr = Cpd (Rd/pr)^(gamma-1) * gamma_avg(Tht1, Tht2, gamma)

    One evaluation replaces the nquad-point quadrature and makes the
    implicit-midpoint energy balance exact (the reference's
    si_two_point_discrete_gradient option, params.h:158)."""
    from .operators import mirror_layer, rollm
    g, vs, th = tend.geom, tend.varset, tend.thermo
    assert x1[0].ndim == 4, "two-point discrete gradient is slab-only here"
    cname = type(th).__name__
    if cname not in ("IdealGasPottemp", "ConstantKappaVirtualPottemp"):
        raise NotImplementedError(
            "two-point discrete gradient not implemented for this "
            f"hamiltonian/thermo combination ({cname}); the reference "
            "throws likewise (extrudedmodel.h:2100-2103)")

    def he_u_K(dens, v, w):
        rho_n = vs.get_total_density(dens)
        rho0 = op.Hn1bar_ho(rho_n, g, tend.diff_ord)
        he = op.phi_x(rho0)
        hew = op.phi_z_iface(mirror_layer(rho0, 1))
        u = op.H10_ho(v, g, tend.diff_ord)
        uw = op.H01(w, g)
        v_r = rollm(v, 1)
        u_r = rollm(u, 1)
        Kh = 0.5 * (v * u + v_r * u_r)
        w_pad = mirror_layer(w, 1)
        Kv = 0.5 * (w_pad[..., :-1, :] * uw[..., :-1, :] +
                    w_pad[..., 1:, :] * uw[..., 1:, :])
        return he, hew, u, uw, 0.5 * (Kh + Kv)

    he1, hew1, u1, uw1, K1 = he_u_K(*x1)
    he2, hew2, u2, uw2, K2 = he_u_K(*x2)
    F = 0.25 * (he1 + he2) * (u1 + u2)
    FW = 0.25 * (hew1 + hew2) * (uw1 + uw2)
    K = 0.5 * (K1 + K2)

    area = jnp.asarray(g.d_area_n1(), F.dtype)[:, :, None]
    Tht1 = x1[0][vs.dens_id_entr] / area
    Tht2 = x2[0][vs.dens_id_entr] / area
    cst = th.cst
    gexner = cst.Cpd * (cst.Rd / cst.pr) ** (cst.gamma_d - 1.0) * \
        gamma_avg(Tht1, Tht2, cst.gamma_d)
    B_mass = op.Hn1bar(geop, g) + op.Hn1bar(K, g)
    B = jnp.stack([B_mass, gexner])
    return F, FW, B


def _discrete_gradient(tend, x, xn, geop, pts, wts):
    """Quadrature-averaged functional derivatives between x and xn
    (time_integrator.h compute_discrete_gradient:51-70). All quadrature
    points are evaluated in one vmapped (batched) call — fewer, wider TPU
    kernels than the reference's sequential loop."""
    dens, v, w = x

    def blend(a, b):
        p = pts.reshape((-1,) + (1,) * a.ndim)
        return (1 - p) * a + p * b

    md = blend(dens, xn[0])
    mv = blend(v, xn[1])
    mw = blend(w, xn[2])
    Fq, FWq, _, Bq = jax.vmap(
        lambda d_, v_, w_: tend.functional_derivatives(d_, v_, w_, geop)
    )(md, mv, mw)
    Fa = jnp.einsum('q,q...->...', wts, Fq)
    FWa = jnp.einsum('q,q...->...', wts, FWq)
    Ba = jnp.einsum('q,q...->...', wts, Bq)
    return Fa, FWa, Ba


def _apply_symplectic_full(tend, xm, Fa, FWa, Ba, dt):
    """apply_symplectic + the model's post hook (anelastic pressure
    perturbation / rho pinning; SI_Newton.h:86-89 apply_symplectic +
    add_pressure_perturbation). Inside the SI iterations the reference
    calls apply_symplectic with needs_to_recompute_F=true, so the FT/FTW
    wedges and recon upwinding run on the MIDPOINT mass fluxes
    he(xm)*u(xm) while FCT and the final tendencies keep the averaged
    Fa/FWa (extrudedmodel.h:2188-2204) — recompute them here (the two
    Hodge-star products are cheap next to the recon pipeline; matched by
    tests/spam_oracle.py)."""
    F2, FW2, _, _ = tend.functional_derivatives(xm[0], xm[1], xm[2],
                                                jnp.zeros_like(xm[0][0]))
    dxd, dxv, dxw = tend.apply_symplectic(xm[0], xm[1], xm[2], Fa, FWa, Ba,
                                          dt, F_recon=F2, FW_recon=FW2)
    post = getattr(tend, "post_symplectic", None)
    if post is not None:
        dxd, dxv, dxw = post(dxd, dxv, dxw)
    return dxd, dxv, dxw


def si_step(tend, linsys, dens, v, w, geop, dt, max_iters: int = 3,
            nquad: int = 2, two_point: bool = False):
    """One semi-implicit step (SI_Newton.h step_forward:31-149, with the
    PAM-coupled fixed iteration count — monitor_convergence=0,
    si_max_iters=3, si_nquad=2, core/params.h:153-158). two_point selects
    the exact two-point discrete gradient instead of the nquad-point
    quadrature (si_two_point_discrete_gradient, params.h:158 — off by
    default in the reference too)."""
    pts, wts = gauss_01(nquad)

    dxd, dxv, dxw = tend.compute_rhs(dens, v, w, geop, dt)
    xn = (dens, v, w)
    res = (-dt * dxd, -dt * dxv, -dt * dxw)

    pts = jnp.asarray(pts, v.dtype)
    wts = jnp.asarray(wts, v.dtype)

    # NOTE: the quasi-Newton iterations stay UNROLLED. A lax.scan over the
    # iteration body compiles ~40% faster (one body copy) but runs ~33%
    # slower on TPU v5e (measured 102.6 -> 69.1M pts/s on the bench config)
    # — the scan boundary blocks cross-iteration fusion/layout choices.
    # The final iteration is solve-only: its discrete-gradient/symplectic
    # evaluation is dead (the reference computes-and-discards it,
    # SI_Newton.h:91-93; XLA DCE removes it here).
    for _ in range(max_iters - 1):
        sol = linsys.solve(*res)
        xn = tuple(a + b for a, b in zip(xn, sol))
        if two_point:
            Fa, FWa, Ba = two_point_discrete_gradient(tend, (dens, v, w),
                                                      xn, geop)
        else:
            Fa, FWa, Ba = _discrete_gradient(tend, (dens, v, w), xn, geop,
                                             pts, wts)
        xm = tuple(0.5 * (a + b) for a, b in zip((dens, v, w), xn))
        dxd, dxv, dxw = _apply_symplectic_full(tend, xm, Fa, FWa, Ba, dt)
        res = (dens - xn[0] - dt * dxd, v - xn[1] - dt * dxv,
               w - xn[2] - dt * dxw)
    sol = linsys.solve(*res)
    return tuple(a + b for a, b in zip(xn, sol))


def _res_norm(res):
    """max-abs norm over all prognostic fields (the reference's
    residual norm, time_integrator.h norm:9-17)."""
    return jnp.maximum(jnp.maximum(jnp.max(jnp.abs(res[0])),
                                   jnp.max(jnp.abs(res[1]))),
                       jnp.max(jnp.abs(res[2])))


def si_step_monitored(tend, linsys, dens, v, w, geop, dt,
                      max_iters: int = 3, nquad: int = 2,
                      two_point: bool = False):
    """si_step that also returns the per-iteration residual norms — the
    reference's si_monitor_convergence>0 diagnostic (SI_Newton.h:52-106:
    initial residual + norm after each Newton iteration). Returns
    (xn, norms) with norms[0] = initial residual norm and norms[i] the
    norm after iteration i (max_iters entries total; the convergence
    ratio is norms[i]/norms[0], compared against si_tolerance)."""
    pts, wts = gauss_01(nquad)
    dxd, dxv, dxw = tend.compute_rhs(dens, v, w, geop, dt)
    xn = (dens, v, w)
    res = (-dt * dxd, -dt * dxv, -dt * dxw)
    norms = [_res_norm(res)]
    pts = jnp.asarray(pts, v.dtype)
    wts = jnp.asarray(wts, v.dtype)
    for _ in range(max_iters):
        sol = linsys.solve(*res)
        xn = tuple(a + b for a, b in zip(xn, sol))
        if two_point:
            Fa, FWa, Ba = two_point_discrete_gradient(tend, (dens, v, w),
                                                      xn, geop)
        else:
            Fa, FWa, Ba = _discrete_gradient(tend, (dens, v, w), xn, geop,
                                             pts, wts)
        xm = tuple(0.5 * (a + b) for a, b in zip((dens, v, w), xn))
        dxd, dxv, dxw = _apply_symplectic_full(tend, xm, Fa, FWa, Ba, dt)
        res = (dens - xn[0] - dt * dxd, v - xn[1] - dt * dxv,
               w - xn[2] - dt * dxw)
        norms.append(_res_norm(res))
    return xn, jnp.stack(norms)


def si_fixed_step(tend, dens, v, w, geop, dt, max_iters: int = 5,
                  nquad: int = 2):
    """One fixed-point semi-implicit step (SIFixedTimeIntegrator,
    SI_Fixed.h:13-150): iterate x^{n+1} <- x^n - dt J((x+xn)/2) dH~(x, xn)
    with NO linear solve — the anelastic-friendly integrator where the
    per-rhs pressure projection (post_symplectic) enforces the constraint.
    Fixed iteration count (monitor_convergence=0); the reference evaluates
    the fixed-point rhs max_iters-1 times (SI_Fixed.h:77-107)."""
    pts, wts = gauss_01(nquad)
    pts = jnp.asarray(pts, v.dtype)
    wts = jnp.asarray(wts, v.dtype)
    x = (dens, v, w)
    dx = tend.compute_rhs(dens, v, w, geop, dt)
    for _ in range(max_iters - 1):
        xn = tuple(a - dt * b for a, b in zip(x, dx))
        Fa, FWa, Ba = _discrete_gradient(tend, x, xn, geop, pts, wts)
        xm = tuple(0.5 * (a + b) for a, b in zip(x, xn))
        dx = _apply_symplectic_full(tend, xm, Fa, FWa, Ba, dt)
    return tuple(a - dt * b for a, b in zip(x, dx))


# ---------------------------------------------------------------------------
# Compressible PRESSURE linear system (the reference default,
# params.linear_system == "pressure") — supports ndims=1 AND ndims=2
# ---------------------------------------------------------------------------

def _tridiag_real(L, D, U, R):
    """Tridiagonal solve with real (nens, nz, ...) coefficient stacks on a
    possibly-complex rhs of the same trailing shape; Thomas scan over level
    axis 1 (extrudedmodel.h solve_for_pressure:3806-3830) or PCR on TPU."""
    Lm = jnp.moveaxis(L, 1, 0)
    Dm = jnp.moveaxis(D, 1, 0)
    Um = jnp.moveaxis(U, 1, 0)
    Rm = jnp.moveaxis(R, 1, 0)
    if _use_pcr(R):
        Lc = Lm.astype(Rm.dtype)
        Dc = Dm.astype(Rm.dtype)
        Uc = Um.astype(Rm.dtype)
        return jnp.moveaxis(_pcr(Lc, Dc, Uc, Rm), 0, 1)

    def fwd(carry, x):
        c_prev, y_prev = carry
        lk, dk, uk, rk = x
        denom = dk - lk * c_prev
        ck = uk / denom
        yk = (rk - lk * y_prev) / denom
        return (ck, yk), (ck, yk)

    czero = jnp.zeros_like(Rm[0])
    _, (cs, ys) = jax.lax.scan(fwd, (jnp.real(czero), czero),
                               (Lm, Dm, Um, Rm))

    def bwd(x_next, x):
        ck, yk = x
        xk = yk - ck * x_next
        return xk, xk

    _, xs = jax.lax.scan(bwd, czero, (cs[::-1], ys[::-1]))
    return jnp.moveaxis(xs[::-1], 0, 1)


@dataclasses.dataclass(frozen=True, eq=False)
class CompressiblePressureLinearSystem:
    """(I + dt^2/4 L)^-1 via a pressure Helmholtz solve: horizontal FFT +
    vertical tridiagonal in p, then velocity/density updates
    (CompressiblePressureLinearSystem, extrudedmodel.h:3530-3970). Works on
    both the x-z slab layout (nens, nz, nx) and the 3-D layout
    (nens, nz, ny, nx) — the reference's ONLY compressible SI path for
    ndims=2 (the velocity solver throws, extrudedmodel.h:2561-2564)."""
    geom: Any
    varset: Any
    dt: float
    ndims: int
    linp: np.ndarray          # (nact, nens, nz)
    tri_l: np.ndarray         # (nens, nz, [nyf,] nxf) real
    tri_d: np.ndarray
    tri_u: np.ndarray
    q_pi: np.ndarray          # (ndens, nens, nz)
    q_di: np.ndarray          # (ndens, nens, nz+1)
    rho_pi: np.ndarray        # (nens, nz)
    rho_di: np.ndarray        # (nens, nz+1)

    @staticmethod
    def build(geom, thermo, varset, refstate, dt):
        """compute_coefficients (extrudedmodel.h:3545-3660)."""
        nz, nens = geom.nz, geom.nens
        ndims = 2 if geom.ny > 1 else 1
        al = dt / 2.0

        rho_pi = np.asarray(refstate["rho_pi"])
        q_pi = np.asarray(refstate["q_pi"])
        rho_di = np.asarray(refstate["rho_di"])
        q_di = np.asarray(refstate["q_di"])

        # linear pressure coefficients (variableset.h linear_pressure_coeffs
        # VS_CE:1072 / VS_MCE_rho:1576)
        alpha_ref = 1.0 / rho_pi
        sv = q_pi[varset.dens_id_entr]
        if varset.variant == "CE":
            qv = np.zeros_like(sv)
        else:
            qv = q_pi[varset.dens_id_vap]
        qd = 1.0 - qv
        z = np.zeros_like(sv)
        cs = np.asarray(thermo.compute_soundspeed(alpha_ref, sv, qd, qv, z, z))
        dpds = np.asarray(thermo.compute_dpdentropic_var(alpha_ref, sv, qd,
                                                         qv, z, z))
        linp = np.zeros((varset.ndensity_active, nens, nz))
        linp[varset.active_id_mass] = cs * cs - sv * alpha_ref * dpds
        linp[varset.active_id_entr] = alpha_ref * dpds

        # fourier symbols of cw D0 Dnm1bar per horizontal direction
        thx = 2.0 * np.pi * np.arange(geom.nx // 2 + 1) / geom.nx  # rfft bins
        fDDx = 2.0 * (np.cos(thx) - 1.0)
        dzd = np.asarray(geom.dz_d)                  # (nens, nz)
        dzp = np.asarray(geom.dz_p)
        fHn1bar = 1.0 / (geom.dx * geom.dy * dzd)    # (nens, nz)
        fH1x = dzd * geom.dy / geom.dx
        if ndims == 2:
            thy = 2.0 * np.pi * np.arange(geom.ny) / geom.ny
            fDDy = 2.0 * (np.cos(thy) - 1.0)
            fH1y = dzd * geom.dx / geom.dy
            horiz = (fH1x[:, :, None, None] * fDDx[None, None, None, :] +
                     fH1y[:, :, None, None] * fDDy[None, None, :, None])
            shape = (nens, nz, geom.ny, geom.nx // 2 + 1)
        else:
            horiz = fH1x[:, :, None] * fDDx[None, None, :]
            shape = (nens, nz, geom.nx // 2 + 1)

        qlinp = np.einsum('aek,aek->ek', q_pi[:varset.ndensity_active],
                          linp)
        ex = (Ellipsis,) + (None,) * (len(shape) - 2)
        tri_d = 1.0 - (al * al) * (fHn1bar * qlinp)[ex] * horiz
        tri_u = np.zeros(shape)
        tri_l = np.zeros(shape)

        # vertical couplings (H01 diagonal = dx*dy/dz_p at interior
        # interfaces; rhofac as :3636-3648)
        H01d = np.zeros((nens, nz + 1))
        H01d[:, 1:nz] = geom.dx * geom.dy / dzp
        inv_rho_pi = 1.0 / rho_pi
        rhofac = np.zeros((nens, nz + 1))
        rhofac[:, 1:nz] = rho_di[:, 1:nz] * 0.5 * (inv_rho_pi[:, 1:] +
                                                   inv_rho_pi[:, :-1])
        k = np.arange(nz)
        diag_add = np.zeros((nens, nz))
        up = np.zeros((nens, nz))
        lo = np.zeros((nens, nz))
        for d in range(varset.ndensity_active):
            alpha_k = -(al * al) * fHn1bar * linp[d]       # (nens, nz)
            beta_kp1 = q_di[d][:, 1:] * rhofac[:, 1:] * H01d[:, 1:]   # at k+1
            beta_k = q_di[d][:, :-1] * rhofac[:, :-1] * H01d[:, :-1]  # at k
            up += alpha_k * beta_kp1
            lo += alpha_k * beta_k
            both = beta_kp1 + beta_k
            both[:, 0] = beta_kp1[:, 0]
            both[:, -1] = beta_k[:, -1]
            diag_add += -alpha_k * both
        tri_u += up[ex]
        tri_l += lo[ex]
        tri_d += diag_add[ex]

        return CompressiblePressureLinearSystem(
            geom=geom, varset=varset, dt=dt, ndims=ndims, linp=linp,
            tri_l=tri_l, tri_d=tri_d, tri_u=tri_u, q_pi=q_pi, q_di=q_di,
            rho_pi=rho_pi, rho_di=rho_di)

    # ------------------------------------------------------------------
    _solve_dtype = None  # set per-solve so static columns match the rhs

    def _expand(self, a, extra=0):
        """(nens, nz[+1]) column -> broadcastable against fields, cast to
        the active solve dtype (f32 runs stay f32 even under x64)."""
        a = jnp.asarray(a)
        if self._solve_dtype is not None and a.dtype != self._solve_dtype \
                and not jnp.issubdtype(a.dtype, jnp.complexfloating):
            a = a.astype(self._solve_dtype)
        return a[(Ellipsis,) + (None,) * (self.ndims + extra)]

    def _mass_fluxes(self, v, w):
        """F(d) = H10(v)·rho_pi; FW = H01(w)·rho_di interior, 0 at bnd
        (prepare_pressure_rhs / update_densities flux build)."""
        g = self.geom
        dtype = w.dtype
        dzd = self._expand(g.dz_d)
        rho_pi_x = self._expand(self.rho_pi)
        if self.ndims == 2:
            F0 = v[0] * (dzd * g.dy / g.dx) * rho_pi_x
            F1 = v[1] * (dzd * g.dx / g.dy) * rho_pi_x
            F = (F0, F1)
        else:
            F = (v * (dzd * g.dy / g.dx) * rho_pi_x,)
        dzp = self._expand(jnp.asarray(g.dz_p, dtype))
        FW_in = w * (g.dx * g.dy / dzp) * \
            self._expand(self.rho_di[:, 1:g.nz])
        za = -2 - (self.ndims - 1)          # z axis in field layout
        sl = [slice(None)] * FW_in.ndim
        sl[za] = slice(0, 1)
        zr = jnp.zeros_like(FW_in[tuple(sl)])
        FW = jnp.concatenate([zr, FW_in, zr], axis=za)
        return F, FW

    def _weighted_div(self, F, FW, nd):
        """(Dnm1bar q·F + vert q·FW) for densities 0..nd-1."""
        q_pi = self._expand(self.q_pi[:nd], extra=0)
        q_di = self._expand(self.q_di[:nd], extra=0)
        za = -2 - (self.ndims - 1)          # z axis in field layout
        if self.ndims == 2:
            fx = q_pi * F[0][None]
            fy = q_pi * F[1][None]
            div = (comm.proll(fx, 1, -1) - fx) + (comm.proll(fy, 1, -2) - fy)
        else:
            fx = q_pi * F[0][None]
            div = comm.proll(fx, 1, -1) - fx
        fz = q_di * FW[None]
        sl_hi = [slice(None)] * fz.ndim
        sl_lo = [slice(None)] * fz.ndim
        sl_hi[za] = slice(1, None)
        sl_lo[za] = slice(None, -1)
        return div + (fz[tuple(sl_hi)] - fz[tuple(sl_lo)])

    def solve(self, rhs_dens, rhs_v, rhs_w):
        """(extrudedmodel.h PressureLinearSystem::solve:3234-3247 with the
        compressible prepare/solve/update stages)."""
        object.__setattr__(self, "_solve_dtype", rhs_w.dtype)
        g = self.geom
        nact = self.varset.ndensity_active
        dt = self.dt
        za = -2 - (self.ndims - 1)
        dzd = self._expand(jnp.asarray(g.dz_d, rhs_w.dtype))

        F, FW = self._mass_fluxes(rhs_v, rhs_w)
        mf = rhs_dens[:nact] - 0.5 * dt * self._weighted_div(F, FW, nact)
        B = mf / (g.dx * g.dy * dzd)                     # Hn1bar
        linp = self._expand(self.linp)
        prhs = jnp.einsum('a...,a...->...', linp, B)

        # spectral solve: psum-DFT under x-sharding (ops/dft.py), redundant
        # per-device tridiagonal, comm-free inverse. y stays chip-local.
        phat = dft.rfft_sh(prhs)
        if self.ndims == 2:
            phat = dft.fft(phat, axis=-2)
        phat = _tridiag_real(jnp.asarray(self.tri_l, prhs.dtype),
                             jnp.asarray(self.tri_d, prhs.dtype),
                             jnp.asarray(self.tri_u, prhs.dtype), phat)
        if self.ndims == 2:
            phat = dft.ifft(phat, axis=-2)
        p = dft.irfft_sh(phat, g.nx).astype(rhs_w.dtype)

        # velocity update (:3860-3917)
        sl_hi = [slice(None)] * p.ndim
        sl_lo = [slice(None)] * p.ndim
        sl_hi[za] = slice(1, None)
        sl_lo[za] = slice(None, -1)
        dpdz = p[tuple(sl_hi)] - p[tuple(sl_lo)]
        sol_w = rhs_w - 0.5 * dt * dpdz / \
            self._expand(self.rho_di[:, 1:g.nz])
        rho_pi_x = self._expand(self.rho_pi)
        dpdx = p - comm.proll(p, -1, -1)
        if self.ndims == 2:
            dpdy = p - comm.proll(p, -1, -2)
            sol_v = jnp.stack([rhs_v[0] - 0.5 * dt * dpdx / rho_pi_x,
                               rhs_v[1] - 0.5 * dt * dpdy / rho_pi_x])
        else:
            sol_v = rhs_v - 0.5 * dt * dpdx / rho_pi_x

        # density update with ALL prognostic densities (:3919-3969)
        F, FW = self._mass_fluxes(sol_v, sol_w)
        ndens = rhs_dens.shape[0]
        sol_dens = rhs_dens - 0.5 * dt * self._weighted_div(F, FW, ndens)
        return sol_dens, sol_v, sol_w


@dataclasses.dataclass(frozen=True, eq=False)
class CompressiblePressureGravityLinearSystem(CompressiblePressureLinearSystem):
    """Pressure Helmholtz solve with gravity/stratification terms in the
    linear operator (CompressiblePressureGravityLinearSystem,
    extrudedmodel.h:3970-4580): an extra column tridiagonal A acting on w
    captures the buoyancy coupling the plain pressure system drops —
    required for stably-stratified columns at large dt (the coupled MMF
    configuration). Slab and 3-D layouts."""
    omega: np.ndarray = None      # (nens, ni)
    Dmod_u: np.ndarray = None     # (nens, nl)
    Dmod_d: np.ndarray = None
    A_l: np.ndarray = None        # (nens, nl) — x-independent w-tridiagonal
    A_d: np.ndarray = None
    A_u: np.ndarray = None
    Fhorz: np.ndarray = None      # (nens, ni, [ny,] nxr)
    pres_pi: np.ndarray = None    # (nens, ni)

    @staticmethod
    def build(geom, thermo, varset, refstate, dt):
        """compute_coefficients (extrudedmodel.h:4007-4243)."""
        base = CompressiblePressureLinearSystem.build(geom, thermo, varset,
                                                      refstate, dt)
        nz, nens = geom.nz, geom.nens
        nl = nz - 1
        al = dt / 2.0
        ndims = base.ndims
        linp = base.linp
        rho_pi, rho_di = base.rho_pi, base.rho_di
        q_pi, q_di = base.q_pi, base.q_di
        pres_pi = np.asarray(refstate["pres_pi"])
        dzd = np.asarray(geom.dz_d)
        dzp = np.asarray(geom.dz_p)
        nact = varset.ndensity_active

        # omega(k) = sum_d linp(d,k) q_pi(d,k)  (q_pi(mass)=1)
        omega = linp[varset.active_id_mass].copy()
        for d in range(1, nact):
            omega += linp[d] * q_pi[d, :, :nz]

        # Dmod (:4067-4083)
        dp = pres_pi[:, 1:] - pres_pi[:, :-1]            # (nens, nl)
        inv_rho_mid = 0.5 * (1 / rho_pi[:, 1:] + 1 / rho_pi[:, :-1])
        c = 1.0 / (rho_pi * rho_pi * omega)              # (nens, ni)
        Dmod_u = inv_rho_mid - 0.5 * c[:, 1:] * dp
        Dmod_d = -inv_rho_mid - 0.5 * c[:, :-1] * dp

        # H01 diagonal at dual interfaces (0 outside 1..nz-1)
        H01d = np.zeros((nens, nz + 2))
        H01d[:, 1:nz] = geom.dx * geom.dy / dzp
        fHn1bar = 1.0 / (geom.dx * geom.dy * dzd)        # (nens, ni)

        # A tridiagonal (:4085-4149); entropic-gradient gammas
        A_l = np.zeros((nens, nl))
        A_d = np.ones((nens, nl))
        A_u = np.zeros((nens, nl))
        k = np.arange(nl)
        sv_pi = q_pi[varset.active_id_entr][:, :nz]
        dsv = np.zeros((nens, nz + 1))                   # dsv[k] = sv(k)-sv(k-1)
        dsv[:, 1:nz] = sv_pi[:, 1:] - sv_pi[:, :-1]
        for d in range(1, nact):
            beta = fHn1bar * linp[d] * c                 # (nens, ni)
            alpha_k = -(al * al) / 4.0 * dp              # (nens, nl)
            gam_kp1 = rho_di[:, k + 2] * H01d[:, k + 2] * dsv[:, k + 2]
            gam_k = rho_di[:, k + 1] * H01d[:, k + 1] * dsv[:, k + 1]
            gam_km1 = rho_di[:, k] * H01d[:, k] * dsv[:, k]
            A_u += alpha_k * beta[:, k + 1] * gam_kp1
            A_d += alpha_k * (beta[:, k + 1] + beta[:, k]) * gam_k
            A_l += alpha_k * beta[:, k] * gam_km1

        # Fhorz (:4151-4180) — the plain system's horizontal-only tri_d
        thx = 2.0 * np.pi * np.arange(geom.nx // 2 + 1) / geom.nx
        fDDx = 2.0 * (np.cos(thx) - 1.0)
        fH1x = dzd * geom.dy / geom.dx
        qlinp = np.einsum('aek,aek->ek', q_pi[:nact, :, :nz], linp)
        if ndims == 2:
            thy = 2.0 * np.pi * np.arange(geom.ny) / geom.ny
            fDDy = 2.0 * (np.cos(thy) - 1.0)
            fH1y = dzd * geom.dx / geom.dy
            horiz = (fH1x[:, :, None, None] * fDDx[None, None, None, :] +
                     fH1y[:, :, None, None] * fDDy[None, None, :, None])
            ex = (Ellipsis, None, None)
        else:
            horiz = fH1x[:, :, None] * fDDx[None, None, :]
            ex = (Ellipsis, None)
        Fhorz = 1.0 - (al * al) * (fHn1bar * qlinp)[ex] * horiz

        # tri (:4182-4243): per-wavenumber w-space tridiagonal
        tri_u = np.broadcast_to(A_u[ex], Fhorz[:, :nl].shape).copy()
        tri_d = np.broadcast_to(A_d[ex], Fhorz[:, :nl].shape).copy()
        tri_l = np.broadcast_to(A_l[ex], Fhorz[:, :nl].shape).copy()
        gam_kp1 = (rho_di[:, k + 2] * H01d[:, k + 2])[ex]
        gam_k = (rho_di[:, k + 1] * H01d[:, k + 1])[ex]
        gam_km1 = (rho_di[:, k] * H01d[:, k])[ex]
        for d in range(nact):
            beta_k = (fHn1bar[:, :nl] * linp[d][:, :nl])[ex] / \
                Fhorz[:, :nl] * Dmod_d[ex]
            beta_kp1 = (fHn1bar[:, 1:] * linp[d][:, 1:])[ex] / \
                Fhorz[:, 1:] * Dmod_u[ex]
            qd_kp2 = q_di[d][:, k + 2][ex]
            qd_kp1 = q_di[d][:, k + 1][ex]
            qd_k = q_di[d][:, k][ex]
            tri_u -= (al * al) * beta_kp1 * gam_kp1 * qd_kp2
            tri_d -= (al * al) * (beta_k - beta_kp1) * gam_k * qd_kp1
            tri_l += (al * al) * beta_k * gam_km1 * qd_k

        return CompressiblePressureGravityLinearSystem(
            geom=geom, varset=varset, dt=dt, ndims=ndims, linp=linp,
            tri_l=tri_l, tri_d=tri_d, tri_u=tri_u, q_pi=q_pi, q_di=q_di,
            rho_pi=rho_pi, rho_di=rho_di, omega=omega, Dmod_u=Dmod_u,
            Dmod_d=Dmod_d, A_l=A_l, A_d=A_d, A_u=A_u, Fhorz=Fhorz,
            pres_pi=pres_pi)

    # ------------------------------------------------------------------
    def _A_solve(self, rhs):
        """Thomas solve with the x-independent A tridiagonal broadcast over
        the horizontal dims (prepare_pressure_rhs:4322-4342)."""
        ex = (Ellipsis,) + (None,) * self.ndims
        shp = rhs.shape
        L = jnp.broadcast_to(jnp.asarray(self.A_l, rhs.dtype)[ex], shp)
        D = jnp.broadcast_to(jnp.asarray(self.A_d, rhs.dtype)[ex], shp)
        U = jnp.broadcast_to(jnp.asarray(self.A_u, rhs.dtype)[ex], shp)
        return _tridiag_real(L, D, U, rhs)

    def solve(self, rhs_dens, rhs_v, rhs_w):
        object.__setattr__(self, "_solve_dtype", rhs_w.dtype)
        g = self.geom
        nact = self.varset.ndensity_active
        dt = self.dt
        al = 0.5 * dt
        za = -2 - (self.ndims - 1)
        dzd = self._expand(jnp.asarray(g.dz_d, rhs_w.dtype))
        ex = (Ellipsis,) + (None,) * self.ndims

        # ---- gravity rhs_w modification (:4283-4343) ----
        q_pi = self.q_pi
        Bpert = (rhs_dens[:nact] -
                 self._expand(q_pi[:nact, :, :g.nz], extra=0) *
                 rhs_dens[:1]) / (g.dx * g.dy * dzd)
        linp = self._expand(self.linp)
        c = self._expand(1.0 / (self.rho_pi ** 2 * self.omega))
        B0 = jnp.einsum('a...,a...->...', linp, Bpert) * c
        sl_hi = [slice(None)] * B0.ndim
        sl_lo = [slice(None)] * B0.ndim
        sl_hi[za] = slice(1, None)
        sl_lo[za] = slice(None, -1)
        dp = self._expand(jnp.asarray(self.pres_pi[:, 1:] -
                                      self.pres_pi[:, :-1], rhs_w.dtype))
        Bavg = 0.5 * (B0[tuple(sl_hi)] + B0[tuple(sl_lo)])
        rhs_w_mod = rhs_w - al * Bavg * dp
        rhs_w_mod = self._A_solve(rhs_w_mod)

        # ---- plain pressure rhs from (rhs_v, rhs_w_mod) (:4344-4349) ----
        F, FW = self._mass_fluxes(rhs_v, rhs_w_mod)
        mf = rhs_dens[:nact] - 0.5 * dt * self._weighted_div(F, FW, nact)
        Bv = mf / (g.dx * g.dy * dzd)
        prhs = jnp.einsum('a...,a...->...', linp, Bv)

        # ---- solve for pressure (:4351-4477): psum-DFT under x-sharding,
        # redundant per-device spectral work, comm-free inverse ----
        phat = dft.rfft_sh(prhs)
        if self.ndims == 2:
            phat = dft.fft(phat, axis=-2)
        Fh = jnp.asarray(self.Fhorz, rhs_w.dtype)
        Dmu = self._expand(jnp.asarray(self.Dmod_u, rhs_w.dtype))
        Dmd = self._expand(jnp.asarray(self.Dmod_d, rhs_w.dtype))
        pF = phat / Fh
        qhat = Dmu * pF[tuple(sl_hi)] + Dmd * pF[tuple(sl_lo)]
        qhat = _tridiag_real(jnp.asarray(self.tri_l, prhs.dtype),
                             jnp.asarray(self.tri_d, prhs.dtype),
                             jnp.asarray(self.tri_u, prhs.dtype), qhat)
        # p update: += al^2 linp(d,k) fHn1bar (f_kp1 - f_k), then /= Fhorz
        H01col = np.zeros((g.nens, g.nz + 1))
        H01col[:, 1:g.nz] = g.dx * g.dy / np.asarray(g.dz_p)
        w8 = self.rho_di[None, :, :] * self.q_di[:nact] * \
            H01col[None, :, :]                       # (nact, nens, nz+1)
        w8 = jnp.asarray(w8, qhat.dtype)
        zsl = [slice(None)] * qhat.ndim
        zsl[za] = slice(0, 1)
        zrow = jnp.zeros_like(qhat[tuple(zsl)])
        q_up = jnp.concatenate([qhat, zrow], axis=za)    # q(k) for k<ni-1
        q_dn = jnp.concatenate([zrow, qhat], axis=za)    # q(k-1) for k>0
        fHn1bar = self._expand(jnp.asarray(
            1.0 / (g.dx * g.dy * np.asarray(g.dz_d)), rhs_w.dtype))
        acc = 0.0
        for d in range(nact):
            f_kp1 = self._expand(w8[d][:, 1:]) * q_up
            f_k = self._expand(w8[d][:, :-1]) * q_dn
            acc = acc + linp[d] * fHn1bar * (f_kp1 - f_k)
        phat = (phat + (al * al) * acc) / Fh
        if self.ndims == 2:
            phat = dft.ifft(phat, axis=-2)
        p = dft.irfft_sh(phat, g.nx).astype(rhs_w.dtype)

        # ---- update velocity (:4479-4576) ----
        dpdz_mod = Dmu * p[tuple(sl_hi)] + Dmd * p[tuple(sl_lo)]
        sol_w = self._A_solve(-al * dpdz_mod) + rhs_w_mod
        rho_pi_x = self._expand(self.rho_pi)
        dpdx = p - comm.proll(p, -1, -1)
        if self.ndims == 2:
            dpdy = p - comm.proll(p, -1, -2)
            sol_v = jnp.stack([rhs_v[0] - al * dpdx / rho_pi_x,
                               rhs_v[1] - al * dpdy / rho_pi_x])
        else:
            sol_v = rhs_v - al * dpdx / rho_pi_x

        # ---- update densities (inherited plain path) ----
        F, FW = self._mass_fluxes(sol_v, sol_w)
        ndens = rhs_dens.shape[0]
        sol_dens = rhs_dens - 0.5 * dt * self._weighted_div(F, FW, ndens)
        return sol_dens, sol_v, sol_w
