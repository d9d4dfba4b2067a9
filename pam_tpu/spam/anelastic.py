"""Anelastic (AN) variant of the SPAM extruded dycore.

Parity reference:
* Hamiltonian_AN_Hs — hamiltonians/anelastic.h:7-115: B computed from the
  enthalpy at the REFERENCE pressure profile; the mass density is fixed to
  the reference profile (VS_AN: ndensity_dycore_prognostic=1,
  variableset.h:55-68).
* AnelasticLinearSystem — models/extrudedmodel.h:3245-3520: pressure
  Poisson solve div(rho_ref grad p) = -div(rho_ref u) via FFT in x + a
  real vertical tridiagonal per wavenumber, zero-mode pinned at
  kfix = ni/2; velocity correction v += D0 p, w += D0_vert p.
* project_to_anelastic / add_pressure_perturbation —
  extrudedmodel.h:2489-2503: the projection runs inside every compute_rhs
  (tendency projection) and once on the initial condition.

No acoustics remain, so explicit stepping is limited only by the
advective CFL — the reference's PAMC_MAN default tstype is ssprk3
(core/params.h:148-149).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from . import operators as op
from ..ops import dft
from .tendencies import SpamTendencies
from ..parallel import comm


@dataclasses.dataclass(frozen=True, eq=False)
class AnelasticPressureSolver:
    """div(rho_ref grad) inverse (AnelasticLinearSystem,
    extrudedmodel.h:3245-3520)."""
    geom: Any
    rho_pi: np.ndarray     # (nens, nz)
    rho_di: np.ndarray     # (nens, nz+1)
    tri_l: np.ndarray      # (nens, nz, nx) real
    tri_d: np.ndarray
    tri_u: np.ndarray
    kfix: int

    @staticmethod
    def build(geom, rho_pi, rho_di):
        nz, nx, nens = geom.nz, geom.nx, geom.nens
        dzd = np.asarray(geom.dz_d)
        dzp = np.asarray(geom.dz_p)
        # fourier symbols (ext_deriv.h:964-979); fH1 = dz_d/dx
        th = 2.0 * np.pi * np.arange(nx) / nx
        fD0Dnm1bar = 2.0 * (np.cos(th) - 1.0)
        fH1 = dzd / geom.dx                       # (nens, nz)
        H01d = np.zeros((nens, nz + 1))
        H01d[:, 1:nz] = geom.dx / dzp
        h = np.asarray(rho_di) * H01d             # (nens, nz+1)

        tri_d = (fH1 * np.asarray(rho_pi))[:, :, None] * \
            fD0Dnm1bar[None, None, :]
        tri_u = np.broadcast_to(h[:, 1:, None], tri_d.shape).copy()
        tri_l = np.broadcast_to(h[:, :-1, None], tri_d.shape).copy()
        k = np.arange(nz)
        vert_diag = np.where(k == 0, -h[:, 1:],
                             np.where(k == nz - 1, -h[:, :-1],
                                      -(h[:, 1:] + h[:, :-1])))
        tri_d = tri_d + vert_diag[:, :, None]
        kfix = nz // 2
        # pin the (m=0, kfix) pressure (:3335-3341)
        tri_d[:, kfix, 0] = 1.0
        tri_u[:, kfix, 0] = 0.0
        tri_l[:, kfix, 0] = 0.0
        return AnelasticPressureSolver(geom=geom, rho_pi=np.asarray(rho_pi),
                                       rho_di=np.asarray(rho_di),
                                       tri_l=tri_l, tri_d=tri_d, tri_u=tri_u,
                                       kfix=kfix)

    def _tridiag(self, rhs):
        """Tridiagonal solve batched over (nens, nx) (:3436-3464): Thomas
        scan, or PCR on TPU (si._pcr). rhs complex."""
        from .si import _pcr, _use_pcr
        L = jnp.moveaxis(jnp.asarray(self.tri_l, rhs.real.dtype), 1, 0)
        D = jnp.moveaxis(jnp.asarray(self.tri_d, rhs.real.dtype), 1, 0)
        U = jnp.moveaxis(jnp.asarray(self.tri_u, rhs.real.dtype), 1, 0)
        if _use_pcr(rhs):
            out = _pcr(L.astype(rhs.dtype), D.astype(rhs.dtype),
                       U.astype(rhs.dtype), jnp.moveaxis(rhs, 1, 0))
            return jnp.moveaxis(out, 0, 1)
        R = jnp.moveaxis(rhs, 1, 0)

        def fwd(carry, x):
            c_prev, y_prev = carry
            lk, dk, uk, rk = x
            denom = dk - lk * c_prev
            ck = uk / denom
            yk = (rk - lk * y_prev) / denom
            return (ck, yk), (ck, yk)

        zero_c = jnp.zeros_like(R[0])
        zero_r = jnp.zeros_like(D[0])
        _, (cs, ys) = jax.lax.scan(fwd, (zero_r, zero_c), (L, D, U, R))

        def bwd(x_next, x):
            ck, yk = x
            xk = yk - ck * x_next
            return xk, xk

        _, out_rev = jax.lax.scan(bwd, zero_c, (cs[::-1], ys[::-1]))
        return jnp.moveaxis(out_rev[::-1], 0, 1)

    def project(self, v, w):
        """Return (dv, dw) such that (v+dv, w+dw) satisfies the anelastic
        constraint div(rho_ref u) = 0 (solve + update_velocity,
        :3343-3520)."""
        g = self.geom
        nz = g.nz
        rho_pi = jnp.asarray(self.rho_pi, v.dtype)[:, :, None]
        rho_di = jnp.asarray(self.rho_di, v.dtype)
        F = op.H10(v, g) * rho_pi
        dzp = jnp.asarray(g.dz_p, w.dtype)[:, :, None]
        FW_in = w * (g.dx / dzp) * rho_di[:, 1:nz, None]
        zr = jnp.zeros_like(FW_in[:, :1, :])
        FW = jnp.concatenate([zr, FW_in, zr], axis=1)
        mf = (op.rollm(F, 1) - F) + (FW[:, 1:] - FW[:, :-1])
        # spectral Poisson solve: psum-DFT under x-sharding (ops/dft.py),
        # redundant per-device tridiagonal, comm-free inverse
        rhs = dft.fft_sh(-mf)
        rhs = rhs.at[:, self.kfix, 0].set(0.0)
        phat = self._tridiag(rhs)
        p = dft.ifft_real_sh(phat).astype(v.dtype)
        dv = p - op.rollm(p, -1)                  # D0 in x (:3495-3503)
        dw = p[:, 1:, :] - p[:, :-1, :]           # D0_vert (:3486-3494)
        return dv, dw


@dataclasses.dataclass(frozen=True, eq=False)
class AnelasticTendencies(SpamTendencies):
    """SpamTendencies with the AN Hamiltonian + per-rhs pressure projection.

    dens layout stays [rho, S(, tracers)], but rho is pinned to the
    reference profile (its tendency is zeroed — VS_AN
    ndensity_dycore_prognostic=1)."""
    psolver: Any = None

    def functional_derivatives(self, dens, v, w, geop):
        """F/FW/K as the base; B via Hamiltonian_AN_Hs
        (anelastic.h:57-95): enthalpy at the reference pressure."""
        g, vs, th = self.geom, self.varset, self.thermo
        F, FW, K, _ = SpamTendencies.functional_derivatives(self, dens, v, w,
                                                            geop)
        refrho = jnp.asarray(self.ref_rho_pi, dens.dtype)[:, :, None]
        refs = jnp.asarray(self.ref_q_pi[1], dens.dtype)[:, :, None]
        refp = th.solve_p(refrho, refs)
        sv = vs.get_entropic_var(dens)
        H = th.compute_H(refp, sv)
        gexner = th.compute_dHdentropic_var(refp, sv)
        geop0 = op.Hn1bar(geop, g)
        B_mass = geop0 + H - sv * gexner + op.Hn1bar(K, g)
        B_entr = jnp.broadcast_to(gexner, B_mass.shape)
        return F, FW, K, jnp.stack([B_mass, B_entr])

    def recons(self, dens, qhz, F, FW, FT, FTW):
        """AN branch of compute_recons (extrudedmodel.h:1042-1052,
        1100-1107): the mass-density reconstruction is identically 1 (the
        mass flux is exactly rho_ref u)."""
        dr, dvr, qr, qvr = SpamTendencies.recons(self, dens, qhz, F, FW, FT,
                                                 FTW)
        return dr.at[0].set(1.0), dvr.at[0].set(1.0), qr, qvr

    def post_symplectic(self, fd, fv, fw):
        """rho pinning + anelastic tendency projection, applied after every
        symplectic evaluation (add_pressure_perturbation,
        extrudedmodel.h:2496-2503; used by compute_rhs AND by the SI
        integrators' fixed-point rhs, SI_Fixed.h:41-53)."""
        fd = fd.at[0].set(0.0)     # mass density is not prognostic (VS_AN)
        # the actual tendency is -F; project it so d/dt of the anelastic
        # constraint vanishes, then convert back to F-convention
        dv, dw = self.psolver.project(-fv, -fw)
        return fd, fv - dv, fw - dw

    def compute_rhs(self, dens, v, w, geop, dt):
        """Base symplectic + post hook (Tendencies::compute_rhs +
        add_pressure_perturbation, model.h:275-284)."""
        fd, fv, fw = SpamTendencies.compute_rhs(self, dens, v, w, geop, dt)
        return self.post_symplectic(fd, fv, fw)


@dataclasses.dataclass(frozen=True, eq=False)
class ManTendencies(AnelasticTendencies):
    """Moist anelastic (PAMC_MAN) variant.

    Parity reference: Hamiltonian_MAN_Hs (hamiltonians/anelastic.h:163-340)
    + VS_MAN (variableset.h:84-106, 1196-1335). dens layout here stays
    [rho, S, tracers...] with rho pinned to the reference profile (the
    reference stores rho last; same bookkeeping). The reference pressure
    includes the reference vapor (anelastic.h:214-219); chemical-potential
    terms enter B_mass (anelastic.h:262-268; ConstantKappa decouples the
    moist species so no active tracer B rows)."""

    def functional_derivatives(self, dens, v, w, geop):
        g, vs, th = self.geom, self.varset, self.thermo
        F, FW, K, _ = SpamTendencies.functional_derivatives(self, dens, v, w,
                                                            geop)
        refrho = jnp.asarray(self.ref_rho_pi, dens.dtype)[:, :, None]
        refs = jnp.asarray(self.ref_q_pi[vs.dens_id_entr],
                           dens.dtype)[:, :, None]
        refqv = jnp.asarray(self.ref_q_pi[vs.dens_id_vap],
                            dens.dtype)[:, :, None]
        refp = th.solve_p(refrho, refs, 1.0 - refqv, refqv, 0.0, 0.0)
        sv = vs.get_entropic_var(dens)
        qd, qv, ql, qi = vs.moist_qs(dens)
        H = th.compute_H(refp, sv, qd, qv, ql, qi)
        gexner = th.compute_dHdentropic_var(refp, sv, qd, qv, ql, qi)
        mu_d, mu_v, mu_l, mu_i = th.compute_dHdq(refp, sv, qd, qv, ql, qi)
        geop0 = op.Hn1bar(geop, g)
        B_mass = (geop0 + H - sv * gexner +
                  qv * (mu_d - mu_v) + ql * (mu_d - mu_l) +
                  qi * (mu_d - mu_i) + op.Hn1bar(K, g))
        B_entr = jnp.broadcast_to(gexner, B_mass.shape)
        return F, FW, K, jnp.stack([B_mass, B_entr])


def project_initial(psolver, v, w):
    """project_to_anelastic on the initial state (extrudedmodel.h:2489-2494).
    """
    dv, dw = psolver.project(v, w)
    return v + dv, w + dw
