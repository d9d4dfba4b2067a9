"""SPAM dycore ↔ coupler bridge ("PAM-C").

Parity reference: dynamics/spam/Dycore.h (init/timeStep orchestration,
name "SPAM++", Dycore.h:327) and the coupler conversion kernels in
dynamics/spam/src/hamiltonians/variableset.h:481-912.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.coupler import Coupler
from .geometry import ExtrudedGeometry
from .thermo import (ConstantKappaVirtualPottemp, IdealGasPottemp,
                     ThermoConstants)
from .varset import VariableSet
from .tendencies import SpamTendencies
from .operators import mirror_layer, rollm


def exact_inverse_avg(u, axis: int = -1):
    """Solve v[i] + v[i+1] = 2*u[i] (periodic along ``axis``; requires odd
    extent — the reference's couple_wind_exact_inverse,
    variableset.h:807-846, re-derived in closed form: the reference's
    sequential recurrence v[i] = 2 u[i-1] - v[i-1] becomes an alternating
    cumulative sum, so the inverse is a single parallel scan-free kernel).
    """
    n = u.shape[axis]
    assert n % 2 == 1, (
        "couple_wind_exact_inverse requires an odd cell count "
        "(variableset.h:225-233)")
    from ..parallel import comm
    if comm.active_x_axis() is not None:
        # the alternating-sum recurrence is GLOBAL along x: a shard-local
        # inverse would silently be wrong at every shard boundary
        raise NotImplementedError(
            "couple_wind_exact_inverse requires x unsharded (global "
            "alternating-sum recurrence); use the default averaging "
            "conversion under manual x sharding")
    um = jnp.moveaxis(u, axis, -1)
    i = np.arange(n)
    sgn = jnp.asarray(np.where(i % 2 == 0, 1.0, -1.0), um.dtype)
    v0 = jnp.sum(sgn * um, axis=-1, keepdims=True)
    # v[i] = (-1)^i (v0 + 2 sum_{j=1..i} (-1)^j u[j-1])
    t = -sgn[:-1] * um[..., :-1]                  # (-1)^j u[j-1], j=1..n-1
    c = jnp.concatenate([jnp.zeros_like(um[..., :1]),
                         jnp.cumsum(t, axis=-1)], axis=-1)
    v = sgn * (v0 + 2.0 * c)
    return jnp.moveaxis(v, axis, -1) if axis != -1 else v


def exact_inverse_w(wvel, dzp):
    """Exact inverse of the interface-weighted w interpolation
    (variableset.h:853-875): x[0] = wvel[0];
    x[k] = (e_k + e_{k-1})/e_{k-1} * wvel[k] - e_k/e_{k-1} * x[k-1].

    wvel: (nens, nz, ...) cell-center w; dzp: (nens, nz-1, ...) broadcastable
    interface weights e. Returns (nens, nz-1, ...) primal-layer w_phys."""
    nl = wvel.shape[1] - 1
    e = jnp.broadcast_to(dzp, wvel[:, :nl].shape)
    e_m = jnp.moveaxis(e, 1, 0)          # (nl, nens, ...)
    ws = jnp.moveaxis(wvel, 1, 0)        # (nz, nens, ...)
    x0 = ws[0]

    def body(x, inp):
        ek, ekm1, wk = inp
        x_new = (ek + ekm1) / ekm1 * wk - ek / ekm1 * x
        return x_new, x_new

    _, xs = jax.lax.scan(body, x0, (e_m[1:], e_m[:-1], ws[1:nl]))
    return jnp.moveaxis(jnp.concatenate([x0[None], xs], axis=0), 0, 1)


def thermo_constants_from_coupler(coupler: Coupler) -> ThermoConstants:
    """Map coupler physical constants onto the SPAM thermo constants, as
    CoupledTestCase::set_reference_state does from coupler options
    (extrudedmodel.h:5812-5826). The reference assigns Lvr directly; our
    Lvr is derived from Lv0, so Lv0 is back-solved to make Lvr == latvap."""
    c = coupler.const
    cpv = c.cp_v
    cl = c.cp_l
    return ThermoConstants(
        Rd=c.R_d, Rv=c.R_v, pr=c.p0, Cpd=c.cp_d, Cvd=c.cp_d - c.R_d,
        Cpv=cpv, Cvv=cpv - c.R_v, Cl=cl,
        Lv0=c.latvap - (cpv - cl) * ThermoConstants.Tr, Lfr=c.latice)


@dataclasses.dataclass(frozen=True, eq=False)
class SpamDycore:
    """Coupled SPAM dycore (MCE_rho + ConstantKappa_VirtualPottemp by
    default — the reference's coupled configuration, CI matrix
    .github/workflows/pamc-idealized-ubuntu.yml)."""
    coupler: Coupler
    geom: ExtrudedGeometry
    varset: VariableSet
    thermo: Any
    tend: SpamTendencies
    geop: Any              # (nens, nz, nx) n-form of g*z
    grav: float
    # semi-implicit config (ref tstype="si", core/params.h:151); None ->
    # explicit ssprk3 substepping
    si_linsys: Any = None
    si_dt: float = None
    si_max_iters: int = 3
    si_nquad: int = 2
    # exact two-point discrete gradient (si_two_point_discrete_gradient,
    # params.h:158; default off, matching the reference)
    si_two_point: bool = False
    # exact inversion of the edge-averaging wind conversion (requires odd
    # horizontal cell counts — ref: couple_wind_exact_inverse,
    # variableset.h:225-233, 807-875)
    couple_wind_exact_inverse: bool = False

    name = "SPAM++"  # ref: Dycore.h:327

    @property
    def ndims(self):
        """Horizontal dims: 1 = x-z slab, 2 = full 3-D (PAMC_NDIMS)."""
        return 2 if self.coupler.ny > 1 else 1

    @staticmethod
    def build(coupler: Coupler, zint, grav: float = 9.80616,
              variant: str = "MCE_rho", thermo=None) -> "SpamDycore":
        """x-z slab (ny == 1) or full 3-D extruded model (ny > 1 — the
        reference's PAMC_NDIMS=2 compile configuration)."""
        if thermo is None:
            thermo = (ConstantKappaVirtualPottemp() if variant == "MCE_rho"
                      else IdealGasPottemp())
        if coupler.ny > 1:
            geom = ExtrudedGeometry.build3d(coupler.nx, coupler.ny,
                                            np.asarray(zint), coupler.xlen,
                                            coupler.ylen, coupler.nens,
                                            coupler.dtype)
        else:
            geom = ExtrudedGeometry.build(coupler.nx, np.asarray(zint),
                                          coupler.xlen, coupler.nens,
                                          coupler.dtype)
        vs = VariableSet(variant=variant,
                         tracer_names=tuple(coupler.tracer_names),
                         tracer_positive=tuple(coupler.tracer_positive),
                         geom=geom, thermo=thermo)
        # geopotential as twisted n1-form: avg(g*z)*volume per dual cell
        zmid = geom.zmid_d  # cell average of z = midpoint (linear)
        geop_col = grav * zmid * geom.dx * geom.dy * geom.dz_d
        if coupler.ny > 1:
            from .extruded3d import Tendencies3D
            tend = Tendencies3D(geom=geom, varset=vs, thermo=thermo,
                                grav=grav)
            geop = jnp.asarray(np.broadcast_to(
                geop_col[:, :, None, None],
                (geom.nens, geom.nz, geom.ny, geom.nx)), coupler.dtype)
        else:
            tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo,
                                  grav=grav)
            geop = jnp.asarray(np.repeat(geop_col[:, :, None], geom.nx,
                                         axis=2), coupler.dtype)
        return SpamDycore(coupler=coupler, geom=geom, varset=vs,
                          thermo=thermo, tend=tend, geop=geop, grav=grav)

    @staticmethod
    def build_coupled(coupler: Coupler, state, zint, dt_si,
                      si_max_iters: int = 3, si_nquad: int = 2,
                      variant: str = "MCE_rho",
                      linear_system: str = "velocity",
                      si_two_point: bool = False) -> "SpamDycore":
        """Full coupled setup mirroring the reference's MMF configuration:
        MCE_rho + ConstantKappa_VirtualPottemp, thermo constants copied from
        the coupler, SI reference state built from the coupler's ref_*
        columns, and the semi-implicit integrator at step dt_si
        (CoupledTestCase, extrudedmodel.h:5768-6069 + tstype="si" default,
        core/params.h:148-152)."""
        from . import si as si_mod
        thermo = ConstantKappaVirtualPottemp(
            cst=thermo_constants_from_coupler(coupler))
        dyc = SpamDycore.build(coupler, zint, grav=coupler.const.grav,
                               variant=variant, thermo=thermo)
        refstate = si_mod.build_coupled_reference_state(
            state, dyc.geom, thermo, dyc.varset, coupler.const.grav)
        return dyc.with_si(refstate, dt_si, max_iters=si_max_iters,
                           nquad=si_nquad, linear_system=linear_system,
                           two_point=si_two_point)

    # ------------------------------------------------------- conversions
    def coupler_to_dynamics(self, state):
        """(ref: convert_coupler_to_dynamics_densities/wind,
        variableset.h:675-912, averaging inverse path). Handles both the
        x-z slab (ny dropped) and the 3-D layout (v stacked (vx, vy))."""
        g, vs, th = self.geom, self.varset, self.thermo
        three_d = self.ndims == 2

        def fld(name):
            f = state[name]
            return f if three_d else f[:, :, 0, :]

        nh = 2 if three_d else 1
        area = jnp.asarray(g.d_area_n1(), self.coupler.dtype)
        area = area.reshape(area.shape + (1,) * nh)
        rho_d = fld("density_dry")
        temp = fld("temp")
        tracers = [fld(n) for n in vs.tracer_names]
        if "water_vapor" not in vs.tracer_names:
            raise ValueError(
                "the coupled SPAM conversion requires a registered "
                "'water_vapor' tracer (variableset.h:246-287 searches the "
                "coupler tracers); dry idealized runs use the standalone "
                "testcase path, not the coupler conversion")
        dens_vap = tracers[vs.dens_id_vap - 2]
        dens_liq = tracers[vs.dens_id_liq - 2] if vs.liq_found else 0.0
        dens_ice = tracers[vs.dens_id_ice - 2] if vs.ice_found else 0.0
        dens_tot = rho_d + dens_vap  # ref: variableset.h:724
        qd = rho_d / dens_tot
        qv = dens_vap / dens_tot
        ql = dens_liq / dens_tot if vs.liq_found else 0.0
        qi = dens_ice / dens_tot if vs.ice_found else 0.0
        alpha = 1.0 / dens_tot
        sv = th.compute_entropic_var_from_alpha_T(alpha, temp, qd, qv, ql, qi)
        dens = jnp.stack([dens_tot * area, sv * dens_tot * area] +
                         [t * area for t in tracers])
        # winds (averaging; ref: variableset.h:874-911)
        uvel = fld("uvel")
        wvel = fld("wvel")
        dzp = jnp.asarray(g.dz_p, uvel.dtype)
        dzp = dzp.reshape(dzp.shape + (1,) * nh)
        if self.couple_wind_exact_inverse:
            w = exact_inverse_w(wvel, dzp) * dzp
        else:
            w = 0.5 * (wvel[:, :-1] + wvel[:, 1:]) * dzp
        if three_d:
            from ..parallel import comm
            vvel = fld("vvel")
            if self.couple_wind_exact_inverse:
                vx = exact_inverse_avg(uvel, -1) * g.dx
                vy = exact_inverse_avg(vvel, -2) * g.dy
            else:
                vx = 0.5 * (uvel + comm.proll(uvel, -1, -1)) * g.dx
                vy = 0.5 * (vvel + comm.proll(vvel, -1, -2)) * g.dy
            return dens, jnp.stack([vx, vy]), w
        if self.couple_wind_exact_inverse:
            v = exact_inverse_avg(uvel, -1) * g.dx
        else:
            v = 0.5 * (uvel + rollm(uvel, -1)) * g.dx
        return dens, v, w

    def dynamics_to_coupler(self, state, dens, v, w):
        """(ref: convert_dynamics_to_coupler_densities/wind,
        variableset.h:481-654)."""
        g, vs, th = self.geom, self.varset, self.thermo
        three_d = self.ndims == 2
        nh = 2 if three_d else 1
        area = jnp.asarray(g.d_area_n1(), dens.dtype)
        area = area.reshape(area.shape + (1,) * nh)
        qd, qv, ql, qi = vs.moist_qs(dens)
        sv = vs.get_entropic_var(dens)
        alpha = vs.get_alpha(dens)
        temp = th.compute_T_from_alpha(alpha, sv, qd, qv, ql, qi)
        rho_d = vs.get_dry_density(dens) / area

        def to4d(a):
            return a if three_d else a[:, :, None, :]

        out = dict(state)
        out["density_dry"] = to4d(rho_d)
        out["temp"] = to4d(temp)
        for idx, name in enumerate(vs.tracer_names):
            out[name] = to4d(dens[2 + idx] / area)
        # winds back to cell centers (ref: variableset.h:594-652)
        if three_d:
            from ..parallel import comm
            out["uvel"] = 0.5 * (v[0] / g.dx +
                                 comm.proll(v[0] / g.dx, 1, -1))
            out["vvel"] = 0.5 * (v[1] / g.dy +
                                 comm.proll(v[1] / g.dy, 1, -2))
        else:
            u_edge = v / g.dx
            out["uvel"] = to4d(0.5 * (u_edge + rollm(u_edge, 1)))
            out["vvel"] = jnp.zeros_like(out["uvel"])
        dzp = jnp.asarray(g.dz_p, dens.dtype)
        dzp = dzp.reshape(dzp.shape + (1,) * nh)
        w_phys = w / dzp                      # (nens, nz-1, [ny,] nx)
        # wvel at dual layer k: interface-weighted interp (ref :607-633)
        e = dzp
        if three_d:
            from .extruded3d import mirror_layer as ml3
            w_pad = ml3(w_phys, 1)            # w_pad[k] = w_phys[k-1]
        else:
            w_pad = mirror_layer(w_phys, 1)
        e_pad = jnp.concatenate([e[:, :1], e, e[:, -1:]], axis=1)
        wd = w_pad[:, :-1]                    # w below layer k
        wu = w_pad[:, 1:]                     # w above layer k
        e_d = e_pad[:, :-1]
        e_u = e_pad[:, 1:]
        w_mid = wd + (wu - wd) * e_d / (e_u + e_d)
        nz = g.nz
        w_mid = w_mid.at[:, 0].set(w_phys[:, 0])
        w_mid = w_mid.at[:, nz - 1].set(w_phys[:, -1])
        out["wvel"] = to4d(w_mid)
        return out

    # ------------------------------------------------------- time stepping
    def compute_dt_dyn(self, cfl: float = 0.5):
        """Static acoustic-CFL estimate for SSPRK substepping (analog of
        Dycore.h:248-266 CFL-adaptive substepping, conservative cs).
        Includes dy in the 3-D (ndims=2) configuration — the y acoustic
        CFL binds whenever dy < min(dx, dz)."""
        cs = 350.0
        dz = float(np.min(self.geom.dz_d))
        dmin = min(self.geom.dx, dz)
        if self.ndims == 2:
            dmin = min(dmin, self.geom.dy)
        return cfl * dmin / cs

    def with_si(self, refstate, dt_si, max_iters: int = 3, nquad: int = 2,
                linear_system: str = "velocity", two_point: bool = False):
        """Return a copy configured for semi-implicit stepping at fixed
        dt_si with the given reference state (ref tstype="si" +
        set_reference_state; timestep then takes dt_si-sized SI steps
        regardless of the acoustic CFL). linear_system: "velocity"
        (buoyancy-coupled — stable for the stratified coupled MMF config)
        or "pressure" (the reference YAML default, extrudedmodel.h:5059;
        like the reference's plain pressure system it lacks gravity in the
        linear operator and can destabilize strongly stratified columns at
        large dt — that is what pressure_gravity exists for)."""
        from . import si as si_mod
        J = lambda a: jnp.asarray(a, self.coupler.dtype)
        tend = dataclasses.replace(
            self.tend, force_refstate_hydrostatic_balance=True,
            refdens=J(refstate["dens"]), ref_rho_pi=J(refstate["rho_pi"]),
            ref_q_pi=J(refstate["q_pi"]), ref_rho_di=J(refstate["rho_di"]),
            ref_q_di=J(refstate["q_di"]), ref_B=J(refstate["B"]))
        if self.ndims == 2 and linear_system == "velocity":
            # the velocity solver is slab-only, matching the reference
            # (extrudedmodel.h:2561-2564 throws for ndims>1); the
            # gravity-aware pressure system is the stratification-robust
            # 3-D choice
            linear_system = "pressure_gravity"
        if linear_system == "pressure":
            linsys = si_mod.CompressiblePressureLinearSystem.build(
                self.geom, self.thermo, self.varset, refstate, dt_si)
        elif linear_system == "pressure_gravity":
            linsys = si_mod.CompressiblePressureGravityLinearSystem.build(
                self.geom, self.thermo, self.varset, refstate, dt_si)
        else:
            linsys = si_mod.CompressibleVelocityLinearSystem.build(
                self.geom, self.thermo, self.varset, refstate, dt_si,
                grav=self.grav)
        return dataclasses.replace(self, tend=tend, si_linsys=linsys,
                                   si_dt=dt_si, si_max_iters=max_iters,
                                   si_nquad=nquad, si_two_point=two_point)

    def timestep(self, state, dt_phys, n_substeps: int = None):
        """Advance coupler state by dt_phys: n_substeps SSPRK3 steps
        (ref: Dycore::timeStep, spam/Dycore.h:248-318), or SI steps of
        size si_dt when configured via with_si."""
        from ..parallel import comm
        # geop is a closed-over full-x constant: slice to the local x block
        # inside a manual-x shard_map region (no-op otherwise)
        geop = comm.local_xslice(self.geop, -1)
        if self.si_linsys is not None:
            from . import si as si_mod
            n_substeps = max(1, int(round(dt_phys / self.si_dt)))
            dtcrm = dt_phys / n_substeps
            stepper = lambda d_, v_, w_: si_mod.si_step(
                self.tend, self.si_linsys, d_, v_, w_, geop, dtcrm,
                self.si_max_iters, self.si_nquad,
                two_point=self.si_two_point)
        else:
            if n_substeps is None:
                n_substeps = max(1, int(np.ceil(dt_phys /
                                                self.compute_dt_dyn())))
            dtcrm = dt_phys / n_substeps
            stepper = lambda d_, v_, w_: self.tend.ssprk3_step(
                d_, v_, w_, geop, dtcrm)
        dens, v, w = self.coupler_to_dynamics(state)

        # NOTE: the lax.scan stays even for n_substeps == 1 — XLA compiles
        # the loop body into a measurably faster program than the inlined
        # step (7.3 -> 5.2 ms/step on v5e at 65x50x128), likely due to
        # loop-invariant table hoisting + layout assignment.
        # Clipping of negative positive-definite densities runs INSIDE
        # the substep body (ref: Dycore.h timeStep clips after EVERY
        # inner step, clip_negative_densities default true) so later
        # substeps never advance from a negative tracer state; identical
        # to a post-scan clip when n_substeps == 1 (all configs of
        # record).
        pos = jnp.asarray(self.varset.dens_pos)
        pos = pos.reshape((-1,) + (1,) * (dens.ndim - 1))

        def body(carry, _):
            d_, v_, w_ = carry
            d2, v2, w2 = stepper(d_, v_, w_)
            d2 = jnp.where(pos, jnp.maximum(d2, 0.0), d2)
            return (d2, v2, w2), None

        (dens, v, w), _ = jax.lax.scan(body, (dens, v, w), None,
                                       length=n_substeps)
        return self.dynamics_to_coupler(state, dens, v, w)
