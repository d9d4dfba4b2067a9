"""Standalone driver: YAML-configured runs mirroring the mmf_simplified
executable.

Parity reference: standalone/mmf_simplified/driver.cpp — config keys
(sim_time, crm_nx/ny/nz, nens, xlen/ylen/zlen, vcoords, dt_gcm,
dt_crm_phys, out_freq, out_prefix, idealized, init_data, ...) are the same
names the reference YAML inputs use (inputs/input_pamc.yaml,
inputs/pamc_idealized/*.yaml). TPU extension: ``ens_chunk: <int|auto>``
runs ensembles larger than the VMEM-resident chunk as host-dispatched
micro-batches (PERF.md round 5).

Run:  python -m pam_tpu.driver.standalone <config.yaml>
"""

from __future__ import annotations

import sys
import time

import numpy as np
import yaml


def load_config(path: str) -> dict:
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return cfg


def build_zint(cfg) -> np.ndarray:
    """Vertical interface heights: uniform (driver.cpp:137-155 half-cell
    convention) or from a NetCDF vcoords file."""
    vcoords = cfg.get("vcoords", "uniform")
    if vcoords == "uniform":
        crm_nz = cfg["crm_nz"]
        zlen = cfg.get("zlen", 20000.0)
        dz = zlen / (crm_nz - 1)
        zint = np.empty(crm_nz + 1)
        zint[0] = 0.0
        zint[-1] = zlen
        zint[1:-1] = np.arange(1, crm_nz) * dz - dz / 2
        return zint
    from scipy.io import netcdf_file
    with netcdf_file(vcoords, "r") as f:
        return np.array(f.variables["vertical_interfaces"][:])


def run_mmf(cfg: dict, verbose: bool = True):
    """MMF (supercell-column, GCM-forced) run — the non-idealized branch of
    driver.cpp:221-272."""
    import jax.numpy as jnp
    from .mmf import setup_supercell_mmf
    from ..io.output import make_writer

    zint = build_zint(cfg)
    nz = len(zint) - 1
    nens = cfg.get("nens", 1)
    kw = dict(
        nx=cfg["crm_nx"], ny=cfg.get("crm_ny", 1), nz=nz,
        xlen=cfg["xlen"],
        ylen=cfg.get("ylen", 64000.0),
        zlen=float(zint[-1]),
        micro=cfg.get("micro", "kessler"),
        sgs=cfg.get("sgs", "none"),
        dt_gcm=cfg.get("dt_gcm", cfg["sim_time"]),
        dt_crm_phys=cfg["dt_crm_phys"],
        dycore=cfg.get("dycore", "awfl"),
        crm_per_phys=cfg.get("crm_per_phys", 1),
        zint=zint,
        dtype=jnp.float64 if cfg.get("f64", True) else jnp.float32)
    # ens_chunk: run large ensembles as VMEM-resident micro-batches —
    # the driver is built at the chunk size and MmfDriver.run routes
    # through host-dispatched chunk stepping (driver/mmf.py; compile
    # stays at the single-chunk cost). "auto" calls pick_ens_chunk.
    chunk = cfg.get("ens_chunk")
    if chunk:
        from .mmf import pick_ens_chunk
        if chunk == "auto":
            chunk = pick_ens_chunk(kw["nx"], kw["ny"], nz, kw["dtype"],
                                   nens)
        chunk = int(chunk)
        if nens % chunk != 0:
            raise ValueError(f"ens_chunk={chunk} must divide nens={nens}")
    if chunk and chunk < nens:
        drv, _ = setup_supercell_mmf(nens=chunk, **kw)
        # full-ENSEMBLE state without the full-ensemble module builds
        # (state_only skips the SPAM SI linear-system construction)
        _, state = setup_supercell_mmf(nens=nens, state_only=True, **kw)
        # the writer describes the FULL ensemble, not the chunk driver
        import dataclasses
        writer_cpl = dataclasses.replace(drv.coupler, nens=nens)
    else:
        drv, state = setup_supercell_mmf(nens=nens, **kw)
        writer_cpl = drv.coupler
    out_freq = cfg.get("out_freq", -1.0)
    writer = None
    if out_freq >= 0:
        writer = make_writer(writer_cpl, state,
                             cfg.get("out_prefix", "out"),
                             cfg.get("io_backend", "netcdf"))
        writer.write(state, 0.0)

    t0 = time.time()
    nout = [0]

    def cb(s, etime):
        # multiplication, not division: out_freq == 0 means "write every
        # callback" (the reference's C++ float division yields inf and
        # never writes again; every-step is the useful reading of 0)
        if writer is not None and etime >= (nout[0] + 1) * out_freq:
            writer.write(s, etime)
            nout[0] += 1
        if verbose:
            import jax.numpy as jnp
            maxw = float(jnp.max(jnp.abs(s["wvel"])))
            print(f"Etime , dtphys, maxw: {etime} , "
                  f"{drv.dt_crm_phys} , {maxw:10.5f}", flush=True)

    state = drv.run(state, cfg["sim_time"], cb)
    if verbose:
        print(f"Simulation Time: {cfg['sim_time']}")
        print(f"Run Time: {time.time() - t0}")
    if writer is not None:
        writer.close()
    return state


def run_layer(cfg: dict, verbose: bool = True):
    """Layer-model (SWE/TSWE) runs: doublevortex / bickleyjet
    (layermodel.h:1272-1404)."""
    import jax
    from ..spam.layer import (LayerModel, DoubleVortex, BickleyJet,
                              setup_double_vortex)
    tc = {"doublevortex": DoubleVortex(),
          "bickleyjet": BickleyJet()}[cfg.get("init_data", "doublevortex")]
    variant = cfg.get("model", "swe")
    if variant not in ("swe", "tswe"):
        raise ValueError(f"unknown layer model {variant!r} "
                         "(expected 'swe' or 'tswe')")
    m = LayerModel(nx=cfg["crm_nx"], ny=cfg.get("crm_ny", cfg["crm_nx"]),
                   nens=cfg.get("nens", 1), Lx=tc.Lx, Ly=tc.Ly, g=tc.g,
                   variant=variant, ndens=2 if variant == "tswe" else 1)
    dens, v, hs, cor = setup_double_vortex(m, tc)
    dt = cfg.get("dtcrm", 120.0)
    nsteps = int(np.ceil(cfg["sim_time"] / dt))
    step = jax.jit(lambda d, vv: m.ssprk3_step(d, vv, hs, cor, dt))
    stats_every = max(1, int(cfg.get("stat_freq", cfg["sim_time"] / 10) / dt))
    t0 = time.time()
    for n in range(nsteps):
        dens, v = step(dens, v)
        if verbose and (n + 1) % stats_every == 0:
            st = m.statistics(dens, v, hs, cor)
            print(f"step {n+1} t={dt*(n+1):9.2f}s  E={float(st['E'][0]):.8e} "
                  f"mass={float(st['mass'][0, 0]):.8e}", flush=True)
    if verbose:
        print(f"Run Time: {time.time() - t0}")
    return dens, v


def run_idealized_3d(cfg: dict, verbose: bool = True):
    """3-D (ndims=2) idealized SPAM runs: the reference's max_ndims=2 cases
    risingbubble / moistrisingbubble / supercell on an x-y-z grid
    (extrudedmodel.h:6195,7050), ssprk3 or semi-implicit stepping (the
    pressure-family solvers are the reference's only ndims=2 SI path)."""
    import jax
    import jax.numpy as jnp
    from ..spam import (ExtrudedGeometry, VariableSet, Tendencies3D)
    from ..spam.thermo import thermo_from_string
    from ..spam import testcases as tcs
    from ..spam import si as si_mod
    import dataclasses as dc

    name = cfg["init_data"]
    tc, moist = tcs.testcase_from_string(name)
    nx, ny, nz = cfg["crm_nx"], cfg["crm_ny"], cfg["crm_nz"]
    nens = cfg.get("nens", 1)
    ylen = getattr(tc, "Ly", tc.Lx)
    dtype = jnp.float64 if cfg.get("f64", True) else jnp.float32
    geom = ExtrudedGeometry.build3d(nx, ny, np.linspace(0.0, tc.Lz, nz + 1),
                                    tc.Lx, ylen, nens, dtype)
    thermo = thermo_from_string(cfg.get(
        "thermo", "constkappavirpottemp" if moist else "idealgaspottemp"))
    special_ref = None
    if moist:
        if getattr(tc, "needs_special_init", False) and \
                hasattr(tc, "thermo_constants"):
            thermo = dc.replace(thermo, cst=tc.thermo_constants())
        vs = VariableSet(variant="MCE_rho", tracer_names=("water_vapor",),
                         tracer_positive=(True,), geom=geom, thermo=thermo)
        if getattr(tc, "needs_special_init", False):
            dens, v, w, geop, special_ref = tcs.setup_supercell_3d(
                tc, geom, thermo, vs)
        else:
            dens, v, w, geop = tcs.setup_testcase_3d(tc, geom, thermo)
    else:
        vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
        dens, v, w, geop = tcs.setup_testcase_3d(tc, geom, thermo)
    tend = Tendencies3D(geom=geom, varset=vs, thermo=thermo, grav=tc.g)

    tstype = cfg.get("tstype", "ssprk3")
    if tstype == "si":
        if special_ref is not None:
            ref = special_ref
        elif hasattr(tc, "refrho_f"):
            ref = si_mod.build_reference_state(
                geom, thermo, vs, lambda z: tc.refrho_f(z, thermo),
                lambda z: tc.refentropicdensity_f(z, thermo),
                lambda z: np.asarray(tc.refnsq_f(z, thermo)), tc.g)
        else:
            raise ValueError(
                f"init_data {name!r} has no reference state for tstype=si")
        J = jnp.asarray
        tend = dc.replace(
            tend, force_refstate_hydrostatic_balance=True,
            refdens=J(ref["dens"]), ref_rho_pi=J(ref["rho_pi"]),
            ref_q_pi=J(ref["q_pi"]), ref_rho_di=J(ref["rho_di"]),
            ref_q_di=J(ref["q_di"]), ref_B=J(ref["B"]))
        dt = cfg.get("dtcrm", 10.0)
        linsys_name = cfg.get("linear_system", "pressure_gravity")
        cls = {"pressure": si_mod.CompressiblePressureLinearSystem,
               "pressure_gravity":
                   si_mod.CompressiblePressureGravityLinearSystem}[linsys_name]
        lin = cls.build(geom, thermo, vs, ref, dt)
        step = jax.jit(lambda d, vv, ww: si_mod.si_step(
            tend, lin, d, vv, ww, geop, dt,
            cfg.get("si_max_iters", 3), cfg.get("si_nquad", 2)))
    else:
        dt = cfg.get("dtcrm",
                     0.3 * min(geom.dx, geom.dy,
                               float(geom.dz_d.min())) / 350.0)
        step = jax.jit(lambda d, vv, ww: tend.ssprk3_step(d, vv, ww, geop,
                                                          dt))
    nsteps = int(np.ceil(cfg["sim_time"] / dt))
    stats_every = max(1, int(cfg.get("stat_freq",
                                     cfg["sim_time"] / 10) / dt))
    t0 = time.time()
    for n in range(nsteps):
        dens, v, w = step(dens, v, w)
        if (n + 1) % stats_every == 0 and verbose:
            st = tend.statistics(dens, v, w, geop)
            print(f"step {n+1} t={dt*(n+1):9.2f}s  "
                  f"E={float(st['E'][0]):.8e} "
                  f"mass={float(st['densstat'][0, 0]):.8e}", flush=True)
    if verbose:
        print(f"Run Time: {time.time() - t0}")
    return dens, v, w


def run_idealized(cfg: dict, verbose: bool = True):
    """Idealized SPAM runs (risingbubble, densitycurrent) — the idealized
    branch with init_data dispatch (extrudedmodel.h testcase_from_string)."""
    import jax
    import jax.numpy as jnp
    from ..spam import (ExtrudedGeometry, VariableSet, SpamTendencies)
    from ..spam.thermo import thermo_from_string
    from ..spam import testcases as tcs

    name = cfg["init_data"]
    if name in ("doublevortex", "bickleyjet"):
        return run_layer(cfg, verbose)
    if cfg.get("crm_ny", 1) > 1:
        return run_idealized_3d(cfg, verbose)
    tc, moist = tcs.testcase_from_string(name)
    nx = cfg["crm_nx"]
    nz = cfg["crm_nz"]
    nens = cfg.get("nens", 1)
    dtype = jnp.float64 if cfg.get("f64", True) else jnp.float32
    geom = ExtrudedGeometry.build(nx, np.linspace(0.0, tc.Lz, nz + 1),
                                  tc.Lx, nens, dtype)
    thermo = thermo_from_string(cfg.get(
        "thermo", "constkappavirpottemp" if moist else "idealgaspottemp"))
    special_ref = None
    if moist:
        if getattr(tc, "needs_special_init", False) and \
                hasattr(tc, "thermo_constants"):
            import dataclasses as _dc
            thermo = _dc.replace(thermo, cst=tc.thermo_constants())
        vs = VariableSet(variant="MCE_rho", tracer_names=("water_vapor",),
                         tracer_positive=(True,), geom=geom, thermo=thermo)
        tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
        if getattr(tc, "needs_special_init", False):
            # supercell: ICs + reference state from the special column init
            # (extrudedmodel.h:7148-7287)
            dens, v, w, geop, special_ref = tcs.setup_supercell(
                tc, geom, thermo, vs)
        else:
            dens, v, w, geop = tcs.setup_moist_testcase(tc, geom, thermo)
    else:
        vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
        tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
        dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)

    # diffusion coefficients from config (ref: read_model_params_file,
    # extrudedmodel.h:5020-5078; defaults 0 = off)
    diff_keys = ("scalar_horiz_diffusion_coeff", "scalar_vert_diffusion_coeff",
                 "velocity_vort_horiz_diffusion_coeff",
                 "velocity_vort_vert_diffusion_coeff",
                 "velocity_div_horiz_diffusion_coeff",
                 "velocity_div_vert_diffusion_coeff")
    diff_cfg = {k: float(cfg[k]) for k in diff_keys if k in cfg}
    # numerics knobs (compile-time in the reference, common.h:72-111)
    for k in ("reconstruction_type", "dual_upwind_type"):
        if k in cfg:
            diff_cfg[k] = str(cfg[k])
    if "tanh_upwind_coeff" in cfg:
        diff_cfg["tanh_upwind_coeff"] = float(cfg["tanh_upwind_coeff"])
    if diff_cfg:
        import dataclasses as _dc
        tend = _dc.replace(tend, **diff_cfg)

    if cfg.get("hamil") in ("an", "man"):
        # anelastic variants (PAMC_HAMIL=an / man): rho pinned to the
        # reference profile, per-rhs pressure projection, no acoustic CFL
        from ..spam import si as si_mod
        from ..spam.anelastic import (AnelasticPressureSolver,
                                      AnelasticTendencies, ManTendencies,
                                      project_initial)
        if not hasattr(tc, "refrho_f"):
            raise ValueError(
                f"init_data {name!r} has no reference state for hamil=an")
        ref = si_mod.build_reference_state(
            geom, thermo, vs, lambda z: tc.refrho_f(z, thermo),
            lambda z: tc.refentropicdensity_f(z, thermo),
            lambda z: tc.refnsq_f(z, thermo), tc.g)
        psolver = AnelasticPressureSolver.build(geom, ref["rho_pi"],
                                                ref["rho_di"])
        J = jnp.asarray
        cls = ManTendencies if cfg["hamil"] == "man" else AnelasticTendencies
        if cfg["hamil"] == "man" and not moist:
            raise ValueError("hamil=man needs a moist init_data")
        tend = cls(
            geom=geom, varset=vs, thermo=thermo, grav=tc.g,
            force_refstate_hydrostatic_balance=True,
            refdens=J(ref["dens"]), ref_rho_pi=J(ref["rho_pi"]),
            ref_q_pi=J(ref["q_pi"]), ref_rho_di=J(ref["rho_di"]),
            ref_q_di=J(ref["q_di"]), ref_B=J(ref["B"]), psolver=psolver)
        # anelastic IC: rho = refrho (extrudedmodel.h:5344-5347; MAN:
        # MoistEulerTestCase rho_f -> refrho_f under PAMC_MAN, :5550-5552)
        dens_rho = J(np.broadcast_to(
            np.asarray(ref["dens"][0])[:, :, None],
            (nens, nz, nx)).copy())
        dens_S = J(tcs.project_n1form(
            lambda x, z: tc.refrho_f(z, thermo) *
            tc.entropicvar_f(x, z, thermo), geom))
        rows = [dens_rho, dens_S]
        if moist:
            rows.append(J(tcs.project_n1form(
                lambda x, z: tc.rhov_f(x, z, thermo), geom)))
        dens = jnp.stack(rows)
        v, w = project_initial(psolver, v, w)

    tstype = cfg.get("tstype", "ssprk3")
    if tstype == "si":
        # semi-implicit: needs a testcase reference state (ref: params
        # tstype="si", core/params.h:151 + SI_Newton.h)
        from ..spam import si as si_mod
        if special_ref is not None:
            ref = special_ref
        elif hasattr(tc, "refrho_f"):
            ref = si_mod.build_reference_state(
                geom, thermo, vs, lambda z: tc.refrho_f(z, thermo),
                lambda z: tc.refentropicdensity_f(z, thermo),
                lambda z: np.asarray(tc.refnsq_f(z, thermo)), tc.g)
        else:
            raise ValueError(
                f"init_data {name!r} has no reference state for tstype=si")
        import dataclasses as dc
        J = jnp.asarray
        tend = dc.replace(
            tend, force_refstate_hydrostatic_balance=True,
            refdens=J(ref["dens"]), ref_rho_pi=J(ref["rho_pi"]),
            ref_q_pi=J(ref["q_pi"]), ref_rho_di=J(ref["rho_di"]),
            ref_q_di=J(ref["q_di"]), ref_B=J(ref["B"]))
        dt = cfg.get("dtcrm", 10.0)
        lin = si_mod.CompressibleVelocityLinearSystem.build(
            geom, thermo, vs, ref, dt, grav=tc.g)
        nsteps = int(np.ceil(cfg["sim_time"] / dt))
        step = jax.jit(lambda d, vv, ww: si_mod.si_step(
            tend, lin, d, vv, ww, geop, dt,
            cfg.get("si_max_iters", 3), cfg.get("si_nquad", 2)))
    elif tstype == "si_fixed":
        # fixed-point SI (SIFixedTimeIntegrator, SI_Fixed.h) — no linear
        # solve; pairs with the anelastic pressure projection
        from ..spam import si as si_mod
        dt = cfg.get("dtcrm", 10.0)
        nsteps = int(np.ceil(cfg["sim_time"] / dt))
        step = jax.jit(lambda d, vv, ww: si_mod.si_fixed_step(
            tend, d, vv, ww, geop, dt,
            cfg.get("si_max_iters", 5), cfg.get("si_nquad", 2)))
    else:
        from ..spam.timesteppers import STEPPERS
        if tstype not in STEPPERS:
            raise ValueError(f"unknown tstype {tstype!r}")
        stepper = STEPPERS[tstype]
        dt = cfg.get("dtcrm",
                     0.3 * min(geom.dx, float(geom.dz_d.min())) / 350.0)
        nsteps = int(np.ceil(cfg["sim_time"] / dt))

        def rhs(x):
            return tend.compute_rhs(x[0], x[1], x[2], geop, dt)

        step = jax.jit(lambda d, vv, ww: stepper(rhs, (d, vv, ww), dt))
    stat_freq = cfg.get("stat_freq", cfg["sim_time"] / 10)
    stats_every = max(1, int(stat_freq / dt))
    stats_writer = None
    if cfg.get("out_prefix"):
        from ..io.output import StatsWriter
        st = tend.statistics(dens, v, w, geop)
        stats_writer = StatsWriter(st, nens, cfg["out_prefix"])
        stats_writer.write(st, 0.0)
    t0 = time.time()
    for n in range(nsteps):
        dens, v, w = step(dens, v, w)
        if (n + 1) % stats_every == 0 and (stats_writer is not None
                                           or verbose):
            # skip the reduction+device sync entirely when nobody reads
            # it (matches the guarded loops in run_idealized_3d/run_layer)
            st = tend.statistics(dens, v, w, geop)
            if stats_writer is not None:
                stats_writer.write(st, dt * (n + 1))
            if verbose:
                print(f"step {n+1} t={dt*(n+1):9.2f}s  "
                      f"E={float(st['E'][0]):.8e} "
                      f"mass={float(st['densstat'][0, 0]):.8e}", flush=True)
    if stats_writer is not None:
        stats_writer.close()
    if verbose:
        print(f"Run Time: {time.time() - t0}")
    return dens, v, w


def main(argv=None):
    argv = argv or sys.argv[1:]
    if not argv:
        print("usage: python -m pam_tpu.driver.standalone <config.yaml>")
        return 1
    cfg = load_config(argv[0])
    if cfg.get("f64", True):
        import jax
        jax.config.update("jax_enable_x64", True)
    if cfg.get("idealized", False) or cfg.get("mode") == "idealized":
        run_idealized(cfg)
    else:
        run_mmf(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
