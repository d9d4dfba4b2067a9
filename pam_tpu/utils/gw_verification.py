"""Gravity-wave exact-solution verification (convergence study).

Parity reference: standalone/mmf_simplified/pam-c/gravitywave/convergence.py
— runs the Skamarock-Klemp inertia-gravity wave at a sequence of refinement
levels, compares the simulated (rho, S, w, T) fields against the analytic
linear solution (GravityWave::sum_series + the Exact*Diagnostic family,
extrudedmodel.h:6707-6990), and reports Linf / L2 errors, observed
convergence rates, and the dissipation/dispersion error split
(compute_Ediss_and_Edisp).

Run:  python -m pam_tpu.utils.gw_verification [nlevels] [base_dt]
"""

from __future__ import annotations

import sys

import numpy as np


def ediss_edisp(a, b):
    """Dissipation/dispersion error decomposition (convergence.py:24-33)."""
    a = np.ravel(np.asarray(a))
    b = np.ravel(np.asarray(b))
    cov = np.cov(np.vstack((a, b)))
    sa, sb = np.sqrt(cov[0, 0]), np.sqrt(cov[1, 1])
    ediss = (sa - sb) ** 2 + (a.mean() - b.mean()) ** 2
    edisp = 2 * sa * sb - 2 * cov[0, 1]
    return ediss, edisp


def _metrics(got, exact):
    err = np.asarray(got) - np.asarray(exact)
    linf = float(np.max(np.abs(err)))
    l2 = float(np.sqrt(np.mean(err ** 2)))
    ediss, edisp = ediss_edisp(got, exact)
    return linf, l2, float(ediss), float(edisp)


def gravity_wave_errors(tc, geom, thermo, varset, dens, w, t):
    """Error metrics of a simulated GravityWave state vs the exact linear
    solution at time t. Compares (like compute_errors, convergence.py:35-81):

    * rho, S — dual n-forms de-scaled to concentrations, vs the quadrature
      projection of the exact fields (= the reference's "dense" diagnostic)
    * T — cell-center temperature from the simulated state vs Texact
    * w — point w at interior interfaces (w 1-form / dz_p) vs wexact

    Returns {var: (Linf, L2, Ediss, Edisp)}.
    """
    # the exact-solution sampling conventions (n-form projections, cell
    # centers, interior-interface w) live in ONE place —
    # diagnostics.gravity_wave_exact — so the convergence study and the
    # output diagnostics can never drift apart
    from ..spam.diagnostics import gravity_wave_exact

    dens = np.asarray(dens, np.float64)
    w = np.asarray(w, np.float64)
    vol = geom.dx * np.asarray(geom.dz_d)               # (nens, nz) (dy=1)
    dz_p = np.asarray(geom.dz_p)[:, :, None]
    ex = gravity_wave_exact(tc, geom, thermo, t)

    rho = dens[0] / vol[:, :, None]
    S = dens[1] / vol[:, :, None]
    rho_e = np.asarray(ex["dense"][0]) / vol[:, :, None]
    S_e = np.asarray(ex["dense"][1]) / vol[:, :, None]

    alpha = np.asarray(varset.get_alpha(dens))
    sv = np.asarray(varset.get_entropic_var(dens))
    T = np.asarray(thermo.compute_T_from_alpha(alpha, sv, 1.0, 0, 0, 0))
    T_e = np.asarray(ex["Te"])

    # point w at interior interfaces (both de-scaled by dz_p)
    w_pt = w / dz_p
    w_e = np.asarray(ex["we"]) / dz_p

    return {"rho": _metrics(rho, rho_e), "S": _metrics(S, S_e),
            "T": _metrics(T, T_e), "w": _metrics(w_pt, w_e)}


def run_level(nx, nz, dt, timeend, dtype=None, si_max_iters=3, si_nquad=2):
    """Run one refinement level of the gravity wave with the SI integrator
    (the reference convergence setup: tstype=si, uniform vcoords) and
    return (errors dict, tc, geom)."""
    import jax
    import jax.numpy as jnp
    import dataclasses as dc
    from ..spam import ExtrudedGeometry, VariableSet, SpamTendencies
    from ..spam import si as si_mod
    from ..spam import testcases as tcs
    from ..spam.thermo import thermo_from_string

    dtype = dtype or jnp.float64
    tc = tcs.GravityWave()
    thermo = thermo_from_string("idealgaspottemp")
    geom = ExtrudedGeometry.build(nx, np.linspace(0.0, tc.Lz, nz + 1),
                                  tc.Lx, 1, dtype)
    vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
    dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)
    ref = si_mod.build_reference_state(
        geom, thermo, vs, lambda z: tc.refrho_f(z, thermo),
        lambda z: tc.refentropicdensity_f(z, thermo),
        lambda z: np.asarray(tc.refnsq_f(z, thermo)), tc.g)
    J = jnp.asarray
    tend = dc.replace(
        tend, force_refstate_hydrostatic_balance=True,
        refdens=J(ref["dens"]), ref_rho_pi=J(ref["rho_pi"]),
        ref_q_pi=J(ref["q_pi"]), ref_rho_di=J(ref["rho_di"]),
        ref_q_di=J(ref["q_di"]), ref_B=J(ref["B"]))
    lin = si_mod.CompressibleVelocityLinearSystem.build(
        geom, thermo, vs, ref, dt, grav=tc.g)
    step = jax.jit(lambda d, vv, ww: si_mod.si_step(
        tend, lin, d, vv, ww, geop, dt, si_max_iters, si_nquad))
    nsteps = int(round(timeend / dt))
    for _ in range(nsteps):
        dens, v, w = step(dens, v, w)
    errs = gravity_wave_errors(tc, geom, thermo, vs, dens, w, nsteps * dt)
    return errs, tc, geom


def convergence_study(nlevels: int = 2, base_dt: float = 20.0,
                      base_nz: int = 20, timeend: float = 1800.0,
                      nx_per_nz: int = 15, verbose: bool = True):
    """The convergence.py driver loop: refine (nx, nz, dt) together and
    report observed rates. Returns list of per-level error dicts."""
    results, dxs = [], []
    tc = None
    for lev in range(nlevels):
        nz = base_nz * 2 ** lev
        nx = nx_per_nz * nz
        dt = base_dt / 2 ** lev
        if verbose:
            print(f"level {lev}: nx={nx} nz={nz} dt={dt} "
                  f"steps={int(round(timeend / dt))}", flush=True)
        # nz cells exactly (dz halves level-to-level; passing nz+1 would
        # give dz ratios of 21/41/81 and bias the log2 rates by ~2-4%)
        errs, tc, geom = run_level(nx, nz, dt, timeend)
        results.append(errs)
        dxs.append(tc.Lx / nx)
    if verbose:
        hdr = (f"{'var':4} {'lev':3} {'dx':>9} {'Linf':>10} {'rate':>6} "
               f"{'L2':>10} {'rate':>6} {'Ediss':>10} {'Edisp':>10}")
        print(hdr)
        for var in ("T", "w", "rho", "S"):
            for lev, errs in enumerate(results):
                linf, l2, ediss, edisp = errs[var]
                r_inf = r_l2 = 0.0
                if lev > 0:
                    r_inf = np.log2(results[lev - 1][var][0] / linf)
                    r_l2 = np.log2(results[lev - 1][var][1] / l2)
                print(f"{var:4} {lev:3} {dxs[lev]:9.1f} {linf:10.2e} "
                      f"{r_inf:6.2f} {l2:10.2e} {r_l2:6.2f} "
                      f"{ediss:10.2e} {edisp:10.2e}")
    return results


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    import jax
    jax.config.update("jax_enable_x64", True)
    nlevels = int(argv[0]) if argv else 2
    base_dt = float(argv[1]) if len(argv) > 1 else 20.0
    convergence_study(nlevels=nlevels, base_dt=base_dt)
    return 0


if __name__ == "__main__":
    sys.exit(main())
