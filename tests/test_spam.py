"""SPAM structure-preserving dycore tests: operator identities, conservation
and rising-bubble physics (analog of the reference's operator_properties/
suites and the stats-based conservation checks, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.spam import (ExtrudedGeometry, IdealGasPottemp, VariableSet,
                          SpamTendencies)
from pam_tpu.spam import operators as op
from pam_tpu.spam import testcases as tcs


def make_bubble(nx=20, nz=15, nens=1, dtype=jnp.float64):
    tc = tcs.RisingBubble()
    geom = ExtrudedGeometry.build(nx, np.linspace(0.0, tc.Lz, nz + 1),
                                  tc.Lx, nens, dtype)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
    dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)
    return tc, geom, thermo, vs, tend, dens, v, w, geop


def test_geometry_staggering():
    geom = ExtrudedGeometry.build(8, np.linspace(0, 1500, 16), 1000.0)
    # straight interfaces at dual midpoints, boundaries at domain edges
    assert np.isclose(geom.zint_p[0, 0], 0.0)
    assert np.isclose(geom.zint_p[0, -1], 1500.0)
    assert np.allclose(geom.zint_p[0, 1:-1],
                       0.5 * (geom.zint_d[0, 1:-2] + geom.zint_d[0, 2:-1]))
    # uniform: boundary straight layers are 1.5 dz
    dz = 100.0
    assert np.isclose(geom.dz_p[0, 0], 1.5 * dz)
    assert np.isclose(geom.dz_p[0, -1], 1.5 * dz)
    assert np.allclose(geom.dz_p[0, 1:-1], dz)


def test_curl_of_gradient_vanishes():
    """D1_ext applied to a 'gradient' velocity field (v = D0_x phi,
    w = D0_vert phi) gives zero vorticity at interior vertices — the
    discrete d∘d = 0 identity (analog of test/operator_properties)."""
    rng = np.random.default_rng(0)
    nz, nx = 12, 16
    phi = jnp.asarray(rng.standard_normal((1, nz, nx)))  # at dual layers?
    # phi at v-levels (nz); v = phi[i]-phi[i-1]; w = phi[k+1]-phi[k]
    v = phi - op.rollm(phi, -1)
    w = phi[:, 1:, :] - phi[:, :-1, :]
    w_pad = op.mirror_layer(w, 1)
    zeta = op.D1_ext(v, w_pad)
    assert np.allclose(np.asarray(zeta)[:, 1:-1, :], 0.0, atol=1e-13)


def test_divergence_telescopes():
    """Sum over cells of Dnm1bar divergence = boundary fluxes only (exact
    mass conservation of the flux form)."""
    rng = np.random.default_rng(1)
    nz, nx = 10, 12
    F = jnp.asarray(rng.standard_normal((1, nz, nx)))
    FW = jnp.asarray(rng.standard_normal((1, nz + 1, nx)))
    FW = FW.at[:, 0].set(0.0).at[:, -1].set(0.0)
    div = op.Dnm1bar_x(F) + op.Dnm1bar_vert(FW)
    assert abs(float(jnp.sum(div))) < 1e-12


def test_rising_bubble_conserves_mass_entropy():
    tc, geom, thermo, vs, tend, dens, v, w, geop = make_bubble()
    dt = 0.05  # explicit acoustic CFL: dx=50m, cs~347 m/s
    step = jax.jit(lambda d, vv, ww: tend.ssprk3_step(d, vv, ww, geop, dt))
    mass0 = float(jnp.sum(dens[0]))
    entr0 = float(jnp.sum(dens[1]))
    for _ in range(20):
        dens, v, w = step(dens, v, w)
    assert np.isfinite(np.asarray(dens)).all()
    assert np.isfinite(np.asarray(w)).all()
    mass1 = float(jnp.sum(dens[0]))
    entr1 = float(jnp.sum(dens[1]))
    # exact conservation (flux form): ~machine precision
    assert abs(mass1 - mass0) / mass0 < 1e-12
    assert abs(entr1 - entr0) / entr0 < 1e-12


def test_rising_bubble_energy_and_physics():
    tc, geom, thermo, vs, tend, dens, v, w, geop = make_bubble(nx=25, nz=20)
    dt = 0.04
    step = jax.jit(lambda d, vv, ww: tend.ssprk3_step(d, vv, ww, geop, dt))
    E0, KE0, PE0, IE0 = tend.energy(dens, v, w, geop)
    for _ in range(100):
        dens, v, w = step(dens, v, w)
    E1, KE1, PE1, IE1 = tend.energy(dens, v, w, geop)
    # total energy conserved to time-integration accuracy
    assert abs(float(E1[0] - E0[0]) / float(E0[0])) < 1e-7
    # bubble rises: kinetic energy grows from zero, w positive at center
    assert float(KE1[0]) > 0
    # w is a (0,1)-form = w_phys * dz_p; acoustic transient + buoyancy
    wmax = float(jnp.max(w / jnp.asarray(geom.dz_p)[:, :, None]))
    assert 1e-4 < wmax < 10.0, wmax
    # updraft is centered on the bubble
    wc = np.asarray(w)[0]
    imax = np.unravel_index(np.argmax(wc), wc.shape)[1]
    assert abs(imax - geom.nx // 2) <= 2


def test_rising_bubble_x_symmetry():
    tc, geom, thermo, vs, tend, dens, v, w, geop = make_bubble(nx=16, nz=12)
    dt = 0.05
    step = jax.jit(lambda d, vv, ww: tend.ssprk3_step(d, vv, ww, geop, dt))
    for _ in range(10):
        dens, v, w = step(dens, v, w)
    wv = np.asarray(w)[0]
    # mirror symmetry about the bubble axis (cells mirror across center)
    assert np.allclose(wv, wv[:, ::-1], atol=1e-10)


def test_spam_coupled_dycore_roundtrip_and_step():
    """Coupler conversions invert each other; a coupled MMF-style step on the
    supercell column stays stable (analog of the reference coupled config:
    MCE_rho + ConstantKappa_VirtualPottemp)."""
    from pam_tpu.core import Coupler
    from pam_tpu.spam import SpamDycore
    from pam_tpu.driver.supercell_column import initialize_from_supercell_column
    from pam_tpu.modules.broadcast import broadcast_initial_gcm_column
    from pam_tpu.physics import kessler

    nx, nz = 16, 20
    cpl = Coupler(nz=nz, ny=1, nx=nx, nens=1, xlen=32000.0, ylen=64000.0,
                  dtype=jnp.float64)
    cpl = kessler.register(cpl)
    zint = np.linspace(0.0, 20000.0, nz + 1)
    state = cpl.allocate_state(zint)
    state = initialize_from_supercell_column(cpl, state, zint)
    state = broadcast_initial_gcm_column(cpl, state)
    dyc = SpamDycore.build(cpl, zint)

    dens, v, w = dyc.coupler_to_dynamics(state)
    state2 = dyc.dynamics_to_coupler(state, dens, v, w)
    for k in ("density_dry", "temp", "water_vapor"):
        assert np.allclose(np.asarray(state[k]), np.asarray(state2[k]),
                           rtol=1e-10), k
    # winds: cell-center -> edge -> cell-center averaging is not exact, but
    # for the supercell shear profile it should be close
    assert np.allclose(np.asarray(state["uvel"]), np.asarray(state2["uvel"]),
                       atol=0.8)

    out = jax.jit(lambda s: dyc.timestep(s, 5.0, n_substeps=5))(state)
    for k in ("density_dry", "temp", "uvel", "wvel", "water_vapor"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    t = np.asarray(out["temp"])
    assert t.min() > 150.0 and t.max() < 350.0
    # column stays near hydrostatic: no violent vertical motion in 5 s
    assert float(jnp.max(jnp.abs(out["wvel"]))) < 5.0


@pytest.mark.slow
def test_alternative_time_integrators_agree():
    """ssprk2/34, kgrk4, lsrk5 all advance the bubble consistently with
    ssprk3 at small dt (timesteppers/{SSPRK,KGRK,LSRK}.h)."""
    from pam_tpu.spam.timesteppers import STEPPERS
    _, _, _, _, tend, dens, v, w, geop = make_bubble(nx=20, nz=15)
    dt = 0.04

    def rhs(x):
        return tend.compute_rhs(x[0], x[1], x[2], geop, dt)

    m0 = float(dens[0].sum())
    results = {}
    for name in ("ssprk3", "ssprk2", "ssprk34", "kgrk4", "lsrk5"):
        x = (dens, v, w)
        step = jax.jit(lambda xx, _n=name: STEPPERS[_n](rhs, xx, dt))
        for _ in range(25):
            x = step(x)
        results[name] = np.asarray(x[2])
        assert np.isfinite(results[name]).all(), name
        assert np.isclose(float(x[0][0].sum()), m0, rtol=1e-12), name
    ref = results["ssprk3"]
    scale = max(np.abs(ref).max(), 1e-30)
    # ssprk2 is 2nd order: visibly larger dispersion error on acoustics
    tols = {"ssprk2": 5e-2, "ssprk34": 5e-3, "kgrk4": 5e-3, "lsrk5": 5e-3}
    for name, tol in tols.items():
        assert np.abs(results[name] - ref).max() < tol * scale, name


def test_variable_grid_vertical_recon_convergence():
    """Stretched-vertical-grid WENOFUNC (weno_func_recon_variable.h +
    TransformMatrices_variable.h): per-level matrices restore high-order
    convergence that uniform tables lose on a stretched column."""
    import jax.numpy as jnp
    from pam_tpu.spam import tendencies as td
    from pam_tpu.spam.operators import mirror_iface
    from pam_tpu.ops import weno, recon_matrices as rm

    def err_for(nz, use_var):
        s = np.linspace(0, 1, nz + 1)
        zint = (s + 0.6 * s ** 2) / 1.6
        dz = np.diff(zint)
        f = lambda z: np.sin(2.3 * z) + 0.5 * z ** 2
        F = lambda z: -np.cos(2.3 * z) / 2.3 + z ** 3 / 6
        cellavg = (F(zint[1:]) - F(zint[:-1])) / dz
        a = jnp.asarray(cellavg)[None, :, None]
        tb = weno.weno_tables(5, dtype=jnp.float64)
        pad = mirror_iface(a, 2)
        pl = None
        if use_var:
            p = rm.mirror_recon_matrices(dz, 5, iface=True)
            pl = (p[0][None], p[1][None])
        bot, top = td._edge_recon_z(pad, tb, nz, per_level=pl)
        b = np.asarray(bot)[0, 3:-3, 0]
        t = np.asarray(top)[0, 3:-3, 0]
        return max(np.abs(b - f(zint[:-1][3:-3])).max(),
                   np.abs(t - f(zint[1:][3:-3])).max())

    e20v, e40v = err_for(20, True), err_for(40, True)
    rate_var = np.log2(e20v / e40v)
    assert rate_var > 3.0, rate_var          # high-order on stretched grid
    assert e40v < 0.05 * err_for(40, False)  # and far below uniform tables


def test_spam_stretched_grid_conserves():
    """End-to-end SPAM step on a stretched vertical grid: exact mass
    conservation and stable energy (the variable-grid recon path)."""
    import jax
    import jax.numpy as jnp
    from pam_tpu.spam import (ExtrudedGeometry, VariableSet, SpamTendencies)
    from pam_tpu.spam import testcases as tcs
    from pam_tpu.spam.thermo import IdealGasPottemp

    tc = tcs.RisingBubble()
    nz = 16
    s = np.linspace(0, 1, nz + 1)
    zint = tc.Lz * (s + 0.5 * s ** 2) / 1.5
    geom = ExtrudedGeometry.build(16, zint, tc.Lx, 1, jnp.float64)
    assert not geom.uniform_vertical
    th = IdealGasPottemp()
    vs = VariableSet(variant="CE", geom=geom, thermo=th)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=th, grav=tc.g)
    dens, v, w, geop = tcs.setup_testcase(tc, geom, th)
    dt = 0.2 * min(geom.dx, float(geom.dz_d.min())) / 350.0
    step = jax.jit(lambda d, vv, ww: tend.ssprk3_step(d, vv, ww, geop, dt))
    st0 = tend.statistics(dens, v, w, geop)
    for _ in range(10):
        dens, v, w = step(dens, v, w)
    st1 = tend.statistics(dens, v, w, geop)
    assert np.isfinite(np.asarray(dens)).all()
    m0, m1 = np.asarray(st0["densstat"][0, 0]), np.asarray(st1["densstat"][0, 0])
    assert abs(m1 - m0) / abs(m0) < 1e-12
    E0, E1 = float(st0["E"][0]), float(st1["E"][0])
    assert abs(E1 - E0) / abs(E0) < 1e-5


def _conv_rate(errs, factors=2.0):
    import math
    return [math.log(errs[i] / errs[i + 1]) / math.log(factors)
            for i in range(len(errs) - 1)]


def test_hodge_star_convergence_orders():
    """Grid-convergence of the 2nd/4th/6th-order horizontal Hodge stars
    against analytic fields — the analog of the reference's
    test/hodge_star suite (ConvergenceTest::check_rate, atol=0.1)."""
    from scipy.integrate import quad
    L = 1.0
    for ord_, expected in [(2, 2.0), (4, 4.0), (6, 6.0)]:
        errs_h10 = []
        errs_hn1 = []
        for nx in (16, 32, 64):
            geom = ExtrudedGeometry.build(nx, np.linspace(0, 1.0, 3), L)
            dx = geom.dx
            xe = np.arange(nx + 1) * dx          # edge endpoints
            u = lambda x: np.sin(2 * np.pi * x / L) + 0.3 * \
                np.cos(4 * np.pi * x / L)
            U = lambda x: (-L / (2 * np.pi) * np.cos(2 * np.pi * x / L) +
                           0.3 * L / (4 * np.pi) * np.sin(4 * np.pi * x / L))
            # straight 1-form: integral of u over each x-edge
            v1 = (U(xe[1:]) - U(xe[:-1]))
            v = jnp.asarray(np.broadcast_to(v1, (1, 2, nx)))
            got = np.asarray(op.H10_ho(v, geom, ord_))[0, 0]
            dz = float(geom.dz_d[0, 0])
            exact = u(0.5 * (xe[1:] + xe[:-1])) * dz * geom.dy
            errs_h10.append(np.abs(got - exact).max())
            # dual n-form: cell integral of u -> 0-form u at cell center
            a = jnp.asarray(np.broadcast_to(v1 * dz, (1, 2, nx)))
            got0 = np.asarray(op.Hn1bar_ho(a, geom, ord_))[0, 0]
            errs_hn1.append(np.abs(got0 - u(0.5 * (xe[1:] + xe[:-1]))).max())
        for errs in (errs_h10, errs_hn1):
            rates = _conv_rate(errs)
            assert abs(rates[-1] - expected) < 0.35, (ord_, errs, rates)


def test_diff_ord_4_bubble_runs():
    """The rising bubble with 4th-order Hodge stars stays conservative."""
    import dataclasses as dc
    tc, geom, thermo, vs, tend, dens, v, w, geop = make_bubble(nx=16, nz=12)
    tend4 = dc.replace(tend, diff_ord=4)
    dt = 0.05
    step = jax.jit(lambda d, vv, ww: tend4.ssprk3_step(d, vv, ww, geop, dt))
    m0 = float(jnp.sum(dens[0]))
    for _ in range(10):
        dens, v, w = step(dens, v, w)
    assert np.isfinite(np.asarray(dens)).all()
    assert abs(float(jnp.sum(dens[0])) - m0) / m0 < 1e-12
