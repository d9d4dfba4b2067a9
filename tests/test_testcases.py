"""Tests for the extended SPAM test-case / thermo registry.

Covers the test cases added beyond the initial set (TwoBubbles,
LargeRisingBubble, MoistRisingBubble, MoistLargeRisingBubble, BickleyJet)
and the IdealGas_Entropy thermodynamics (ref: thermo.h:202-340,
extrudedmodel.h:6279-6592, layermodel.h:1362-1393).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.spam import (ExtrudedGeometry, VariableSet, SpamTendencies)
from pam_tpu.spam import testcases as tcs
from pam_tpu.spam.thermo import (IdealGasPottemp, IdealGasEntropy,
                                 ThermoNone, thermo_from_string)


def _run_case(tc, thermo, moist=False, nsteps=10, nx=16, nz=16):
    geom = ExtrudedGeometry.build(nx, np.linspace(0.0, tc.Lz, nz + 1),
                                  tc.Lx, 1, jnp.float64)
    if moist:
        vs = VariableSet(variant="MCE_rho", tracer_names=("water_vapor",),
                         tracer_positive=(True,), geom=geom, thermo=thermo)
        dens, v, w, geop = tcs.setup_moist_testcase(tc, geom, thermo)
    else:
        vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
        dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
    dt = 0.2 * min(geom.dx, float(geom.dz_d.min())) / 350.0
    step = jax.jit(lambda d, vv, ww: tend.ssprk3_step(d, vv, ww, geop, dt))
    st0 = tend.statistics(dens, v, w, geop)
    for _ in range(nsteps):
        dens, v, w = step(dens, v, w)
    st1 = tend.statistics(dens, v, w, geop)
    assert np.isfinite(np.asarray(dens)).all()
    assert np.isfinite(np.asarray(v)).all()
    assert np.isfinite(np.asarray(w)).all()
    # mass conservation to machine precision (Hamiltonian structure)
    m0 = np.asarray(st0["densstat"][0, 0])
    m1 = np.asarray(st1["densstat"][0, 0])
    assert abs(m1 - m0) / abs(m0) < 1e-12
    # energy conservation (explicit RK: approximate)
    E0, E1 = float(st0["E"][0]), float(st1["E"][0])
    assert abs(E1 - E0) / abs(E0) < 1e-5
    return dens, v, w


def test_two_bubbles_runs_and_conserves():
    _run_case(tcs.TwoBubbles(), IdealGasPottemp())


def test_large_rising_bubble_runs_and_conserves():
    _run_case(tcs.LargeRisingBubble(), IdealGasPottemp())


def test_moist_rising_bubble_mce_rho():
    tc = tcs.MoistRisingBubble()
    thermo = thermo_from_string("constkappavirpottemp")
    dens, v, w = _run_case(tc, thermo, moist=True)
    # vapor stays nonnegative-ish and bounded
    assert float(jnp.min(dens[2])) > -1e-8


def test_moist_large_rising_bubble_has_vapor():
    tc = tcs.MoistLargeRisingBubble()
    thermo = thermo_from_string("constkappavirpottemp")
    geom = ExtrudedGeometry.build(16, np.linspace(0.0, tc.Lz, 17),
                                  tc.Lx, 1, jnp.float64)
    dens, v, w, geop = tcs.setup_moist_testcase(tc, geom, thermo)
    assert float(jnp.max(dens[2])) > 0.0
    assert float(jnp.min(dens[2])) >= 0.0


def test_testcase_registry():
    for name in tcs.TESTCASE_REGISTRY:
        tc, moist = tcs.testcase_from_string(name)
        if getattr(tc, "needs_special_init", False):
            assert hasattr(tc, "build_columns")
            continue
        assert hasattr(tc, "rho_f")
        if moist:
            assert hasattr(tc, "rhov_f")


def test_idealgas_entropy_consistency():
    """IdealGas_Entropy must agree with IdealGas_Pottemp on all state
    functions expressible in (p, T) — they differ only in the entropic
    variable used (thermo.h:202-340 vs 70-200)."""
    pt = IdealGasPottemp()
    en = IdealGasEntropy()
    p, T = 8.7e4, 287.3
    alpha_pt = pt.compute_alpha(p, T)
    alpha_en = en.compute_alpha(p, T)
    assert np.allclose(alpha_pt, alpha_en)
    sv_en = en.compute_entropic_var_from_p_T(p, T)
    # round trips
    assert np.allclose(en.compute_T_from_p(p, sv_en), T)
    assert np.allclose(en.compute_T_from_alpha(alpha_en, sv_en), T)
    assert np.allclose(en.solve_p(1.0 / alpha_en, sv_en), p)
    assert np.allclose(
        en.compute_entropic_var_from_alpha_T(alpha_en, T), sv_en)
    # same sound speed as pottemp formulation at the same (p, T)
    sv_pt = pt.compute_entropic_var_from_p_T(p, T)
    cs_pt = pt.compute_soundspeed(alpha_pt, sv_pt)
    cs_en = en.compute_soundspeed(alpha_en, sv_en)
    assert np.allclose(cs_pt, cs_en)
    # dU/dalpha = -p (thermodynamic identity at constant entropy)
    assert np.allclose(en.compute_dUdalpha(alpha_en, sv_en), -p)
    # dU/ds = T
    assert np.allclose(en.compute_dUdentropic_var(alpha_en, sv_en), T)


def test_idealgas_entropy_runs_dynamics():
    """The entropy formulation must run the rising-bubble dynamics."""
    _run_case(tcs.RisingBubble(), IdealGasEntropy(), nsteps=5)


def test_thermo_registry():
    assert isinstance(thermo_from_string("none"), ThermoNone)
    assert isinstance(thermo_from_string("idealgaspottemp"), IdealGasPottemp)
    with pytest.raises(KeyError):
        thermo_from_string("nosuchthermo")


def test_moist_anelastic_man():
    """MAN (moist anelastic) via the driver surface: conserves mass/energy,
    keeps the anelastic constraint (ref: Hamiltonian_MAN_Hs,
    anelastic.h:163-340)."""
    from pam_tpu.driver.standalone import run_idealized
    cfg = dict(init_data="moistrisingbubble", crm_nx=12, crm_nz=12,
               sim_time=0.5, idealized=True, hamil="man", dtcrm=0.05)
    dens, v, w = run_idealized(cfg, verbose=False)
    assert np.isfinite(np.asarray(dens)).all()
    assert dens.shape[0] == 3  # rho, S, water_vapor
    assert float(jnp.max(dens[2])) > 0.0


def test_bickley_jet_runs():
    from pam_tpu.spam.layer import LayerModel, BickleyJet, setup_double_vortex
    tc = BickleyJet()
    m = LayerModel(nx=32, ny=32, nens=1, Lx=tc.Lx, Ly=tc.Ly, g=tc.g,
                   variant="swe", ndens=1)
    dens, v, hs, cor = setup_double_vortex(m, tc)
    dt = 0.01
    step = jax.jit(lambda d, vv: m.ssprk3_step(d, vv, hs, cor, dt))
    st0 = m.statistics(dens, v, hs, cor)
    for _ in range(20):
        dens, v = step(dens, v)
    st1 = m.statistics(dens, v, hs, cor)
    assert np.isfinite(np.asarray(dens)).all()
    m0, m1 = np.asarray(st0["mass"][0, 0]), np.asarray(st1["mass"][0, 0])
    assert abs(m1 - m0) / abs(m0) < 1e-12
    E0, E1 = float(st0["E"][0]), float(st1["E"][0])
    assert abs(E1 - E0) / abs(E0) < 1e-4


def test_supercell_column_build():
    """Supercell special init (extrudedmodel.h:7148-7224): hydrostatic
    moist column via fixed-point iteration; physical profiles."""
    from pam_tpu.spam.thermo import ConstantKappaVirtualPottemp
    tc = tcs.Supercell()
    thermo = ConstantKappaVirtualPottemp(cst=tc.thermo_constants())
    geom = ExtrudedGeometry.build(8, np.linspace(0.0, tc.Lz, 41), tc.Lx, 1)
    rho, thtv, qv = tc.build_columns(geom, thermo)
    assert rho.shape == (1, 40)
    # surface: near 300K pottemp, ~1.1-1.2 kg/m3, capped vapor
    assert 1.05 < rho[0, 0] < 1.25
    assert 299.0 < thtv[0, 0] < 304.0
    assert abs(qv[0, 0] - tc.max_qv) < 2e-3  # RH cap active near surface
    assert (np.diff(rho[0]) < 0).all()       # monotone decreasing density
    assert qv[0, -1] < 1e-4                  # dry stratosphere
    # virtual pottemp increases with height (stable sounding)
    assert (np.diff(thtv[0]) > 0).all()


def test_supercell_si_run_conserves():
    """Supercell + SI integrator: exact mass conservation, bounded energy
    drift, stable updraft growth from the bubble."""
    from pam_tpu.driver.standalone import run_idealized
    cfg = dict(init_data="supercell", crm_nx=16, crm_nz=16, sim_time=100.0,
               tstype="si", dtcrm=10.0, out_prefix=None)
    dens, v, w = run_idealized(cfg, verbose=False)
    assert np.isfinite(np.asarray(dens)).all()
    assert float(dens[2].min()) > 0.0        # vapor stays positive


def test_unimplemented_thermo_stubs():
    """The reference declares ConstantKappa_Entropy / Unapprox_* with every
    method commented out (thermo.h:482-660); our registry mirrors that."""
    import pytest
    from pam_tpu.spam.thermo import thermo_from_string
    for name in ("constkappaentropy", "unapproxpottemp", "unapproxentropy"):
        th = thermo_from_string(name)
        with pytest.raises(NotImplementedError):
            th.compute_U(1.0, 300.0)


@pytest.mark.slow
def test_cfv_and_tanh_numerics_options():
    """RECONSTRUCTION_TYPE::CFV and UPWIND_TYPE::TANH (common.h:72-111,
    recon.h:326-424): stable, and near the WENOFUNC/HEAVISIDE defaults on a
    smooth field."""
    from pam_tpu.driver.standalone import run_idealized
    base = dict(init_data="risingbubble", crm_nx=16, crm_nz=16, sim_time=3.0,
                tstype="ssprk3", out_prefix=None)
    ref, _, _ = run_idealized(base, verbose=False)
    for kw in (dict(reconstruction_type="cfv"),
               dict(dual_upwind_type="tanh", tanh_upwind_coeff=250.0)):
        d, v, w = run_idealized(dict(base, **kw), verbose=False)
        assert np.isfinite(np.asarray(d)).all(), kw
        err = float(np.abs(np.asarray(d[1]) - np.asarray(ref[1])).max() /
                    np.abs(np.asarray(ref[1])).max())
        assert err < 1e-4, (kw, err)


def test_standalone_driver_3d_bubble():
    """The standalone YAML driver's crm_ny>1 branch (3-D idealized runs)."""
    from pam_tpu.driver.standalone import run_idealized
    cfg = dict(idealized=True, init_data="risingbubble", crm_nx=10,
               crm_ny=8, crm_nz=10, nens=1, sim_time=0.6, tstype="ssprk3",
               dtcrm=0.15, stat_freq=0.3)
    dens, v, w = run_idealized(cfg, verbose=False)
    assert dens.shape[0] == 2 and dens.shape[-2:] == (8, 10)
    import numpy as np
    assert np.isfinite(np.asarray(dens)).all()


@pytest.mark.slow
def test_standalone_driver_3d_supercell_si():
    from pam_tpu.driver.standalone import run_idealized
    cfg = dict(idealized=True, init_data="supercell", crm_nx=10, crm_ny=8,
               crm_nz=16, nens=1, sim_time=20.0, tstype="si", dtcrm=10.0,
               linear_system="pressure_gravity", stat_freq=10.0)
    dens, v, w = run_idealized(cfg, verbose=False)
    import numpy as np
    assert np.isfinite(np.asarray(dens)).all()
    assert np.isfinite(np.asarray(w)).all()
