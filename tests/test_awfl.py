"""AWFL dycore end-to-end tests: thermal bubble on a small grid.

Analog of the reference's CI smoke runs plus its PAM_DEBUG conservation
audits (dynamics/awfl/Dycore.h:136-251, mass drift tolerance 1e-10 relative).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.core import Coupler, Constants
from pam_tpu.dycore.awfl import AwflDycore
from pam_tpu.dycore import awfl_init


def make_thermal_setup(nx=20, nz=10, nens=1, ny=1, dtype=jnp.float64):
    cpl = Coupler(nz=nz, ny=ny, nx=nx, nens=nens, xlen=20000.0,
                  ylen=20000.0, dtype=dtype)
    cpl = cpl.add_tracer("water_vapor", "Water Vapor", True, True)
    zint = np.linspace(0.0, 10000.0, nz + 1)
    state = cpl.allocate_state(zint)
    state = awfl_init.init_thermal(cpl, state)
    dz = np.diff(zint)
    dyc = AwflDycore.build(cpl, dz, ord=5)
    return cpl, dyc, state


def column_mass(cpl, state, name):
    dz = state["vertical_cell_dz"][:, :, None, None]
    return float(jnp.sum(state[name] * dz))


def test_thermal_init_hydrostatic_background():
    cpl, dyc, state = make_thermal_setup()
    # background density decreases with height, pressure too
    hy_d = np.asarray(state["hy_dens_cells"])[0]
    hy_p = np.asarray(state["hy_pressure_cells"])[0]
    assert (np.diff(hy_d) < 0).all()
    assert (np.diff(hy_p) < 0).all()
    assert hy_p[0] < cpl.const.p0  # cell average below surface pressure
    # temperature field warm anomaly in the middle
    T = np.asarray(state["temp"])[0]
    assert T[:, 0, :].max() > T[:, 0, 0].max()


def test_conversion_roundtrip():
    cpl, dyc, state = make_thermal_setup()
    dyn, tracers = dyc.coupler_to_dynamics(state)
    state2 = dyc.dynamics_to_coupler(state, dyn, tracers)
    for k in ("density_dry", "uvel", "vvel", "wvel", "temp", "water_vapor"):
        assert np.allclose(state[k], state2[k], rtol=1e-12, atol=1e-12), k


def test_cfl_timestep_reasonable():
    cpl, dyc, state = make_thermal_setup()
    dt = float(dyc.compute_time_step(state))
    # dx=1000m, cs~350 -> dt ~ 0.8*1000/350 ~ 2.3s
    assert 1.0 < dt < 4.0


def test_thermal_bubble_rises_and_conserves():
    cpl, dyc, state = make_thermal_setup()
    step = jax.jit(lambda s: dyc.timestep(s, 10.0))
    mass0 = column_mass(cpl, state, "density_dry") + \
        column_mass(cpl, state, "water_vapor")
    rhot0 = None
    s = state
    for _ in range(6):
        s = step(s)
    w = np.asarray(s["wvel"])
    assert np.isfinite(w).all()
    # bubble must produce upward motion of sensible magnitude within 60 s
    assert w.max() > 0.1, w.max()
    assert w.max() < 50.0
    # mass conservation (ref audit tolerance, Dycore.h:238)
    mass1 = column_mass(cpl, s, "density_dry") + \
        column_mass(cpl, s, "water_vapor")
    assert abs(mass1 - mass0) / abs(mass0) < 1e-10
    # x-symmetry of the bubble is preserved (centered initial condition)
    T = np.asarray(s["temp"])[0, :, 0, :]
    assert np.allclose(T, T[:, ::-1], rtol=1e-8, atol=1e-8)


def test_tracer_positivity_preserved():
    cpl, dyc, state = make_thermal_setup()
    # seed a localized vapor blob
    rv = np.zeros((1, cpl.nz, 1, cpl.nx))
    rv[0, 2:5, 0, 8:12] = 0.01
    state = dict(state)
    state["water_vapor"] = jnp.asarray(rv)
    step = jax.jit(lambda s: dyc.timestep(s, 10.0))
    s = state
    for _ in range(4):
        s = step(s)
    assert float(jnp.min(s["water_vapor"])) >= -1e-14
