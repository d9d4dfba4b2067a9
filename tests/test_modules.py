"""Column-physics module tests (sponge, perturb, saturation, hole filling,
surface friction, Kessler).

Mirrors the reference's runtime invariant checks (PAM_DEBUG conservation
audits, positivity validators — SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp

from pam_tpu.core import Coupler
from pam_tpu.core.coupler import hmean
from pam_tpu.modules import (sponge_layer, perturb_temperature,
                             saturation_adjustment, fill_holes,
                             compute_adjusted_state,
                             broadcast_initial_gcm_column,
                             surface_friction_init, compute_surface_friction,
                             compute_gcm_forcing_tendencies,
                             apply_gcm_forcing_tendencies)
from pam_tpu.physics import kessler


def make_cpl(nx=8, ny=1, nz=12, nens=2, micro=True):
    cpl = Coupler(nz=nz, ny=ny, nx=nx, nens=nens, xlen=8000.0, ylen=8000.0,
                  dtype=jnp.float64)
    if micro:
        cpl = kessler.register(cpl)
    return cpl


def base_state(cpl, rng):
    zint = np.linspace(0.0, 12000.0, cpl.nz + 1)
    state = cpl.allocate_state(zint)
    shape = (cpl.nens, cpl.nz, cpl.ny, cpl.nx)
    state = dict(state)
    state["density_dry"] = jnp.asarray(1.0 + 0.1 * rng.random(shape))
    state["temp"] = jnp.asarray(280.0 + 10.0 * rng.random(shape))
    state["uvel"] = jnp.asarray(rng.standard_normal(shape))
    state["vvel"] = jnp.asarray(rng.standard_normal(shape))
    state["wvel"] = jnp.asarray(rng.standard_normal(shape))
    state["water_vapor"] = jnp.asarray(0.005 * rng.random(shape))
    return state


def test_sponge_relaxes_top_layers():
    cpl = make_cpl()
    rng = np.random.default_rng(0)
    state = base_state(cpl, rng)
    out = sponge_layer(cpl, state, dt=60.0, num_layers=5, time_scale=60.0)
    u0, u1 = np.asarray(state["uvel"]), np.asarray(out["uvel"])
    # bottom levels untouched
    assert np.allclose(u0[:, :7], u1[:, :7])
    # top level strongly relaxed toward horizontal mean
    spread0 = u0[:, -1].std()
    spread1 = u1[:, -1].std()
    assert spread1 < spread0
    # w relaxed toward zero, not its mean
    w_top0 = np.abs(np.asarray(state["wvel"])[:, -1]).mean()
    w_top1 = np.abs(np.asarray(out["wvel"])[:, -1]).mean()
    assert w_top1 < w_top0


def test_perturb_conserves_level_mean():
    cpl = make_cpl()
    rng = np.random.default_rng(1)
    state = base_state(cpl, rng)
    out = perturb_temperature(cpl, state, np.array([3, 4]), magnitude=0.5)
    t0, t1 = state["temp"], out["temp"]
    # horizontal mean conserved per level (ref conservation rescale)
    assert np.allclose(hmean(t0), hmean(t1), rtol=1e-12)
    # bottom quarter actually perturbed; top untouched
    assert not np.allclose(np.asarray(t0)[:, 0], np.asarray(t1)[:, 0])
    assert np.allclose(np.asarray(t0)[:, -1], np.asarray(t1)[:, -1])
    # different seeds -> different noise
    assert not np.allclose(np.asarray(t1)[0, 0], np.asarray(t1)[1, 0])


def test_saturation_adjustment_converges():
    # a supersaturated parcel condenses to saturation and warms
    rho_d = jnp.asarray([1.0])
    rho_v = jnp.asarray([0.02])
    rho_c = jnp.asarray([0.0])
    temp = jnp.asarray([285.0])
    rv, rc, t = compute_adjusted_state(rho_d + rho_v, rho_d, rho_v, rho_c,
                                       temp, 461.0, 1003.0, 1859.0, 4188.0)
    assert float(rc[0]) > 0 and float(t[0]) > 285.0
    from pam_tpu.modules.saturation import saturation_vapor_pressure
    pv = float(rv[0] * 461.0 * t[0])
    svp = float(saturation_vapor_pressure(t[0]))
    assert abs(pv - svp) / svp < 1e-4
    # mass conserved
    assert np.isclose(float(rv[0] + rc[0]), 0.02, atol=1e-12)
    # an unsaturated parcel with no cloud is untouched
    rv2, rc2, t2 = compute_adjusted_state(
        jnp.asarray([1.001]), jnp.asarray([1.0]), jnp.asarray([0.001]),
        jnp.asarray([0.0]), jnp.asarray([300.0]), 461.0, 1003.0, 1859.0, 4188.0)
    assert float(rv2[0]) == 0.001 and float(t2[0]) == 300.0


def test_fill_holes_conserves_and_clamps():
    rng = np.random.default_rng(2)
    rho = rng.random((2, 6, 1, 8)) * 0.01
    rho[0, 2, 0, 3] = -0.004  # a hole
    rho[1, 5, 0, :] = -1e-5   # a whole negative level -> global fallback
    dz = np.ones((2, 6))
    out = np.asarray(fill_holes(jnp.asarray(rho), jnp.asarray(dz)))
    assert (out >= 0).all()
    for e in range(2):
        assert np.isclose(out[e].sum(), np.asarray(rho)[e].sum(), atol=1e-12)


def test_gcm_forcing_roundtrip_drives_crm_to_gcm():
    """If forcing is the only tendency, after dt_gcm of applying it the
    column-mean CRM state equals the GCM state (gcm_forcing.h:8-17)."""
    cpl = make_cpl()
    rng = np.random.default_rng(3)
    state = base_state(cpl, rng)
    state["cloud_liquid"] = jnp.asarray(
        0.0001 * rng.random((cpl.nens, cpl.nz, cpl.ny, cpl.nx)))
    state["precip_liquid"] = jnp.zeros_like(state["cloud_liquid"])
    # GCM wants uniform wind/temp columns
    state["gcm_density_dry"] = hmean(state["density_dry"]) * 1.01
    state["gcm_uvel"] = jnp.full((cpl.nens, cpl.nz), 5.0)
    state["gcm_vvel"] = jnp.zeros((cpl.nens, cpl.nz))
    state["gcm_temp"] = jnp.full((cpl.nens, cpl.nz), 290.0)
    state["gcm_water_vapor"] = hmean(state["water_vapor"])
    state["gcm_cloud_water"] = jnp.zeros((cpl.nens, cpl.nz))
    state["gcm_cloud_ice"] = jnp.zeros((cpl.nens, cpl.nz))
    dt_gcm, nstep = 900.0, 10
    state = compute_gcm_forcing_tendencies(cpl, state, dt_gcm)
    s = state
    for _ in range(nstep):
        s = apply_gcm_forcing_tendencies(cpl, s, dt_gcm / nstep, dt_gcm)
    assert np.allclose(hmean(s["uvel"]), 5.0, atol=1e-10)
    assert np.allclose(hmean(s["temp"]), 290.0, atol=1e-10)
    assert np.allclose(hmean(s["density_dry"]),
                       np.asarray(state["gcm_density_dry"]), rtol=1e-12)


def test_surface_friction_opposes_wind():
    cpl = make_cpl()
    rng = np.random.default_rng(4)
    state = base_state(cpl, rng)
    state["gcm_uvel"] = jnp.full((cpl.nens, cpl.nz), 10.0)
    state["gcm_vvel"] = jnp.zeros((cpl.nens, cpl.nz))
    state = surface_friction_init(cpl, state, tau_in=np.full(cpl.nens, 0.1),
                                  bflx_in=np.zeros(cpl.nens))
    assert 1e-5 <= float(state["z0"][0]) <= 1.0
    out = compute_surface_friction(cpl, state)
    # fluxes oppose the deviation from the horizontal-mean wind
    du = np.asarray(state["uvel"][:, 0]) - \
        np.asarray(state["uvel"][:, 0]).mean(axis=(-2, -1), keepdims=True)
    corr = (np.asarray(out["sfc_mom_flx_u"]) * du).sum()
    assert corr < 0


def test_kessler_condensation_and_conservation():
    cpl = make_cpl()
    rng = np.random.default_rng(5)
    state = base_state(cpl, rng)
    state = kessler.init_state(cpl, state)
    # supersaturate low levels; cold temps aloft
    shape = (cpl.nens, cpl.nz, cpl.ny, cpl.nx)
    state["temp"] = jnp.asarray(np.linspace(295, 230, cpl.nz))[None, :, None, None] \
        * jnp.ones(shape)
    qv = np.zeros(shape)
    qv[:, :4] = 0.02
    state["water_vapor"] = jnp.asarray(qv) * state["density_dry"]
    state["cloud_liquid"] = jnp.zeros(shape)
    state["precip_liquid"] = jnp.zeros(shape)
    micro = kessler.KesslerMicro(cpl)
    step = jax.jit(lambda s: micro.timestep(s, 20.0))
    s = state
    water0 = float(jnp.sum((state["water_vapor"] + state["cloud_liquid"] +
                            state["precip_liquid"]) / state["density_dry"]))
    for _ in range(5):
        s = step(s)
    # condensation occurred and heated the air
    assert float(jnp.max(s["cloud_liquid"])) > 0
    assert float(jnp.max(s["temp"])) > 295.0
    # all species nonnegative
    for name in ("water_vapor", "cloud_liquid", "precip_liquid"):
        assert float(jnp.min(s[name])) >= 0.0
    # total water conserved up to surface precip removal and the scheme's
    # own positivity clamps (the reference's audit tolerates this too and
    # comments out its abort, Microphysics.h:268-270)
    water1 = float(jnp.sum((s["water_vapor"] + s["cloud_liquid"] +
                            s["precip_liquid"]) / s["density_dry"]))
    assert water1 <= water0 * (1 + 1e-4)
    assert water1 > 0.5 * water0


def test_vertical_interp_cells_to_edges():
    """WENO cells->edges: exact for smooth quadratics on stretched grids,
    respects BC_ZERO_VALUE (ref: pam_core/vertical_interp.h)."""
    from pam_tpu.core import vinterp
    rng = np.random.default_rng(0)
    nz = 24
    zint = np.concatenate([[0.0], np.cumsum(50.0 + 40.0 * rng.random(nz))])
    zmid = 0.5 * (zint[:-1] + zint[1:])
    dz = np.diff(zint)
    # cell averages of a quadratic: avg = (z_t^3 - z_b^3)/(3 dz) for f=z^2
    f_avg = (zint[1:] ** 3 - zint[:-1] ** 3) / (3 * dz)
    data = jnp.asarray(f_avg)[None, :]
    edges = vinterp.cells_to_edges(data, zint)
    exact = zint ** 2
    # interior edges (with ghost-free stencils) exact for quadratics
    err = np.abs(np.asarray(edges)[0, 3:-3] - exact[3:-3]) / exact[3:-3]
    assert err.max() < 1e-10, err.max()
    # smooth sine (proper cell averages): high-order accurate interior
    L = 200.0
    sin_avg = (np.cos(zint[:-1] / L) - np.cos(zint[1:] / L)) * L / dz
    edges2 = vinterp.cells_to_edges(jnp.asarray(sin_avg)[None, :], zint)
    assert np.abs(np.asarray(edges2)[0, 5:-5] -
                  np.sin(zint[5:-5] / L)).max() < 2e-4
    # BC_ZERO_VALUE forces zero boundary values
    edges3 = vinterp.cells_to_edges(data, zint,
                                    bc_lower=vinterp.BC_ZERO_VALUE,
                                    bc_upper=vinterp.BC_ZERO_VALUE)
    assert float(edges3[0, 0]) == 0.0 and float(edges3[0, -1]) == 0.0


def test_forced_radiation_applies_enthalpy_tendency():
    """Forced radiation heats each CRM column by the coarse-cell tendency
    (ref: physics/radiation/forced/radiation.h:40-44)."""
    from pam_tpu.physics import radiation
    cpl = make_cpl(nx=8, micro=False)
    cpl = radiation.register(cpl, rad_nx=2, rad_ny=1)
    rng = np.random.default_rng(7)
    state = base_state(cpl, rng)
    state = radiation.init_state(cpl, state)
    tend = np.zeros((cpl.nens, cpl.nz, 1, 2))
    tend[:, :, 0, 0] = 100.0   # left half heats, right half does not
    state["rad_enthalpy_tend"] = jnp.asarray(tend)
    rad = radiation.ForcedRadiation(cpl)
    out = rad.timestep(state, 10.0)
    dT = np.asarray(out["temp"] - state["temp"])
    expected = 100.0 / cpl.const.cp_d * 10.0
    assert np.allclose(dT[:, :, :, :4], expected)
    assert np.allclose(dT[:, :, :, 4:], 0.0)
