"""SPAM dycore oracle tests: the port's functional derivatives,
apply_symplectic chain, SI velocity solve, and full quasi-Newton SI step
vs the scalar transliteration of the reference kernels
(tests/spam_oracle.py) at f64 (VERDICT r3 item 2).

Configuration: the COUPLED production variant (MCE_rho +
ConstantKappa_VirtualPottemp, Kessler tracers, supercell column init) on
a small 8x1x6 grid — the same stack `bench.py` ships, two SI iterations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.ops import recon_matrices as rm

import spam_oracle as orc


@pytest.fixture(scope="module", params=["uniform", "stretched"])
def setup(request):
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.spam import si as si_mod
    nz, zlen = 6, 20000.0
    if request.param == "stretched":
        # geometrically stretched vertical interfaces (the vcoords-grid
        # regime, driver.cpp:135-170): exercises the per-level WENOFUNC
        # matrices (weno_func_recon_variable.h) through the whole SI chain
        r = 1.35
        zint = zlen * (r ** np.arange(nz + 1) - 1.0) / (r ** nz - 1.0)
    else:
        zint = None
    drv, state = setup_supercell_mmf(
        nx=8, ny=1, nz=nz, nens=2, xlen=16000.0, ylen=64000.0, zlen=zlen,
        micro="kessler", dt_gcm=80.0, dt_crm_phys=20.0, dycore="spam",
        dtype=jnp.float64, zint=zint)
    dyc = drv.dycore
    tend = dyc.tend
    # rebuild the (deterministic) coupled reference state to recover the
    # Nsq_pi column the linear-system build consumed; cross-checked below
    # against the tendencies' baked refdens
    refstate0 = si_mod.build_coupled_reference_state(
        state, dyc.geom, dyc.thermo, dyc.varset, dyc.grav)
    np.testing.assert_allclose(np.asarray(tend.refdens),
                               np.asarray(refstate0["dens"]), rtol=1e-14)
    # structured + random perturbation so WENO limiters see both regimes
    # and rain exists (FCT has positive tracers to limit)
    rng = np.random.default_rng(11)
    state = dict(state)
    shp = np.asarray(state["temp"]).shape
    state["temp"] = state["temp"] * (1 + 3e-3 * rng.standard_normal(shp))
    state["uvel"] = state["uvel"] + 2.0 * rng.standard_normal(shp)
    state["wvel"] = state["wvel"] + 1.0 * rng.standard_normal(shp)
    state["precip_liquid"] = jnp.asarray(
        1e-4 * rng.random(shp) * np.asarray(state["density_dry"]))
    state["cloud_liquid"] = jnp.asarray(
        5e-4 * rng.random(shp) * np.asarray(state["density_dry"]))

    dens, v, w = dyc.coupler_to_dynamics(state)
    g = dyc.geom
    vs = dyc.varset
    idl, sigma = rm.weno_ideal_weights(tend.ord)
    mats = dict(s2c=rm.sten_to_coefs(tend.ord),
                wrl=rm.weno_lower_sten_to_coefs(tend.ord),
                c2g=rm.coefs_to_gll_lower(tend.ord), idl=idl, sigma=sigma)
    ids = {"vap": vs.dens_id_vap,
           "liq": vs.dens_id_liq if vs.liq_found else None,
           "ice": vs.dens_id_ice if vs.ice_found else None}
    ref = dict(refdens=np.asarray(tend.refdens),
               rho_pi=np.asarray(tend.ref_rho_pi),
               q_pi=np.asarray(tend.ref_q_pi),
               rho_di=np.asarray(tend.ref_rho_di),
               q_di=np.asarray(tend.ref_q_di),
               Nsq_pi=np.asarray(refstate0["Nsq_pi"]),
               pres_pi=np.asarray(refstate0["pres_pi"]),
               grav=dyc.grav, ids=ids, B_ref=np.asarray(tend.ref_B))
    geo = dict(dz_d=np.asarray(g.dz_d), dz_p=np.asarray(g.dz_p),
               dx=float(g.dx), dy=float(g.dy),
               zint_p=np.asarray(g.zint_p))
    # per-level variable-grid vertical matrices for the oracle on
    # stretched grids (None on uniform); the matrices themselves are
    # validated independently by polynomial exactness
    # (tests/test_recon.py::test_variable_grid_exact_on_stretched)
    vmats = None
    if not g.uniform_vertical:
        pd = tend.vert_per_level()
        pq = tend.vert_per_level_q()
        vmats = dict(dens=(np.asarray(pd[0]), np.asarray(pd[1])),
                     q=(np.asarray(pq[0]), np.asarray(pq[1])))
    return dict(drv=drv, dyc=dyc, tend=tend, dens=np.asarray(dens),
                v=np.asarray(v), w=np.asarray(w),
                geop=np.asarray(dyc.geop), mats=mats, ref=ref, geo=geo,
                cst=dyc.thermo.cst, dens_pos=list(vs.dens_pos),
                refstate0=refstate0, vmats=vmats)


def _cmp(got, want, what, rtol=1e-10):
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol,
                               atol=rtol * scale, err_msg=what)


def test_functional_derivatives_match_oracle(setup):
    s = setup
    F, FW, K, B = jax.jit(s["tend"].functional_derivatives)(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]),
        jnp.asarray(s["geop"]))
    Fo, FWo, Ko, Bo = orc.fd_oracle(
        s["dens"], s["v"], s["w"], s["geop"], s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        ids=s["ref"]["ids"])
    _cmp(F, Fo, "F")
    _cmp(FW, FWo, "FW")
    _cmp(K, Ko, "K")
    _cmp(B, Bo, "B")


def test_apply_symplectic_matches_oracle(setup):
    s = setup
    dt = 20.0
    F, FW, K, B = jax.jit(s["tend"].functional_derivatives)(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]),
        jnp.asarray(s["geop"]))
    td, tv, tw = jax.jit(lambda d, v_, w_, F_, FW_, B_: s[
        "tend"].apply_symplectic(d, v_, w_, F_, FW_, B_, dt))(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]),
        F, FW, B)
    tdo, tvo, two = orc.apply_symplectic_oracle(
        s["dens"], s["v"], s["w"], np.asarray(F), np.asarray(FW),
        np.asarray(B), dt, s["geo"]["dz_d"], s["geo"]["dz_p"],
        s["geo"]["dx"], s["geo"]["dy"], s["mats"], s["ref"],
        s["dens_pos"], vmats=s["vmats"])
    _cmp(tv, tvo, "vtend")
    _cmp(tw, two, "wtend")
    for l in range(tdo.shape[0]):
        _cmp(np.asarray(td)[l], tdo[l], f"denstend[{l}]")


def test_si_velocity_solve_matches_oracle(setup):
    s = setup
    linsys = s["dyc"].si_linsys
    rng = np.random.default_rng(5)
    nens, nz, nx = s["v"].shape
    ndens = s["dens"].shape[0]
    rhs_dens = 1e-3 * rng.standard_normal((ndens, nens, nz, nx)) * \
        (1.0 + np.abs(s["dens"]))
    rhs_v = 50.0 * rng.standard_normal((nens, nz, nx))
    rhs_w = 50.0 * rng.standard_normal((nens, nz - 1, nx))
    sd, sv_, sw = jax.jit(linsys.solve)(jnp.asarray(rhs_dens),
                                        jnp.asarray(rhs_v),
                                        jnp.asarray(rhs_w))
    sdo, svo, swo = orc.velocity_solve_oracle(
        rhs_dens, rhs_v, rhs_w, s["dyc"].si_dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["ref"], s["geo"]["zint_p"])
    _cmp(sv_, svo, "sol_v")
    _cmp(sw, swo, "sol_w")
    for l in range(ndens):
        _cmp(np.asarray(sd)[l], sdo[l], f"sol_dens[{l}]")


def test_si_step_matches_oracle(setup):
    from pam_tpu.spam import si as si_mod
    s = setup
    dt = s["dyc"].si_dt
    xn = jax.jit(lambda d, v_, w_: si_mod.si_step(
        s["tend"], s["dyc"].si_linsys, d, v_, w_, jnp.asarray(s["geop"]),
        dt, max_iters=2, nquad=2))(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]))
    pts, wts = si_mod.gauss_01(2)
    xo = orc.si_step_oracle(
        s["dens"], s["v"], s["w"], s["geop"], dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["mats"], s["ref"], s["dens_pos"], s["geo"]["zint_p"],
        max_iters=2, quad_pts=np.asarray(pts), quad_wts=np.asarray(wts),
        vmats=s["vmats"])
    _cmp(xn[1], xo[1], "si v")
    _cmp(xn[2], xo[2], "si w")
    for l in range(xo[0].shape[0]):
        _cmp(np.asarray(xn[0])[l], xo[0][l], f"si dens[{l}]")


def _pressure_rhs(s, seed=7):
    rng = np.random.default_rng(seed)
    nens, nz, nx = s["v"].shape
    ndens = s["dens"].shape[0]
    rhs_dens = 1e-3 * rng.standard_normal((ndens, nens, nz, nx)) * \
        (1.0 + np.abs(s["dens"]))
    rhs_v = 50.0 * rng.standard_normal((nens, nz, nx))
    rhs_w = 50.0 * rng.standard_normal((nens, nz - 1, nx))
    return rhs_dens, rhs_v, rhs_w


def test_si_pressure_solve_matches_oracle(setup):
    """The reference's YAML-DEFAULT linear system (linear_system ==
    "pressure", extrudedmodel.h:5059) against the scalar transliteration
    of compute_coefficients + prepare/solve/update
    (extrudedmodel.h:3530-3970) — direct oracle coverage replacing the
    transitive velocity-system cross-check (VERDICT r4 item 7)."""
    from pam_tpu.spam import si as si_mod
    s = setup
    dyc = s["dyc"]
    linp = si_mod.CompressiblePressureLinearSystem.build(
        dyc.geom, dyc.thermo, dyc.varset, s["refstate0"], dyc.si_dt)
    rhs_dens, rhs_v, rhs_w = _pressure_rhs(s)
    sd, sv_, sw = jax.jit(linp.solve)(jnp.asarray(rhs_dens),
                                      jnp.asarray(rhs_v),
                                      jnp.asarray(rhs_w))
    sdo, svo, swo = orc.pressure_solve_oracle(
        rhs_dens, rhs_v, rhs_w, dyc.si_dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["ref"], gravity=False)
    _cmp(sv_, svo, "pressure sol_v")
    _cmp(sw, swo, "pressure sol_w")
    for l in range(sdo.shape[0]):
        _cmp(np.asarray(sd)[l], sdo[l], f"pressure sol_dens[{l}]")


def test_si_pressure_gravity_solve_matches_oracle(setup):
    """The gravity-aware pressure system (the stratification-robust
    variant, extrudedmodel.h:3970-4580) against its transliteration, on
    the same stratified coupled column."""
    from pam_tpu.spam import si as si_mod
    s = setup
    dyc = s["dyc"]
    ling = si_mod.CompressiblePressureGravityLinearSystem.build(
        dyc.geom, dyc.thermo, dyc.varset, s["refstate0"], dyc.si_dt)
    rhs_dens, rhs_v, rhs_w = _pressure_rhs(s, seed=8)
    sd, sv_, sw = jax.jit(ling.solve)(jnp.asarray(rhs_dens),
                                      jnp.asarray(rhs_v),
                                      jnp.asarray(rhs_w))
    sdo, svo, swo = orc.pressure_solve_oracle(
        rhs_dens, rhs_v, rhs_w, dyc.si_dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["ref"], gravity=True)
    _cmp(sv_, svo, "pressure-gravity sol_v")
    _cmp(sw, swo, "pressure-gravity sol_w")
    for l in range(sdo.shape[0]):
        _cmp(np.asarray(sd)[l], sdo[l], f"pressure-gravity sol_dens[{l}]")
