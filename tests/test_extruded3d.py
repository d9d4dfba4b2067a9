"""3-D (ndims=2) SPAM extruded model tests.

The main correctness lever: a y-degenerate 3-D configuration must reduce
EXACTLY to the validated x-z slab (the ndims=2 sign flips of zeta_xz and
the Qxz operators cancel — wedge.h:154,506 + ext_deriv.h:705-716), and an
x-degenerate configuration must reduce to the slab with x mapped to y
(exercising the Qyz/Wyz path). Plus structural conservation in full 3-D.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pam_tpu.spam import (ExtrudedGeometry, IdealGasPottemp, VariableSet,
                          SpamTendencies)
from pam_tpu.spam import testcases as tcs
from pam_tpu.spam.extruded3d import Tendencies3D
import pytest


def make_pair(nx=16, nz=12, ny=6, ylen=None):
    """Matching slab (1-D) and 3-D setups with the same x-z grid.

    ylen=None -> dy=1 so the slab (which has dy=1) embeds EXACTLY: WENO
    smoothness weights are not invariant under field rescaling by 1/dy, so
    exact-degeneracy checks need unit dy; dy!=1 behavior is covered by the
    conservation test."""
    if ylen is None:
        ylen = float(ny)
    tc = tcs.RisingBubble()
    zint = np.linspace(0.0, tc.Lz, nz + 1)
    geom1 = ExtrudedGeometry.build(nx, zint, tc.Lx, 1, jnp.float64)
    geom3 = ExtrudedGeometry.build3d(nx, ny, zint, tc.Lx, ylen, 1,
                                     jnp.float64)
    thermo = IdealGasPottemp()
    vs1 = VariableSet(variant="CE", geom=geom1, thermo=thermo)
    vs3 = VariableSet(variant="CE", geom=geom3, thermo=thermo)
    t1 = SpamTendencies(geom=geom1, varset=vs1, thermo=thermo, grav=tc.g)
    t3 = Tendencies3D(geom=geom3, varset=vs3, thermo=thermo, grav=tc.g)
    dens1, v1, w1, geop1 = tcs.setup_testcase(tc, geom1, thermo)
    return tc, geom1, geom3, t1, t3, dens1, v1, w1, geop1


def bcast_y(a1, ny, dy):
    """Broadcast an (…, nens, nz, nx) slab field along y, scaling n-forms
    by dy (3-D dual n-form = density*dx*dy*dz)."""
    return jnp.repeat(a1[..., None, :], ny, axis=-2) * dy


@pytest.mark.slow
def test_y_degenerate_matches_slab():
    tc, geom1, geom3, t1, t3, dens1, v1, w1, geop1 = make_pair()
    ny, dy = geom3.ny, geom3.dy
    # give the slab a nontrivial velocity field to exercise upwinding
    rng = np.random.default_rng(3)
    v1 = v1 + 0.3 * jnp.asarray(rng.standard_normal(v1.shape))
    w1 = w1 + 0.3 * jnp.asarray(rng.standard_normal(w1.shape))
    dens3 = bcast_y(dens1, ny, dy)
    geop3 = bcast_y(geop1, ny, dy)
    v3 = jnp.stack([jnp.repeat(v1[..., None, :], ny, axis=-2),
                    jnp.zeros((geom3.nens, geom3.nz, ny, geom3.nx))])
    w3 = jnp.repeat(w1[..., None, :], ny, axis=-2)
    dt = 0.05
    Fd1, Fv1, Fw1 = t1.compute_rhs(dens1, v1, w1, geop1, dt)
    Fd3, Fv3, Fw3 = t3.compute_rhs(dens3, v3, w3, geop3, dt)
    # every y-slice reproduces the slab
    for j in range(ny):
        np.testing.assert_allclose(np.asarray(Fd3[..., j, :]),
                                   np.asarray(Fd1) * dy, rtol=1e-11)
        np.testing.assert_allclose(np.asarray(Fv3[0][..., j, :]),
                                   np.asarray(Fv1), rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(Fw3[..., j, :]),
                                   np.asarray(Fw1), rtol=1e-11, atol=1e-13)
    # no spurious y-velocity tendency
    np.testing.assert_allclose(np.asarray(Fv3[1]), 0.0, atol=1e-12)


@pytest.mark.slow
def test_x_degenerate_matches_slab():
    """x-invariant data with v=(0, vy): the qyz/Wyz/Qyz path must reproduce
    the slab with x->y (the slab's nx plays the 3-D ny role)."""
    tc, geom1, _, t1, _, dens1, v1, w1, geop1 = make_pair(nx=12, nz=12)
    # 3-D grid whose y matches the slab's x; unit dx (see make_pair note)
    nx3, ny3 = 5, geom1.nx
    zint = np.linspace(0.0, tc.Lz, geom1.nz + 1)
    geom3 = ExtrudedGeometry.build3d(nx3, ny3, zint, float(nx3), tc.Lx, 1,
                                     jnp.float64)
    thermo = IdealGasPottemp()
    vs3 = VariableSet(variant="CE", geom=geom3, thermo=thermo)
    t3 = Tendencies3D(geom=geom3, varset=vs3, thermo=thermo, grav=tc.g)
    rng = np.random.default_rng(4)
    v1 = v1 + 0.3 * jnp.asarray(rng.standard_normal(v1.shape))
    w1 = w1 + 0.3 * jnp.asarray(rng.standard_normal(w1.shape))

    def to3d(a1):
        # (…, nens, nz, nX) -> (…, nens, nz, ny=nX, nx3), x-invariant,
        # scaled by dx3 (the slab's "dy" here is geom3.dx)
        return jnp.repeat(a1[..., :, None], nx3, axis=-1) * geom3.dx

    dens3 = to3d(dens1)
    geop3 = to3d(geop1)
    vy = jnp.repeat(v1[..., :, None], nx3, axis=-1)
    v3 = jnp.stack([jnp.zeros_like(vy), vy])
    w3 = jnp.repeat(w1[..., :, None], nx3, axis=-1)
    dt = 0.05
    Fd1, Fv1, Fw1 = t1.compute_rhs(dens1, v1, w1, geop1, dt)
    Fd3, Fv3, Fw3 = t3.compute_rhs(dens3, v3, w3, geop3, dt)
    for i in range(nx3):
        np.testing.assert_allclose(np.asarray(Fd3[..., i]),
                                   np.asarray(Fd1) * geom3.dx, rtol=1e-11)
        np.testing.assert_allclose(np.asarray(Fv3[1][..., i]),
                                   np.asarray(Fv1), rtol=1e-11, atol=1e-13)
        np.testing.assert_allclose(np.asarray(Fw3[..., i]),
                                   np.asarray(Fw1), rtol=1e-11, atol=1e-13)
    np.testing.assert_allclose(np.asarray(Fv3[0]), 0.0, atol=1e-12)


def test_qxy_of_horizontal_gradient_vanishes():
    """Vertical vorticity of a horizontal gradient field is zero
    (discrete d∘d = 0 for the xy curl, ext_deriv.h compute_D1)."""
    _, _, geom3, _, t3, dens1, _, _, _ = make_pair()
    rng = np.random.default_rng(5)
    phi = jnp.asarray(rng.standard_normal(
        (geom3.nens, geom3.nz, geom3.ny, geom3.nx)))
    from pam_tpu.spam.extruded3d import rx, ry
    v3 = jnp.stack([phi - rx(phi, -1), phi - ry(phi, -1)])
    w3 = jnp.zeros((geom3.nens, geom3.nz - 1, geom3.ny, geom3.nx))
    dens3 = bcast_y(dens1, geom3.ny, geom3.dy)
    _, qxy = t3.q_and_f(dens3, v3, w3)
    np.testing.assert_allclose(np.asarray(qxy), 0.0, atol=1e-12)


def test_3d_bubble_conservation_and_symmetry():
    """Full 3-D rising bubble (asymmetric in x and y): mass/entropy exact,
    total energy to time-integrator accuracy, PV components finite."""
    tc, _, geom3, _, t3, dens1, v1, w1, geop1 = make_pair(nx=12, nz=10, ny=10,
                                                          ylen=10000.0)
    ny, dy = geom3.ny, geom3.dy
    dens3 = bcast_y(dens1, ny, dy)
    geop3 = bcast_y(geop1, ny, dy)
    # y-dependent entropy perturbation to make the flow genuinely 3-D
    yc = (np.arange(ny) + 0.5) * dy
    pert = 1.0 + 1e-3 * np.cos(2 * np.pi * yc / geom3.ylen)
    dens3 = dens3.at[1].set(dens3[1] * jnp.asarray(pert)[None, None, :, None])
    v3 = jnp.zeros((2, geom3.nens, geom3.nz, ny, geom3.nx))
    w3 = jnp.zeros((geom3.nens, geom3.nz - 1, ny, geom3.nx))
    dt = 0.05
    step = jax.jit(lambda d, vv, ww: t3.ssprk3_step(d, vv, ww, geop3, dt))
    E0 = t3.energy(dens3, v3, w3, geop3)[0]
    m0 = float(jnp.sum(dens3[0]))
    s0 = float(jnp.sum(dens3[1]))
    for _ in range(20):
        dens3, v3, w3 = step(dens3, v3, w3)
    assert np.isfinite(np.asarray(dens3)).all()
    assert np.isfinite(np.asarray(v3)).all()
    assert np.isfinite(np.asarray(w3)).all()
    assert abs(float(jnp.sum(dens3[0])) - m0) / m0 < 1e-12
    assert abs(float(jnp.sum(dens3[1])) - s0) / s0 < 1e-12
    E1 = t3.energy(dens3, v3, w3, geop3)[0]
    assert abs(float(E1[0] - E0[0]) / float(E0[0])) < 1e-6
    stats = t3.statistics(dens3, v3, w3, geop3)
    assert np.isfinite(np.asarray(stats["PV"])).all()


def test_3d_moist_bubble_conserves():
    """3-D MoistRisingBubble (spherical vapor bubble, MCE_rho + positive
    tracer -> exercises the 3-D FCT path)."""
    from pam_tpu.spam import IdealGasPottemp
    tc = tcs.MoistRisingBubble()
    nx = ny = nz = 10
    zint = np.linspace(0.0, tc.Lz, nz + 1)
    geom3 = ExtrudedGeometry.build3d(nx, ny, zint, tc.Lx, tc.Lx, 1,
                                     jnp.float64)
    th = IdealGasPottemp()
    vs = VariableSet(variant="MCE_rho", tracer_names=("water_vapor",),
                     tracer_positive=(True,), geom=geom3, thermo=th)
    t3 = Tendencies3D(geom=geom3, varset=vs, thermo=th, grav=tc.g)
    dens, v, w, geop = tcs.setup_testcase_3d(tc, geom3, th)
    assert dens.shape == (3, 1, nz, ny, nx)
    # vapor is a spherical bubble: max at center, ~0 at corner
    rv = np.asarray(dens[2, 0])
    assert rv.max() > 0 and rv[0, 0, 0] < 1e-6 * rv.max()
    dt = 0.05
    step = jax.jit(lambda d, vv, ww: t3.ssprk3_step(d, vv, ww, geop, dt))
    m0 = float(jnp.sum(dens[0]))
    qv0 = float(jnp.sum(dens[2]))
    for _ in range(10):
        dens, v, w = step(dens, v, w)
    assert np.isfinite(np.asarray(dens)).all()
    assert abs(float(jnp.sum(dens[0])) - m0) / m0 < 1e-12
    assert abs(float(jnp.sum(dens[2])) - qv0) / qv0 < 1e-12
    assert float(jnp.min(dens[2])) > -1e-10 * float(jnp.max(dens[2]))


def test_3d_supercell_ics_and_step():
    """3-D Supercell: ellipsoidal bubble + u(z) shear, near-hydrostatic
    columns stay stable over a few explicit acoustic steps."""
    from pam_tpu.spam import ConstantKappaVirtualPottemp
    tc = tcs.Supercell()
    nx, ny, nz = 12, 12, 20
    zint = np.linspace(0.0, tc.Lz, nz + 1)
    geom3 = ExtrudedGeometry.build3d(nx, ny, zint, tc.Lx, tc.Ly, 1,
                                     jnp.float64)
    th = ConstantKappaVirtualPottemp(cst=tc.thermo_constants())
    vs = VariableSet(variant="MCE_rho", tracer_names=("water_vapor",),
                     tracer_positive=(True,), geom=geom3, thermo=th)
    dens, v, w, geop, refstate = tcs.setup_supercell_3d(tc, geom3, th, vs)
    assert np.isfinite(np.asarray(dens)).all()
    # bubble is 3-D: entropy perturbation varies along y
    S = np.asarray(dens[1, 0])
    assert S.std(axis=1).max() > 0
    t3 = Tendencies3D(geom=geom3, varset=vs, thermo=th, grav=tc.g,
                      refdens=jnp.asarray(refstate["dens"]))
    dt = 0.5
    step = jax.jit(lambda d, vv, ww: t3.ssprk3_step(d, vv, ww, geop, dt))
    m0 = float(jnp.sum(dens[0]))
    for _ in range(6):
        dens, v, w = step(dens, v, w)
    assert np.isfinite(np.asarray(dens)).all()
    assert np.isfinite(np.asarray(w)).all()
    assert abs(float(jnp.sum(dens[0])) - m0) / m0 < 1e-12
    # shear wind preserved to leading order
    u_phys = np.asarray(v[0, 0]) / geom3.dx
    assert abs(u_phys.max() - (tc.U_s - tc.U_c)) < 2.0
