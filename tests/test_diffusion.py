"""Convergence tests for SPAM scalar/velocity diffusion.

Mirrors the reference's Laplacian convergence strategy
(dynamics/spam/test/operator_properties/laplacian_extruded.cpp:411-447):
apply the discrete diffusion operator to smooth analytic fields at two
resolutions and check ~2nd-order convergence to the continuum Laplacian.
"""

import numpy as np
import jax.numpy as jnp

from pam_tpu.spam import ExtrudedGeometry, VariableSet, SpamTendencies
from pam_tpu.spam import diffusion as diff
from pam_tpu.spam.thermo import IdealGasPottemp
import pytest

LX = 2.0
LZ = 1.0


def _setup(n):
    geom = ExtrudedGeometry.build(n, np.linspace(0.0, LZ, n + 1), LX, 1,
                                  jnp.float64)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=0.0)
    # cell centers
    x = (np.arange(n) + 0.5) * geom.dx
    zmid = np.asarray(geom.zmid_d)[0]          # (nz,)
    X, Z = np.meshgrid(x, zmid)                # (nz, nx)
    return geom, vs, tend, X, Z


def _interior(err2d, m=3):
    return err2d[m:-m, :]


def test_scalar_diffusion_converges_to_laplacian():
    kx = 2 * np.pi / LX
    kz = np.pi / LZ

    def q_f(X, Z):
        # dq/dz = 0 at boundaries -> compatible with mirror halos
        return np.sin(kx * X) * np.cos(kz * Z)

    lap = -(kx ** 2 + kz ** 2)
    errs = []
    for n in (32, 64):
        geom, vs, tend, X, Z = _setup(n)
        area = np.asarray(geom.d_area_n1())[0][:, None]   # (nz, 1)
        rho0 = 1.0
        q = q_f(X, Z)
        dens = jnp.asarray(
            np.stack([rho0 * area * np.ones_like(q), rho0 * q * area])
        )[:, None]  # (2, nens=1, nz, nx)
        denstend = jnp.zeros_like(dens)
        out = diff.scalar_diffusion(tend, dens, denstend, 1.0, 1.0)
        # F convention: dq/dt = -F => F_S should be -rho * lap * q * area
        got = np.asarray(out[1, 0]) / area
        want = -rho0 * lap * q
        err = np.abs(_interior(got - want)).max()
        errs.append(err)
    rate = np.log2(errs[0] / errs[1])
    assert errs[1] < 0.2 * abs(lap)
    assert rate > 1.6, f"scalar diffusion convergence rate {rate}"


def test_velocity_diffusion_converges_to_laplacian():
    kx = 2 * np.pi / LX
    kz = np.pi / LZ

    def u_f(X, Z):
        return np.sin(kx * X) * np.cos(kz * Z)

    def w_f(X, Z):
        return np.cos(kx * X) * np.sin(kz * Z)

    lap = -(kx ** 2 + kz ** 2)
    errs_u, errs_w = [], []
    for n in (32, 64):
        geom, vs, tend, X, Z = _setup(n)
        nz = n
        x_edges = np.arange(n) * geom.dx
        zmid = np.asarray(geom.zmid_d)[0]
        zint = np.asarray(geom.zint_d)[0] if hasattr(geom, "zint_d") else \
            np.linspace(0.0, LZ, n + 1)
        dz_p = np.asarray(geom.dz_p)[0]
        Xe, Zc = np.meshgrid(x_edges, zmid)         # v points
        Xc, Zw = np.meshgrid((np.arange(n) + 0.5) * geom.dx, zint[1:-1])
        v = jnp.asarray(u_f(Xe, Zc) * geom.dx)[None]         # 1-form
        w = jnp.asarray(w_f(Xc, Zw) * dz_p[:, None])[None]   # 1-form
        vt = jnp.zeros_like(v)
        wt = jnp.zeros_like(w)
        vt, wt = diff.velocity_diffusion(tend, v, w, vt, wt,
                                         1.0, 1.0, 1.0, 1.0)
        got_u = np.asarray(vt[0]) / geom.dx
        want_u = -lap * u_f(Xe, Zc)
        errs_u.append(np.abs(_interior(got_u - want_u)).max())
        got_w = np.asarray(wt[0]) / dz_p[:, None]
        want_w = -lap * w_f(Xc, Zw)
        errs_w.append(np.abs(_interior(got_w - want_w)).max())
    rate_u = np.log2(errs_u[0] / errs_u[1])
    rate_w = np.log2(errs_w[0] / errs_w[1])
    assert errs_u[1] < 0.2 * abs(lap), errs_u
    assert errs_w[1] < 0.2 * abs(lap), errs_w
    assert rate_u > 1.6, f"u diffusion convergence rate {rate_u}"
    assert rate_w > 1.6, f"w diffusion convergence rate {rate_w}"


@pytest.mark.slow
def test_diffusion_dissipates_energy_in_dynamics():
    """Running the rising bubble with diffusion on must not blow up and
    must reduce kinetic energy relative to the inviscid run."""
    import dataclasses
    import jax
    from pam_tpu.spam import testcases as tcs

    tc = tcs.RisingBubble()
    geom = ExtrudedGeometry.build(16, np.linspace(0.0, tc.Lz, 17), tc.Lx, 1,
                                  jnp.float64)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
    dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)
    kw = dict(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
    tend0 = SpamTendencies(**kw)
    tendD = SpamTendencies(**kw, scalar_horiz_diffusion_coeff=1.0,
                           scalar_vert_diffusion_coeff=1.0,
                           velocity_vort_horiz_diffusion_coeff=1.0,
                           velocity_vort_vert_diffusion_coeff=1.0,
                           velocity_div_horiz_diffusion_coeff=1.0,
                           velocity_div_vert_diffusion_coeff=1.0)
    dt = 0.2 * min(geom.dx, float(geom.dz_d.min())) / 350.0
    s0 = (dens, v, w)
    sD = (dens, v, w)
    step0 = jax.jit(lambda d, vv, ww: tend0.ssprk3_step(d, vv, ww, geop, dt))
    stepD = jax.jit(lambda d, vv, ww: tendD.ssprk3_step(d, vv, ww, geop, dt))
    for _ in range(20):
        s0 = step0(*s0)
        sD = stepD(*sD)
    assert np.isfinite(np.asarray(sD[0])).all()
    ke0 = float(tend0.energy(*s0, geop)[1][0])
    keD = float(tendD.energy(*sD, geop)[1][0])
    assert keD < ke0
