"""3-D (ndims=2) SPAM tendencies oracle test (VERDICT r4 item 3a): one
genuinely y-VARYING compute_rhs evaluation of the port
(pam_tpu.spam.extruded3d.Tendencies3D) vs the scalar transliteration of
the reference's ndims=2 kernels (tests/spam3d_oracle.py) at f64
rtol 1e-10.

This covers exactly the terms the x/y-degenerate slab reductions kill:
the vertical vorticity qxy and its per-level straight recon + Q_EC
fluxes, the Qyz_w / Qyz_v wedges and their sign conventions, the W2D
tangent fluxes, the y-direction density/PV recons and FCT fluxes, and
the ndims=2 sign flips of zeta_xz / Qxz_w / Qxz_u.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.spam import si
from pam_tpu.spam.geometry import ExtrudedGeometry
from pam_tpu.spam.thermo import IdealGasPottemp
from pam_tpu.spam.varset import VariableSet
from pam_tpu.spam.testcases import RisingBubble, setup_testcase_3d
from pam_tpu.spam.extruded3d import Tendencies3D
from pam_tpu.ops import recon_matrices as rm

import spam3d_oracle as orc3


@pytest.fixture(scope="module")
def setup():
    tc = RisingBubble()
    nx, ny, nz, nens = 6, 4, 5, 1
    zint = np.linspace(0, tc.Lz, nz + 1)
    geom = ExtrudedGeometry.build3d(nx, ny, zint, tc.Lx, tc.Lx, nens,
                                    jnp.float64)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", tracer_names=("puff",),
                     tracer_positive=(True,), geom=geom, thermo=thermo)
    ref = si.build_reference_state(
        geom, thermo, vs, lambda z: tc.refrho_f(z, thermo),
        lambda z: tc.refentropicdensity_f(z, thermo),
        lambda z: tc.refnsq_f(z, thermo), tc.g)
    J = jnp.asarray
    tend3 = Tendencies3D(
        geom=geom, varset=vs, thermo=thermo, grav=tc.g,
        force_refstate_hydrostatic_balance=True,
        refdens=J(ref["dens"]), ref_rho_pi=J(ref["rho_pi"]),
        ref_q_pi=J(ref["q_pi"]), ref_rho_di=J(ref["rho_di"]),
        ref_q_di=J(ref["q_di"]), ref_B=J(ref["B"]))
    dens2, v, w, geop = setup_testcase_3d(tc, geom, thermo)
    # genuinely y-VARYING state: structured + random perturbations on
    # density/entropy, nonzero v0 AND v1, random w; a sharp zero-background
    # positive tracer so the 3-D FCT limiters fire (incl. at y seams)
    rng = np.random.default_rng(17)
    dens2 = np.asarray(dens2)[:, :nens] if dens2.ndim == 5 else \
        np.asarray(dens2)
    shape = (nens, nz, ny, nx)
    ys = np.arange(ny) / ny
    ymod = (1.0 + 0.02 * np.sin(2 * np.pi * ys))[None, None, :, None]
    dens = np.zeros((3, nens, nz, ny, nx))
    dens[0] = np.asarray(dens2[0]) * ymod * \
        (1.0 + 3e-3 * rng.standard_normal(shape))
    dens[1] = np.asarray(dens2[1]) * ymod * \
        (1.0 + 3e-3 * rng.standard_normal(shape))
    puff = np.zeros(shape)
    puff[:, nz // 2, 1, 0] = 1e-3
    puff[:, nz // 2, :, nx // 2] = 2e-3
    puff[:, nz // 3] = 1e-4 * rng.random((nens, ny, nx))
    dens[2] = puff * dens[0]
    v = np.stack([3.0 * rng.standard_normal(shape),
                  2.0 * rng.standard_normal(shape)])
    w = 1.5 * rng.standard_normal((nens, nz - 1, ny, nx))

    idl, sigma = rm.weno_ideal_weights(tend3.ord)
    mats = dict(s2c=rm.sten_to_coefs(tend3.ord),
                wrl=rm.weno_lower_sten_to_coefs(tend3.ord),
                c2g=rm.coefs_to_gll_lower(tend3.ord), idl=idl, sigma=sigma)
    oref = dict(refdens=np.asarray(ref["dens"]),
                rho_pi=np.asarray(ref["rho_pi"]),
                q_pi=np.asarray(ref["q_pi"]),
                rho_di=np.asarray(ref["rho_di"]),
                q_di=np.asarray(ref["q_di"]),
                B_ref=np.asarray(ref["B"]))
    geo = dict(dz_d=np.asarray(geom.dz_d), dz_p=np.asarray(geom.dz_p),
               dx=float(geom.dx), dy=float(geom.dy))
    return dict(tend3=tend3, dens=dens, v=v, w=w, geop=np.asarray(geop),
                mats=mats, ref=oref, geo=geo, cst=thermo.cst,
                dens_pos=list(vs.dens_pos))


def _cmp(got, want, what, rtol=1e-10):
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol,
                               atol=rtol * scale, err_msg=what)


def test_3d_fd_matches_oracle(setup):
    s = setup
    F, FW, K, B = jax.jit(s["tend3"].functional_derivatives)(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]),
        jnp.asarray(s["geop"]))
    Fo, FWo, Ko, Bo = orc3.fd_3d_oracle(
        s["dens"], s["v"], s["w"], s["geop"], s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"])
    _cmp(F, Fo, "F")
    _cmp(FW, FWo, "FW")
    _cmp(K, Ko, "K")
    _cmp(B, Bo, "B")


def test_3d_q_matches_oracle(setup):
    s = setup
    qhz, qxy = jax.jit(s["tend3"].q_and_f)(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]))
    qhzo, qxyo = orc3.q_3d_oracle(s["dens"], s["v"], s["w"])
    _cmp(qhz, qhzo, "qhz")
    _cmp(qxy, qxyo, "qxy")


def test_3d_tangent_fluxes_match_oracle(setup):
    s = setup
    F, FW, K, B = jax.jit(s["tend3"].functional_derivatives)(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]),
        jnp.asarray(s["geop"]))
    FT, FTW, FTxy = jax.jit(s["tend3"].tangent_fluxes)(F, FW)
    FTo, FTWo, FTxyo = orc3.tangent_fluxes_3d_oracle(np.asarray(F),
                                                     np.asarray(FW))
    _cmp(jnp.stack(FT), FTo, "FT")
    _cmp(jnp.stack(FTW), FTWo, "FTW")
    _cmp(jnp.stack(FTxy), FTxyo, "FTxy")


def test_3d_compute_rhs_matches_oracle(setup):
    s = setup
    dt = 2.0
    td, tv, tw = jax.jit(lambda d, v_, w_: s["tend3"].compute_rhs(
        d, v_, w_, jnp.asarray(s["geop"]), dt))(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]))
    tdo, tvo, two = orc3.compute_rhs_3d_oracle(
        s["dens"], s["v"], s["w"], s["geop"], dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["mats"], s["ref"], s["dens_pos"])
    _cmp(tw, two, "wtend")
    _cmp(tv, tvo, "vtend")
    for l in range(tdo.shape[0]):
        _cmp(np.asarray(td)[l], tdo[l], f"denstend[{l}]")
    # the 3-D FCT must actually have fired somewhere (else only the
    # unlimited path is certified): unlimited mass availability changes
    # the tracer tendency
    tdo2, _, _ = orc3.compute_rhs_3d_oracle(
        s["dens"], s["v"], s["w"], s["geop"], dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["mats"], s["ref"], s["dens_pos"],
        fct_avail=np.full_like(s["dens"], 1e30))
    assert np.abs(tdo2[2] - tdo[2]).max() > 0.0, "3-D FCT never fired"
