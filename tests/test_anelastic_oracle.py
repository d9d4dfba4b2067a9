"""Anelastic oracle tests (VERDICT r4 item 3b): the AN pressure
projection and the full AN compute_rhs (Hamiltonian_AN_Hs +
AnelasticLinearSystem + add_pressure_perturbation) vs the scalar
transliteration of the reference kernels (tests/spam_oracle.py) at f64.

The round-4 verdict flagged that the anelastic chain rested on
self-consistency only (the constraint and energy invariants); this pins
it against an independent transliteration of
extrudedmodel.h:2489-2527 + 3245-3520 + anelastic.h:83-115.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.spam import si
from pam_tpu.spam.geometry import ExtrudedGeometry
from pam_tpu.spam.thermo import IdealGasPottemp
from pam_tpu.spam.varset import VariableSet
from pam_tpu.spam.testcases import RisingBubble, project_n1form
from pam_tpu.spam.anelastic import (AnelasticPressureSolver,
                                    AnelasticTendencies)
from pam_tpu.ops import recon_matrices as rm

import spam_oracle as orc


@pytest.fixture(scope="module")
def setup():
    tc = RisingBubble()
    nx, nz, nens = 10, 8, 2
    zint = np.linspace(0, tc.Lz, nz + 1)
    geom = ExtrudedGeometry.build(nx, zint, tc.Lx, nens=nens,
                                  dtype=jnp.float64)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", tracer_names=(), tracer_positive=(),
                     geom=geom, thermo=thermo)
    ref = si.build_reference_state(
        geom, thermo, vs, lambda z: tc.refrho_f(z, thermo),
        lambda z: tc.refentropicdensity_f(z, thermo),
        lambda z: tc.refnsq_f(z, thermo), tc.g)
    psolver = AnelasticPressureSolver.build(geom, ref["rho_pi"],
                                            ref["rho_di"])
    J = jnp.asarray
    tend = AnelasticTendencies(
        geom=geom, varset=vs, thermo=thermo, grav=tc.g,
        force_refstate_hydrostatic_balance=True,
        refdens=J(ref["dens"]), ref_rho_pi=J(ref["rho_pi"]),
        ref_q_pi=J(ref["q_pi"]), ref_rho_di=J(ref["rho_di"]),
        ref_q_di=J(ref["q_di"]), ref_B=J(ref["B"]), psolver=psolver)
    # anelastic state: rho pinned to the reference; perturbed S and winds
    rng = np.random.default_rng(3)
    dens_rho = np.broadcast_to(np.asarray(ref["dens"][0])[:, :, None],
                               (nens, nz, nx)).copy()
    S0 = np.asarray(project_n1form(
        lambda x, z: tc.refrho_f(z, thermo) * tc.entropicvar_f(x, z, thermo),
        geom))
    dens_S = S0 * (1.0 + 2e-3 * rng.standard_normal(S0.shape))
    geop = np.asarray(project_n1form(lambda x, z: tc.g * z, geom))
    dens = np.stack([dens_rho, dens_S])
    v = 3.0 * rng.standard_normal((nens, nz, nx))
    w = 2.0 * rng.standard_normal((nens, nz - 1, nx))

    idl, sigma = rm.weno_ideal_weights(tend.ord)
    mats = dict(s2c=rm.sten_to_coefs(tend.ord),
                wrl=rm.weno_lower_sten_to_coefs(tend.ord),
                c2g=rm.coefs_to_gll_lower(tend.ord), idl=idl, sigma=sigma)
    oref = dict(refdens=np.asarray(ref["dens"]),
                rho_pi=np.asarray(ref["rho_pi"]),
                q_pi=np.asarray(ref["q_pi"]),
                rho_di=np.asarray(ref["rho_di"]),
                q_di=np.asarray(ref["q_di"]),
                B_ref=np.asarray(ref["B"]))
    geo = dict(dz_d=np.asarray(geom.dz_d), dz_p=np.asarray(geom.dz_p),
               dx=float(geom.dx), dy=float(geom.dy))
    return dict(tend=tend, psolver=psolver, dens=dens, v=v, w=w, geop=geop,
                mats=mats, ref=oref, geo=geo, cst=thermo.cst,
                dens_pos=list(vs.dens_pos))


def _cmp(got, want, what, rtol=1e-10):
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol,
                               atol=rtol * scale, err_msg=what)


def test_anelastic_projection_matches_oracle(setup):
    """AnelasticPressureSolver.project vs the transliterated FFT + pinned
    Thomas Poisson solve (extrudedmodel.h:3245-3520)."""
    s = setup
    dv, dw = jax.jit(s["psolver"].project)(jnp.asarray(s["v"]),
                                           jnp.asarray(s["w"]))
    dvo, dwo = orc.anelastic_project_oracle(
        s["v"], s["w"], s["geo"]["dz_d"], s["geo"]["dz_p"],
        s["geo"]["dx"], s["ref"])
    _cmp(dv, dvo, "dv")
    _cmp(dw, dwo, "dw")


def test_anelastic_fd_matches_oracle(setup):
    """AN functional derivatives: B from the enthalpy at the reference
    pressure (anelastic.h:83-115)."""
    s = setup
    F, FW, K, B = jax.jit(s["tend"].functional_derivatives)(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]),
        jnp.asarray(s["geop"]))
    Fo, FWo, Ko, Bo = orc.fd_an_oracle(
        s["dens"], s["v"], s["w"], s["geop"], s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["ref"])
    _cmp(F, Fo, "F")
    _cmp(FW, FWo, "FW")
    _cmp(B, Bo, "B")


def test_anelastic_compute_rhs_matches_oracle(setup):
    """The full AN compute_rhs: AN recon branch (mass recon == 1), rho
    tendency pinned to zero, and the tendency projection
    (add_pressure_perturbation, extrudedmodel.h:2496-2503)."""
    s = setup
    dt = 5.0
    td, tv, tw = jax.jit(lambda d, v_, w_: s["tend"].compute_rhs(
        d, v_, w_, jnp.asarray(s["geop"]), dt))(
        jnp.asarray(s["dens"]), jnp.asarray(s["v"]), jnp.asarray(s["w"]))
    tdo, tvo, two = orc.anelastic_rhs_oracle(
        s["dens"], s["v"], s["w"], s["geop"], dt, s["geo"]["dz_d"],
        s["geo"]["dz_p"], s["geo"]["dx"], s["geo"]["dy"], s["cst"],
        s["mats"], s["ref"], s["dens_pos"])
    _cmp(tv, tvo, "vtend")
    _cmp(tw, two, "wtend")
    for l in range(tdo.shape[0]):
        _cmp(np.asarray(td)[l], tdo[l], f"denstend[{l}]")
