"""Anelastic SPAM tests (ref: hamiltonians/anelastic.h +
AnelasticLinearSystem, extrudedmodel.h:3245-3520)."""

import numpy as np
import jax
import jax.numpy as jnp

from pam_tpu.spam.geometry import ExtrudedGeometry
from pam_tpu.spam.thermo import IdealGasPottemp
from pam_tpu.spam.varset import VariableSet
from pam_tpu.spam.testcases import RisingBubble, project_n1form
from pam_tpu.spam import si
from pam_tpu.spam import operators as op
import pytest

from pam_tpu.spam.anelastic import (AnelasticPressureSolver,
                                    AnelasticTendencies, project_initial)


def _setup(nx=32, nz=24):
    tc = RisingBubble()
    zint = np.linspace(0, tc.Lz, nz + 1)
    geom = ExtrudedGeometry.build(nx, zint, tc.Lx, nens=1,
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
    # anelastic IC: rho = refrho exactly (extrudedmodel.h:5344-5347)
    dens_rho = J(np.broadcast_to(np.asarray(ref["dens"][0])[:, :, None],
                                 (1, nz, nx)).copy())
    dens_S = J(project_n1form(
        lambda x, z: tc.refrho_f(z, thermo) * tc.entropicvar_f(x, z, thermo),
        geom))
    geop = J(project_n1form(lambda x, z: tc.g * z, geom))
    dens = jnp.stack([dens_rho, dens_S])
    v = jnp.zeros((1, nz, nx))
    w = jnp.zeros((1, nz - 1, nx))
    return tc, geom, ref, psolver, tend, dens, v, w, geop


def _constraint(geom, ref, v, w):
    nz = geom.nz
    J = jnp.asarray
    F = op.H10(v, geom) * J(ref["rho_pi"])[:, :, None]
    dzp = J(geom.dz_p)[:, :, None]
    FW_in = w * (geom.dx / dzp) * J(ref["rho_di"])[:, 1:nz, None]
    zr = jnp.zeros_like(FW_in[:, :1, :])
    FW = jnp.concatenate([zr, FW_in, zr], axis=1)
    mf = (jnp.roll(F, -1, axis=-1) - F) + (FW[:, 1:] - FW[:, :-1])
    return float(jnp.abs(mf).max())


def test_projection_enforces_constraint():
    tc, geom, ref, psolver, tend, dens, v, w, geop = _setup()
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal(v.shape))
    w = jnp.asarray(rng.standard_normal(w.shape))
    scale0 = _constraint(geom, ref, v, w)
    v2, w2 = project_initial(psolver, v, w)
    assert _constraint(geom, ref, v2, w2) < 1e-10 * scale0
    # projecting twice is idempotent
    v3, w3 = project_initial(psolver, v2, w2)
    assert float(jnp.abs(v3 - v2).max()) < 1e-10


def test_tendency_is_divergence_free():
    tc, geom, ref, psolver, tend, dens, v, w, geop = _setup()
    fd, fv, fw = tend.compute_rhs(dens, v, w, geop, 1.0)
    assert _constraint(geom, ref, -fv, -fw) < 1e-10
    # mass density has no tendency (VS_AN prognostic=1)
    assert float(jnp.abs(fd[0]).max()) == 0.0


def test_anelastic_bubble_rises_beyond_acoustic_cfl():
    """dt=2s is ~50x the compressible acoustic limit; the anelastic bubble
    rises with compressible-like w and conserved entropy."""
    tc, geom, ref, psolver, tend, dens, v, w, geop = _setup()
    v, w = project_initial(psolver, v, w)
    dt = 2.0
    step = jax.jit(lambda d_, v_, w_: tend.ssprk3_step(d_, v_, w_, geop, dt))
    s0 = float(dens[1].sum())
    d_, v_, w_ = dens, v, w
    for _ in range(100):   # 200 s
        d_, v_, w_ = step(d_, v_, w_)
    assert bool(jnp.isfinite(d_).all())
    assert abs(float(d_[1].sum()) - s0) / s0 < 1e-12
    # rho pinned up to SSPRK convex-combination roundoff
    assert float(jnp.abs(d_[0] - dens[0]).max()) < 1e-9
    assert _constraint(geom, ref, v_, w_) < 1e-10
    dzp = float(np.asarray(geom.dz_p).mean())
    maxw = float(jnp.max(jnp.abs(w_))) / dzp
    assert 0.3 < maxw < 5.0
    # bubble risen: upward S-perturbation center of mass
    sp0 = np.maximum(np.asarray(dens[1] / dens[0]) -
                     np.asarray(ref["q_pi"][1])[:, :, None], 0)[0]
    sp1 = np.maximum(np.asarray(d_[1] / d_[0]) -
                     np.asarray(ref["q_pi"][1])[:, :, None], 0)[0]
    zmid = 0.5 * (np.asarray(geom.zint_d)[0, 1:] +
                  np.asarray(geom.zint_d)[0, :-1])
    com0 = (sp0.sum(1) * zmid).sum() / sp0.sum()
    com1 = (sp1.sum(1) * zmid).sum() / sp1.sum()
    assert com1 > com0 + 30.0


@pytest.mark.slow
def test_si_fixed_matches_explicit():
    """SIFixedTimeIntegrator (SI_Fixed.h): the fixed-point SI step on the
    anelastic system agrees with fine-dt explicit SSPRK3."""
    from pam_tpu.driver.standalone import run_idealized
    cfg = dict(init_data="risingbubble", hamil="an", crm_nx=12, crm_nz=12,
               sim_time=60.0, tstype="si_fixed", dtcrm=5.0, out_prefix=None)
    dens, v, w = run_idealized(cfg, verbose=False)
    assert np.isfinite(np.asarray(dens)).all()
    cfg2 = dict(cfg, tstype="ssprk3", dtcrm=1.0)
    d2, _, _ = run_idealized(cfg2, verbose=False)
    err = float(np.abs(np.asarray(dens[1]) - np.asarray(d2[1])).max() /
                np.abs(np.asarray(d2[1])).max())
    assert err < 1e-5, err
