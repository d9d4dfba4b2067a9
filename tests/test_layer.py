"""Layer-model (SWE/TSWE) tests: conservation + vortex dynamics
(ref: dynamics/spam/src/models/layermodel.h)."""

import numpy as np
import jax
import jax.numpy as jnp

from pam_tpu.spam.layer import LayerModel, DoubleVortex, setup_double_vortex


def _run(variant, ndens, nx=32, steps=50, dt=120.0):
    tc = DoubleVortex()
    m = LayerModel(nx=nx, ny=nx, nens=1, Lx=tc.Lx, Ly=tc.Ly, g=tc.g,
                   variant=variant, ndens=ndens)
    dens, v, hs, cor = setup_double_vortex(m, tc)
    st0 = m.statistics(dens, v, hs, cor)
    step = jax.jit(lambda d, vv: m.ssprk3_step(d, vv, hs, cor, dt))
    d_, v_ = dens, v
    for _ in range(steps):
        d_, v_ = step(d_, v_)
    st1 = m.statistics(d_, v_, hs, cor)
    return m, tc, (dens, v), (d_, v_), st0, st1


def test_swe_conservation_and_stability():
    m, tc, x0, x1, st0, st1 = _run("swe", 1)
    # exact conservation of mass and circulation (flux-form + curl-form)
    assert abs(float(st1["mass"][0, 0] - st0["mass"][0, 0])) / \
        float(st0["mass"][0, 0]) < 1e-12
    assert abs(float(st1["pv"][0] - st0["pv"][0])) / \
        abs(float(st0["pv"][0])) < 1e-12
    # energy nearly conserved (EC PV flux + upwind dissipation)
    assert abs(float(st1["E"][0] - st0["E"][0])) / \
        float(st0["E"][0]) < 1e-6
    h = np.asarray(m.H2bar(x1[0])[0, 0])
    assert np.isfinite(h).all()
    # height stays near the H0 +- dh envelope
    assert 500.0 < h.min() and h.max() < 1000.0


def test_swe_vortices_rotate():
    """The vortex pair stays coherent and the flow keeps rotating: KE
    preserved within a few percent (no spurious damping/blowup)."""
    m, tc, x0, x1, st0, st1 = _run("swe", 1, nx=48, steps=200)
    ke0, ke1 = float(st0["KE"][0]), float(st1["KE"][0])
    assert 0.9 < ke1 / ke0 < 1.1
    # the height field is no longer identical (the vortices moved)
    h0 = np.asarray(m.H2bar(x0[0])[0, 0])
    h1 = np.asarray(m.H2bar(x1[0])[0, 0])
    assert np.abs(h1 - h0).max() > 1.0


def test_tswe_conservation():
    m, tc, x0, x1, st0, st1 = _run("tswe", 2)
    for k in range(2):
        assert abs(float(st1["mass"][0, k] - st0["mass"][0, k])) / \
            abs(float(st0["mass"][0, k])) < 1e-12
    assert abs(float(st1["E"][0] - st0["E"][0])) / \
        abs(float(st0["E"][0])) < 1e-6
    assert bool(jnp.isfinite(x1[0]).all())
