"""Coupled 3-D SPAM (ndims=2) — VERDICT r1 item 5.

The reference compiles the coupled extruded model at PAMC_NDIMS=2
(extrudedmodel.h ndims=2 branches + variableset.h:481-912 conversions).
Here: (a) the full MMF supercell configuration runs with ny > 1 and the
SPAM dycore, and (b) a y-degenerate 3-D coupled step (y-invariant state,
vvel = 0) reproduces the validated x-z slab coupled step exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.driver.mmf import setup_supercell_mmf
from pam_tpu.modules import gcm_forcing


def _tile_y(state, ny):
    """Tile every horizontal field of a ny=1 state along y."""
    out = {}
    for k, v in state.items():
        if getattr(v, "ndim", 0) == 4 and v.shape[2] == 1:
            out[k] = jnp.broadcast_to(v, v.shape[:2] + (ny,) + v.shape[3:])
        elif getattr(v, "ndim", 0) == 3 and v.shape[1] == 1:
            out[k] = jnp.broadcast_to(v, (v.shape[0], ny, v.shape[2]))
        else:
            out[k] = v
    return out


def test_3d_coupled_ydegenerate_matches_slab():
    # ylen chosen so dy == 1 == the slab's implicit dy: differential forms
    # then carry identical numerical scales in both layouts, which the
    # WENO epsilon-regularization (not scale-invariant) requires for exact
    # equality of the nonlinear reconstructions
    kw = dict(nx=16, nz=12, nens=2, xlen=32000.0, ylen=4.0,
              zlen=20000.0, micro="kessler", dt_gcm=80.0, dt_crm_phys=20.0,
              dycore="spam",
              dycore_kwargs={"linear_system": "pressure_gravity"})
    drv1, s1 = setup_supercell_mmf(ny=1, **kw)
    drv3, _ = setup_supercell_mmf(ny=4, **kw)
    s3 = _tile_y(s1, 4)

    out1 = jax.jit(lambda s: drv1.dycore.timestep(s, 20.0))(s1)
    out3 = jax.jit(lambda s: drv3.dycore.timestep(s, 20.0))(s3)
    for k in ("temp", "uvel", "wvel", "density_dry", "water_vapor"):
        a = np.asarray(out1[k])[:, :, 0, :]
        b = np.asarray(out3[k])
        for j in range(4):
            np.testing.assert_allclose(b[:, :, j, :], a, rtol=1e-9,
                                       atol=1e-9, err_msg=f"{k} y={j}")
    # vvel stays zero in the degenerate configuration
    assert np.abs(np.asarray(out3["vvel"])).max() < 1e-10


def test_3d_coupled_mmf_runs():
    """setup_supercell_mmf(..., ny=8, dycore='spam') runs ≥2 CRM steps
    (the VERDICT item-5 'done' criterion) with finite, physical output."""
    drv, state = setup_supercell_mmf(nx=12, ny=8, nz=12, nens=1,
                                     xlen=24000.0, ylen=16000.0,
                                     zlen=20000.0, micro="kessler",
                                     dt_gcm=80.0, dt_crm_phys=20.0,
                                     dycore="spam")
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    step = jax.jit(drv.crm_phys_step)
    for _ in range(2):
        state = step(state)
    for k in ("temp", "uvel", "vvel", "wvel", "water_vapor"):
        assert np.isfinite(np.asarray(state[k])).all(), k
    assert 150.0 < np.asarray(state["temp"]).min()
    assert np.asarray(state["temp"]).max() < 330.0
    assert np.abs(np.asarray(state["wvel"])).max() < 30.0
