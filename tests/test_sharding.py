"""Multi-device sharding equivalence tests on a virtual 8-device CPU mesh.

Our analog of the reference's single-process Exchange loopback fake
(exchange.h:434 exchange_direct; SURVEY.md §4): the sharded computation must
produce bit-identical (up to reduction reassociation) results to the
unsharded one, with XLA inserting the halo collectives.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pam_tpu.driver.mmf import setup_supercell_mmf
from pam_tpu.modules import gcm_forcing
from pam_tpu.parallel.mesh import make_mesh, state_sharding


@pytest.fixture(scope="module")
def setup():
    drv, state = setup_supercell_mmf(nx=16, ny=1, nz=12, nens=4,
                                     xlen=32000.0, ylen=64000.0,
                                     zlen=20000.0, micro="kessler",
                                     dt_gcm=80.0, dt_crm_phys=20.0)
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    return drv, state


def _run(drv, state, mesh=None):
    if mesh is None:
        step = jax.jit(drv.crm_phys_step)
        return step(state)
    sh = state_sharding(mesh, state)
    state = {k: jax.device_put(v, sh[k]) for k, v in state.items()}
    step = jax.jit(drv.crm_phys_step, in_shardings=(sh,), out_shardings=sh)
    return step(state)


def test_ensemble_sharding_matches_single(setup):
    drv, state = setup
    ref = _run(drv, state)
    mesh = make_mesh(n_ens_shards=4, n_x_shards=2)
    out = _run(drv, state, mesh)
    for k in ("temp", "uvel", "wvel", "water_vapor"):
        assert np.allclose(np.asarray(ref[k]), np.asarray(out[k]),
                           rtol=1e-11, atol=1e-11), k


def test_spatial_only_sharding_matches_single(setup):
    drv, state = setup
    ref = _run(drv, state)
    mesh = make_mesh(n_ens_shards=1, n_x_shards=8)
    out = _run(drv, state, mesh)
    for k in ("temp", "uvel", "wvel", "water_vapor"):
        assert np.allclose(np.asarray(ref[k]), np.asarray(out[k]),
                           rtol=1e-11, atol=1e-11), k
