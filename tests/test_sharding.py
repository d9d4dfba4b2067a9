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


@pytest.mark.slow
def test_spatial_only_sharding_matches_single(setup):
    drv, state = setup
    ref = _run(drv, state)
    mesh = make_mesh(n_ens_shards=1, n_x_shards=8)
    out = _run(drv, state, mesh)
    for k in ("temp", "uvel", "wvel", "water_vapor"):
        assert np.allclose(np.asarray(ref[k]), np.asarray(out[k]),
                           rtol=1e-11, atol=1e-11), k


def test_extruded3d_sharded_matches_unsharded():
    """3-D extruded model under an (ens, y, x) mesh: GSPMD turns the
    periodic rolls into collective permutes over the horizontal axes — the
    3-D analog of the reference's 2-D proc-grid halo exchange
    (params.h finalize_parallel + exchange.h)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from test_extruded3d import make_pair, bcast_y
    tc, geom1, geom3, t1, t3, dens1, v1, w1, geop1 = make_pair(
        nx=16, nz=10, ny=8)
    ny, dy = geom3.ny, geom3.dy
    rng = np.random.default_rng(7)
    dens3 = bcast_y(dens1, ny, dy)
    geop3 = bcast_y(geop1, ny, dy)
    v3 = 0.3 * jnp.asarray(rng.standard_normal(
        (2, 1, geom3.nz, ny, geom3.nx)))
    w3 = 0.3 * jnp.asarray(rng.standard_normal(
        (1, geom3.nz - 1, ny, geom3.nx)))
    dt = 0.05
    ref = t3.compute_rhs(dens3, v3, w3, geop3, dt)

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("ens", "y", "x"))
    # nens=1 -> shard y and x only; replicate the (tiny) ens axis
    sh5 = NamedSharding(mesh, P(None, None, None, "y", "x"))
    sh4 = NamedSharding(mesh, P(None, None, "y", "x"))
    args = (jax.device_put(dens3, sh5), jax.device_put(v3, sh5),
            jax.device_put(w3, sh4), jax.device_put(geop3, sh4))
    out = jax.jit(lambda d, v, w, g: t3.compute_rhs(d, v, w, g, dt))(*args)
    for r, o, nm in zip(ref, out, ("dens", "v", "w")):
        # up to reduction reassociation across shards (~1e-12 relative)
        scale = float(np.abs(np.asarray(r)).max()) + 1e-30
        assert float(np.abs(np.asarray(r) - np.asarray(o)).max()) < \
            1e-9 * scale, nm
