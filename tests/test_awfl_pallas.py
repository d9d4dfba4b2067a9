"""Fused Pallas flux kernel vs the jnp reference path.

Runs the Pallas kernel in interpreter mode on CPU (the analog of the
reference's single-process Exchange stub, SURVEY.md §4) and checks the
full dycore tendency bit-closeness between the two implementations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from pam_tpu.core import Coupler
from pam_tpu.dycore import AwflDycore, awfl_init


def _setup(dtype, ny=1):
    cpl = Coupler(nz=12, ny=ny, nx=16, nens=2, xlen=20000., ylen=20000.,
                  dtype=dtype)
    cpl = cpl.add_tracer("water_vapor")
    cpl = cpl.add_tracer("cloud_liquid", positive=True, adds_mass=True)
    zint = np.linspace(0., 10000., 13)
    state = awfl_init.init_thermal(cpl, cpl.allocate_state(zint))
    return cpl, zint, state


@pytest.mark.parametrize("ny", [1, 4])
@pytest.mark.slow
def test_pallas_flux_matches_jnp(ny):
    dtype = jnp.float32
    cpl, zint, state = _setup(dtype, ny=ny)
    dz = np.diff(zint)
    dyc_ref = AwflDycore.build(cpl, dz, use_pallas=False)
    dyc_pl = AwflDycore.build(cpl, dz, use_pallas=True)
    state = dyc_ref.declare_current_profile_as_hydrostatic(state)

    dyn, tracers = dyc_ref.coupler_to_dynamics(state)
    # give the state some structure so upwinding/limiting activate
    key = jax.random.PRNGKey(0)
    dyn = dyn.at[1:4].add(
        3.0 * jax.random.normal(key, dyn[1:4].shape, dtype))

    st_ref, tt_ref = dyc_ref.tendencies(dyn, tracers, tracers, 1.0, state)
    with pltpu.force_tpu_interpret_mode():
        st_pl, tt_pl = dyc_pl.tendencies(dyn, tracers, tracers, 1.0, state)

    # same math, different evaluation order -> tight f32 agreement
    scale = float(jnp.max(jnp.abs(st_ref)))
    np.testing.assert_allclose(np.asarray(st_pl), np.asarray(st_ref),
                               rtol=2e-5, atol=2e-5 * scale)
    tscale = float(jnp.max(jnp.abs(tt_ref))) + 1e-30
    np.testing.assert_allclose(np.asarray(tt_pl), np.asarray(tt_ref),
                               rtol=2e-5, atol=2e-5 * tscale)


@pytest.mark.slow
def test_pallas_full_timestep_runs():
    dtype = jnp.float32
    cpl, zint, state = _setup(dtype)
    dyc_pl = AwflDycore.build(cpl, np.diff(zint), use_pallas=True)
    state = dyc_pl.declare_current_profile_as_hydrostatic(state)
    with pltpu.force_tpu_interpret_mode():
        out = jax.jit(lambda s: dyc_pl.timestep(s, 2.0))(state)
    for k in ("density_dry", "uvel", "wvel", "temp"):
        assert np.isfinite(np.asarray(out[k])).all()


def test_weno_x_pallas_matches_xla_path():
    """The Pallas x-WENO edge-recon experiment (VERDICT r2 item 6) must be
    bit-identical to the XLA fused path — the kernel body reuses
    weno.weno_coefs_list, so any difference means a staging bug."""
    import numpy as np
    import jax.numpy as jnp
    from pam_tpu.ops import weno
    from pam_tpu.ops.weno_x_pallas import edge_recon_x_pallas

    ord, nx, rows = 5, 33, 96
    hs = (ord - 1) // 2
    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.standard_normal((rows, nx)), jnp.float32)
    pad = jnp.concatenate([field[:, -hs:], field, field[:, :hs]], axis=-1)
    tables = weno.weno_tables(ord, dtype=jnp.float32)

    import jax

    @jax.jit
    def xla_path(pad):
        sten = [pad[..., s:s + nx] for s in range(ord)]
        s2c, wrl, tvh, tvl, c2g, idl, sigma = tables
        aw = weno.weno_coefs_list(sten, s2c, wrl, tvh, tvl, idl, sigma)
        return (weno._eval_edge_list(aw, c2g[:, 0]),
                weno._eval_edge_list(aw, c2g[:, 1]))

    lx, rx = xla_path(pad)
    lp, rp = edge_recon_x_pallas(pad, ord=ord, interpret=True)
    # both sides are jit programs of the same math; interpret-mode Pallas
    # evaluates the identical jaxpr, so agreement is exact on CPU
    np.testing.assert_array_equal(np.asarray(lx), np.asarray(lp))
    np.testing.assert_array_equal(np.asarray(rx), np.asarray(rp))
