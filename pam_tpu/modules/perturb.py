"""Seeded temperature perturbations to break CRM ensemble symmetry.

Parity reference: pam_core/modules/perturb_temperature.h — uniform noise in
the bottom nz/4 levels, amplitude tapered with height, then a per-level
multiplicative rescale so the horizontal-mean temperature (energy) is
conserved. The counter-based yakl::Random is replaced by jax.random with a
per-ensemble fold-in (reproducible, parallel-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.coupler import Coupler, hmean


def perturb_temperature(coupler: Coupler, state, seeds, magnitude: float = 0.1):
    """Ref: perturb_temperature, perturb_temperature.h:10-64.

    Args:
      seeds: (nens,) int array — per-CRM seed (globally unique per batch).
    """
    out = dict(state)
    nz = coupler.nz
    num_levels = nz // 4
    temp = state["temp"]
    hmean1 = hmean(temp)

    def one_member(seed):
        key = jax.random.PRNGKey(seed)
        return jax.random.uniform(
            key, (nz, coupler.ny, coupler.nx), temp.dtype, -1.0, 1.0)

    rand = jax.vmap(one_member)(jnp.asarray(seeds))
    k = jnp.arange(nz)
    scaling = jnp.where(k < num_levels,
                        (num_levels - k.astype(temp.dtype)) / num_levels, 0.0)
    temp = temp + rand * magnitude * scaling[None, :, None, None]
    # per-level conservation rescale (ref: perturb_temperature.h:57-61)
    hmean2 = hmean(temp)
    ratio = jnp.where((k < num_levels)[None, :], hmean1 / hmean2, 1.0)
    out["temp"] = temp * ratio[:, :, None, None]
    return out
