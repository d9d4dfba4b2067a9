"""Device-mesh construction and sharding specs.

TPU-native replacement for the reference's MPI domain decomposition
(dynamics/spam/src/core/params.h:166-224 block decomposition +
exchange.h host-staged Isend/Irecv): a 2-D ``jax.sharding.Mesh`` with the
ensemble (``nens``) axis as pure data parallelism (the dominant MMF axis,
zero communication) and the horizontal x/y axes spatially sharded (halo
exchange becomes XLA collective-permutes over ICI). The vertical axis is
never sharded — column physics and vertical solves stay chip-local,
mirroring the reference's design (SURVEY.md §2.7).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENS_AXIS = "ens"
X_AXIS = "x"
Y_AXIS = "y"


def make_mesh(n_ens_shards: int = None, n_x_shards: int = 1,
              n_y_shards: int = 1, devices=None) -> Mesh:
    """Build an (ens, y, x) mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_ens_shards is None:
        n_ens_shards = n // (n_x_shards * n_y_shards)
    assert n_ens_shards * n_x_shards * n_y_shards == n, \
        (n_ens_shards, n_y_shards, n_x_shards, n)
    arr = np.array(devices).reshape(n_ens_shards, n_y_shards, n_x_shards)
    return Mesh(arr, (ENS_AXIS, Y_AXIS, X_AXIS))


def state_sharding(mesh: Mesh, state: dict) -> dict:
    """NamedSharding pytree for a coupler state dict: 3-D fields
    (nens, nz, ny, nx) sharded (ens, -, y, x); column fields (nens, ...)
    sharded on ens only."""
    def spec(arr):
        if arr.ndim == 4:
            return NamedSharding(mesh, P(ENS_AXIS, None, Y_AXIS, X_AXIS))
        if arr.ndim >= 1:
            return NamedSharding(mesh, P(ENS_AXIS))
        return NamedSharding(mesh, P())
    return {k: spec(v) for k, v in state.items()}


def shard_state(mesh: Mesh, state: dict) -> dict:
    shardings = state_sharding(mesh, state)
    return {k: jax.device_put(v, shardings[k]) for k, v in state.items()}
