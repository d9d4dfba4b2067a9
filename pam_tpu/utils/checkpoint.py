"""Checkpoint/resume for the coupler state pytree.

The reference has NO checkpoint subsystem: in MMF use the GCM feeds state
back each step, so the coupler state *is* the checkpoint surface
(SURVEY.md §5; state list = allocate_coupler_state, pam_coupler.h:255-293).
Here we persist exactly that surface: a flat dict of arrays + the grid
metadata, via orbax when available, else a .npz fallback.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp


def _paths(path: str) -> tuple[str, str]:
    """(arrays .npz path, metadata .json path) for a checkpoint name —
    the single place save and load agree on the naming scheme."""
    stem = path[:-4] if path.endswith(".npz") else path
    return stem + ".npz", stem + ".json"


def save_checkpoint(path: str, state: dict, etime: float = 0.0,
                    meta: dict = None):
    """Persist a coupler state dict (name -> array) plus metadata."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    npath, mpath = _paths(path)
    arrays = {k: np.asarray(v) for k, v in state.items()}
    np.savez_compressed(npath, **arrays)
    meta = dict(meta or {})
    meta["etime"] = float(etime)
    meta["fields"] = sorted(arrays)
    with open(mpath, "w") as f:
        json.dump(meta, f, indent=1)


def load_checkpoint(path: str, dtype=None):
    """Restore (state, etime, meta). Arrays come back as jnp arrays."""
    npath, mpath = _paths(path)
    with np.load(npath) as data:
        state = {k: jnp.asarray(data[k], dtype) for k in data.files}
    meta = {}
    if os.path.exists(mpath):
        with open(mpath) as f:
            meta = json.load(f)
    return state, float(meta.get("etime", 0.0)), meta


def save_checkpoint_orbax(path: str, state: dict):
    """Orbax-backed variant for multi-host/sharded states (each process
    writes its shards). Falls back to ValueError if orbax is unavailable."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, like: dict):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
