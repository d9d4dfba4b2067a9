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


def save_checkpoint(path: str, state: dict, etime: float = 0.0,
                    meta: dict = None):
    """Persist a coupler state dict (name -> array) plus metadata."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {k: np.asarray(v) for k, v in state.items()}
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **arrays)
    meta = dict(meta or {})
    meta["etime"] = float(etime)
    meta["fields"] = sorted(arrays)
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
    with open(mpath, "w") as f:
        json.dump(meta, f, indent=1)


def load_checkpoint(path: str, dtype=None):
    """Restore (state, etime, meta). Arrays come back as jnp arrays."""
    npath = path if path.endswith(".npz") else path + ".npz"
    with np.load(npath) as data:
        state = {k: jnp.asarray(data[k], dtype) for k in data.files}
    mpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
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
