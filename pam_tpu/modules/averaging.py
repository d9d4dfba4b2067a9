"""Horizontal and running-time averaging of coupler fields.

Parity reference: pam_core/modules/{horizontal_average.h, time_average.h}.
NOTE: both reference files contain syntax errors and are not compiled
anywhere (SURVEY.md §2.1 — `r_ncol` undeclared at horizontal_average.h:70;
missing semicolon at time_average.h:67); these are working re-derivations
of their documented intent.
"""

from __future__ import annotations

import jax.numpy as jnp


def horizontal_average(coupler, state, var_names):
    """For each named field, store its horizontal mean as
    ``<name>_horizontal_average`` in the state. Fields are the coupler's
    (nens, nz, ny, nx) layout; the average is over (ny, nx), yielding
    (nens, nz) columns (ref intent: horizontal_average.h:25-80). The mean
    is shard-aware (comm.pmean_h): inside the explicit shard_map mode it
    spans the whole CRM, not the local shard."""
    from ..parallel import comm
    out = dict(state)
    for name in var_names:
        out[name + "_horizontal_average"] = comm.pmean_h(state[name],
                                                         (-2, -1))
    return out


def time_average(coupler, state, var_names, dt, window):
    """Exponential-free running average: accumulates
    ``<name>_time_average`` over a window of total length ``window``;
    call once per step of size ``dt``. The accumulator convention follows
    time_average.h:39-70 (accumulate var*dt/window; caller resets by
    zeroing the accumulator at window boundaries)."""
    out = dict(state)
    w = dt / window
    for name in var_names:
        key = name + "_time_average"
        acc = state.get(key, jnp.zeros_like(state[name]))
        out[key] = acc + state[name] * w
    return out


def reset_time_average(state, var_names):
    """Zero the running accumulators at a window boundary."""
    out = dict(state)
    for name in var_names:
        key = name + "_time_average"
        if key in out:
            out[key] = jnp.zeros_like(out[key])
    return out
