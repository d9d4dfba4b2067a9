"""Observability: module timers and state-diff (dirty-entry) tracing.

Parity reference: PamCoupler::run_module (pam_core/pam_coupler.h:139-160)
wraps every coupler phase with (a) yakl timers (PAM_FUNCTION_TIMERS) and
(b) DataManager dirty-entry tracing (PAM_FUNCTION_TRACE) that prints which
coupler fields each module wrote. TPU equivalents: jax.profiler /
named_scope for on-device tracing, plus a host-side wall-clock + pytree
state-diff wrapper for the coupler-level module flow.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


class ModuleTimers:
    """Accumulates wall-clock per named module (host-side, blocking) and
    exposes a run_module wrapper mirroring pam_coupler.h:139-160."""

    def __init__(self, trace: bool = False):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self.trace = trace
        self.trace_log: list[tuple[str, tuple[str, ...]]] = []

    def run_module(self, name: str, fn: Callable, state: dict) -> dict:
        """state -> state', timed; with trace=True also records which
        entries the module changed (the dirty-entry report)."""
        with jax.named_scope(name):
            t0 = time.perf_counter()
            out = fn(state)
            # sync the WHOLE pytree: blocking on one leaf can return
            # while the module's real outputs are still computing (a
            # passthrough leaf that sorts first is already materialized),
            # misattributing the cost to the NEXT module
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
        self.times[name] = self.times.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        if self.trace:
            dirty = state_diff(state, out)
            self.trace_log.append((name, dirty))
        return out

    def report(self) -> str:
        """Timer-tree style report (analog of the yakl timer printout)."""
        total = sum(self.times.values())
        lines = [f"{'module':24s} {'calls':>6s} {'total s':>10s} {'%':>6s}"]
        for k in sorted(self.times, key=self.times.get, reverse=True):
            pct = 100.0 * self.times[k] / total if total else 0.0
            lines.append(f"{k:24s} {self.counts[k]:6d} "
                         f"{self.times[k]:10.3f} {pct:6.1f}")
        return "\n".join(lines)


def state_diff(before: dict, after: dict) -> tuple[str, ...]:
    """Names of entries whose arrays changed (dirty entries,
    DataManager.h:239-271). Host-side; for debugging, not jit."""
    dirty = []
    for k in after:
        if k not in before:
            dirty.append(k)
            continue
        a, b = np.asarray(before[k]), np.asarray(after[k])
        # equal_nan: a field already containing NaN (exactly the blow-up
        # this tool debugs) must not read as dirty in EVERY module
        eq_nan = a.dtype.kind == "f" and b.dtype.kind == "f"
        if a.shape != b.shape or not np.array_equal(a, b,
                                                    equal_nan=eq_nan):
            dirty.append(k)
    return tuple(dirty)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler wrapper for device-level tracing (open the result with
    tensorboard / xprof). Analog of the yakl timer tree at device level."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def validate_state(state: dict, positive: tuple[str, ...] = ()) -> dict:
    """NaN/Inf/positivity audit (ref: DataManager validate_all,
    DataManager.h:411-466 + pam_const.h validators). Returns a report dict
    name -> list of failed checks; empty when clean. Host-side."""
    report = {}
    for k, v in state.items():
        arr = np.asarray(v)
        fails = []
        if np.isnan(arr).any():
            fails.append("nan")
        if np.isinf(arr).any():
            fails.append("inf")
        if k in positive and (arr < 0).any():
            fails.append("negative")
        if fails:
            report[k] = fails
    return report
