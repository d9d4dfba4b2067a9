"""Capture a device trace of the benched CRM step and print a per-op table.

This is the auditable artifact behind PERF.md's roofline claims: it traces
N steps of the selected configuration (PAM_BENCH_MICRO/PAM_BENCH_SGS env,
default kessler/none), aggregates XLA op time on the device timeline, and
writes a JSON op-table to PERF_optable_<config>.json at the repo root.

Usage:
  python tools/trace_ops.py                      # kessler config
  PAM_BENCH_MICRO=p3 PAM_BENCH_SGS=shoc python tools/trace_ops.py

The table groups ops by their XLA fusion/op name prefix (e.g. 'fusion',
'while', 'all-reduce') and also prints the top individual ops per step.
"""

import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_device_events(trace_dir):
    """Parse the xplane proto(s) under trace_dir; return a list of
    (name, total_duration_us, count) summed over the device planes."""
    from jax.profiler import ProfileData
    paths = []
    for root, _, files in os.walk(trace_dir):
        for f in files:
            if f.endswith(".xplane.pb"):
                paths.append(os.path.join(root, f))
    agg = defaultdict(lambda: [0.0, 0])
    for p in paths:
        data = ProfileData.from_file(p)
        for plane in data.planes:
            pname = plane.name.lower()
            if not ("tpu" in pname or "device" in pname or "/gpu" in pname):
                continue
            if "host" in pname:
                continue
            for line in plane.lines:
                # the synchronous compute queue only: 'XLA Ops'. The
                # 'Async XLA Ops' line carries DMA spans that OVERLAP
                # compute (their durations double-count wall time).
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    dur_us = ev.duration_ns / 1e3
                    agg[ev.name][0] += dur_us
                    agg[ev.name][1] += 1
    return [(k, v[0], v[1]) for k, v in agg.items()]


def group_key(name):
    """Aggregate key: strip trailing .N / digits from the op name."""
    base = name.split(".")[0]
    return re.sub(r"[0-9]+$", "", base)


def main():
    import jax
    import jax.numpy as jnp
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.modules import gcm_forcing

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    nens = int(os.environ.get("PAM_BENCH_NENS", "128"))
    micro = os.environ.get("PAM_BENCH_MICRO", "kessler")
    sgs = os.environ.get("PAM_BENCH_SGS", "none")
    nsteps = int(os.environ.get("PAM_TRACE_STEPS", "10"))
    spinup = int(os.environ.get("PAM_PROF_SPINUP", "20"))
    drv, state = setup_supercell_mmf(
        nx=65, ny=1, nz=50, nens=nens, xlen=128000.0, ylen=64000.0,
        zlen=20000.0, micro=micro, sgs=sgs, dt_gcm=900.0, dt_crm_phys=20.0,
        dycore="spam", dtype=jnp.float32,
        dycore_kwargs={"linear_system": "velocity"})
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    print(f"devices: {jax.devices()}  nens={nens} micro={micro} sgs={sgs}")
    step = jax.jit(drv.crm_phys_step)
    for _ in range(spinup):
        state = step(state)
    jax.block_until_ready(state)

    t0 = time.perf_counter()
    for _ in range(nsteps):
        state = step(state)
    jax.block_until_ready(state)
    wall_ms = (time.perf_counter() - t0) / nsteps * 1e3

    tdir = tempfile.mkdtemp(prefix="pam_trace_")
    jax.profiler.start_trace(tdir)
    s = state
    for _ in range(nsteps):
        s = step(s)
    jax.block_until_ready(s)
    jax.profiler.stop_trace()

    events = collect_device_events(tdir)
    total_us = sum(d for _, d, _ in events)
    print(f"\nwall/step: {wall_ms:.2f} ms;  device op time/step: "
          f"{total_us / nsteps / 1e3:.2f} ms  ({len(events)} distinct ops)")

    groups = defaultdict(lambda: [0.0, 0])
    for name, dur, cnt in events:
        g = groups[group_key(name)]
        g[0] += dur
        g[1] += cnt
    print(f"\n{'op group':28s} {'us/step':>10s} {'%':>6s} {'count/step':>11s}")
    rows = []
    for name, (dur, cnt) in sorted(groups.items(), key=lambda kv: -kv[1][0]):
        pct = 100.0 * dur / total_us if total_us else 0.0
        rows.append(dict(group=name, us_per_step=round(dur / nsteps, 1),
                         pct=round(pct, 1), count_per_step=cnt / nsteps))
        if pct >= 0.3:
            print(f"{name:28s} {dur / nsteps:10.1f} {pct:6.1f} "
                  f"{cnt / nsteps:11.1f}")

    print(f"\ntop individual ops ({'us/step'}):")
    top = sorted(events, key=lambda e: -e[1])[:25]
    for name, dur, cnt in top:
        print(f"  {dur / nsteps:8.1f}  x{cnt / nsteps:5.1f}  {name[:90]}")

    out = dict(config=f"micro={micro},sgs={sgs}", nens=nens,
               wall_ms_per_step=round(wall_ms, 3),
               device_ms_per_step=round(total_us / nsteps / 1e3, 3),
               groups=rows,
               top_ops=[dict(name=n, us_per_step=round(d / nsteps, 1),
                             count_per_step=c / nsteps) for n, d, c in top])
    outp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"PERF_optable_{micro}_{sgs}.json")
    with open(outp, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {outp}")


if __name__ == "__main__":
    main()
