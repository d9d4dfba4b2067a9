"""Per-SOURCE-LINE device-time budget of the benched CRM step.

Joins a device trace ('XLA Ops' timeline, tools/trace_ops.py methodology)
with the compiled HLO's metadata (source_file:source_line per op), giving
the budget PER REPO SOURCE LINE instead of per XLA op group — the
round-5 methodology behind PERF.md's evidence-tagged breakdown. Ops
without metadata (async copy/slice completions are mapped to their
-start op; the remainder is mostly parameter/result copies) are
reported as one 'unattributed' row.

Usage:
  python tools/line_budget.py                      # kessler config
  PAM_BENCH_MICRO=p3 PAM_BENCH_SGS=shoc python tools/line_budget.py

Writes PERF_linetable_<micro>_<sgs>.json at the repo root.
"""

import json
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_ops import collect_device_events  # noqa: E402


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
    nsteps = int(os.environ.get("PAM_TRACE_STEPS", "5"))
    drv, state = setup_supercell_mmf(
        nx=65, ny=1, nz=50, nens=nens, xlen=128000.0, ylen=64000.0,
        zlen=20000.0, micro=micro, sgs=sgs, dt_gcm=900.0, dt_crm_phys=20.0,
        dycore="spam", dtype=jnp.float32,
        dycore_kwargs={"linear_system": "velocity"})
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    step = jax.jit(drv.crm_phys_step)

    # opname -> src from the compiled HLO metadata
    txt = step.lower(state).compile().as_text()
    hlo_meta = {}
    pat = re.compile(
        r"%(\S+) = .*?metadata=\{op_name=\"[^\"]*\".*?"
        r"source_file=\"([^\"]*)\" source_line=(\d+)")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for line in txt.splitlines():
        m = pat.search(line)
        if m:
            src = m.group(2)
            base = os.path.relpath(src, start=repo_root) \
                if src.startswith(repo_root) else os.path.basename(src)
            hlo_meta[m.group(1)] = f"{base}:{m.group(3)}"
    if not hlo_meta:
        # fail LOUDLY: with zero parsed metadata every event would land
        # in "unattributed" and the committed artifact would be silently
        # empty (e.g. if an XLA upgrade changes the HLO text format)
        raise RuntimeError(
            "line_budget: parsed 0 op->source mappings from the compiled "
            "HLO text — the metadata regex no longer matches this XLA's "
            "format; fix the pattern before trusting any budget output")

    for _ in range(20):
        state = step(state)
    jax.block_until_ready(state["temp"])
    tdir = tempfile.mkdtemp(prefix="pam_linebudget_")
    jax.profiler.start_trace(tdir)
    s = state
    for _ in range(nsteps):
        s = step(s)
    jax.block_until_ready(s["temp"])
    jax.profiler.stop_trace()

    events = collect_device_events(tdir)
    by_line = defaultdict(lambda: [0.0, 0])
    unattr = [0.0, 0]
    for name, dur, cnt in events:
        op = name.split(" = ")[0].lstrip("%")
        key = hlo_meta.get(op) or hlo_meta.get(op.replace("-done", "-start"))
        if key is None:
            unattr[0] += dur
            unattr[1] += cnt
            continue
        by_line[key][0] += dur
        by_line[key][1] += cnt
    total = sum(d for _, d, _ in events)
    rows = sorted(by_line.items(), key=lambda kv: -kv[1][0])
    print(f"device {total / nsteps / 1e3:.2f} ms/step; unattributed "
          f"{unattr[0] / nsteps / 1e3:.2f} ms ({unattr[1] / nsteps:.0f} ops)")
    print(f"{'source line':52s} {'us/step':>9s} {'%':>5s} {'ops':>6s}")
    out_rows = []
    for key, (dur, cnt) in rows:
        out_rows.append(dict(line=key, us_per_step=round(dur / nsteps, 1),
                             pct=round(100 * dur / total, 2),
                             ops_per_step=cnt / nsteps))
        if dur / total > 0.004:
            print(f"{key:52s} {dur / nsteps:9.1f} {100 * dur / total:5.1f} "
                  f"{cnt / nsteps:6.1f}")

    outp = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"PERF_linetable_{micro}_{sgs}.json")
    with open(outp, "w") as f:
        json.dump(dict(config=f"micro={micro},sgs={sgs}", nens=nens,
                       device_ms_per_step=round(total / nsteps / 1e3, 3),
                       unattributed_ms=round(unattr[0] / nsteps / 1e3, 3),
                       rows=out_rows[:120]), f, indent=1)
    print(f"wrote {outp}")


if __name__ == "__main__":
    main()
