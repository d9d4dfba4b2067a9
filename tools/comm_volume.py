"""Per-step communication accounting for the sharded CRM step.

Compiles the SPAM+SI (and AWFL) CRM physics step at 1/2/4/8-way x-sharding
on the virtual CPU device mesh, and reports, from the compiled HLO, the
count and output bytes of every collective op — for BOTH the explicit
shard_map/ppermute path (pam_tpu.parallel.sharded_step) and the GSPMD-auto
path (plain jit of sharded arrays). This is the measurement artifact asked
for by BASELINE.json / VERDICT r1 item 1; results are recorded in
SCALING.md.

Usage:  python tools/comm_volume.py [--nx 64] [--nz 50] [--nens 8]
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

_DTYPE_BYTES = {"f16": 2, "bf16": 2, "f32": 4, "f64": 8, "c64": 8,
                "c128": 16, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
                "pred": 1, "s64": 8, "u64": 8}

_COLLECTIVES = ("collective-permute", "all-to-all", "all-gather",
                "all-reduce", "reduce-scatter")


def _shape_bytes(shape_str):
    """bytes of one HLO shape string like 'f64[8,12,16]' or a tuple."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_stats(hlo_text):
    """{op: {count, bytes}} from compiled HLO, out-shape bytes per call."""
    stats = {op: {"count": 0, "bytes": 0} for op in _COLLECTIVES}
    for line in hlo_text.splitlines():
        for op in _COLLECTIVES:
            if re.search(rf"\b{op}(\.\d+)?\(", line) and "=" in line:
                shape = line.split("=", 1)[1].strip().split(" ")[0]
                stats[op]["count"] += 1
                stats[op]["bytes"] += _shape_bytes(shape)
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--ny", type=int, default=1)
    ap.add_argument("--nz", type=int, default=50)
    ap.add_argument("--nens", type=int, default=8)
    ap.add_argument("--dycore", default="spam")
    ap.add_argument("--micro", default="kessler")
    ap.add_argument("--sgs", default="none")
    args = ap.parse_args()

    from jax.sharding import NamedSharding, PartitionSpec as P
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.modules import gcm_forcing
    from pam_tpu.parallel.mesh import make_mesh
    from pam_tpu.parallel.sharded_step import sharded_crm_step

    drv, state = setup_supercell_mmf(
        nx=args.nx, ny=args.ny, nz=args.nz, nens=args.nens,
        xlen=2000.0 * args.nx, ylen=2000.0 * max(args.ny, 32),
        zlen=20000.0, micro=args.micro, sgs=args.sgs,
        dt_gcm=80.0, dt_crm_phys=20.0, dycore=args.dycore)
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)

    results = []
    for n_x in (1, 2, 4, 8):
        n_ens = 8 // n_x
        mesh = make_mesh(n_ens_shards=n_ens, n_x_shards=n_x)

        # --- explicit shard_map path ---
        step, place = sharded_crm_step(drv, mesh)
        placed = place(state)
        txt = jax.jit(step).lower(placed).compile().as_text()
        ex = collective_stats(txt)

        # --- GSPMD-auto path (round-1 behavior) ---
        def sh(v):
            nd = getattr(v, "ndim", 0)
            if nd == 4:
                return NamedSharding(mesh, P("ens", None, None, "x"))
            if nd == 3:
                return NamedSharding(mesh, P("ens", None, "x"))
            if nd >= 1:
                return NamedSharding(mesh, P("ens"))
            return NamedSharding(mesh, P())
        placed_a = {k: jax.device_put(v, sh(v)) for k, v in state.items()}
        txt_a = jax.jit(drv.crm_phys_step).lower(placed_a).compile().as_text()
        auto = collective_stats(txt_a)

        results.append({"x_shards": n_x, "ens_shards": n_ens,
                        "explicit": ex, "gspmd_auto": auto})
        tot = lambda s: (sum(v["count"] for v in s.values()),
                         sum(v["bytes"] for v in s.values()))
        print(f"x={n_x} ens={n_ens}: explicit {tot(ex)} "
              f"auto {tot(auto)}", file=sys.stderr)

    print(json.dumps({"config": vars(args), "results": results}, indent=1))


if __name__ == "__main__":
    main()
