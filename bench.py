"""Benchmark: supercell CRM throughput (grid-points·steps/s per chip).

Runs the flagship MMF configuration (65x1x50 cells per CRM — the reference's
production config, inputs/input_pamc.yaml — batched over an ensemble sized to
fill the chip) and reports CRM-physics-step throughput.

Two configurations are measured by default:
  1. the production physics stack micro=p3, sgs=shoc (the reference CI
     config, inputs/ci/input_pamc.yaml) — emitted FIRST;
  2. the Kessler config benched since round 1 — emitted LAST (the line of
     record; comparable with BENCH_BASELINE.json across rounds).
Each is ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline caveat (carried in the JSON "baseline_note"): the reference
publishes no performance numbers and cannot run in this image (BASELINE.md),
so vs_baseline divides by this project's OWN round-1 TPU measurement stored
in ``BENCH_BASELINE.json`` — it is a cross-round progress ratio, not a
reference comparison. Absolute anchors (ms/step) are included per line.

Setting PAM_BENCH_MICRO/PAM_BENCH_SGS/PAM_BENCH_DYCORE/... runs only that
single configuration (the pre-round-3 behavior).
"""

import json
import os
import sys
import time

BASELINE_NOTE = ("vs_baseline divides by this project's round-1 TPU "
                 "measurement (BENCH_BASELINE.json), not a reference-code "
                 "number: the reference publishes none and cannot run here")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    # persistent compilation cache: repeat bench runs skip the (long)
    # XLA compile of the fused CRM step
    cache_dir = os.environ.get("PAM_JAX_CACHE",
                               os.path.join(os.path.dirname(
                                   os.path.abspath(__file__)),
                                   ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:  # older jax: ignore
        log(f"compilation cache unavailable: {e}")

    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.modules import gcm_forcing

    nx, ny, nz = 65, 1, 50
    nens = int(os.environ.get("PAM_BENCH_NENS", "128"))
    n_crm_steps = int(os.environ.get("PAM_BENCH_STEPS", "60"))
    # PAM-C (SPAM + semi-implicit) is the reference's production MMF dycore
    # (inputs/input_pamc.yaml); PAM_BENCH_DYCORE=awfl benches PAM-A instead.
    # PAM_BENCH_MICRO=p3 PAM_BENCH_SGS=shoc benches the full production
    # physics stack (the reference CI config inputs/ci/input_pamc.yaml).
    dycore = os.environ.get("PAM_BENCH_DYCORE", "spam")
    linsys = os.environ.get("PAM_BENCH_LINSYS", "velocity")
    # PAM_BENCH_TWOPOINT=1 enables the reference's (off-by-default) exact
    # two-point discrete gradient (si_two_point_discrete_gradient)
    two_point = os.environ.get("PAM_BENCH_TWOPOINT", "0") == "1"
    dycore_kwargs = ({"linear_system": linsys, "si_two_point": two_point}
                     if dycore == "spam" else None)

    log(f"devices: {jax.devices()}")

    # PAM_BENCH_KESSLER_CHUNK=<n>: per-chunk rainsplit CFL sub-cycling
    # (KesslerMicro.ens_chunk — measured neutral; kept as a knob)
    kess_chunk = os.environ.get("PAM_BENCH_KESSLER_CHUNK")
    micro_kwargs = ({"ens_chunk": int(kess_chunk)} if kess_chunk else None)
    # PAM_BENCH_ENS_MICROBATCH=<chunk>: run the CRM step in sequential
    # VMEM-sized ensemble micro-batches (crm_phys_step_microbatched) —
    # the large-nens residency fix
    mb = os.environ.get("PAM_BENCH_ENS_MICROBATCH")
    mb = int(mb) if mb else None

    def run_config(micro, sgs, run_nens=None, chunk=None):
        run_nens = run_nens or nens
        drv_nens = chunk if chunk else (mb if mb else run_nens)
        drv, state = setup_supercell_mmf(
            nx=nx, ny=ny, nz=nz, nens=drv_nens, xlen=128000.0,
            ylen=64000.0, zlen=20000.0, micro=micro, sgs=sgs, dt_gcm=900.0,
            dt_crm_phys=20.0, dycore=dycore, dtype=jnp.float32,
            dycore_kwargs=dycore_kwargs,
            micro_kwargs=micro_kwargs if micro == "kessler" else None)
        if drv_nens != run_nens:
            # chunk-sized driver + full-ensemble state; crm_phys_step
            # auto-routes through the micro-batched path (driver/mmf.py)
            _, state = setup_supercell_mmf(
                nx=nx, ny=ny, nz=nz, nens=run_nens, xlen=128000.0,
                ylen=64000.0, zlen=20000.0, micro=micro, sgs=sgs,
                dt_gcm=900.0, dt_crm_phys=20.0, dycore=dycore,
                dtype=jnp.float32, dycore_kwargs=dycore_kwargs)
        state = gcm_forcing.compute_gcm_forcing_tendencies(
            drv.coupler, state, drv.dt_gcm)

        step = jax.jit(drv.crm_phys_step)
        t0 = time.time()
        state = step(state)
        jax.block_until_ready(state["temp"])
        log(f"[micro={micro} sgs={sgs}] compile+first step: "
            f"{time.time()-t0:.1f}s")

        for _ in range(3):  # warmup
            state = step(state)
        jax.block_until_ready(state["temp"])

        t0 = time.time()
        s = state
        for _ in range(n_crm_steps):
            s = step(s)
        jax.block_until_ready(s["temp"])
        elapsed = time.time() - t0

        if not bool(np.isfinite(np.asarray(s["temp"])).all()):
            log("ERROR: non-finite state after benchmark run")
            sys.exit(1)

        gridpoints = nx * ny * nz * run_nens
        value = gridpoints * n_crm_steps / elapsed
        log(f"[micro={micro} sgs={sgs} nens={run_nens} drv={drv_nens}] "
            f"{n_crm_steps} CRM steps x {gridpoints} pts in {elapsed:.3f}s")
        return value, elapsed / n_crm_steps * 1e3

    def emit(value, ms_step, micro, sgs, vs_baseline=None, extra=""):
        rec = {
            "metric": "supercell CRM grid-points*steps/s per chip",
            "value": round(value, 1),
            "unit": "gridpoint-steps/s",
            "config": f"micro={micro},sgs={sgs},dycore={dycore}" + extra,
            "ms_per_step": round(ms_step, 2),
        }
        if vs_baseline is not None:
            rec["vs_baseline"] = round(vs_baseline, 3)
            rec["baseline_note"] = BASELINE_NOTE
        print(json.dumps(rec))

    vs_baseline = 1.0
    base_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")

    def baseline_ratio(value):
        if os.path.exists(base_path):
            try:
                base = json.load(open(base_path))
                if base.get("value"):
                    return value / base["value"]
            except Exception:
                pass
        return 1.0

    if "PAM_BENCH_MICRO" in os.environ or "PAM_BENCH_SGS" in os.environ:
        # explicit single-config run
        micro = os.environ.get("PAM_BENCH_MICRO", "kessler")
        sgs = os.environ.get("PAM_BENCH_SGS", "none")
        value, ms = run_config(micro, sgs)
        emit(value, ms, micro, sgs, baseline_ratio(value)
             if (micro, sgs) == ("kessler", "none") else None)
        return

    # default: production physics first, then the line of record (LAST —
    # the driver parses the final JSON line; it stays comparable with
    # BENCH_BASELINE.json across rounds)
    v_p3, ms_p3 = run_config("p3", "shoc")
    # production-regime ensemble lines of record (VERDICT r3 item 5):
    # nens=512 with the auto-selected VMEM-resident chunk
    from pam_tpu.driver.mmf import pick_ens_chunk
    big = int(os.environ.get("PAM_BENCH_NENS_BIG", "512"))
    ck = pick_ens_chunk(nx, ny, nz, jnp.float32, big)
    v_p3b, ms_p3b = run_config("p3", "shoc", run_nens=big, chunk=ck)
    v_kb, ms_kb = run_config("kessler", "none", run_nens=big, chunk=ck)
    v_k, ms_k = run_config("kessler", "none")
    emit(v_p3, ms_p3, "p3", "shoc")
    emit(v_p3b, ms_p3b, "p3", "shoc",
         extra=f",nens={big},ens_chunk={ck}")
    emit(v_kb, ms_kb, "kessler", "none",
         extra=f",nens={big},ens_chunk={ck}")
    emit(v_k, ms_k, "kessler", "none", baseline_ratio(v_k))


if __name__ == "__main__":
    main()
