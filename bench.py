"""Benchmark: supercell CRM throughput (grid-points·steps/s per chip).

Runs the flagship MMF configuration (65x1x50 cells per CRM — the reference's
production config, inputs/input_pamc.yaml — batched over an ensemble sized to
fill the chip) and reports CRM-physics-step throughput.

Six rows are measured by default (VERDICT r4 item 2 — the drift-proof
artifact of record):
  1. production physics stack micro=p3, sgs=shoc, nens=128 (the reference
     CI config, inputs/ci/input_pamc.yaml);
  2. p3+shoc at nens=512 through HOST-dispatched ensemble micro-batching
     (the round-5 production path: faster than the in-jit barrier chain
     and compile-bounded at the single-chunk cost — driver/mmf.py
     crm_phys_step_hostchunked, measured in tools/mb_host_bench.py);
  3. p3+shoc at nens=1024, same path (PAM_BENCH_NENS_BIG2=0 skips);
  4. kessler at nens=512, same path;
  5. the PAM-A (AWFL) dycore on the kessler config;
  6. the Kessler config benched since round 1 — emitted LAST (the line of
     record; comparable with BENCH_BASELINE.json across rounds).
Each is ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Drift-proofing (PERF.md round-4 methodology note): the axon-tunnel dispatch
drifts ±1 ms session-to-session, so each config runs ``PAM_BENCH_REPS``
(default 3) timed repetitions in ONE session and the row of record carries
the BEST wall ms/step (value is derived from it), the MEDIAN, and the traced
DEVICE op-time per step ('XLA Ops' timeline only — async DMA spans overlap
compute and would double count).

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
import statistics
import sys
import tempfile
import time

BASELINE_NOTE = ("vs_baseline divides by this project's round-1 TPU "
                 "measurement (BENCH_BASELINE.json), not a reference-code "
                 "number: the reference publishes none and cannot run here")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def device_ms_per_step(step, state, nsteps, sync):
    """Traced device op time per step, ms ('XLA Ops' timeline only; the
    'Async XLA Ops' line carries DMA spans that OVERLAP compute —
    tools/trace_ops.collect_device_events is the single implementation
    of that methodology). Returns None if tracing fails."""
    import jax
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    tdir = None
    try:
        from trace_ops import collect_device_events
        tdir = tempfile.mkdtemp(prefix="pam_bench_trace_")
        jax.profiler.start_trace(tdir)
        try:
            s = state
            for _ in range(nsteps):
                s = step(s)
            sync(s)
        finally:
            jax.profiler.stop_trace()
        total_us = sum(d for _, d, _ in collect_device_events(tdir))
        return total_us / nsteps / 1e3 if total_us else None
    except Exception as e:
        log(f"device trace unavailable: {e}")
        return None
    finally:
        if tdir is not None:
            import shutil
            shutil.rmtree(tdir, ignore_errors=True)


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
    reps = max(1, int(os.environ.get("PAM_BENCH_REPS", "3")))
    trace_steps = int(os.environ.get("PAM_BENCH_TRACE_STEPS", "10"))
    # PAM-C (SPAM + semi-implicit) is the reference's production MMF dycore
    # (inputs/input_pamc.yaml); PAM_BENCH_DYCORE=awfl benches PAM-A instead.
    # PAM_BENCH_MICRO=p3 PAM_BENCH_SGS=shoc benches the full production
    # physics stack (the reference CI config inputs/ci/input_pamc.yaml).
    env_dycore = os.environ.get("PAM_BENCH_DYCORE", "spam")
    linsys = os.environ.get("PAM_BENCH_LINSYS", "velocity")
    # PAM_BENCH_TWOPOINT=1 enables the reference's (off-by-default) exact
    # two-point discrete gradient (si_two_point_discrete_gradient)
    two_point = os.environ.get("PAM_BENCH_TWOPOINT", "0") == "1"

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

    def run_config(micro, sgs, run_nens=None, chunk=None, dycore=None,
                   steps=None):
        run_nens = run_nens or nens
        steps = steps if steps is not None else n_crm_steps
        dycore = dycore or env_dycore
        dycore_kwargs = ({"linear_system": linsys, "si_two_point": two_point}
                         if dycore == "spam" else None)
        drv_nens = chunk if chunk else (mb if mb else run_nens)
        drv, state = setup_supercell_mmf(
            nx=nx, ny=ny, nz=nz, nens=drv_nens, xlen=128000.0,
            ylen=64000.0, zlen=20000.0, micro=micro, sgs=sgs, dt_gcm=900.0,
            dt_crm_phys=20.0, dycore=dycore, dtype=jnp.float32,
            dycore_kwargs=dycore_kwargs,
            micro_kwargs=micro_kwargs if micro == "kessler" else None)
        if drv_nens != run_nens:
            # chunk-sized driver + full-ensemble state, HOST-dispatched
            # micro-batching (round 5: measured faster than the in-jit
            # barrier chain — 46.4 vs 47.0 ms/step at P3+SHOC nens=512,
            # bitwise identical — and compile stays at the single-chunk
            # cost; MmfDriver.crm_phys_step_hostchunked /
            # tools/mb_host_bench.py). The state is split ONCE here and
            # rejoined after timing, as MmfDriver.run does.
            from pam_tpu.driver.mmf import _split_ens, _join_ens
            _, state = setup_supercell_mmf(
                nx=nx, ny=ny, nz=nz, nens=run_nens, xlen=128000.0,
                ylen=64000.0, zlen=20000.0, micro=micro, sgs=sgs,
                dt_gcm=900.0, dt_crm_phys=20.0, dycore=dycore,
                dtype=jnp.float32, dycore_kwargs=dycore_kwargs,
                state_only=True)
            state = gcm_forcing.compute_gcm_forcing_tendencies(
                drv.coupler, state, drv.dt_gcm)
            inner = drv._jitted_single()
            n_chunks = run_nens // drv_nens

            def step(cs):
                return tuple(inner(c) for c in cs)

            def sync(cs):
                jax.block_until_ready(cs[-1]["temp"])

            def to_array(cs):
                return np.asarray(_join_ens(cs)["temp"])

            state = _split_ens(state, n_chunks)
        else:
            state = gcm_forcing.compute_gcm_forcing_tendencies(
                drv.coupler, state, drv.dt_gcm)
            step = jax.jit(drv.crm_phys_step)

            def sync(s):
                jax.block_until_ready(s["temp"])

            def to_array(s):
                return np.asarray(s["temp"])

        t0 = time.time()
        state = step(state)
        sync(state)
        compile_s = time.time() - t0
        log(f"[micro={micro} sgs={sgs} dycore={dycore}] compile+first "
            f"step: {compile_s:.1f}s")

        for _ in range(3):  # warmup
            state = step(state)
        sync(state)

        # repeat timed reps in ONE session: best is the drift-proof
        # statistic, median is the honesty check
        ms_reps = []
        s = state
        for _ in range(reps):
            t0 = time.time()
            for _ in range(steps):
                s = step(s)
            sync(s)
            ms_reps.append((time.time() - t0) / steps * 1e3)

        if not bool(np.isfinite(to_array(s)).all()):
            log("ERROR: non-finite state after benchmark run")
            sys.exit(1)

        dev_ms = device_ms_per_step(step, s, trace_steps, sync)

        gridpoints = nx * ny * nz * run_nens
        best = min(ms_reps)
        med = statistics.median(ms_reps)
        value = gridpoints / best * 1e3
        log(f"[micro={micro} sgs={sgs} nens={run_nens} drv={drv_nens} "
            f"dycore={dycore}] reps(ms/step)="
            f"{['%.2f' % m for m in ms_reps]} best={best:.2f} med={med:.2f} "
            f"device={dev_ms if dev_ms is None else round(dev_ms, 2)}")
        return dict(value=value, best=best, median=med, device=dev_ms,
                    compile_s=compile_s)

    def emit(r, micro, sgs, vs_baseline=None, extra="", dycore=None):
        rec = {
            "metric": "supercell CRM grid-points*steps/s per chip",
            "value": round(r["value"], 1),
            "unit": "gridpoint-steps/s",
            "config": f"micro={micro},sgs={sgs},"
                      f"dycore={dycore or env_dycore}" + extra,
            "ms_per_step": round(r["best"], 2),
            "ms_per_step_median": round(r["median"], 2),
            "reps": reps,
        }
        if r["device"] is not None:
            rec["device_ms_per_step"] = round(r["device"], 2)
            if (dycore or env_dycore) == "awfl":
                # the AWFL step is one lax.while_loop over ~22 acoustic
                # subcycles; the 'XLA Ops' timeline counts the while
                # wrapper AND its body ops, so device > wall here
                rec["device_note"] = ("while-wrapped subcycles double-"
                                      "count on the XLA Ops line; wall "
                                      "is authoritative for awfl")
        rec["compile_first_step_s"] = round(r["compile_s"], 1)
        if vs_baseline is not None:
            rec["vs_baseline"] = round(vs_baseline, 3)
            rec["baseline_note"] = BASELINE_NOTE
        print(json.dumps(rec))

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

    if any(k in os.environ for k in ("PAM_BENCH_MICRO", "PAM_BENCH_SGS",
                                     "PAM_BENCH_DYCORE")):
        # explicit single-config run (any of the three selectors; the
        # baseline ratio only applies to the exact line-of-record
        # config: kessler/none on the SPAM dycore)
        micro = os.environ.get("PAM_BENCH_MICRO", "kessler")
        sgs = os.environ.get("PAM_BENCH_SGS", "none")
        r = run_config(micro, sgs)
        emit(r, micro, sgs, baseline_ratio(r["value"])
             if (micro, sgs, env_dycore) == ("kessler", "none", "spam")
             else None)
        return

    # default: production physics first, then the line of record (LAST —
    # the driver parses the final JSON line; it stays comparable with
    # BENCH_BASELINE.json across rounds)
    r_p3 = run_config("p3", "shoc")
    # production-regime ensemble lines of record (VERDICT r3 item 5):
    # nens=512 with the auto-selected VMEM-resident chunk
    from pam_tpu.driver.mmf import pick_ens_chunk
    big = int(os.environ.get("PAM_BENCH_NENS_BIG", "512"))
    ck = pick_ens_chunk(nx, ny, nz, jnp.float32, big)
    r_p3b = run_config("p3", "shoc", run_nens=big, chunk=ck)
    r_kb = run_config("kessler", "none", run_nens=big, chunk=ck)
    # nens=1024: feasible as a row of record since round 5's
    # host-dispatched micro-batching bounds compile at the single-chunk
    # cost (the in-jit chain needed 308 s; PERF.md)
    big2 = int(os.environ.get("PAM_BENCH_NENS_BIG2", "1024"))
    r_p3c = (run_config("p3", "shoc", run_nens=big2,
                        chunk=pick_ens_chunk(nx, ny, nz, jnp.float32, big2))
             if big2 else None)
    # PAM-A (AWFL) as a first-class row (VERDICT r4 item 2): ~130 ms/step
    # (66 acoustic tendency evaluations — algorithmic, PERF.md), so fewer
    # steps per rep
    awfl_steps = int(os.environ.get("PAM_BENCH_AWFL_STEPS", "10"))
    r_a = run_config("kessler", "none", dycore="awfl", steps=awfl_steps)
    r_k = run_config("kessler", "none")
    emit(r_p3, "p3", "shoc")
    emit(r_p3b, "p3", "shoc", extra=f",nens={big},ens_chunk={ck}")
    if r_p3c is not None:
        emit(r_p3c, "p3", "shoc", extra=f",nens={big2},ens_chunk="
             f"{pick_ens_chunk(nx, ny, nz, jnp.float32, big2)}")
    emit(r_kb, "kessler", "none", extra=f",nens={big},ens_chunk={ck}")
    emit(r_a, "kessler", "none", dycore="awfl")
    emit(r_k, "kessler", "none", baseline_ratio(r_k["value"]))


if __name__ == "__main__":
    main()
