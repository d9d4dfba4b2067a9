"""Measure host-dispatched vs in-jit (unrolled barrier-chain) ensemble
micro-batching on the production grid (PERF.md round-5 compile budget).

Single-session alternating reps (the dispatch-drift methodology of
PERF.md): for each path, compile once, then time R reps of N steps and
report best/median wall ms/step plus compile+first-step seconds.

Usage:  python tools/mb_host_bench.py [micro] [sgs] [nens] [chunk]
        (defaults: p3 shoc 512 128)
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from pam_tpu.driver.mmf import setup_supercell_mmf, _split_ens, _join_ens
    from pam_tpu.modules import gcm_forcing

    micro = sys.argv[1] if len(sys.argv) > 1 else "p3"
    sgs = sys.argv[2] if len(sys.argv) > 2 else "shoc"
    nens = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 128
    nsteps = int(os.environ.get("PAM_BENCH_STEPS", "60"))
    reps = int(os.environ.get("PAM_BENCH_REPS", "3"))
    nx, ny, nz = 65, 1, 50

    kw = dict(nx=nx, ny=ny, nz=nz, xlen=128000.0, ylen=64000.0,
              zlen=20000.0, micro=micro, sgs=sgs, dt_gcm=900.0,
              dt_crm_phys=20.0, dycore="spam", dtype=jnp.float32,
              dycore_kwargs={"linear_system": "velocity",
                             "si_two_point": False})
    drv, _ = setup_supercell_mmf(nens=chunk, **kw)
    _, state = setup_supercell_mmf(nens=nens, **kw)
    state = gcm_forcing.compute_gcm_forcing_tendencies(
        drv.coupler, state, drv.dt_gcm)
    n_chunks = nens // chunk
    pts = nx * ny * nz * nens

    def timeit(label, first, stepper, s0):
        # sync on the WHOLE pytree: for the host path, blocking on only
        # the first chunk's leaf would stop the timer with the remaining
        # chunks of the final step still on the queue (~0.75 chunk-step
        # per rep of bias — code-review finding, round 5)
        t0 = time.time()
        s = first(s0)
        jax.block_until_ready(s)
        print(f"[{label}] compile+first step: {time.time() - t0:.1f}s",
              flush=True)
        for _ in range(3):
            s = stepper(s)
        jax.block_until_ready(s)
        ms = []
        for _ in range(reps):
            t0 = time.time()
            for _ in range(nsteps):
                s = stepper(s)
            jax.block_until_ready(s)
            ms.append((time.time() - t0) / nsteps * 1e3)
        best, med = min(ms), statistics.median(ms)
        print(f"[{label}] reps={['%.2f' % m for m in ms]} best={best:.2f} "
              f"med={med:.2f} ms/step  -> {pts / best * 1e3 / 1e6:.1f}M "
              f"pts/s", flush=True)
        return s

    paths = os.environ.get("PAM_MB_PATHS", "host,unrolled").split(",")
    out_h = out_u = None

    if "host" in paths:
        # host-dispatched: state split once, chunk program dispatched
        # per chunk
        step1 = drv._jitted_single()
        chunks0 = _split_ens(state, n_chunks)

        def host_step(cs):
            return tuple(step1(c) for c in cs)

        out_h = timeit(f"host n_chunks={n_chunks}", host_step, host_step,
                       chunks0)

    if "unrolled" in paths:
        # in-jit unrolled barrier-chain
        stepU = jax.jit(drv.crm_phys_step)
        out_u = timeit(f"unrolled n_chunks={n_chunks}", stepU, stepU, state)

    if out_h is not None and out_u is not None:
        # equality of the two paths after the same number of steps
        import numpy as np
        a = np.asarray(_join_ens(out_h)["temp"])
        b = np.asarray(out_u["temp"])
        print(f"max |host-unrolled| temp after {3 + reps * nsteps + 1} "
              f"steps: {np.abs(a - b).max():.3e} "
              f"(scale {np.abs(b).max():.3e})")


if __name__ == "__main__":
    main()
