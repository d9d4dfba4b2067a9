"""Per-stage timing + cost analysis of the SPAM+SI CRM step on the TPU.

Times each pipeline component (jitted separately) of the bench
configuration and prints XLA cost-analysis bytes/flops for the full step —
the roofline evidence for BENCH notes (VERDICT r1 item 2).

Usage: python tools/profile_step.py  (runs on the default platform)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def timeit(fn, args, n=30, name=""):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.modules import gcm_forcing, sponge
    from pam_tpu.spam import si as si_mod

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    nens = int(os.environ.get("PAM_BENCH_NENS", "128"))
    drv, state = setup_supercell_mmf(
        nx=65, ny=1, nz=50, nens=nens, xlen=128000.0, ylen=64000.0,
        zlen=20000.0, micro="kessler", dt_gcm=900.0, dt_crm_phys=20.0,
        dycore="spam", dtype=jnp.float32,
        dycore_kwargs={"linear_system": os.environ.get(
            "PAM_BENCH_LINSYS", "velocity")})
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    dyc = drv.dycore
    dens, v, w = jax.jit(dyc.coupler_to_dynamics)(state)
    jax.block_until_ready(dens)
    print(f"devices: {jax.devices()}  nens={nens}")

    # ---- full step + components ----
    full = jax.jit(drv.crm_phys_step)
    t_full = timeit(full, (state,), name="full crm_phys_step")

    t = {}
    t["dycore.timestep"] = timeit(
        jax.jit(lambda s: dyc.timestep(s, 20.0)), (state,),
        name="dycore.timestep (SI)")
    t["forcing"] = timeit(
        jax.jit(lambda s: gcm_forcing.apply_gcm_forcing_tendencies(
            drv.coupler, s, 20.0, 900.0)), (state,), name="gcm forcing")
    t["sponge"] = timeit(
        jax.jit(lambda s: sponge.sponge_layer(drv.coupler, s, 20.0)),
        (state,), name="sponge")
    if drv.micro is not None:
        t["micro"] = timeit(
            jax.jit(lambda s: drv.micro.timestep(s, 20.0)), (state,),
            name="kessler micro")

    # ---- inside the SI step ----
    geop = dyc.geop
    t["conversions"] = timeit(
        jax.jit(lambda s: dyc.dynamics_to_coupler(
            s, *dyc.coupler_to_dynamics(s))), (state,),
        name="coupler<->dynamics roundtrip")
    t["compute_rhs"] = timeit(
        jax.jit(lambda d, vv, ww: dyc.tend.compute_rhs(d, vv, ww, geop,
                                                       20.0)),
        (dens, v, w), name="tend.compute_rhs (1x)")
    t["fd"] = timeit(
        jax.jit(lambda d, vv, ww: dyc.tend.functional_derivatives(
            d, vv, ww, geop)), (dens, v, w),
        name="functional_derivatives (1x)")
    t["solve"] = timeit(
        jax.jit(lambda d, vv, ww: dyc.si_linsys.solve(d, vv, ww)),
        (dens, v, w), name="linsys.solve (1x)")
    t["si_step"] = timeit(
        jax.jit(lambda d, vv, ww: si_mod.si_step(
            dyc.tend, dyc.si_linsys, d, vv, ww, geop, 20.0,
            dyc.si_max_iters, dyc.si_nquad)), (dens, v, w),
        name="si_step (1x)")

    # breakdown estimate: si_step = rhs + 3*(solve + 2-pt DG + symplectic)
    print("\nnotes: si_step should be ~ compute_rhs + 3*(solve + "
          "2x fd + apply_symplectic)")

    # ---- XLA cost analysis of the full step ----
    comp = jax.jit(drv.crm_phys_step).lower(state).compile()
    try:
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        print(f"\nXLA cost analysis: flops={flops:.3e}  "
              f"bytes accessed={bytes_acc:.3e}")
        bw = 819e9  # v5e HBM ~819 GB/s
        print(f"HBM roofline at {bw/1e9:.0f} GB/s: "
              f"{bytes_acc / bw * 1e3:.3f} ms vs measured "
              f"{t_full * 1e3:.3f} ms -> "
              f"{bytes_acc / bw / t_full * 100:.1f}% of BW-bound light speed")
        print(f"f32 MXU roofline at 98 TFLOP/s: "
              f"{flops / 98e12 * 1e3:.3f} ms")
    except Exception as e:
        print("cost_analysis unavailable:", e)

    mem = comp.memory_analysis()
    if mem is not None:
        print(f"memory: temp={getattr(mem, 'temp_size_in_bytes', '?')} "
              f"args={getattr(mem, 'argument_size_in_bytes', '?')}")


if __name__ == "__main__":
    main()
