"""Per-stage timing of the P3+SHOC production physics step on the TPU.

Times p3_main's stages (part1 / part2 / sedimentation x3 / freezing /
part3) separately on realistic post-spinup state, since the sedimentation
while_loop trip counts are data-dependent.

Usage: python tools/profile_p3.py  [PAM_PROF_SPINUP=30]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, n=20, name=""):
    """Wall loop + device trace: 'device' (XLA Ops timeline, dispatch-free)
    is the authoritative column — wall through the axon tunnel carries
    ~1-2 ms session-dependent dispatch (see tools/profile_shoc.py)."""
    import tempfile
    import jax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_ops import collect_device_events
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    tdir = tempfile.mkdtemp(prefix="pam_p3_")
    jax.profiler.start_trace(tdir)
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    dev_ms = sum(us for _, us, _ in collect_device_events(tdir)) / n / 1e3
    print(f"{name:34s} wall {dt * 1e3:8.3f} ms   device {dev_ms:7.3f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.physics.p3 import main as p3m
    from pam_tpu.physics.p3 import sedimentation as sed
    from pam_tpu.physics.p3.microphysics import _to_cols
    from pam_tpu.physics.p3.constants import CONST as C

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    nens = int(os.environ.get("PAM_BENCH_NENS", "128"))
    spinup = int(os.environ.get("PAM_PROF_SPINUP", "30"))
    drv, state = setup_supercell_mmf(
        nx=65, ny=1, nz=50, nens=nens, xlen=128000.0, ylen=64000.0,
        zlen=20000.0, micro="p3", sgs="shoc", dt_gcm=900.0, dt_crm_phys=20.0,
        dycore="spam", dtype=jnp.float32,
        dycore_kwargs={"linear_system": "velocity"})
    from pam_tpu.modules import gcm_forcing
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    print(f"devices: {jax.devices()}  nens={nens}  spinup={spinup}")
    full = jax.jit(drv.crm_phys_step)
    for _ in range(spinup):
        state = full(state)
    jax.block_until_ready(state)

    t_full = timeit(full, (state,), name="full crm_phys_step")
    t_micro = timeit(jax.jit(lambda s: drv.micro.timestep(s, 20.0)),
                     (state,), name="p3 micro.timestep")
    if drv.sgs is not None:
        timeit(jax.jit(lambda s: drv.sgs.timestep(s, 20.0)), (state,),
               name="shoc sgs.timestep")
    timeit(jax.jit(lambda s: drv.dycore.timestep(s, 20.0)), (state,),
           name="dycore.timestep (SI)")

    # ---- inside p3_main: rebuild the column inputs the wrapper builds ----
    cpl = drv.coupler
    nz = cpl.nz
    rho_d = state["density_dry"]
    temp = state["temp"]
    rho_v = state["water_vapor"]
    dens = {"qc": state["cloud_water"], "qv": rho_v,
            "nc": state["cloud_water_num"], "qr": state["rain"],
            "nr": state["rain_num"], "qi": state["ice"],
            "ni": state["ice_num"], "qm": state["ice_rime"],
            "bm": state["ice_rime_vol"]}
    q = {k: _to_cols(v / rho_d, nz) for k, v in dens.items()}
    pressure = C.rd * rho_d * temp + C.rv * rho_v * temp
    exner_g = (pressure / 1.0e5) ** (C.rd / C.cp)
    theta = temp / exner_g
    zint = state["vertical_interface_height"]
    shape = (cpl.nens, nz, cpl.ny, cpl.nx)
    dz = (zint[:, 1:] - zint[:, :-1])[:, :, None, None] * \
        jnp.ones(shape, cpl.dtype)
    pres = _to_cols(C.rd * rho_d * temp, nz)
    dpres = _to_cols(rho_d * C.g * dz, nz)
    inv_exner = _to_cols(1.0 / exner_g, nz)
    th = _to_cols(theta, nz)
    dzc = _to_cols(dz, nz)
    ones = jnp.ones_like(q["qc"])
    zeros = jnp.zeros_like(ones)
    qv_prev = _to_cols(state["q_prev"] / rho_d, nz)
    t_prev = _to_cols(state["t_prev"], nz)
    dt = 20.0

    args = dict(qc=q["qc"], nc=q["nc"], qr=q["qr"], nr=q["nr"], qv=q["qv"],
                th=th, qi=q["qi"], qm=q["qm"], ni=q["ni"], bm=q["bm"],
                pres=pres, dz=dzc, nc_nuceat_tend=zeros, ni_activated=zeros,
                inv_qc_relvar=ones, dt=dt, dpres=dpres, inv_exner=inv_exner,
                qv_prev=qv_prev, t_prev=t_prev, cld_frac_i=ones,
                cld_frac_l=ones, cld_frac_r=ones, nccn_prescribed=zeros)
    timeit(jax.jit(lambda a: p3m.p3_main(**a)), (args,), name="p3_main")

    exner = 1.0 / inv_exner
    t_atm = th * exner
    qv = jnp.maximum(q["qv"], 0.0)
    part1 = jax.jit(lambda: p3m.p3_main_part1(
        dt, pres, dpres, dzc, zeros, inv_exner, exner, ones, ones, ones,
        t_atm, qv, th, q["qc"], q["nc"], q["qr"], q["nr"], q["qi"], q["ni"],
        q["qm"], q["bm"], zeros, "prescribed"))
    st = part1()
    jax.block_until_ready(st)
    timeit(part1, (), name="p3_main_part1")

    part2 = jax.jit(lambda s: p3m.p3_main_part2(
        dt, pres, inv_exner, ones, ones, ones, ones, ones, ones, zeros,
        ones, qv_prev, t_prev, s, "prescribed"))
    st2, _ = part2(st)
    jax.block_until_ready(st2)
    timeit(part2, (st,), name="p3_main_part2")

    rho, inv_rho = st2["rho"], st2["inv_rho"]
    inv_dz = 1.0 / dzc
    timeit(jax.jit(lambda s: sed.cloud_sedimentation(
        s["qc"], s["nc"], rho, inv_rho, ones, s["acn"], inv_dz, dt,
        do_predict_nc=True)), (st2,), name="cloud_sedimentation")
    timeit(jax.jit(lambda s: sed.rain_sedimentation(
        s["qr"], s["nr"], rho, inv_rho, s["rhofacr"], ones, inv_dz, dt)),
        (st2,), name="rain_sedimentation")
    timeit(jax.jit(lambda s: sed.ice_sedimentation(
        s["qi"], s["ni"], s["qm"], s["bm"], rho, inv_rho, s["rhofaci"],
        ones, inv_dz, dt)), (st2,), name="ice_sedimentation")
    timeit(jax.jit(lambda s: p3m.p3_main_part3(
        inv_exner, ones, ones, ones, rho, inv_rho, s["rhofaci"], s["qv"],
        s["th"], s["qc"], s["nc"], s["qr"], s["nr"], s["qi"], s["ni"],
        s["qm"], s["bm"])), (st2,), name="p3_main_part3")

    print(f"\nfull={t_full*1e3:.2f} ms  micro={t_micro*1e3:.2f} ms")


if __name__ == "__main__":
    main()
