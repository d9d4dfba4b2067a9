import os, time, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from pam_tpu.driver.mmf import setup_supercell_mmf
from pam_tpu.modules import gcm_forcing

nens = 64
drv, state = setup_supercell_mmf(nx=65, ny=1, nz=50, nens=nens,
    xlen=128000.0, ylen=64000.0, zlen=20000.0, micro="kessler",
    dt_gcm=900.0, dt_crm_phys=20.0, dtype=jnp.float32)
state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state, drv.dt_gcm)
dyc = drv.dycore

def timeit(name, fn, *args, n=20):
    fn_j = jax.jit(fn)
    out = fn_j(*args); jax.block_until_ready(out)
    t0=time.time()
    for _ in range(n):
        out = fn_j(*args)
    jax.block_until_ready(out)
    dt=(time.time()-t0)/n
    print(f"{name:35s} {dt*1e3:9.2f} ms")
    return dt

# full crm step
timeit("crm_phys_step", drv.crm_phys_step, state, n=5)
# dycore only
timeit("dycore.timestep(20s)", lambda s: dyc.timestep(s, 20.0), state, n=5)
# single ssprk3 cycle
dyn, tracers = dyc.coupler_to_dynamics(state)
print("ncycles:", int(np.ceil(20.0/float(dyc.compute_time_step(state)))))
timeit("ssprk3_cycle", lambda d,t: dyc._ssprk3_cycle(d, t, 0.9, state), dyn, tracers)
# single tendencies eval
timeit("tendencies", lambda d,t: dyc.tendencies(d, t, t, 0.9, state), dyn, tracers)
# micro only
if drv.micro is not None:
    timeit("kessler micro", lambda s: drv.micro.timestep(s, 20.0), state, n=5)
# sponge
from pam_tpu.modules import sponge as sp
timeit("sponge", lambda s: sp.sponge_layer(drv.coupler, s, 20.0), state)
timeit("gcm forcing apply", lambda s: gcm_forcing.apply_gcm_forcing_tendencies(drv.coupler, s, 20.0, 900.0), state)
