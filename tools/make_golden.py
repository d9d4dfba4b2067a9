"""Regenerate the golden-trajectory regression baselines (tests/golden/).

Freezes small-config f64 CPU trajectories of the full CRM physics step so
future optimization work cannot silently change answers (VERDICT r4 item 4
— the analog of the reference's fixed-config CI run,
.github/workflows/mmf-simplified-ubuntu.yml:34-39).

Regenerating is a DELIBERATE act: run this script, inspect the printed
max-relative-change per field against the previous baselines, and commit
the new .npz together with the justification in the commit message (see
PARITY.md "Golden trajectories").

Usage: python tools/make_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

# the configs of record: kessler+SPAM-SI (the bench line of record) and the
# production physics stack p3+shoc, both at a small grid that runs in
# seconds on CPU
CONFIGS = [
    dict(name="kessler_spam_si", micro="kessler", sgs="none"),
    dict(name="p3_shoc_spam_si", micro="p3", sgs="shoc"),
]
FIELDS = ("temp", "uvel", "wvel", "water_vapor", "density_dry")
NSTEPS = 10


def run_config(micro, sgs):
    import jax
    import jax.numpy as jnp
    from pam_tpu.driver.mmf import setup_supercell_mmf
    from pam_tpu.modules import gcm_forcing
    drv, state = setup_supercell_mmf(
        nx=16, ny=1, nz=12, nens=2, xlen=32000.0, ylen=64000.0,
        zlen=20000.0, micro=micro, sgs=sgs, dt_gcm=200.0, dt_crm_phys=20.0,
        dycore="spam", dtype=jnp.float64)
    state = gcm_forcing.compute_gcm_forcing_tendencies(drv.coupler, state,
                                                       drv.dt_gcm)
    step = jax.jit(drv.crm_phys_step)
    for _ in range(NSTEPS):
        state = step(state)
    extra = ("cloud_liquid", "precip_liquid") if micro == "kessler" else \
        ("cloud_water", "rain", "ice", "tke")
    return {k: state[k] for k in FIELDS + extra}


def main():
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for cfg in CONFIGS:
        out = run_config(cfg["micro"], cfg["sgs"])
        path = os.path.join(GOLDEN_DIR, cfg["name"] + ".npz")
        if os.path.exists(path):
            old = np.load(path)
            print(f"{cfg['name']}: change vs committed baseline")
            for k, v in out.items():
                if k in old:
                    a, b = old[k], np.asarray(v)
                    scale = max(np.abs(a).max(), 1e-300)
                    print(f"  {k:16s} max rel change "
                          f"{np.abs(a - b).max() / scale:.3e}")
        np.savez_compressed(path, **{k: np.asarray(v)
                                     for k, v in out.items()})
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
