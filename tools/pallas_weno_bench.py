"""Measure the Pallas x-WENO kernel vs the XLA-fused path (VERDICT r2
item 6: test the megakernel deferral with one experiment).

Benchmarks the bench-config shape: the 12-density P3 stack
(12 x 128 x 50, nx=65), f32, on the current default device. Reports
per-call time for (a) the XLA path (halo_pad + fused slices + limiter
fusion, exactly what tendencies._edge_recon_x compiles to) and (b) the
Pallas kernel, plus max|diff|.

Usage: python tools/pallas_weno_bench.py  [PAM_ROWS=76800] [PAM_NX=65]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=50):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pam_tpu.ops import weno
    from pam_tpu.ops.weno_x_pallas import edge_recon_x_pallas

    rows = int(os.environ.get("PAM_ROWS", str(12 * 128 * 50)))
    nx = int(os.environ.get("PAM_NX", "65"))
    ord = 5
    hs = (ord - 1) // 2
    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.standard_normal((rows, nx)), jnp.float32)
    pad = jnp.concatenate([field[:, -hs:], field, field[:, :hs]], axis=-1)

    tables = tuple(weno.weno_tables(ord, dtype=jnp.float32))

    @jax.jit
    def xla_path(pad):
        sten = [pad[..., s:s + nx] for s in range(ord)]
        s2c, wrl, tvh, tvl, c2g, idl, sigma = tables
        aw = weno.weno_coefs_list(sten, s2c, wrl, tvh, tvl, idl, sigma)
        return (weno._eval_edge_list(aw, c2g[:, 0]),
                weno._eval_edge_list(aw, c2g[:, 1]))

    interpret = jax.default_backend() == "cpu"
    pallas_path = lambda p: edge_recon_x_pallas(p, ord=ord,
                                                interpret=interpret)

    lx, rx = xla_path(pad)
    lp, rp = pallas_path(pad)
    dmax = max(float(jnp.max(jnp.abs(lx - lp))),
               float(jnp.max(jnp.abs(rx - rp))))
    print(f"device={jax.devices()[0]}  rows={rows} nx={nx}  "
          f"max|diff|={dmax:.3e}")

    t_xla = timeit(xla_path, pad)
    print(f"XLA fused path:   {t_xla * 1e6:9.1f} us/call")
    for br in (8, 16, 32, 64):
        t_p = timeit(lambda p: edge_recon_x_pallas(p, ord=ord,
                                                   block_rows=br,
                                                   interpret=interpret),
                     pad)
        print(f"Pallas (block_rows={br:3d}): {t_p * 1e6:9.1f} us/call  "
              f"({t_xla / t_p:.2f}x vs XLA)")


if __name__ == "__main__":
    main()
