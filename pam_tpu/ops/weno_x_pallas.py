"""Pallas TPU kernel for the x-direction WENO edge reconstruction.

The round-2 roofline (PERF.md) argued the SPAM symplectic pipeline's WENO
limiter fusions already run at the VPU envelope and that cross-stage
Pallas megakernels would buy <1.5x; the round-2 verdict asked for that
deferral to be TESTED with one measured experiment (item 6). This module
is that experiment: the dominant single kernel of the pipeline — the
x-direction WENO edge recon over the full density stack — implemented as
ONE Pallas kernel that reads the halo-padded field once from VMEM-staged
blocks and emits both cell-edge values, with zero HBM round-trips between
the stencil gather, the limiter, and the edge evaluation.

The kernel body REUSES the exact batched limiter math
(`weno.weno_coefs_list` / `_eval_edge_list`) — jnp ops lower through
Mosaic inside the kernel — so there is no duplicated WENO formula and
results are identical to the XLA path by construction.

Measured by tools/pallas_weno_bench.py; the keep/drop decision is
recorded in PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from . import weno


def _kernel(pad_ref, left_ref, right_ref, *, tables, ord):
    hs = (ord - 1) // 2
    nx = left_ref.shape[-1]
    pad = pad_ref[...]
    sten = [pad[..., s:s + nx] for s in range(ord)]
    s2c, wrl, tvh, tvl, c2g, idl, sigma = tables
    aw = weno.weno_coefs_list(sten, s2c, wrl, tvh, tvl, idl, sigma)
    left_ref[...] = weno._eval_edge_list(aw, c2g[:, 0])
    right_ref[...] = weno._eval_edge_list(aw, c2g[:, 1])


@functools.partial(jax.jit, static_argnames=("ord", "block_rows",
                                             "interpret"))
def edge_recon_x_pallas(pad, ord: int = 5, block_rows: int = 8,
                        interpret: bool = False):
    """left/right cell-edge values from a periodically padded field.

    pad: (rows, nx + ord - 1) — the field flattened over all leading dims
    (densities x ens x nz) with an hs-wide x halo on each side (the same
    layout `tendencies._edge_recon_x` builds via comm.halo_pad).
    Returns (left, right), each (rows, nx)."""
    rows, nxp = pad.shape
    hs = (ord - 1) // 2
    nx = nxp - 2 * hs
    # numpy tables: constants fold into the kernel (weno_coefs_list
    # asserts numpy inputs for exactly this reason)
    tables = weno.weno_tables(ord, dtype=pad.dtype)
    grid = (pl.cdiv(rows, block_rows),)
    out = pl.pallas_call(
        functools.partial(_kernel, tables=tables, ord=ord),
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, nxp), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((block_rows, nx), lambda i: (i, 0)),
                   pl.BlockSpec((block_rows, nx), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((rows, nx), pad.dtype),
                   jax.ShapeDtypeStruct((rows, nx), pad.dtype)],
        interpret=interpret,
    )(pad)
    return out[0], out[1]
