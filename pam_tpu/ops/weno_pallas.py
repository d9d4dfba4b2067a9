"""Fused Pallas TPU kernel for the SPAM periodic-x WENO edge reconstruction.

The XLA-fused form of the WENO limiter (ops/weno.py, used by
spam/tendencies._edge_recon_x) compiles into 2-3 giant fusions per call
whose tuple interfaces materialize the shifted stencil arrays and
intermediate coefficients in HBM (measured: the three ~350 us + three
~180 us fusions dominating the SPAM+SI step, PERF.md). This kernel keeps
the WHOLE chain VMEM-resident: load one (rows, nx+2*hs) slab, take the
``ord`` stencil views as static lane slices, run the same unrolled limiter
(:func:`pam_tpu.ops.weno.weno_coefs_list`, reused verbatim — it is pure
jnp), and write only the two edge-value outputs.

Uniform-grid (scalar-matrix) path only — exactly the bench configuration;
the jnp path remains the reference implementation and the fallback for
stretched vertical grids, f64, and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import weno as weno_mod


def _kernel(ord, tables, nx, up_ref, left_ref, right_ref):
    s2c, wrl, tv_hi, tv_lo, c2g, idl, sigma = tables
    u = up_ref[...]
    sten = [u[:, s:s + nx] for s in range(ord)]
    aw = weno_mod.weno_coefs_list(sten, s2c, wrl, tv_hi, tv_lo, idl, sigma)
    left_ref[...] = weno_mod._eval_edge_list(aw, c2g[:, 0])
    right_ref[...] = weno_mod._eval_edge_list(aw, c2g[:, 1])


@functools.partial(jax.jit, static_argnums=(1, 2))
def _run(up, ord, nx):
    tables = weno_mod.weno_tables(ord, dtype=up.dtype)
    R = up.shape[0]
    BR = 512
    grid = (R // BR,)
    kern = functools.partial(_kernel, ord, tables, nx)
    left, right = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec((BR, up.shape[1]), lambda r: (r, 0))],
        out_specs=[pl.BlockSpec((BR, nx), lambda r: (r, 0)),
                   pl.BlockSpec((BR, nx), lambda r: (r, 0))],
        out_shape=[jax.ShapeDtypeStruct((R, nx), up.dtype),
                   jax.ShapeDtypeStruct((R, nx), up.dtype)],
    )(up)
    return left, right


def edge_recon_x(field, ord: int = 5):
    """(left, right) WENO edge values per cell along periodic x (last axis).

    Drop-in for the stencil+limiter part of
    spam/tendencies._edge_recon_x on the uniform-matrix path."""
    *lead, nx = field.shape
    hs = (ord - 1) // 2
    R = int(np.prod(lead))
    u = field.reshape(R, nx)
    up = jnp.concatenate([u[:, nx - hs:], u, u[:, :hs]], axis=1)
    BR = 512
    Rpad = -(-R // BR) * BR
    if Rpad != R:
        up = jnp.concatenate(
            [up, jnp.zeros((Rpad - R, up.shape[1]), up.dtype)], axis=0)
    left, right = _run(up, ord, nx)
    shape = tuple(lead) + (nx,)
    return left[:R].reshape(shape), right[:R].reshape(shape)
