"""Fused Pallas TPU kernel for the AWFL directional flux evaluation.

This fuses the ENTIRE per-direction hot path of the AWFL dycore
(dynamics/awfl/Dycore.h:334-519 — characteristic acoustic/advective upwind
WENO reconstruction + flux assembly) into one VMEM-resident kernel:

* the stencil direction lives in the LANE dimension (x contiguous), so all
  WENO stencil shifts are lane slices;
* rows = every other grid index (ens*y*z for the x-direction; ens*y*x for
  the z-direction after a cheap transpose), blocked over the Pallas grid;
* the WENO limiter math is the same unrolled elementwise formulation as
  :func:`pam_tpu.ops.weno.weno_coefs_list` — the helper is reused verbatim
  inside the kernel body (it is pure jnp);
* per-level (variable vertical grid) reconstruction matrices are passed as
  (ord*ord, nfaces) / (hs^3, nfaces) lane vectors and broadcast per face.

The jnp path in pam_tpu.ops.weno remains the reference implementation;
AwflDycore selects this kernel on TPU f32 runs and falls back otherwise
(f64 is not supported by Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import weno as weno_mod


class _LaneMat:
    """Adapter exposing a (flattened_matrix, nfaces) VMEM ref as an object
    indexable with matrix subscripts, returning (1, nfaces) lane vectors."""

    def __init__(self, ref, dims):
        self.ref = ref
        self.dims = dims  # e.g. (ord, ord) or (hs, hs, hs)

    def __getitem__(self, idx):
        flat = 0
        for i, d in zip(idx, self.dims):
            flat = flat * d + i
        return self.ref[flat:flat + 1, :]


class _SelMat:
    """Upwind-selected per-face matrix: entries materialized once as
    where(upw, L, R) lane vectors and cached, so the advective fields pay a
    single WENO evaluation each (instead of evaluating both candidates)."""

    def __init__(self, matL, matR, upw):
        self.matL, self.matR, self.upw = matL, matR, upw
        self._cache = {}

    def __getitem__(self, idx):
        if idx not in self._cache:
            self._cache[idx] = jnp.where(self.upw, self.matL[idx],
                                         self.matR[idx])
        return self._cache[idx]


def _direction_kernel(nq, ntr, ord, cs, mom_q_idx, zmask, tables,
                      per_level, nfaces,
                      *refs):
    """Kernel body. refs layout:
    [prim(5,R,nxp), trac(ntr,R,nxp), pres(R,nxp),
     (s2cL, s2cR, wrlL, wrlR if per_level)],
    then outputs [sf(5,R,nfaces), tf(ntr,R,nfaces)].
    """
    s2c, wrl, tv_hi, tv_lo, c2g, idl, sigma = tables
    hs = (ord + 1) // 2
    nin = 3 + (4 if per_level else 0)
    prim_ref, trac_ref, pres_ref = refs[0], refs[1], refs[2]
    if per_level:
        s2cL = _LaneMat(refs[3], (ord, ord))
        s2cR = _LaneMat(refs[4], (ord, ord))
        wrlL = _LaneMat(refs[5], (hs, hs, hs))
        wrlR = _LaneMat(refs[6], (hs, hs, hs))
    else:
        s2cL = s2cR = s2c
        wrlL = wrlR = wrl
    sf_ref, tf_ref = refs[nin], refs[nin + 1]

    def views(a):
        return [a[:, s:s + nfaces] for s in range(ord + 1)]

    def recon_both(a):
        vw = views(a)
        aL = weno_mod.weno_coefs_list(vw[:ord], s2cL, wrlL, tv_hi, tv_lo,
                                      idl, sigma)
        aR = weno_mod.weno_coefs_list(vw[1:], s2cR, wrlR, tv_hi, tv_lo,
                                      idl, sigma)
        return (weno_mod._eval_edge_list(aL, c2g[:, 1]),
                weno_mod._eval_edge_list(aR, c2g[:, 0]))

    rho = prim_ref[0]
    mom = prim_ref[1 + mom_q_idx]
    pres = pres_ref[...]
    ru_f = rho * mom

    ruL, ruR = recon_both(ru_f)
    ppL, ppR = recon_both(pres)
    if zmask:
        lane = jax.lax.broadcasted_iota(jnp.int32, ruL.shape, 1)
        bmask = (lane == 0) | (lane == nfaces - 1)
        ruL = jnp.where(bmask, 0.0, ruL)
        ruR = jnp.where(bmask, 0.0, ruR)
    w1 = 0.5 * (ppR - cs * ruR)
    w2 = 0.5 * (ppL + cs * ruL)
    pp = w1 + w2
    ru = (w2 - w1) * (1.0 / cs)
    if zmask:
        ru = jnp.where(bmask, 0.0, ru)
    upw = ru > 0

    sf_ref[0] = ru
    if per_level:
        # upwind-select the per-face matrices ONCE (cached lane vectors) so
        # each advective field pays a single WENO evaluation
        s2cU = _SelMat(s2cL, s2cR, upw)
        wrlU = _SelMat(wrlL, wrlR, upw)
    else:
        s2cU, wrlU = s2c, wrl
    for qi in range(nq):
        q = prim_ref[1 + qi] if qi < 4 else trac_ref[qi - 4]
        vw = views(q)
        sten = [jnp.where(upw, l, r) for l, r in zip(vw[:ord], vw[1:])]
        a = weno_mod.weno_coefs_list(sten, s2cU, wrlU, tv_hi, tv_lo,
                                     idl, sigma)
        val = jnp.where(upw, weno_mod._eval_edge_list(a, c2g[:, 1]),
                        weno_mod._eval_edge_list(a, c2g[:, 0]))
        flux = ru * val
        if qi == mom_q_idx:
            flux = flux + pp
        if qi < 4:
            sf_ref[1 + qi] = flux
        else:
            tf_ref[qi - 4] = flux


@functools.partial(
    jax.jit,
    static_argnames=("ord", "cs", "mom_q_idx", "zmask", "row_block"))
def flux_direction_fused(prim, trac, pres, tables_key=None, *,
                         ord, cs, mom_q_idx, zmask, per_level=None,
                         row_block=256):
    """Fused directional flux on 2D-ified arrays.

    Args:
      prim: (5, M, nxp) de-densitized state [rho, u, v, w, th], stencil
        direction in lanes, padded by hs each side (nxp = nfaces-1+2hs+1).
      trac: (ntr, M, nxp) de-densitized tracers.
      pres: (M, nxp) pressure (perturbation).
      per_level: optional (s2cL, s2cR, wrlL, wrlR) flattened matrices,
        shapes (ord*ord, nfaces) and (hs^3, nfaces).
      mom_q_idx: index of the normal-momentum component among [u,v,w].
      zmask: rigid-boundary masking of the acoustic mass flux at the first
        and last face (Dycore.h:477-496).
    Returns:
      (state_flux (5, M, nfaces), tracer_flux (ntr, M, nfaces)).
    """
    dtype = prim.dtype
    assert dtype == jnp.float32, "pallas path is f32-only"
    ntr = trac.shape[0]
    nq = 4 + ntr
    M, nxp = prim.shape[1], prim.shape[2]
    nfaces = nxp - ord
    hs = (ord + 1) // 2
    tables = weno_mod.weno_tables(ord, dtype=dtype)

    grid = (pl.cdiv(M, row_block),)
    R = row_block

    in_specs = [
        pl.BlockSpec((5, R, nxp), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(ntr, 1), R, nxp), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((R, nxp), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [prim, trac if ntr else jnp.zeros((1, M, nxp), dtype), pres]
    per_level_flag = per_level is not None
    if per_level_flag:
        for m, rows in zip(per_level, (ord * ord, ord * ord,
                                       hs ** 3, hs ** 3)):
            assert m.shape == (rows, nfaces)
            in_specs.append(pl.BlockSpec((rows, nfaces), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            args.append(m.astype(dtype))

    out_shape = (
        jax.ShapeDtypeStruct((5, M, nfaces), dtype),
        jax.ShapeDtypeStruct((max(ntr, 1), M, nfaces), dtype),
    )
    out_specs = (
        pl.BlockSpec((5, R, nfaces), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((max(ntr, 1), R, nfaces), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(
        _direction_kernel, nq, ntr, ord, cs, mom_q_idx, zmask, tables,
        per_level_flag, nfaces)
    sf, tf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args)
    return sf, tf[:ntr]
