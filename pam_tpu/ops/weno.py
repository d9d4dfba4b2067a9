"""WENO limited polynomial reconstruction as batched JAX ops.

TPU-first re-design of the reference's per-thread WENO routine
(dynamics/awfl/WenoLimiter.h:98-181 ``compute_weno_coefs`` and
dynamics/awfl/Dycore.h:591-604 ``reconstruct``): instead of a scalar loop per
(cell, face), every stage here is a batched elementwise op / tiny einsum over
LEADING stencil axes. Stencil/coefficient axes live at the FRONT of the
arrays so the trailing (spatial) dims keep their (8, 128) TPU tiling —
putting a length-5 stencil axis minor-most would pad every intermediate to
128 lanes and blow up HBM traffic ~25x.

All matrices come from :mod:`pam_tpu.ops.recon_matrices` (derived with numpy,
not copied from the reference's generated tables).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from . import recon_matrices as rm

_EPS = 1.0e-20


@functools.cache
def weno_tables(ord: int, dtype=jnp.float64):
    """Static tables for a given order: (s2c, wrl, tv_hi, tv_lo, c2g, idl,
    sigma). Cached as NUMPY arrays — caching jnp arrays would capture
    tracers when first invoked inside a jit trace."""
    s2c = rm.sten_to_coefs(ord)
    wrl = rm.weno_lower_sten_to_coefs(ord)
    tv_hi = rm.tv_quadform(ord)
    hs = (ord + 1) // 2
    tv_lo = rm.tv_quadform(hs)
    c2g = rm.coefs_to_gll_lower(ord)
    idl, sigma = rm.weno_ideal_weights(ord)
    import numpy as np
    to = lambda x: np.asarray(x, dtype=np.dtype(dtype))
    return to(s2c), to(wrl), to(tv_hi), to(tv_lo), to(c2g), to(idl), float(sigma)


def weno_coefs(u, s2c, wrl, tv_hi_M, tv_lo_M, idl, sigma):
    """WENO-limited monomial coefficients from stencil cell averages.

    Args:
      u: (ord, ...) stencils — stencil axis LEADING.
      s2c: (ord, ord) [c, s], or batched (ord, ord, ...) with trailing batch
        dims broadcastable to u's batch dims (variable vertical grids).
      wrl: (hs, hs, hs) [i, s, c] or batched (hs, hs, hs, ...).
      tv_hi_M/tv_lo_M: smoothness quadratic forms; idl/sigma: limiter tuning.
    Returns:
      (ord, ...) limited coefficients, coefficient axis leading.

    Parity reference: WenoLimiter.h compute_weno_coefs incl. the
    weight-mapping step (map_weights, WenoLimiter.h:12-19).
    """
    ord = u.shape[0]
    hs = (ord + 1) // 2  # number and size of low-order sub-stencils
    # Low-order polynomial coefficients a_lo[i, c, ...]
    uw = jnp.stack([u[i:i + hs] for i in range(hs)], axis=0)  # (hs, hs, ...)
    if wrl.ndim == 3:
        a_lo = jnp.einsum('isc,is...->ic...', wrl, uw)
    else:
        a_lo = jnp.einsum('isc...,is...->ic...', wrl, uw)
    # High-order coefficients a_hi[c, ...]
    if s2c.ndim == 2:
        a_hi = jnp.einsum('cs,s...->c...', s2c, u)
    else:
        a_hi = jnp.einsum('cs...,s...->c...', s2c, u)
    # Bridge polynomial
    pad = [(0, ord - hs)] + [(0, 0)] * (a_lo.ndim - 2)
    a_lo_full = jnp.pad(a_lo, [(0, 0)] + pad)  # (hs, ord, ...)
    a_br = (a_hi - jnp.einsum('i,ic...->c...', idl[:hs], a_lo_full)) / idl[hs]
    # Smoothness indicators
    tv_lo = jnp.einsum('ic...,cd,id...->i...', a_lo, tv_lo_M, a_lo)
    tv_br = jnp.einsum('c...,cd,d...->...', a_br, tv_hi_M, a_br)
    lo_avg = jnp.mean(tv_lo, axis=0)
    tv_br = lo_avg + (tv_br - lo_avg) * sigma
    tv = jnp.concatenate([tv_lo, tv_br[None]], axis=0)  # (hs+1, ...)
    # Nonlinear weights: idl/(tv^2+eps) -> convexify -> map -> convexify
    idl_c = idl.reshape((hs + 1,) + (1,) * (tv.ndim - 1))
    w = idl_c / (tv * tv + _EPS)
    w = w / (jnp.sum(w, axis=0, keepdims=True) + _EPS)
    w = w * (idl_c + idl_c * idl_c - 3.0 * idl_c * w + w * w) / \
        (idl_c * idl_c + w * (1.0 - 2.0 * idl_c))
    w = w / (jnp.sum(w, axis=0, keepdims=True) + _EPS)
    # Weighted combination of candidates
    return w[hs] * a_br + jnp.einsum('i...,ic...->c...', w[:hs], a_lo_full)


def windows(a, ord: int, axis: int):
    """Stack ``ord`` shifted views of ``a`` along a NEW LEADING axis:
    ``windows(a)[s, ..., j, ...] = a[..., j+s, ...]``. Length along ``axis``
    shrinks by ord-1."""
    n = a.shape[axis] - ord + 1
    sl = [slice(None)] * a.ndim
    parts = []
    for s in range(ord):
        sl[axis] = slice(s, s + n)
        parts.append(a[tuple(sl)])
    return jnp.stack(parts, axis=0)


def _face_windows(u_halo, ord, axis):
    """Stencil windows for the two one-sided candidates at each face.

    u_halo has hs=(ord+1)//2 halo cells per side -> n+2 windows for n cells,
    n+1 faces. Window f is the stencil centered on the left cell of face f;
    window f+1 on the right cell (cf. Dycore.h:346-351 stencil indexing).
    Returns (stenL, stenR), each (ord, ..., n+1, ...).
    """
    w = windows(u_halo, ord, axis)
    w_axis = axis + 1 if axis >= 0 else axis
    nfaces = w.shape[w_axis] - 1
    sl = [slice(None)] * w.ndim

    def take(off):
        s = list(sl)
        s[w_axis] = slice(off, off + nfaces)
        return w[tuple(s)]

    return take(0), take(1)


def _eval_edge(a, g):
    """Evaluate monomial coefficients (ord, ...) at an edge via c2g column
    g (ord,)."""
    return jnp.einsum('c,c...->...', g, a)


def reconstruct_faces_both(u_halo, axis, tables, per_level=None,
                           per_level_axis=-3):
    """Both one-sided face reconstructions (valL, valR) along ``axis``.

    valL = left cell's right-edge value; valR = right cell's left-edge value.

    per_level: optional (s2c_lev, wrl_lev) variable-grid matrix stacks with
    LEADING matrix dims — shapes (ord, ord, nens, nlev, 1, 1) and
    (hs, hs, hs, nens, nlev, 1, 1) with nlev = nfaces+1 positioned so the
    trailing batch dims broadcast against the stencil arrays; matrix f+k_upw
    serves face f exactly as the reference indexes vert_sten_to_coefs
    (Dycore.h:456-469). The level axis is -3.
    """
    s2c, wrl, tv_hi_M, tv_lo_M, c2g, idl, sigma = tables
    ord = s2c.shape[-1] if s2c.ndim == 2 else s2c.shape[0]
    stenL, stenR = _face_windows(u_halo, ord, axis)
    if per_level is None:
        s2cL = s2cR = s2c
        wrlL = wrlR = wrl
    else:
        s2c_lev, wrl_lev = per_level
        nfaces = stenL.shape[axis + 1]
        lev = per_level_axis
        s2cL = jnp.take(s2c_lev, jnp.arange(0, nfaces), axis=lev)
        s2cR = jnp.take(s2c_lev, jnp.arange(1, nfaces + 1), axis=lev)
        wrlL = jnp.take(wrl_lev, jnp.arange(0, nfaces), axis=lev)
        wrlR = jnp.take(wrl_lev, jnp.arange(1, nfaces + 1), axis=lev)
    aL = weno_coefs(stenL, s2cL, wrlL, tv_hi_M, tv_lo_M, idl, sigma)
    aR = weno_coefs(stenR, s2cR, wrlR, tv_hi_M, tv_lo_M, idl, sigma)
    valL = _eval_edge(aL, c2g[:, 1])
    valR = _eval_edge(aR, c2g[:, 0])
    return valL, valR


def reconstruct_faces_upwind(u_halo, axis, tables, upw, per_level=None,
                             per_level_axis=-3):
    """Single upwind-selected face reconstruction along ``axis``.

    ``upw`` is boolean, broadcastable to the face shape: True selects the left
    cell's stencil evaluated at its right edge (flow toward +axis), False the
    right cell's stencil at its left edge. On the uniform-matrix path the
    selection happens on the stacked stencil windows before the limiter, so
    only one WENO evaluation is paid per (face, quantity) — same op count as
    the reference's branchy upwinding (Dycore.h:368-385) but fully
    data-parallel. On the per-level (variable vertical grid) path both
    candidates are evaluated and the RESULT selected: selecting matrices
    pointwise would materialize (ord^2 x spatial) intermediates.
    """
    s2c, wrl, tv_hi_M, tv_lo_M, c2g, idl, sigma = tables
    ord = s2c.shape[-1] if s2c.ndim == 2 else s2c.shape[0]
    stenL, stenR = _face_windows(u_halo, ord, axis)
    if per_level is None:
        sten = jnp.where(upw[None], stenL, stenR)
        a = weno_coefs(sten, s2c, wrl, tv_hi_M, tv_lo_M, idl, sigma)
        return jnp.where(upw, _eval_edge(a, c2g[:, 1]),
                         _eval_edge(a, c2g[:, 0]))
    s2c_lev, wrl_lev = per_level
    nfaces = stenL.shape[axis + 1]
    lev = per_level_axis
    s2cL = jnp.take(s2c_lev, jnp.arange(0, nfaces), axis=lev)
    s2cR = jnp.take(s2c_lev, jnp.arange(1, nfaces + 1), axis=lev)
    wrlL = jnp.take(wrl_lev, jnp.arange(0, nfaces), axis=lev)
    wrlR = jnp.take(wrl_lev, jnp.arange(1, nfaces + 1), axis=lev)
    aL = weno_coefs(stenL, s2cL, wrlL, tv_hi_M, tv_lo_M, idl, sigma)
    aR = weno_coefs(stenR, s2cR, wrlR, tv_hi_M, tv_lo_M, idl, sigma)
    return jnp.where(upw, _eval_edge(aL, c2g[:, 1]),
                     _eval_edge(aR, c2g[:, 0]))
