"""Banded linear-system utilities (AWFL's solve_banded, Dycore.h:1508-1541).

The reference eliminates bands sequentially per ensemble member on the
device. TPU-native choice: scatter the bands into a dense (n, n) matrix and
use the batched LAPACK-style solve XLA provides — n here is a vertical
extent (tens of levels), so the dense solve is a single small MXU-friendly
batched op, far better than a sequential scalar elimination on the VPU.
(The performance-critical tridiagonal solves in the SI solver keep their
specialized lax.scan Thomas kernels — si.py.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def banded_to_dense(diags):
    """(nbands, n, ...) band storage -> (..., n, n) dense matrices.

    Band b holds the diagonal at offset (b - h), h = (nbands-1)//2, i.e.
    A[row, row + b - h] = diags[b, row] (the reference's layout:
    diags(h, i) is the main diagonal of row i)."""
    nbands, n = diags.shape[0], diags.shape[1]
    assert nbands % 2 == 1, "number of bands must be odd (Dycore.h:1512)"
    h = (nbands - 1) // 2
    dense = jnp.zeros(diags.shape[2:] + (n, n), diags.dtype)
    rows = np.arange(n)
    for b in range(nbands):
        cols = rows + b - h
        valid = (cols >= 0) & (cols < n)
        r, c = rows[valid], cols[valid]
        vals = jnp.moveaxis(diags[b][valid], 0, -1)  # (..., nvalid)
        dense = dense.at[..., r, c].set(vals)
    return dense


def solve_banded(diags, rhs):
    """Solve the banded system per trailing batch dims.

    Args:
      diags: (nbands, n, ...) bands, reference layout (Dycore.h:1508).
      rhs:   (n, ...) right-hand sides.
    Returns (n, ...) solutions."""
    dense = banded_to_dense(diags)                  # (..., n, n)
    b = jnp.moveaxis(rhs, 0, -1)[..., None]         # (..., n, 1)
    x = jnp.linalg.solve(dense, b)[..., 0]
    return jnp.moveaxis(x, -1, 0)
