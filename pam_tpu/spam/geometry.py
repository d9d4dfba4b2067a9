"""Extruded primal/dual ("straight/twisted") geometry for the SPAM dycore.

Parity reference: dynamics/spam/src/grids/{topology.h, geometry.h}.

Vertical staggering (ndims=1 horizontal + extruded z; dual grid carries the
physical layers):

* dual (twisted): nz layers, nz+1 interfaces; ``zint_d`` = physical
  interfaces, ``dz_d(k)`` = layer thickness.
* primal (straight): nz-1 layers, nz interfaces; straight interfaces sit at
  the midpoints of the dual layers except the first/last which sit on the
  boundaries (geometry.h:303-317) — so the first/last primal layers are
  "half cells" (uniform grid: dz_p = 1.5 dz at the boundaries).

Horizontal grid is uniform periodic; ndims=1 sets dy=1 (geometry.h:282-288).

Field layout in this implementation: ``(ndof, nens, nlev, nx)`` with no
stored halos — x shifts are periodic rolls, z stencils use explicit mirror
padding (pam_tpu.spam.operators).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True, eq=False)
class ExtrudedGeometry:
    nx: int
    nz: int           # dual layers (= CRM nz)
    nens: int
    xlen: float
    dx: float
    dy: float         # 1.0 for ndims=1
    uniform_vertical: bool
    # numpy (nens, ...) arrays — static per run
    zint_d: np.ndarray   # (nens, nz+1) twisted interfaces
    dz_d: np.ndarray     # (nens, nz)   twisted layer thicknesses
    zint_p: np.ndarray   # (nens, nz)   straight interfaces (v-levels)
    dz_p: np.ndarray     # (nens, nz-1) straight layer thicknesses (w-edges)
    dtype: Any = jnp.float64
    ny: int = 1       # ndims=2 (3-D x-y-z) when > 1
    ylen: float = 1.0

    @property
    def nl_d(self):
        return self.nz

    @property
    def ni_d(self):
        return self.nz + 1

    @property
    def nl_p(self):
        return self.nz - 1

    @property
    def ni_p(self):
        return self.nz

    # --- area entities (geometry.h:402-466; dy=1 for ndims=1) ---
    # twisted (dual) entities, z-index = dual layer / interface as noted
    def d_area_n1(self):
        """dual n1 (cell 'volume'): dx*dy*dz_d(k), (nens, nz)."""
        return self.dx * self.dy * self.dz_d

    def d_area_nm11(self):
        """dual (n-1,1) = x-normal side of dual cell: dy*dz_d(k) (ndims=1:
        area_01), (nens, nz)."""
        return self.dy * self.dz_d

    def d_area_nm11_y(self):
        """dual (n-1,1), y-normal side: dx*dz_d(k) (ndims=2 only)."""
        return self.dx * self.dz_d

    def d_area_n0(self):
        """dual (n,0) = horizontal face: dx*dy (scalar)."""
        return self.dx * self.dy

    def p_area_10(self):
        """primal horizontal edge length: dx."""
        return self.dx

    def p_area_01(self):
        """primal vertical edge length at w-level kw: dz_p(kw), (nens, nz-1)."""
        return self.dz_p

    @staticmethod
    def build3d(nx: int, ny: int, zint, xlen: float, ylen: float,
                nens: int = 1, dtype=jnp.float64) -> "ExtrudedGeometry":
        """3-D (ndims=2 horizontal + z) grid: periodic x AND y."""
        g = ExtrudedGeometry.build(nx, zint, xlen, nens=nens, dtype=dtype)
        return dataclasses.replace(g, ny=ny, ylen=ylen, dy=ylen / ny)

    @staticmethod
    def build(nx: int, zint, xlen: float, nens: int = 1,
              dtype=jnp.float64) -> "ExtrudedGeometry":
        zint = np.asarray(zint, np.float64)
        if zint.ndim == 1:
            zint = np.broadcast_to(zint, (nens, len(zint))).copy()
        nz = zint.shape[1] - 1
        dz_d = np.diff(zint, axis=1)
        uniform = bool(np.allclose(dz_d, dz_d[:, :1]))
        # straight interfaces (geometry.h:303-317)
        zint_p = np.empty((nens, nz))
        zint_p[:, 0] = zint[:, 0]
        zint_p[:, -1] = zint[:, -1]
        zint_p[:, 1:-1] = 0.5 * (zint[:, 1:-2] + zint[:, 2:-1])
        dz_p = np.diff(zint_p, axis=1)
        return ExtrudedGeometry(
            nx=nx, nz=nz, nens=nens, xlen=xlen, dx=xlen / nx, dy=1.0,
            uniform_vertical=uniform, zint_d=zint, dz_d=dz_d,
            zint_p=zint_p, dz_p=dz_p, dtype=dtype)

    # --- z centers used for initial conditions ---
    @property
    def zmid_d(self):
        return 0.5 * (self.zint_d[:, :-1] + self.zint_d[:, 1:])
