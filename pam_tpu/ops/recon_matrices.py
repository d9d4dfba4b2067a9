"""Polynomial reconstruction matrices for finite-volume WENO schemes.

The reference (E3SM-Project/PAM) ships ~15k lines of SageMath-generated constant
tables (``dynamics/awfl/TransformMatrices.h``, ``TransformMatrices_variable.h``).
Here we derive every matrix from first principles with numpy at setup time:
nothing is copied, and arbitrary (stretched) grids fall out of the same code
path as uniform grids.

Conventions (matching the reference semantics, verified by unit tests):

* A cell-average polynomial reconstruction on a stencil of ``ord`` cells.
  Coordinates are normalized by the *central* cell width and centered on the
  central cell midpoint; the central cell occupies ``[-1/2, +1/2]``.
* ``sten_to_coefs`` (ord, ord): maps the ``ord`` cell averages to monomial
  coefficients ``a_s`` of ``p(x) = sum_s a_s x**s``
  (ref: TransformMatrices::sten_to_coefs / sten_to_coefs_variable).
* ``coefs_to_gll_lower`` (ord, 2): evaluates the monomials at the two cell
  edges ``x = -1/2`` (col 0) and ``x = +1/2`` (col 1)
  (ref: TransformMatrices::coefs_to_gll_lower).
* ``weno_recon_lower`` (hs, hs, hs) with ``hs=(ord+1)/2``: for each of the
  ``hs`` low-order sub-stencils ``i`` (cells ``i..i+hs-1`` of the full
  stencil), maps its cell averages to degree-(hs-1) monomial coefficients in
  the same global coordinates (ref: weno_lower_sten_to_coefs).
* ``tv_quadform`` (ord, ord): symmetric quadratic form such that the
  Jiang-Shu total-variation/smoothness indicator of a polynomial with
  coefficients ``a`` is ``a @ TV @ a`` =
  ``sum_n integral_{-1/2}^{1/2} (d^n p/dx^n)^2 dx`` over n = 1..ord-1
  (ref: TransformMatrices::coefs_to_tv).
* GLL points are on ``[-1/2, 1/2]`` with weights summing to 1
  (ref: TransformMatrices::get_gll_points/get_gll_weights).
"""

from __future__ import annotations

import functools
import math

import numpy as np


def gll_points_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre-Lobatto points/weights on [-1/2, 1/2], weights sum to 1.

    Ref parity: dynamics/awfl/TransformMatrices.h get_gll_points/get_gll_weights.
    """
    if n < 2:
        raise ValueError("GLL rule needs n >= 2")
    # GLL interior nodes are roots of P'_{n-1}; compute via Jacobi-matrix-free
    # approach: roots of derivative of Legendre polynomial.
    from numpy.polynomial import legendre

    c = np.zeros(n)
    c[-1] = 1.0
    dP = legendre.legder(c)
    interior = legendre.legroots(dP)
    pts = np.concatenate(([-1.0], np.sort(interior), [1.0]))
    # weights: w_i = 2 / (n(n-1) [P_{n-1}(x_i)]^2)
    Pnm1 = legendre.legval(pts, c)
    wts = 2.0 / (n * (n - 1) * Pnm1**2)
    # map [-1,1] -> [-1/2,1/2]; weights scale by 1/2 so they sum to 1
    return pts / 2.0, wts / 2.0


def _cell_average_matrix(locs: np.ndarray, ncoef: int, first_cell: int) -> np.ndarray:
    """A[j, s] = average of x**s over cell j (edges locs[first_cell+j],
    locs[first_cell+j+1]), for j in range(len) and s in range(ncoef)."""
    ncell = len(locs) - 1 - 2 * 0
    del ncell
    n = ncoef
    nc = n  # square system uses ncoef cells
    A = np.empty((nc, n))
    for j in range(nc):
        lo = locs[first_cell + j]
        hi = locs[first_cell + j + 1]
        for s in range(n):
            A[j, s] = (hi ** (s + 1) - lo ** (s + 1)) / ((s + 1) * (hi - lo))
    return A


def normalized_edge_locs(ord: int) -> np.ndarray:
    """Uniform-grid normalized edge locations: ord cells of width 1 centered
    so the central cell spans [-1/2, 1/2]."""
    return np.arange(ord + 1, dtype=np.float64) - ord / 2.0


def sten_to_coefs(locs_or_ord) -> np.ndarray:
    """(ord, ord) matrix mapping ord cell averages -> monomial coefficients.

    ``locs_or_ord`` is either an integer order (uniform grid) or an array of
    ord+1 normalized edge locations (variable grid; see
    TransformMatrices_variable::sten_to_coefs_variable for the reference
    semantics).
    """
    if np.isscalar(locs_or_ord):
        locs = normalized_edge_locs(int(locs_or_ord))
    else:
        locs = np.asarray(locs_or_ord, dtype=np.float64)
    ord = len(locs) - 1
    A = _cell_average_matrix(locs, ord, 0)
    return np.linalg.inv(A)  # coefs = S2C @ u ; row index = coefficient power


def coefs_to_gll_lower(ord: int) -> np.ndarray:
    """(ord, 2): evaluate monomial basis at x=-1/2 (col 0) and x=+1/2 (col 1)."""
    out = np.empty((ord, 2))
    for s in range(ord):
        out[s, 0] = (-0.5) ** s
        out[s, 1] = (+0.5) ** s
    return out


def weno_lower_sten_to_coefs(locs_or_ord) -> np.ndarray:
    """(hs, hs, hs) low-order reconstruction matrices, hs = (ord+1)//2.

    result[i, s, c]: contribution of cell average ``u[i+s]`` to monomial
    coefficient ``c`` of the degree-(hs-1) polynomial on sub-stencil ``i``
    (cells i..i+hs-1 of the full stencil), in global normalized coordinates.
    """
    if np.isscalar(locs_or_ord):
        locs = normalized_edge_locs(int(locs_or_ord))
    else:
        locs = np.asarray(locs_or_ord, dtype=np.float64)
    ord = len(locs) - 1
    hs = (ord + 1) // 2
    out = np.empty((hs, hs, hs))
    for i in range(hs):
        A = np.empty((hs, hs))
        for j in range(hs):
            lo, hi = locs[i + j], locs[i + j + 1]
            for s in range(hs):
                A[j, s] = (hi ** (s + 1) - lo ** (s + 1)) / ((s + 1) * (hi - lo))
        Ainv = np.linalg.inv(A)  # coef c = sum_s Ainv[c, s] u[i+s]
        out[i] = Ainv.T  # out[i, s, c]
    return out


@functools.cache
def tv_quadform(ord: int, truncate: bool = True) -> np.ndarray:
    """(ord, ord) symmetric matrix: beta(a) = a @ M @ a is the Jiang-Shu
    smoothness indicator sum_{n>=1} int_{-1/2}^{1/2} (p^(n))^2 dx.

    With ``truncate`` (default), product terms whose monomial power exceeds
    ``ord`` are dropped, matching the dycore's generated formulas exactly
    (e.g. coefs_to_tv(5) omits the x^6 term of (p')^2; verified against
    TransformMatrices.h orders 3/5/7). ``truncate=False`` gives the full
    form used by the coupler's vertical interpolation
    (pam_core/vertical_interp.h TV()).
    """
    M = np.zeros((ord, ord))
    for n in range(1, ord):
        # d^n/dx^n x^s = s!/(s-n)! x^(s-n)  for s >= n
        for s1 in range(n, ord):
            c1 = math.factorial(s1) / math.factorial(s1 - n)
            for s2 in range(n, ord):
                c2 = math.factorial(s2) / math.factorial(s2 - n)
                p = s1 + s2 - 2 * n  # power of the product
                if truncate and p > ord:
                    continue  # reference truncation of high-power terms
                # integral of x^p over [-1/2, 1/2]
                integ = 0.0 if p % 2 == 1 else (0.5**p) / (p + 1)
                M[s1, s2] += c1 * c2 * integ
    return M


def weno_ideal_weights(ord: int) -> tuple[np.ndarray, float]:
    """Idealized weights and sigma for the WENO limiter.

    These are tuning constants of the scheme (ref: WenoLimiter.h
    wenoSetIdealSigma) — part of the numerical method's definition, kept
    identical so convergence behavior matches the reference.
    Returns (idl[hs+1+1], sigma) already convexified (idl sums to 1).
    """
    hs = (ord - 1) // 2
    if ord == 3:
        sigma = 0.0343557947899881
        idl = np.array([1.0, 1.0, 1224.61619926508])
    elif ord == 5:
        sigma = 0.73564225445964
        idl = np.array([1.0, 73.564225445964, 1.0, 1584.89319246111])
    elif ord == 7:
        sigma = 0.125594321575479
        idl = np.array([1.0, 7.35642254459641, 7.35642254459641, 1.0, 794.328234724281])
    elif ord == 9:
        sigma = 0.0288539981181442
        idl = np.array([1.0, 2.15766927997459, 2.40224886796286, 2.15766927997459,
                        1.0, 1136.12697719888])
    else:
        sigma = 0.1
        idl = np.ones(hs + 2)
    idl = idl / idl.sum()
    return idl, sigma


def mirror_recon_matrices(dz: np.ndarray, ord: int,
                          iface: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Per-cell variable-grid reconstruction matrices for a column with
    MIRROR halos (the SPAM extruded grid, exchange.h:565-606): the stencil
    for cell k uses cells k-hs..k+hs with thicknesses reflected at the
    boundaries. Analog of the reference's variable-grid WENOFUNC matrix
    setup (weno_func_recon_variable.h + TransformMatrices_variable.h).

    Args:
      dz: (nz,) or (nens, nz) cell thicknesses of the recon grid.
      iface: mirror rule — False = layer rule (halo(-1-m)=dz(m)),
        True = interface rule (halo(-1-m)=dz(m+1)).
    Returns:
      (s2c, wrl): shapes (..., nz, ord, ord) and (..., nz, nsub, nsub, nsub).
    """
    dz = np.asarray(dz, dtype=np.float64)
    squeeze = dz.ndim == 1
    if squeeze:
        dz = dz[None, :]
    nens, nz = dz.shape
    nsub = (ord + 1) // 2
    half = ord // 2
    off = 1 if iface else 0
    pad_lo = dz[:, off:off + half][:, ::-1]
    pad_hi = dz[:, nz - half - off:nz - off][:, ::-1]
    dzm = np.concatenate([pad_lo, dz, pad_hi], axis=1)  # (nens, nz+2*half)
    s2c = np.empty((nens, nz, ord, ord))
    wrl = np.empty((nens, nz, nsub, nsub, nsub))
    for e in range(nens):
        for k in range(nz):
            dzloc = dzm[e, k:k + ord] / dzm[e, k + half]
            locs = np.concatenate(([0.0], np.cumsum(dzloc)))
            mid = 0.5 * (locs[half] + locs[half + 1])
            locs -= mid
            s2c[e, k] = sten_to_coefs(locs)
            wrl[e, k] = weno_lower_sten_to_coefs(locs)
    if squeeze:
        return s2c[0], wrl[0]
    return s2c, wrl


def vertical_recon_matrices(dz: np.ndarray, ord: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-interface variable-grid reconstruction matrices for a stretched
    vertical column.

    Analog of the per-level matrix setup in the reference dycore init
    (dynamics/awfl/Dycore.h:897-940). Matrix index ``k`` (0..nz+1) is used by
    the flux kernel at vertical face ``k - k_upw``; its stencil's *central*
    cell is cell ``k-1`` and the face being reconstructed is an edge of that
    central cell. We therefore build, for each k, the ord-cell stencil of
    absolute cells ``k-1-(ord//2) .. k-1+(ord//2)`` (clamped into [0, nz-1]
    for halo cells), normalize widths by the central cell's width, and shift
    so the central cell spans [-1/2, 1/2]. On uniform grids this reproduces
    the reference's matrices exactly.

    Args:
      dz: (nz,) or (nens, nz) cell thicknesses.
    Returns:
      (s2c, wrl): shapes (..., nz+2, ord, ord) and (..., nz+2, hs, hs, hs).
    """
    dz = np.asarray(dz, dtype=np.float64)
    squeeze = dz.ndim == 1
    if squeeze:
        dz = dz[None, :]
    nens, nz = dz.shape
    hs = (ord + 1) // 2
    half = ord // 2
    s2c = np.empty((nens, nz + 2, ord, ord))
    wrl = np.empty((nens, nz + 2, hs, hs, hs))
    for e in range(nens):
        for k in range(nz + 2):
            center = min(nz - 1, max(0, k - 1))
            cells = [min(nz - 1, max(0, k - 1 - half + kk)) for kk in range(ord)]
            dzloc = dz[e, cells] / dz[e, center]
            locs = np.concatenate(([0.0], np.cumsum(dzloc)))
            mid = 0.5 * (locs[half] + locs[half + 1])
            locs -= mid
            s2c[e, k] = sten_to_coefs(locs)
            wrl[e, k] = weno_lower_sten_to_coefs(locs)
    if squeeze:
        return s2c[0], wrl[0]
    return s2c, wrl
