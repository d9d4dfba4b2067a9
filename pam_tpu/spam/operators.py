"""DEC operators, Hodge stars and wedge/Q/W products for the extruded SPAM
grid (ndims=1 horizontal + z), as whole-array JAX ops.

Parity references: dynamics/spam/src/operators/{ext_deriv.h, hodge_star.h,
hodge_star_extruded.h, wedge.h}. All Hodge stars are the 2nd-order diagonal
variants (diff_ord=2, the reference's compile default, common.h:64-65).

Array layout: (…, nens, nlev, nx); x is periodic (rolls), z stencils use
mirror padding that replicates the reference's Exchange::exchange_mirror
(exchange.h:565-606):

* layer fields:     halo(-1-m) = a(m),   halo(n+m) = a(n-1-m)
* interface fields: halo(-1-m) = a(m+1), halo(n+m) = a(n-2-m)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..parallel import comm

AXZ = -2  # z axis
AXX = -1  # x axis


def rollm(a, s):
    """a shifted so that result[i] = a[i+s] along x (periodic). Routed
    through comm.proll: a plain jnp.roll unsharded / under GSPMD, an
    explicit ppermute halo fetch inside a shard_map axis context."""
    return comm.proll(a, s, axis=AXX)


def _flip(a, sl):
    return jnp.flip(a[..., sl, :], axis=AXZ)


def mirror_layer(a, h: int):
    """Mirror-pad a layer field along z by h (exchange.h:571-585)."""
    bot = _flip(a, slice(0, h))
    top = _flip(a, slice(a.shape[AXZ] - h, None))
    return jnp.concatenate([bot, a, top], axis=AXZ)


def mirror_iface(a, h: int):
    """Mirror-pad an interface field along z by h (exchange.h:589-602)."""
    bot = _flip(a, slice(1, h + 1))
    top = _flip(a, slice(a.shape[AXZ] - 1 - h, a.shape[AXZ] - 1))
    return jnp.concatenate([bot, a, top], axis=AXZ)


# ---------------------------------------------------------------------------
# exterior derivatives (signed neighbor differences)
# ---------------------------------------------------------------------------

def D0_x(f):
    """Horizontal gradient component at x-edges: out[i] = f[i] - f[i-1]
    (ext_deriv.h compute_D0, d=0). Same shape as f (periodic)."""
    return f - rollm(f, -1)


def Dnm1bar_x(U, recon=None):
    """Horizontal part of the dual divergence at dual cells:
    out[i] = U[i+1]*r[i+1] - U[i]*r[i] (ext_deriv.h wDnm1bar)."""
    UR = U if recon is None else U * recon
    return rollm(UR, 1) - UR


def Dnm1bar_vert(UW, recon=None):
    """Vertical part: out[k] = UW[k+1]*r[k+1] - UW[k]*r[k]; UW/recon on
    dual interfaces (nz+1), output on dual layers (nz)."""
    UR = UW if recon is None else UW * recon
    return UR[..., 1:, :] - UR[..., :-1, :]


def D1_ext(v, w_pad):
    """Horizontal-vertical curl at dual vertices k=0..nz (interface index),
    evaluated from v (nz levels) and w (nz-1 levels, mirror-layer-padded by
    1 so w_pad[k] = w[k-1]):
    zeta[k] = v[k-1] - v[k] + w[k-1,i] - w[k-1,i-1]
    (ext_deriv.h:822-843 evaluated at k-1 per functionals.h:281-287).

    Args:
      v: (nens, nz, nx); w_pad: (nens, nz+1, nx) with w_pad[k] = w[k-1],
         w_pad[0] = mirror, w_pad[nz] = mirror.
    Returns (nens, nz+1, nx) with only interior rows 1..nz-1 meaningful.
    """
    nz = v.shape[AXZ]
    # v[k-1] - v[k] for vertex k: pad v as interface field by 1
    v_pad = mirror_iface(v, 1)  # v_pad[k] = v[k-1]
    dv = v_pad[..., :-1, :] - v_pad[..., 1:, :]  # (nens, nz+1, nx)
    dw = w_pad - rollm(w_pad, -1)
    return dv + dw


# ---------------------------------------------------------------------------
# Hodge stars (diagonal, 2nd order)
# ---------------------------------------------------------------------------

def H10(v, geom):
    """U = H10 v at dual cells: U[k] = v[k] * dz_d(k)/dx
    (hodge_star_extruded.h:111-147, ndims=1). v, U: (nens, nz, nx)."""
    dz = jnp.asarray(geom.dz_d, v.dtype)[:, :, None]
    return v * (dz / geom.dx)


def H01(w, geom):
    """UW = H01 w at interior dual interfaces: UW[k] = w[k-1]*dx/dz_p(k-1)
    for k=1..nz-1; UW[0]=UW[nz]=0 (rigid boundaries).
    (hodge_star_extruded.h:197-237). w: (nens, nz-1, nx) -> (nens, nz+1, nx)."""
    dzp = jnp.asarray(geom.dz_p, w.dtype)[:, :, None]
    inner = w * (geom.dx / dzp)  # (nens, nz-1, nx)
    z = jnp.zeros_like(inner[..., :1, :])
    return jnp.concatenate([z, inner, z], axis=AXZ)


def Hn1bar(dens, geom):
    """0-form from dual n-form: dens0[k] = dens[k]/(dx*dz_d(k))
    (hodge_star_extruded.h:517-624). Works for (…, nens, nz, nx)."""
    dz = jnp.asarray(geom.dz_d, dens.dtype)[:, :, None]
    return dens / (geom.dx * dz)


# ---------------------------------------------------------------------------
# wedge / W / Q operators (ndims=1 signs)
# ---------------------------------------------------------------------------

def Wxz_u(FW):
    """Tangent average of FW (dual interfaces, nz+1) onto v-points
    (primal interfaces, nz): FT[k] = -0.25*(FW[k,i]+FW[k,i-1]+FW[k+1,i]+
    FW[k+1,i-1]) interior; FT[0] = -0.5*(FW[0,i]+FW[0,i-1]);
    FT[nz-1] = -0.5*(FW[nz,i]+FW[nz,i-1]) (wedge.h:811-856)."""
    s = FW + rollm(FW, -1)  # (nens, nz+1, nx): FW[k,i]+FW[k,i-1]
    interior = -0.25 * (s[..., 1:-2, :] + s[..., 2:-1, :])  # k=1..nz-2
    bot = -0.5 * s[..., 0:1, :]
    top = -0.5 * s[..., -1:, :]
    return jnp.concatenate([bot, interior, top], axis=AXZ)


def Wxz_w(F):
    """Tangent average of F (dual layers, nz) onto w-points (primal layers,
    nz-1): FTW[k] = 0.25*(F[k,i]+F[k,i+1]+F[k+1,i]+F[k+1,i+1]) interior;
    the BOUNDARY rows read the interior-shifted dual layer —
    FTW[0] = 0.25*(F[1,i]+F[1,i+1]) (compute_Wxz_w_bottom reads
    Uvar(k+1), wedge.h:891-902) and FTW[nz-2] = 0.25*(F[nz-2,i]+
    F[nz-2,i+1]) (compute_Wxz_w_top reads Uvar(k), wedge.h:880-889);
    note the boundary coefficient is 0.25, not 0.5. (The pre-round-4
    boundary rows used F[0]/F[nz-1] — found by tests/spam_oracle.py.)"""
    s = F + rollm(F, 1)  # F[k,i]+F[k,i+1]
    interior = 0.25 * (s[..., 1:-2, :] + s[..., 2:-1, :])  # k=1..nz-3
    bot = 0.25 * s[..., 1:2, :]
    top = 0.25 * s[..., -2:-1, :]
    return jnp.concatenate([bot, interior, top], axis=AXZ)


def R_avg(D):
    """Dual-vertex average of total density (dual layers) onto interior
    vertices with boundary-weighted variants (functionals.h R/Rbnd):
    hv[k] = 0.25*(D[k-1,i]+D[k-1,i-1]+D[k,i]+D[k,i-1])  k=2..nz-2... — here
    we return the full (nens, nz+1, nx) array with the reference's interior,
    bottom (k=1) and top (k=nz-1) forms; rows 0 and nz are zero."""
    Ds = D + rollm(D, -1)  # D[k,i]+D[k,i-1]
    nz = D.shape[AXZ]
    # interior vertices k: hv = 0.25*(Ds[k-1] + Ds[k])
    interior = 0.25 * (Ds[..., 1:-1, :] + Ds[..., 2:, :])  # k=2..nz-1... see below
    # vertex k (2..nz-2): 0.25*(Ds[k-1]+Ds[k])
    full_int = 0.25 * (Ds[..., :-1, :] + Ds[..., 1:, :])   # k=1..nz-1 naive
    # bottom vertex k=1 (functionals.h compute_hvxz_bottom at k-1=0):
    # 0.25*Ds[1] + 0.5*Ds[0]
    bot = 0.25 * Ds[..., 1:2, :] + 0.5 * Ds[..., 0:1, :]
    # top vertex k=nz-1 (compute_hvxz_top at k-1=nz-2): 0.25*Ds[nz-2]+0.5*Ds[nz-1]
    top = 0.25 * Ds[..., -2:-1, :] + 0.5 * Ds[..., -1:, :]
    z = jnp.zeros_like(bot)
    if nz > 2:
        mid = full_int[..., 1:-1, :]  # vertices 2..nz-2
        return jnp.concatenate([z, bot, mid, top, z], axis=AXZ)
    return jnp.concatenate([z, bot, top, z], axis=AXZ)


def Qxz_w(qr, qvr, F):
    """PV flux contribution to the w-tendency at w-points (primal layers,
    nz-1), energy-conserving form (wedge.h compute_Qxz_w_EC + _top/_bottom,
    ndims=1 => sgn=+1):

    interior kw=1..nz-3:
      0.25*sum_m Flux_m*Recon_m with
      Flux = [F[kw,i], F[kw,i+1], F[kw+1,i], F[kw+1,i+1]]
      Recon_m = 0.5*(qvr[kw or kw+1, i or i+1] + qr[kw,i])
    bottom kw=0: 0.25*(F[1,i]*r0 + F[1,i+1]*r1), r_m = 0.5*(qvr[1,i or i+1]+qr[0,i])
    top kw=nz-2: 0.25*(F[kw,i]*r0 + F[kw,i+1]*r1), r_m = 0.5*(qvr[kw,*]+qr[kw,i])

    qr: (nens, nz-1, nx) [qhzrecon at w-levels]; qvr: (nens, nz, nx)
    [qhzvertrecon at v-levels]; F: (nens, nz, nx).
    """
    Fp = rollm(F, 1)      # F[k,i+1]
    qvrp = rollm(qvr, 1)  # qvr[k,i+1]
    # interior kw=1..nz-3: F/qvr at kw -> [1:-2], at kw+1 -> [2:-1];
    # qr at kw -> [1:-1] (qr has nz-1 entries)
    t = (F[..., 1:-2, :] * (qvr[..., 1:-2, :] + qr[..., 1:-1, :]) +
         Fp[..., 1:-2, :] * (qvrp[..., 1:-2, :] + qr[..., 1:-1, :]) +
         F[..., 2:-1, :] * (qvr[..., 2:-1, :] + qr[..., 1:-1, :]) +
         Fp[..., 2:-1, :] * (qvrp[..., 2:-1, :] + qr[..., 1:-1, :]))
    interior = 0.125 * t  # 0.25 * 0.5
    bot = 0.125 * (F[..., 1:2, :] * (qvr[..., 1:2, :] + qr[..., 0:1, :]) +
                   Fp[..., 1:2, :] * (qvrp[..., 1:2, :] + qr[..., 0:1, :]))
    top = 0.125 * (F[..., -2:-1, :] * (qvr[..., -2:-1, :] + qr[..., -1:, :]) +
                   Fp[..., -2:-1, :] * (qvrp[..., -2:-1, :] + qr[..., -1:, :]))
    return jnp.concatenate([bot, interior, top], axis=AXZ)


def Qxz_u(qr_pad, qvr, FW):
    """PV flux contribution to the v-tendency at v-points (primal
    interfaces, nz), EC form (wedge.h compute_Qxz_u_EC + _top/_bottom,
    ndims=1 => sgn=-1):

    interior kv=1..nz-2:
      -0.25*sum Flux_m*Recon_m with
      Flux = [FW[kv,i], FW[kv,i-1], FW[kv+1,i], FW[kv+1,i-1]]
      Recon = 0.5*(qr[kv-1 or kv, i or i-1] + qvr[kv,i])
    boundary kv=0:    -0.5*(FW[0,i]+FW[0,i-1]) * qvr[0,i]   (= 0: FW[0]=0)
    boundary kv=nz-1: -0.5*(FW[nz,i]+FW[nz,i-1]) * qvr[nz-1,i] (= 0)

    qr_pad: (nens, nz+1, nx) = qhzrecon mirror-layer-padded by 1 so
    qr_pad[k] = qr[k-1]; qvr: (nens, nz, nx); FW: (nens, nz+1, nx).
    """
    FWm = rollm(FW, -1)     # FW[k,i-1]
    qrm = rollm(qr_pad, -1)  # qr[k-1,i-1]
    # interior kv: Flux at kv,kv+1; qr at kv-1=qr_pad[kv], kv=qr_pad[kv+1]
    t = (FW[..., 1:-2, :] * (qr_pad[..., 1:-2, :] + qvr[..., 1:-1, :]) +
         FWm[..., 1:-2, :] * (qrm[..., 1:-2, :] + qvr[..., 1:-1, :]) +
         FW[..., 2:-1, :] * (qr_pad[..., 2:-1, :] + qvr[..., 1:-1, :]) +
         FWm[..., 2:-1, :] * (qrm[..., 2:-1, :] + qvr[..., 1:-1, :]))
    interior = -0.125 * t
    bot = -0.5 * (FW[..., 0:1, :] + FWm[..., 0:1, :]) * qvr[..., 0:1, :]
    top = -0.5 * (FW[..., -1:, :] + FWm[..., -1:, :]) * qvr[..., -1:, :]
    return jnp.concatenate([bot, interior, top], axis=AXZ)


def phi_x(dens0):
    """Edge average along x: he[k,i] = 0.5*(dens0[k,i]+dens0[k,i-1])."""
    return 0.5 * (dens0 + rollm(dens0, -1))


def phi_z_iface(dens0tot_pad):
    """Edge average onto dual interfaces: hew[k] = 0.5*(d0[k]+d0[k-1]) for
    k=0..nz from a mirror-iface-padded-by-1 dens0tot (so pad[k] = d0[k-1])."""
    return 0.5 * (dens0tot_pad[..., 1:, :] + dens0tot_pad[..., :-1, :])


# ---------------------------------------------------------------------------
# higher-order Hodge stars (horizontal stencil corrections; hodge_star.h
# H1/H2bar 3- and 5-point variants:30-193 — diff_ord 2/4/6. The vertical
# factors stay diagonal (vert_diff_ord=2, the reference compile default).
# ---------------------------------------------------------------------------

def _h1_stencil_x(v, ord: int):
    """Flux-averaging correction along x for a 1-form component
    (hodge_star.h H1:43-73). ord in {2, 4, 6}."""
    if ord == 2:
        return v
    if ord == 4:
        return (-1.0 / 24.0) * rollm(v, -1) + (26.0 / 24.0) * v + \
            (-1.0 / 24.0) * rollm(v, 1)
    if ord == 6:
        return ((9.0 / 1920.0) * rollm(v, -2) +
                (-116.0 / 1920.0) * rollm(v, -1) +
                (2134.0 / 1920.0) * v +
                (-116.0 / 1920.0) * rollm(v, 1) +
                (9.0 / 1920.0) * rollm(v, 2))
    raise ValueError(f"diff_ord must be 2, 4 or 6, got {ord}")


def _h2bar_stencil_x(a, ord: int):
    """0-form recovery correction along x (hodge_star.h H2bar:153-193)."""
    if ord == 2:
        return a
    if ord == 4:
        return a + ((-1.0 / 24.0) * rollm(a, -1) + (2.0 / 24.0) * a +
                    (-1.0 / 24.0) * rollm(a, 1))
    if ord == 6:
        return a + ((9.0 / 1920.0) * rollm(a, -2) +
                    (-116.0 / 1920.0) * rollm(a, -1) +
                    (214.0 / 1920.0) * a +
                    (-116.0 / 1920.0) * rollm(a, 1) +
                    (9.0 / 1920.0) * rollm(a, 2))
    raise ValueError(f"diff_ord must be 2, 4 or 6, got {ord}")


def H10_ho(v, geom, ord: int = 2):
    """H10 with horizontal diff_ord 2/4/6 (hodge_star_extruded.h H10 +
    hodge_star.h H1 stencils)."""
    return H10(_h1_stencil_x(v, ord), geom)


def Hn1bar_ho(dens, geom, ord: int = 2):
    """Hn1bar with horizontal diff_ord 2/4/6 (fourier/pointwise Hn1bar +
    hodge_star.h H2bar stencils)."""
    return _h2bar_stencil_x(Hn1bar(dens, geom), ord)
