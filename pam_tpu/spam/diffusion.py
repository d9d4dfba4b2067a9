"""Scalar and velocity (hyper)diffusion for the SPAM extruded model.

Parity reference: dynamics/spam/src/models/extrudedmodel.h
add_scalar_diffusion (:1176-1293) and add_velocity_diffusion_2d
(:1294-1438), invoked at the end of apply_symplectic when any coefficient
is positive (:2439-2484). The velocity diffusion is the standard
vorticity/divergence (Hodge-Laplacian) split:

    dv/dt += nu_div * grad(div u) - nu_vort * curl(zeta)

Sign convention matches tendencies.py: these functions ADD to the returned
RHS ``F`` with d(state)/dt = -F.

All diagonal Hodge factors follow hodge_star_extruded.h (H10:111, H01:197,
Hn1:456, Hn1bar, Hnm11bar:356, Hn0bar:411) specialised to ndims=1 with a
uniform x grid and per-ensemble variable z grid.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import operators as op
from .operators import rollm, mirror_layer, AXZ


def scalar_diffusion(tend, dens, denstend, coeff_h, coeff_v,
                     diffused_ids=None):
    """Add scalar diffusion to ``denstend`` for the diffused densities.

    Diffuses *concentrations* q_l = dens_l / rho and multiplies the flux
    divergence back by rho (extrudedmodel.h:1204-1292). The diffused set
    defaults to the entropic density plus positive physics tracers marked
    diffused (variableset.h:991,1104: dens_id_entr diffused, mass not).
    """
    g, vs = tend.geom, tend.varset
    if diffused_ids is None:
        diffused_ids = [vs.dens_id_entr] + [
            2 + i for i in range(vs.ntracers_physics)]
    rho_n = vs.get_total_density(dens)
    rho0 = op.Hn1bar(rho_n, g)
    dsel = dens[jnp.asarray(diffused_ids)]
    q = dsel / rho_n[None]
    if tend.force_refstate_hydrostatic_balance and tend.ref_q_pi is not None:
        q = q - tend.ref_q_pi[jnp.asarray(diffused_ids)][:, :, :, None]

    dz_d = jnp.asarray(g.dz_d, dens.dtype)[:, :, None]
    dz_p = jnp.asarray(g.dz_p, dens.dtype)[:, :, None]

    # horizontal flux at x-edges: D0 * H10_diag (dz_d/dx)
    Fx = op.D0_x(q) * (dz_d / g.dx)
    hdiv = op.Dnm1bar_x(Fx)
    # vertical flux at interior interfaces: D0_vert * H01_diag (dx/dz_p)
    Fz_int = (q[..., 1:, :] - q[..., :-1, :]) * (g.dx / dz_p)
    zeros = jnp.zeros_like(Fz_int[..., :1, :])
    Fz = jnp.concatenate([zeros, Fz_int, zeros], axis=AXZ)
    vdiv = op.Dnm1bar_vert(Fz)

    Hn1bar_diag = 1.0 / (g.dx * dz_d)
    diff = (-coeff_h * rho_n[None] * Hn1bar_diag * hdiv
            - coeff_v * rho_n[None] * Hn1bar_diag * vdiv)
    return denstend.at[jnp.asarray(diffused_ids)].add(diff)


def velocity_diffusion(tend, v, w, vtend, wtend,
                       vort_h, vort_v, div_h, div_v):
    """Add velocity diffusion via the vorticity/divergence split
    (extrudedmodel.h add_velocity_diffusion_2d:1294-1438).

    v: (nens, nz, nx) primal x 1-forms; w: (nens, nz-1, nx) primal z
    1-forms. Interior behavior equals -coeff * (vector Laplacian) added to
    the RHS F (so d(u)/dt gains +coeff * Laplacian u).
    """
    g = tend.geom
    dtype = v.dtype
    dz_d = jnp.asarray(g.dz_d, dtype)[:, :, None]     # (nens, nz, 1)
    dz_p = jnp.asarray(g.dz_p, dtype)[:, :, None]     # (nens, nz-1, 1)

    vv = v
    if (tend.force_refstate_hydrostatic_balance and
            getattr(tend, "ref_v", None) is not None):
        vv = v - tend.ref_v[:, :, None]

    # ---- vorticity path: qhz = Hn1 * D1(v, w) at dual vertices ----
    w_pad = mirror_layer(w, 1)
    zeta = op.D1_ext(vv, w_pad)                       # (nens, nz+1, nx)
    # Hn1_diag at interior vertex k = 1/(dx*dz_p[k-1]) (hodge:456-461);
    # boundary rows forced to zero (set_bnd, :1229)
    inv_area = jnp.concatenate(
        [jnp.zeros_like(dz_p[..., :1, :]), 1.0 / (g.dx * dz_p),
         jnp.zeros_like(dz_p[..., :1, :])], axis=AXZ)
    qhz = zeta * inv_area

    # V vort tendency at v-points k: +c*(dx/dz_d[k])*(qhz[k+1]-qhz[k])
    # (Vtend -= c*D0bar_vert*Hnm11bar_diag with Hnm11bar = -dx/dz_d,
    #  hodge:356-364)
    dqz = qhz[..., 1:, :] - qhz[..., :-1, :]          # (nens, nz, nx)
    vtend = vtend + vort_h * (g.dx / dz_d) * dqz

    # W vort tendency at w-points k: -c*(dz_p[k]/dx)*(qhz[k+1,i+1]-qhz[k+1,i])
    # (Wtend -= c*D0bar_ext*Hn0bar_diag with Hn0bar = -dz_p/dx, hodge:411-416;
    #  D0bar_ext gives the twisted x-difference, orientation such that the
    #  interior combination is dissipative)
    qhz_in = qhz[..., 1:-1, :]                        # (nens, nz-1, nx)
    dqx = rollm(qhz_in, 1) - qhz_in                   # qhz[i+1]-qhz[i]
    wtend = wtend - vort_v * (dz_p / g.dx) * dqx

    # ---- divergence path: div = Hn1bar * (Dnm1bar H10 v + Dnm1bar_vert H01 w)
    U = op.H10(vv, g)
    UW = op.H01(w, g)
    div = (op.Dnm1bar_x(U) + op.Dnm1bar_vert(UW)) / (g.dx * dz_d)
    # V div tendency: -c * D0(div) = -(div[i]-div[i-1])
    vtend = vtend - div_h * op.D0_x(div)
    # W div tendency: -c * D0_vert(div) = -(div[k+1]-div[k])
    wtend = wtend - div_v * (div[..., 1:, :] - div[..., :-1, :])
    return vtend, wtend
