"""AWFL unit-test analogs: banded solve / matvec, Burgers characteristics,
and the exact-inverse wind conversion (VERDICT r1 'missing' item 7).

Reference: dynamics/awfl/unit/{matvec, burger_prim} and the banded solver
Dycore.h:1508-1541; couple_wind_exact_inverse variableset.h:807-875."""

import numpy as np
import jax
import jax.numpy as jnp

from pam_tpu.ops import banded, weno
from pam_tpu.spam.dycore import exact_inverse_avg, exact_inverse_w


def test_solve_banded_matches_dense():
    """matvec/solve consistency (unit/matvec analog + the pentadiagonal
    smoke solve in Dycore.h init:851-864)."""
    rng = np.random.RandomState(0)
    nbands, n, nens = 5, 12, 3
    h = (nbands - 1) // 2
    diags = rng.randn(nbands, n, nens)
    diags[h] += 5.0  # diagonal dominance
    # zero out-of-range band entries like the reference fills
    for b in range(nbands):
        off = b - h
        for i in range(n):
            if not (0 <= i + off < n):
                diags[b, i] = 0.0
    rhs = rng.randn(n, nens)
    x = np.asarray(banded.solve_banded(jnp.asarray(diags), jnp.asarray(rhs)))
    # verify by matvec against scipy-style dense assembly
    for e in range(nens):
        A = np.zeros((n, n))
        for b in range(nbands):
            for i in range(n):
                j = i + b - h
                if 0 <= j < n:
                    A[i, j] = diags[b, i, e]
        np.testing.assert_allclose(A @ x[:, e], rhs[:, e], atol=1e-10)


def test_reference_pentadiagonal_example():
    """The exact 5x5 system the reference solves at init (Dycore.h:851-864)."""
    n = 5
    diags = np.zeros((5, n, 1))
    for i in range(n):
        if i > 1:
            diags[0, i, 0] = 0.5
        if i > 0:
            diags[1, i, 0] = -1
        diags[2, i, 0] = 2
        if i < n - 1:
            diags[3, i, 0] = -1
        if i < n - 2:
            diags[4, i, 0] = 0.5
    rhs = np.zeros((n, 1))
    rhs[n // 2, 0] = 1.0
    x = np.asarray(banded.solve_banded(jnp.asarray(diags), jnp.asarray(rhs)))
    A = np.asarray(banded.banded_to_dense(jnp.asarray(diags)))[0]
    np.testing.assert_allclose(A @ x[:, 0], rhs[:, 0], atol=1e-12)


def test_burgers_weno_self_convergence():
    """Burgers' equation with WENO5 reconstruction + upwind Godunov flux:
    L1 self-convergence between grid refinements (unit/burger_prim analog —
    the reference checks L1 between lo/hi resolutions on a step profile)."""
    tb = weno.weno_tables(5, dtype=jnp.float64)

    def run(nx, t_end=0.15):
        x = (np.arange(nx) + 0.5) / nx
        u = np.where((x > 0.4) & (x < 0.6), 1.0, 0.0) + 0.5
        u = jnp.asarray(u)[None, None, :]          # (1, 1, nx) batch dims
        dx = 1.0 / nx
        dt = 0.3 * dx / 1.5

        def rhs(u_):
            sten = [jnp.roll(u_, 2 - s, axis=-1) for s in range(5)]
            aw = weno.weno_coefs_list(sten, *([t for t in tb[:2]] +
                                              [tb[2], tb[3], tb[5], tb[6]]))
            left = weno._eval_edge_list(aw, tb[4][:, 0])
            right = weno._eval_edge_list(aw, tb[4][:, 1])
            # Godunov upwind for convex flux with u > 0: use the right
            # edge of the upwind (left) cell
            u_face = jnp.roll(right, 1, axis=-1)   # face i: cell i-1 right
            f = 0.5 * u_face * u_face
            return -(jnp.roll(f, -1, axis=-1) - f) / dx

        nsteps = int(t_end / dt)

        def body(u_, _):
            k1 = u_ + dt * rhs(u_)
            k2 = 0.75 * u_ + 0.25 * (k1 + dt * rhs(k1))
            return (u_ + 2.0 * (k2 + dt * rhs(k2))) / 3.0, None

        u, _ = jax.lax.scan(body, u, None, length=nsteps)
        return np.asarray(u)[0, 0]

    u_lo, u_hi, u_hi2 = run(100), run(200), run(400)

    def L1(lo, hi):
        f = len(hi) // len(lo)
        interp = hi.reshape(len(lo), f).mean(axis=1)
        return np.abs(interp - lo).sum() / np.abs(interp).sum()

    e1 = L1(u_lo, u_hi2)
    e2 = L1(u_hi, u_hi2)
    assert np.isfinite(u_hi2).all()
    assert e2 < e1          # refinement reduces L1 error
    assert e1 < 0.05        # and the coarse error is already small


def test_exact_inverse_wind_roundtrip():
    """couple_wind_exact_inverse: averaging the exact-inverse edge winds
    reproduces the cell-center winds to machine precision (odd nx)."""
    rng = np.random.RandomState(1)
    u = jnp.asarray(rng.randn(2, 6, 65))             # (nens, nz, nx) odd nx
    v = exact_inverse_avg(u, -1)
    u_back = 0.5 * (v + jnp.roll(v, -1, axis=-1))
    np.testing.assert_allclose(np.asarray(u_back), np.asarray(u), atol=1e-10)

    # w: interface-weighted interpolation roundtrip on a stretched grid
    nz = 10
    dzp = jnp.asarray(np.abs(rng.randn(2, nz - 1)) + 0.5)[:, :, None]
    wvel = jnp.asarray(rng.randn(2, nz, 7))
    w_phys = exact_inverse_w(wvel, dzp)
    # forward map (dynamics_to_coupler w interpolation)
    e = jnp.broadcast_to(dzp, w_phys.shape)
    w_pad = jnp.concatenate([w_phys[:, :1], w_phys, w_phys[:, -1:]], axis=1)
    e_pad = jnp.concatenate([e[:, :1], e, e[:, -1:]], axis=1)
    wd, wu = w_pad[:, :-1], w_pad[:, 1:]
    e_d, e_u = e_pad[:, :-1], e_pad[:, 1:]
    w_mid = wd + (wu - wd) * e_d / (e_u + e_d)
    w_mid = w_mid.at[:, 0].set(w_phys[:, 0])
    w_mid = w_mid.at[:, nz - 1].set(w_phys[:, -1])
    # the top cell's wvel is redundant in the inverse; compare 0..nz-2
    np.testing.assert_allclose(np.asarray(w_mid[:, :nz - 1]),
                               np.asarray(wvel[:, :nz - 1]), atol=1e-10)


def test_exact_inverse_in_coupled_dycore():
    """SpamDycore with couple_wind_exact_inverse reproduces coupler winds
    exactly through a coupler->dynamics->coupler roundtrip (odd nx)."""
    import dataclasses
    from pam_tpu.driver.mmf import setup_supercell_mmf
    drv, state = setup_supercell_mmf(nx=17, ny=1, nz=10, nens=1,
                                     xlen=34000.0, ylen=64000.0,
                                     zlen=20000.0, micro="kessler",
                                     dt_gcm=80.0, dt_crm_phys=20.0,
                                     dycore="spam")
    dyc = dataclasses.replace(drv.dycore, couple_wind_exact_inverse=True)
    # put nonzero structure into the winds
    rng = np.random.RandomState(2)
    state = dict(state)
    state["uvel"] = jnp.asarray(rng.randn(*state["uvel"].shape))
    state["wvel"] = jnp.asarray(rng.randn(*state["wvel"].shape))
    dens, v, w = dyc.coupler_to_dynamics(state)
    out = dyc.dynamics_to_coupler(state, dens, v, w)
    np.testing.assert_allclose(np.asarray(out["uvel"]),
                               np.asarray(state["uvel"]), atol=1e-9)
    # wvel: all rows except the redundant top cell
    np.testing.assert_allclose(np.asarray(out["wvel"])[:, :-1],
                               np.asarray(state["wvel"])[:, :-1], atol=1e-9)
