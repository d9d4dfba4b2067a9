"""Reconstruction-matrix parity and WENO convergence tests.

Mirrors the reference test strategy (dynamics/awfl/unit/recon_regular.cpp:
grid-convergence of the reconstruction on smooth data) plus direct parity
checks against the generated constants in TransformMatrices.h.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pam_tpu.ops import recon_matrices as rm
from pam_tpu.ops import weno


def test_gll_matches_reference_tables():
    p, w = rm.gll_points_weights(5)
    assert np.allclose(p, [-0.5, -0.32732683535398857, 0.0,
                           0.32732683535398857, 0.5])
    assert np.allclose(w, [0.05, 0.27222222222222222, 0.35555555555555556,
                           0.27222222222222222, 0.05])


def test_tv_quadform_matches_reference():
    # coefficients printed in TransformMatrices.h coefs_to_tv (ord 3, 5, 7)
    M3 = rm.tv_quadform(3)
    a = np.array([0.3, -1.2, 0.7])
    assert np.isclose(a @ M3 @ a, 1.0 * a[1] ** 2 + 4.333333333333333 * a[2] ** 2)
    M5 = rm.tv_quadform(5)
    a = np.array([0.1, 0.2, -0.4, 1.1, -0.6])
    ref = (a[1] ** 2 + 4.333333333333333 * a[2] ** 2 + 0.5 * a[1] * a[3] +
           39.1125 * a[3] ** 2 + 4.2 * a[2] * a[4] + 625.8 * a[4] ** 2)
    assert np.isclose(a @ M5 @ a, ref)


def test_coefs_to_gll_lower():
    G = rm.coefs_to_gll_lower(5)
    assert np.allclose(G[:, 0], [1, -0.5, 0.25, -0.125, 0.0625])
    assert np.allclose(G[:, 1], [1, 0.5, 0.25, 0.125, 0.0625])


def test_sten_to_coefs_exact_polynomials():
    for ord in (3, 5, 7):
        locs = rm.normalized_edge_locs(ord)
        S = rm.sten_to_coefs(ord)
        for deg in range(ord):
            u = np.array([(locs[j + 1] ** (deg + 1) - locs[j] ** (deg + 1)) /
                          ((deg + 1) * (locs[j + 1] - locs[j]))
                          for j in range(ord)])
            expect = np.zeros(ord)
            expect[deg] = 1.0
            assert np.allclose(S @ u, expect, atol=1e-11)


def test_variable_grid_matches_uniform():
    s2c, wrl = rm.vertical_recon_matrices(np.ones(12), 5)
    S, W = rm.sten_to_coefs(5), rm.weno_lower_sten_to_coefs(5)
    for k in range(4, 9):  # interior levels see a uniform stencil
        assert np.allclose(s2c[k], S)
        assert np.allclose(wrl[k], W)


def test_variable_grid_exact_on_stretched():
    """Reconstruction is exact for polynomials on a stretched grid."""
    rng = np.random.default_rng(0)
    dz = 1.0 + 0.5 * rng.random(16)
    s2c, wrl = rm.vertical_recon_matrices(dz, 5)
    k = 8  # interior
    cells = np.arange(k - 3, k + 2)
    edges_abs = np.concatenate(([0], np.cumsum(dz)))
    locs = edges_abs[cells[0]:cells[-1] + 2].copy()
    locs = (locs - 0.5 * (locs[2] + locs[3])) / dz[k - 1]
    # average of cubic over each cell
    f = lambda a, b: (b ** 4 - a ** 4) / (4 * (b - a))
    u = np.array([f(locs[j], locs[j + 1]) for j in range(5)])
    coefs = s2c[k] @ u
    assert np.allclose(coefs, [0, 0, 0, 1, 0], atol=1e-9)


@pytest.mark.parametrize("ord", [3, 5, 7])
def test_weno_convergence_order(ord):
    """Face reconstruction of a smooth function converges at design order
    (analog of dynamics/awfl/unit/recon_regular.cpp test_convergence)."""
    tables = weno.weno_tables(ord, dtype=jnp.float64)
    hs = (ord + 1) // 2
    errs = []
    ns = [16, 32, 64]
    for n in ns:
        dx = 1.0 / n
        edges = np.linspace(0.0, 1.0, n + 1)
        # cell averages of sin(2 pi x)
        u = (np.cos(2 * np.pi * edges[:-1]) - np.cos(2 * np.pi * edges[1:])) / \
            (2 * np.pi * dx)
        u_halo = np.concatenate([u[-hs:], u, u[:hs]])
        valL, valR = weno.reconstruct_faces_both(jnp.asarray(u_halo), 0, tables)
        exact = np.sin(2 * np.pi * edges)
        errs.append(np.abs(np.asarray(valL) - exact).max())
    rate = np.log2(errs[0] / errs[1]), np.log2(errs[1] / errs[2])
    # ord=3's tuned limiter constants give ~2nd-order edge values on this
    # test (verified identical to a scalar port of the reference limiter);
    # ord 5/7 achieve design order.
    expect = 2.0 if ord == 3 else ord
    assert min(rate) > expect - 0.7, (errs, rate)


def test_weno_upwind_matches_both():
    """Upwind-selected single evaluation equals selecting from the pair."""
    tables = weno.weno_tables(5, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    u = rng.random(24)
    u_halo = np.concatenate([u[-3:], u, u[:3]])
    valL, valR = weno.reconstruct_faces_both(jnp.asarray(u_halo), 0, tables)
    upw = jnp.asarray(rng.random(25) > 0.5)
    val = weno.reconstruct_faces_upwind(jnp.asarray(u_halo), 0, tables, upw)
    expect = jnp.where(upw, valL, valR)
    assert np.allclose(val, expect, atol=1e-13)


def test_weno_limits_oscillations():
    """A step function must reconstruct without large overshoot."""
    tables = weno.weno_tables(5, dtype=jnp.float64)
    u = np.zeros(32)
    u[16:] = 1.0
    u_halo = np.concatenate([np.zeros(3), u, np.ones(3)])
    valL, valR = weno.reconstruct_faces_both(jnp.asarray(u_halo), 0, tables)
    assert np.asarray(valL).min() > -0.02 and np.asarray(valL).max() < 1.02


def _scalar_weno_reference(u, ord):
    """Direct scalar transliteration of the reference limiter algorithm
    (WenoLimiter.h compute_weno_coefs) used purely as a test oracle."""
    hs = (ord - 1) // 2
    s2c = rm.sten_to_coefs(ord)
    wrl = rm.weno_lower_sten_to_coefs(ord)
    idl, sigma = rm.weno_ideal_weights(ord)
    a_lo = np.zeros((hs + 1, hs + 1))
    for i in range(hs + 1):
        for ii in range(hs + 1):
            a_lo[i, ii] = sum(wrl[i, s, ii] * u[i + s] for s in range(hs + 1))
    a_hi = np.array([sum(s2c[ii, s] * u[s] for s in range(ord))
                     for ii in range(ord)])
    for i in range(hs + 1):
        for ii in range(hs + 1):
            a_hi[ii] -= idl[i] * a_lo[i, ii]
    a_hi /= idl[hs + 1]
    Mlo, Mhi = rm.tv_quadform(hs + 1), rm.tv_quadform(ord)
    tv = np.array([a_lo[i] @ Mlo @ a_lo[i] for i in range(hs + 1)] +
                  [a_hi @ Mhi @ a_hi])
    lo_avg = tv[:hs + 1].mean()
    tv[hs + 1] = lo_avg + (tv[hs + 1] - lo_avg) * sigma
    eps = 1e-20
    w = idl / (tv * tv + eps)
    w /= (w.sum() + eps)
    w = w * (idl + idl * idl - 3 * idl * w + w * w) / \
        (idl * idl + w * (1 - 2 * idl))
    w /= (w.sum() + eps)
    aw = w[hs + 1] * a_hi
    for i in range(hs + 1):
        for ii in range(hs + 1):
            aw[ii] += w[i] * a_lo[i, ii]
    return aw


@pytest.mark.parametrize("ord", [3, 5, 7])
def test_weno_coefs_match_scalar_oracle(ord):
    tables = weno.weno_tables(ord, dtype=jnp.float64)
    s2c, wrl, tvh, tvl, c2g, idl, sigma = tables
    rng = np.random.default_rng(0)
    for _ in range(10):
        u = np.cumsum(rng.standard_normal(ord))
        mine = np.asarray(weno.weno_coefs(jnp.asarray(u), s2c, wrl, tvh, tvl,
                                          idl, sigma))
        ref = _scalar_weno_reference(u, ord)
        assert np.allclose(mine, ref, rtol=1e-12, atol=1e-12)
