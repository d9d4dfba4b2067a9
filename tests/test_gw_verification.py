"""Gravity-wave exact linear solution + convergence verification.

Parity reference: GravityWave::sum_series / Exact*Diagnostic
(extrudedmodel.h:6707-6990) and the convergence study
standalone/mmf_simplified/pam-c/gravitywave/convergence.py.
"""

import numpy as np
import pytest

from pam_tpu.spam.testcases import GravityWave
from pam_tpu.spam.thermo import thermo_from_string


@pytest.fixture(scope="module")
def tc_thermo():
    return GravityWave(), thermo_from_string("idealgaspottemp")


def test_series_matches_initial_condition(tc_thermo):
    """At t=0 the mode sum must re-synthesize the Gaussian T/rho
    perturbation (the series is the exact Fourier transform of the IC)."""
    tc, th = tc_thermo
    x = np.linspace(0, tc.Lx, 33)[None, :]
    z = np.linspace(100.0, tc.Lz - 100.0, 11)[:, None]
    sol = tc.sum_series(x, z, 0.0, th)
    dT_ic, drho_ic = tc._pert(x, z, th.cst)
    assert np.abs(sol["drho"] - drho_ic).max() < 1e-12
    assert np.abs(sol["dT"] - dT_ic).max() < 1e-10
    assert np.abs(sol["du"]).max() == 0.0
    assert np.abs(sol["dw"]).max() == 0.0


def test_exact_fields_consistent(tc_thermo):
    """rhoexact/entropicdensityexact/Texact satisfy the ideal-gas relation
    p = rho*Rd*T to linear order in the perturbation amplitude."""
    tc, th = tc_thermo
    x = np.linspace(0, tc.Lx, 17)[None, :]
    z = np.linspace(200.0, tc.Lz - 200.0, 7)[:, None]
    t = 450.0
    rho = tc.rhoexact_f(x, z, t, th)
    T = tc.Texact_f(x, z, t, th)
    sol = tc.sum_series(x, z, t, th)
    p_ref = tc._isothermal(z, tc.p_s, th.cst) + 0.0 * x
    p = p_ref + sol["dp"]
    # rho*Rd*T = p + O(pert^2); perturbations are O(1e-5) relative
    assert np.abs(rho * th.cst.Rd * T - p).max() / tc.p_s < 1e-8


def test_gravity_wave_si_error_vs_exact():
    """A coarse SI run stays close to the analytic linear solution
    (the single-level analog of convergence.py; thresholds ~2x the
    measured errors at this resolution)."""
    from pam_tpu.utils.gw_verification import run_level
    errs, tc, geom = run_level(nx=150, nz=11, dt=20.0, timeend=600.0)
    # signal scales: drho ~ 4e-5, w ~ 6e-3, S ~ 0.1
    assert errs["rho"][1] < 4e-6      # L2
    assert errs["S"][1] < 1e-3
    assert errs["w"][1] < 2e-3
    assert errs["T"][1] < 0.1         # dominated by 2nd-order background
    # dissipation/dispersion split must be finite and small
    for var in ("rho", "S", "w", "T"):
        assert np.isfinite(errs[var][2]) and np.isfinite(errs[var][3])


def test_gravity_wave_exact_diagnostics_shapes():
    import jax.numpy as jnp
    from pam_tpu.spam import ExtrudedGeometry
    from pam_tpu.spam.diagnostics import gravity_wave_exact
    tc = GravityWave()
    th = thermo_from_string("idealgaspottemp")
    geom = ExtrudedGeometry.build(30, np.linspace(0.0, tc.Lz, 11), tc.Lx, 1,
                                  jnp.float64)
    out = gravity_wave_exact(tc, geom, th, 120.0)
    assert out["dense"].shape == (2, 1, 10, 30)
    assert out["densb"].shape == (2, 1, 10, 30)
    assert out["Te"].shape == (1, 10, 30)
    assert out["we"].shape == (1, 9, 30)
    # background density diag matches the reference-state column everywhere
    assert np.ptp(out["densb"][0], axis=-1).max() < 1e-10
