"""Tests for analysis/plotting utilities (ref: utils/plotting/)."""

import numpy as np
import pytest

from pam_tpu.utils import plotting as plo


def test_running_mean():
    x = np.arange(10.0)
    rm = plo.running_mean(x, 3)
    assert rm.shape == x.shape
    np.testing.assert_allclose(rm[5], np.mean(x[4:7]))


def test_ke_spectra_peak():
    # E(k) = 0.5 sum |u_hat|^2: a single-mode u field peaks at ITS
    # wavenumber (FFT-ing the pointwise ke field would double it)
    nx = 128
    dx = 500.0
    x = np.arange(nx) * dx
    k1 = 2 * np.pi * 4 / (nx * dx)
    u = np.sin(k1 * x)
    freq, spd = plo.ke_spectra(u, 0 * u, 0 * u, dx=dx)
    assert freq.shape == spd.shape
    assert np.argmax(spd[1:]) + 1 == 4
    # leading axes average the per-row SPECTRA, not the fields:
    # opposite-phase levels must not cancel to zero power
    u2 = np.stack([u, -u])
    _, spd2 = plo.ke_spectra(u2, 0 * u2, 0 * u2, dx=dx)
    np.testing.assert_allclose(spd2, spd, rtol=1e-12)


def test_tracer_min():
    state = {"water_vapor": np.array([0.1, -0.2]), "uvel": np.ones(2)}
    mins = plo.tracer_min(state)
    assert mins["water_vapor"] == pytest.approx(-0.2)
    assert "uvel" not in mins


def test_dew_point_inverts_magnus():
    # at saturation (rho_v = svp/(Rv T)), dew point == temperature
    T = 290.0
    tc = T - 273.15
    svp = 610.94 * np.exp(17.625 * tc / (243.04 + tc))
    rho_v = svp / (461.0 * T)
    td = plo.dew_point(T, rho_v)
    np.testing.assert_allclose(td, tc, atol=1e-6)


def test_figures_render(tmp_path):
    pytest.importorskip("matplotlib")
    f, s = plo.ke_spectra(np.random.RandomState(0).randn(64),
                          np.zeros(64), np.zeros(64))
    plo.plot_ke_spectra([(f, s)], labels=["a"],
                        out=str(tmp_path / "ke.png"))
    plo.plot_skewt(np.linspace(1e5, 2e4, 20), np.linspace(300, 220, 20),
                   out=str(tmp_path / "skew.png"))
    plo.plot_field_panels({"w": np.random.RandomState(1).randn(10, 20)},
                          out=str(tmp_path / "pan.png"))
    assert (tmp_path / "ke.png").exists()
