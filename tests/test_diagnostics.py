"""Smoke tests for the SPAM diagnostics registry
(ref: extrudedmodel.h:21-189)."""

import numpy as np
import jax.numpy as jnp

from pam_tpu.spam import ExtrudedGeometry, VariableSet, SpamTendencies
from pam_tpu.spam import testcases as tcs
from pam_tpu.spam import diagnostics as diag
from pam_tpu.spam.thermo import IdealGasPottemp


def test_diagnostics_shapes_and_values():
    tc = tcs.RisingBubble()
    nx, nz = 12, 10
    geom = ExtrudedGeometry.build(nx, np.linspace(0.0, tc.Lz, nz + 1),
                                  tc.Lx, 2, jnp.float64)
    thermo = IdealGasPottemp()
    vs = VariableSet(variant="CE", geom=geom, thermo=thermo)
    tend = SpamTendencies(geom=geom, varset=vs, thermo=thermo, grav=tc.g)
    dens, v, w, geop = tcs.setup_testcase(tc, geom, thermo)
    out = diag.compute_diagnostics(tend, dens, v, w)
    assert set(out) == {"total_dens", "densl", "QHZl", "zeta"}
    assert out["total_dens"].shape == (2, nz, nx)
    assert out["densl"].shape == (2, 2, nz, nx)
    assert out["QHZl"].shape == (2, nz + 1, nx)
    # densl of the mass density should be the physical density (~1 kg/m3)
    rho = np.asarray(out["densl"][0])
    assert 0.5 < rho.mean() < 1.5
    # at rest: no vorticity, no PV
    assert np.abs(np.asarray(out["zeta"])[:, 1:-1]).max() == 0.0
    assert np.abs(np.asarray(out["QHZl"])).max() == 0.0
