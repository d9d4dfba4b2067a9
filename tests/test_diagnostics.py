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


def test_diagnostics_3d_model():
    """QXYl and 3-D shapes (QXYDiagnostic, extrudedmodel.h:133-189)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_extruded3d import make_pair, bcast_y
    from pam_tpu.spam import diagnostics
    import jax.numpy as jnp
    tc, geom1, geom3, t1, t3, dens1, v1, w1, geop1 = make_pair()
    dens3 = bcast_y(dens1, geom3.ny, geom3.dy)
    v3 = jnp.zeros((2, 1, geom3.nz, geom3.ny, geom3.nx))
    w3 = jnp.zeros((1, geom3.nz - 1, geom3.ny, geom3.nx))
    out = diagnostics.compute_diagnostics(t3, dens3, v3, w3)
    assert out["QXYl"].shape == (1, geom3.nz, geom3.ny, geom3.nx)
    assert out["QHZl"].shape == (2, 1, geom3.nz + 1, geom3.ny, geom3.nx)
    assert "zeta" not in out
    import numpy as np
    assert np.allclose(np.asarray(out["QXYl"]), 0.0)  # irrotational ICs
