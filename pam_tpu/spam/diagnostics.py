"""Built-in SPAM diagnostics.

Parity reference: dynamics/spam/src/models/extrudedmodel.h:21-189
(TotalDensityDiagnostic, Dens0Diagnostic, QHZDiagnostic) and the
layer-model QXYDiagnostic. Each is a pure function of the prognostic state
returning a named array; `compute_diagnostics` evaluates a selection for
output (analog of the Diagnostic list built per testcase,
add_diagnostics + io.outputDiagnostics).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import operators as op
from .operators import mirror_layer


def total_density(tend, dens, v=None, w=None):
    """Total (moist) density as a twisted n-form (extrudedmodel.h:21-54)."""
    return tend.varset.get_total_density(dens)


def dens0(tend, dens, v=None, w=None):
    """Concentration 0-forms dens / cell area ("densl",
    extrudedmodel.h:56-91)."""
    if hasattr(tend, "Hn1bar"):          # 3-D model carries its own star
        return tend.Hn1bar(dens)
    return op.Hn1bar(dens, tend.geom)


def qhz(tend, dens, v, w):
    """Relative PV at dual vertices ("QHZl", extrudedmodel.h:93-131) —
    reuses the dycore's PVPE functional (q_and_f). For the 3-D model this
    is the 2-dof (qxz, qyz) stack."""
    out = tend.q_and_f(dens, v, w)
    return out[0] if isinstance(out, tuple) else out


def qxy(tend, dens, v, w):
    """Vertical-vorticity PV at primal vertices/dual layers ("QXYl",
    ndims=2 only — extrudedmodel.h:133-189 QXYDiagnostic)."""
    out = tend.q_and_f(dens, v, w)
    if not isinstance(out, tuple):
        raise ValueError("QXYl requires the 3-D (ndims=2) model")
    return out[1]


def relative_vorticity(tend, dens, v, w):
    """Raw circulation form zeta = D1(v, w) (interior vertices)."""
    w_pad = mirror_layer(w, 1)
    return op.D1_ext(v, w_pad)


def gravity_wave_exact(tc, geom, thermo, t):
    """Exact-solution and background diagnostics for the GravityWave
    verification run (ExactDensityDiagnostic "dense",
    ExactTemperatureDiagnostic "Te", ExactWDiagnostic "we",
    BackgroundDensityDiagnostic "densb" — extrudedmodel.h:6876-6990).
    Returns a name->array dict; dense/densb are (2, nens, nz, nx) twisted
    n-forms, Te cell-center point values, we the w 1-form at interior
    interfaces."""
    import numpy as np
    from .testcases import project_n1form
    dense = np.stack([
        project_n1form(lambda x, z: tc.rhoexact_f(x, z, t, thermo), geom),
        project_n1form(lambda x, z: tc.entropicdensityexact_f(x, z, t,
                                                              thermo), geom)])
    densb = np.stack([
        project_n1form(lambda x, z: tc.refrho_f(z, thermo) + 0.0 * x, geom),
        project_n1form(lambda x, z: tc.refentropicdensity_f(z, thermo) +
                       0.0 * x, geom)])
    xc = (np.arange(geom.nx) + 0.5) * geom.dx
    zc = 0.5 * (np.asarray(geom.zint_d)[:, :-1] +
                np.asarray(geom.zint_d)[:, 1:])
    X, Z = xc[None, None, :], zc[:, :, None]
    Te = tc.Texact_f(X + 0 * Z, Z + 0 * X, t, thermo)
    Zw = np.asarray(geom.zint_d)[:, 1:-1][:, :, None]
    we = tc.wexact_f(X + 0 * Zw, Zw + 0 * X, t, thermo) * \
        np.asarray(geom.dz_p)[:, :, None]
    return {"dense": dense, "Te": Te, "we": we, "densb": densb}


DIAGNOSTICS = {
    "total_dens": total_density,
    "densl": dens0,
    "QHZl": qhz,
    "QXYl": qxy,
    "zeta": relative_vorticity,
}


def compute_diagnostics(tend, dens, v, w, names=None):
    """Evaluate the named diagnostics; default = all applicable built-ins
    (QXYl only for the 3-D model)."""
    if names is None:
        from .extruded3d import Tendencies3D
        names = list(DIAGNOSTICS)
        if isinstance(tend, Tendencies3D):   # incl. future subclasses
            names.remove("zeta")         # slab-layout circulation form
        else:
            names.remove("QXYl")
    return {n: DIAGNOSTICS[n](tend, dens, v, w) for n in names}
