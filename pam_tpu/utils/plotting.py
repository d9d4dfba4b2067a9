"""Plotting / analysis utilities.

Parity reference: utils/plotting/{ke_spectra.py, tracer_min.py, skewt.py,
plot.py}. The analysis pieces (spectra, running mean, tracer minima,
dew-point) are importable pure-numpy functions; figure rendering needs
matplotlib (optional — gated at call time) and, for skew-T, metpy when
available (falls back to a plain T/log-p plot).
"""

from __future__ import annotations

import numpy as np


def running_mean(x, N: int):
    """Boundary-shrinking running mean (utils/plotting/ke_spectra.py rm):
    a centered N-window that shrinks SYMMETRICALLY at both ends (the
    window is [i-h, i-h+N) clipped to the array)."""
    x = np.asarray(x, np.float64)
    ret = x.copy()
    h = N // 2
    nx = x.shape[0]
    for i in range(nx):
        lo = max(0, i - h)
        hi = min(nx, i + (N - h))
        ret[i] = np.mean(x[lo:max(hi, lo + 1)])
    return ret


def ke_spectra(u, v, w, dx: float = 500.0):
    """1-D kinetic-energy spectrum along the last axis
    (utils/plotting/ke_spectra.py ke_spectra). Returns (freq, power) with
    E(k) = 0.5 (|u_k|^2 + |v_k|^2 + |w_k|^2) per row, AVERAGED over the
    leading axes (levels/ensemble). Averaging the velocity FIELDS first
    would let cross-level phase cancellation destroy the spectrum (two
    opposite-phase shear layers -> zero power), and FFT-ing the pointwise
    ke field would shift a single mode k to 2k — both wrong."""
    rows = [np.asarray(a).reshape(-1, np.asarray(a).shape[-1])
            for a in (u, v, w)]
    nx = rows[0].shape[-1]
    spd = sum(0.5 * (np.abs(np.fft.rfft(r, axis=-1)) ** 2).mean(axis=0)
              for r in rows)
    freq = np.fft.rfftfreq(nx, d=dx)
    return freq, spd


def tracer_min(state, names=None):
    """Global minima per tracer field (utils/plotting/tracer_min.py) —
    positivity monitor for FCT."""
    names = names or [k for k in state
                      if k not in ("uvel", "vvel", "wvel", "temp")]
    return {n: float(np.min(np.asarray(state[n]))) for n in names}


def dew_point(temp, rho_v):
    """Dew point (C) from temperature (K) and vapor density (kg/m3) by
    inverting the Magnus saturation formula the moist inits use
    (extrudedmodel.h:5209-5212): e = rho_v Rv T; Td solves svp(Td) = e."""
    Rv = 461.0
    e = np.maximum(np.asarray(rho_v) * Rv * np.asarray(temp), 1e-10)
    ln = np.log(e / 610.94)
    return 243.04 * ln / (17.625 - ln)


def plot_ke_spectra(freqs_spds, labels=None, smooth: int = 3, out=None):
    """loglog KE spectra overlay (ke_spectra.py main)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    for i, (f, s) in enumerate(freqs_spds):
        lbl = labels[i] if labels else None
        ax.loglog(f[1:], running_mean(s, smooth)[1:], label=lbl)
    ax.set_xlabel("wavenumber [1/m]")
    ax.set_ylabel("KE power")
    if labels:
        ax.legend()
    if out:
        fig.savefig(out, dpi=120, bbox_inches="tight")
    return fig


def plot_skewt(pressure, temp, dew=None, out=None):
    """Skew-T of a sounding; metpy when available, else T vs log-p
    (utils/plotting/skewt.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    try:
        from metpy.plots import SkewT
        fig = plt.figure(figsize=(9, 11))
        skew = SkewT(fig, rotation=45)
        skew.plot(np.asarray(pressure) / 100, np.asarray(temp) - 273.15, "r")
        if dew is not None:
            skew.plot(np.asarray(pressure) / 100, dew, "g")
        if out:
            fig.savefig(out, dpi=120, bbox_inches="tight")
        return fig
    except ImportError:
        fig, ax = plt.subplots(figsize=(6, 8))
        ax.semilogy(np.asarray(temp) - 273.15, np.asarray(pressure) / 100,
                    "r", label="T")
        if dew is not None:
            ax.semilogy(dew, np.asarray(pressure) / 100, "g", label="Td")
        ax.invert_yaxis()
        ax.set_xlabel("T [C]")
        ax.set_ylabel("p [hPa]")
        ax.legend()
        if out:
            fig.savefig(out, dpi=120, bbox_inches="tight")
        return fig


def plot_field_panels(field2d_by_name, out=None, ncols: int = 2):
    """2-D (z, x) filled-contour panels (utils/plotting/plot.py /
    plot_extrudedmodel2D*.py)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    names = list(field2d_by_name)
    n = len(names)
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(6 * ncols, 3.5 * nrows),
                             squeeze=False)
    for i, name in enumerate(names):
        ax = axes[i // ncols][i % ncols]
        im = ax.imshow(np.asarray(field2d_by_name[name]), origin="lower",
                       aspect="auto", cmap="RdBu_r")
        fig.colorbar(im, ax=ax)
        ax.set_title(name)
    for j in range(n, nrows * ncols):
        axes[j // ncols][j % ncols].axis("off")
    if out:
        fig.savefig(out, dpi=120, bbox_inches="tight")
    return fig
