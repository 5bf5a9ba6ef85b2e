"""Nonlinear physics anchor: finite-amplitude plane-wave harmonic growth
vs the Fubini solution.

A lossless Westervelt plane wave develops harmonics with amplitudes
B_n(sigma) = 2 p0 J_n(n sigma) / (n sigma), sigma = x / x_shock,
x_shock = rho c^3 / (beta omega p0)  (Blackstock/Hamilton, Nonlinear
Acoustics ch. 4).  A quasi-1D Westervelt run (rigid side walls = natural
BCs keep the wave plane) must reproduce the second-harmonic-to-
fundamental ratio at an interior probe.  This anchors the NONLINEAR
solver externally, like the O'Neil test anchors the linear one — a
validation the reference itself does not carry."""

import jax.numpy as jnp
import numpy as np

from fustpu.config import Material, Source
from fustpu.mesh.box import build_box_mesh
from fustpu.models.westervelt import WesterveltModel
from fustpu.utils.eval import PointSampler


def _bessel_j(n: int, x: float, terms: int = 30) -> float:
    """J_n(x) by series (x is O(1) here; converges in a few terms)."""
    import math

    s, fact_m, fact_mn = 0.0, 1.0, float(math.factorial(n))
    for m in range(terms):
        s += (-1) ** m / (fact_m * fact_mn) * (x / 2.0) ** (2 * m + n)
        fact_m *= (m + 1)
        fact_mn *= (m + 1 + n)
    return s


def test_second_harmonic_matches_fubini():
    c0, rho, beta = 1500.0, 1000.0, 5.0
    f0 = 1.0e6
    omega = 2 * np.pi * f0
    p0 = 1.5e6      # the source convention doubles this; sigma ~ 0.34
    L, probe_x = 0.018, 0.012

    mat = Material(sound_speed=c0, density=rho, nonlinearity=beta,
                   attenuation_dB=0.0)
    src = Source(frequency=f0, amplitude=p0, window_periods=2.0)
    lam = c0 / f0
    # 4 cells/wavelength at P=4: the harmonic needs phase-matched
    # propagation (at 2 cells/wavelength numerical dispersion of the
    # 2nd harmonic decoheres its cumulative growth ~3x)
    nx = int(round(4 * L / lam))
    h = L / nx
    mesh = build_box_mesh((nx, 1, 1), 4, hi=(L, h, h))
    # rigid (natural) side walls keep the wave plane; absorb at x=L only
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets("x-"),
                            mesh.boundary_facets("x+"), dtype=jnp.float64)
    dt, spp = model.cfl_dt(0.4)

    pfn = PointSampler(mesh, np.array([[probe_x, h / 2, h / 2]])).jax_probe()
    t_need = (probe_x / c0
              + (src.window_periods + 3.0) * src.period)  # settle + measure
    nsteps = (int(t_need / dt) // spp + 2) * spp
    _, ys = model.solve(model.init_state(), dt, nsteps,
                        probe=lambda s: pfn(s.u))
    # harmonic amplitudes from the last 2 full periods
    w = np.asarray(ys).ravel()[-2 * spp:]
    spec = np.abs(np.fft.rfft(w)) / w.size * 2
    B1, B2 = spec[2], spec[4]      # bins: 2 periods -> harmonic n at 2n

    # infer sigma from the MEASURED fundamental (calibration-free):
    # B1 = 2 p0 J1(sigma)/sigma and sigma = x beta omega p0 / (rho c^3)
    K = probe_x * beta * omega / (rho * c0**3)
    sigma = K * B1                 # first guess (B1 ~ p0 for small sigma)
    for _ in range(20):
        p0_eff = B1 * sigma / (2 * _bessel_j(1, sigma))
        sigma = K * p0_eff
    B2_pred = 2 * p0_eff * _bessel_j(2, 2 * sigma) / (2 * sigma)

    assert 0.15 < sigma < 0.9, sigma          # meaningfully nonlinear
    rel = abs(B2 - B2_pred) / B2_pred
    assert rel < 0.02, (B2, B2_pred, sigma, rel)   # measured: 0.04%
    # and the harmonic is a genuine finite fraction of the fundamental
    assert B2 / B1 > 0.05
