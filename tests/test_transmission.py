"""Physics anchor: two-layer interface transmission.

A CW plane wave crossing an impedance step Z1 -> Z2 at normal incidence
transmits with the closed-form pressure coefficient

    T_p = 2 Z2 / (Z1 + Z2),        Z = rho c.

This validates the heterogeneous-media machinery (per-cell material
fields, the combined-pass stiffness stage) against an external analytic
solution — the reference carries no heterogeneous validation at all
(its demos are uniform water).  Companion anchors: O'Neil (linear,
imported mesh) and Fubini (nonlinear harmonic growth).
"""

import numpy as np
import jax.numpy as jnp

from fustpu.config import Material, Source
from fustpu.mesh.box import build_box_mesh
from fustpu.models.linear import LinearWaveModel
from fustpu.utils.eval import PointSampler


def test_two_layer_transmission_matches_analytic():
    c1, rho1 = 1500.0, 1000.0
    c2, rho2 = 1800.0, 1100.0
    Z1, Z2 = rho1 * c1, rho2 * c2
    T_p = 2.0 * Z2 / (Z1 + Z2)                    # 1.1379...

    f0, p0 = 0.5e6, 60000.0
    lam1 = c1 / f0
    nx = 48
    L = 12.0 * lam1                               # interface at L/2
    h = L / nx                                    # = lam1 / 4
    mesh = build_box_mesh((nx, 1, 1), 4, hi=(L, h, h))

    cs = np.full(mesh.nc, c1)
    cs[nx // 2:] = c2
    rho = np.full(mesh.nc, rho1)
    rho[nx // 2:] = rho2
    mat = Material(sound_speed=cs, density=rho)
    src = Source(frequency=f0, amplitude=p0, window_periods=2.0)

    model = LinearWaveModel(mesh, mat, src, mesh.boundary_facets("x-"),
                            mesh.boundary_facets("x+"), dtype=jnp.float64)
    dt, spp = model.cfl_dt(0.4)

    # probe in medium 2, far enough from the interface and the absorber
    xp = 0.75 * L
    pts = np.array([[xp, h / 2, h / 2]])
    pfn = PointSampler(mesh, pts).jax_probe()

    # measure after the ramped CW front has passed the probe, but before
    # the source-wall re-reflection of the interface echo returns through
    # it (earliest at t_echo)
    t_front = (L / 2) / c1 + (xp - L / 2) / c2 \
        + (src.window_periods + 1.0) * src.period
    t_echo = 1.5 * L / c1 + (xp - L / 2) / c2
    assert t_echo - t_front > src.period          # window sanity
    nsteps = int(t_echo / dt)
    _, ys = model.solve(model.init_state(), dt, nsteps,
                        probe=lambda s: pfn(s.u))
    ys = np.asarray(ys)[:, 0]
    k0 = int(t_front / dt)
    amp = np.abs(ys[k0:]).max()

    dev = abs(amp - T_p * p0) / (T_p * p0)
    assert dev < 0.03, (amp, T_p * p0, dev)
    # the coefficient is genuinely nontrivial (> 13% above unity): a
    # uniform-medium run would miss by ~T_p - 1
    assert abs(T_p - 1.0) > 0.1
