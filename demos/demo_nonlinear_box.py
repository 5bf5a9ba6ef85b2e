"""Westervelt nonlinear wave in a homogeneous box, plane source —
the physics of /root/reference/cuda/demo_nonlinear_box.py (P=6, strong
nonlinearity + attenuation so harmonics develop over a short domain).

    python demos/demo_nonlinear_box.py [--elements N] [--degree P] ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demos.common import apply_platform, demo_argparser, pick_dtype, run_demo  # noqa: E402
from fustpu.config import Material, Source  # noqa: E402
from fustpu.mesh.box import build_box_mesh  # noqa: E402
from fustpu.models.westervelt import WesterveltModel  # noqa: E402


def main():
    p = demo_argparser(degree=6)
    p.add_argument("--two-layer", action="store_true",
                   help="water | tissue-like half-spaces (per-cell "
                        "material fields; the heterogeneous stage runs "
                        "the one-pass pair kernel)")
    args = p.parse_args()
    apply_platform(args)
    # reference cuda/demo_nonlinear_box.py material block: beta=100,
    # alpha=50 dB/m exaggerate nonlinear/attenuation effects for testing
    src = Source(frequency=0.5e6, amplitude=60000.0)
    L = 0.03
    c0 = 1500.0
    wavelength = c0 / src.frequency
    ne = args.elements or int(2 * L / wavelength)
    mesh = build_box_mesh((ne,) * 3, args.degree, hi=(L, L, L))
    if args.two_layer:
        import numpy as np

        cs = np.full(mesh.nc, c0)
        cs[mesh.nc[0] // 2:] = 1600.0
        rho = np.full(mesh.nc, 1000.0)
        rho[mesh.nc[0] // 2:] = 1060.0
        mat = Material(sound_speed=cs, density=rho, nonlinearity=100.0,
                       attenuation_dB=50.0)
    else:
        mat = Material(sound_speed=c0, density=1000.0,
                       nonlinearity=100.0, attenuation_dB=50.0)
    print(f"Number of degrees-of-freedom: {mesh.ndofs}")

    # Gamma1 = x=0 source plane, Gamma2 = x=L absorbing — disjoint, as in
    # the reference (cuda/demo_nonlinear_box.py:279-285; absorbing over
    # the source plane would damp the source)
    model = WesterveltModel(mesh, mat, src,
                            mesh.boundary_facets("x-"),
                            mesh.boundary_facets("x+"),
                            dtype=pick_dtype(args.dtype))
    if args.two_layer:
        print(f"two-layer medium; stiffness pair pass: "
              f"{getattr(model, '_pair', False)}")
    dt, _ = model.cfl_dt(0.4)
    tf = L / c0 + args.periods / src.frequency
    nsteps = int(tf / dt) + 1
    print(f"Number of steps: {nsteps}")
    run_demo(model, dt, nsteps, args, "nonlinear_box")


if __name__ == "__main__":
    main()
