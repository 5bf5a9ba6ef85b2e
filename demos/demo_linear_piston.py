"""Linear wave from a circular piston transducer with absorbing far field —
Benchmark 1 Source 2 of the inter-code FUS benchmark suite, the physics of
/root/reference/numba-cpu/demo_linear_piston.py & cuda/demo_linear_piston.py.

The reference reads a Gmsh/XDMF mesh with tagged facets; here the piston is
a circular aperture patch (radius 10 mm) on the x- face of a structured box
and every other boundary facet absorbs.  Writes the pressure on the
axial plane to a text point cloud like the reference's evaluation output
(cuda/demo_linear_piston.py:120-132).

    python demos/demo_linear_piston.py [--elements N] [--degree P] ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from demos.common import apply_platform, demo_argparser, pick_dtype, run_demo  # noqa: E402
from fustpu.config import Material, Source  # noqa: E402
from fustpu.mesh.box import build_box_mesh  # noqa: E402
from fustpu.models.linear import LinearWaveModel  # noqa: E402
from fustpu.utils import eval as fev  # noqa: E402
from fustpu.utils import io as fio  # noqa: E402


def main():
    args = demo_argparser(degree=4).parse_args()
    apply_platform(args)
    mat = Material(sound_speed=1500.0, density=1000.0)
    src = Source(frequency=0.5e6, amplitude=60000.0)
    L = 0.03                       # BM1 domain: 0.03 x 0.03 x 0.03 m
    piston_radius = 0.01           # BM1 source 2: 10 mm radius piston
    wavelength = mat.sound_speed / src.frequency
    ne = args.elements or int(2 * L / wavelength)
    mesh = build_box_mesh((ne,) * 3, args.degree, hi=(L, L, L))
    print(f"Number of degrees-of-freedom: {mesh.ndofs}")

    yc = zc = L / 2
    piston = mesh.boundary_facets(
        "x-", predicate=lambda c: ((c[:, 1] - yc) ** 2
                                   + (c[:, 2] - zc) ** 2) < piston_radius**2)
    print(f"piston facets: {len(piston)}")
    model = LinearWaveModel(mesh, mat, src, piston,
                            mesh.all_boundary_facets(),
                            dtype=pick_dtype(args.dtype))
    dt, _ = model.cfl_dt(0.65)
    tf = L / mat.sound_speed + args.periods / src.frequency
    nsteps = int(tf / dt) + 1
    print(f"Number of steps: {nsteps}")
    state = run_demo(model, dt, nsteps, args, "linear_piston")

    # axial-plane evaluation (reference grids 141 x 241)
    if args.output:
        pts, vals = fev.eval_plane(mesh, np.asarray(state.u),
                                   axis=1, coord=yc, n0=141, n1=241)
        p = fio.save_point_cloud(f"{args.output}_piston_plane.txt",
                                 pts, vals, cols=(0, 2))
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
