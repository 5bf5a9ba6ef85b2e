"""Multi-device Westervelt run over a sharded box — the analogue of the
reference's `mpirun -n k python demo_nonlinear_box.py` (domain decomposition
over MPI ranks; here a jax.sharding.Mesh with halo exchange over ICI).

On a CPU host this runs on virtual devices (functional check); on a real
TPU slice the same code scales over chips.

    python demos/demo_sharded_box.py [--devices 8] [--grid 2 2 2]
                                     [--elements 16] [--degree 4]
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--grid", type=int, nargs=3, default=None,
                   help="device grid (Sx Sy Sz); default (devices, 1, 1)")
    p.add_argument("--elements", type=int, default=16)
    p.add_argument("--degree", type=int, default=4)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--platform", choices=["default", "cpu"], default="cpu")
    args = p.parse_args()

    if args.platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={args.devices}")
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from fustpu.config import Material, Source
    from fustpu.mesh.box import build_box_mesh
    from fustpu.models.westervelt import WesterveltModel
    from fustpu.parallel.models import ShardedModel
    from fustpu.parallel.sharding import DeviceGrid

    S = tuple(args.grid) if args.grid else (args.devices, 1, 1)
    ne = args.elements
    L = 0.01
    mesh = build_box_mesh((ne, ne, ne), args.degree, hi=(L, L, L))
    mat = Material(sound_speed=1480.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.2)
    src = Source(frequency=1.1e6, amplitude=1480.0 * 1000.0 * 0.3856)
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets("x-"),
                            mesh.all_boundary_facets())
    grid = DeviceGrid.create(S)
    smodel = ShardedModel(model, grid)
    print(f"device grid {S}, dofs {mesh.ndofs}, impl {smodel.impl}")
    dt, _ = model.cfl_dt(0.4)
    out, _ = smodel.solve(smodel.init_state(), dt, args.steps)
    u = smodel.collect(out.u)
    print(f"steps={args.steps}, t={float(np.asarray(out.t)):.3e}, "
          f"|u|max={np.abs(u).max():.4e}, finite={np.all(np.isfinite(u))}")


if __name__ == "__main__":
    main()
