"""Flagship: H131-class focused transducer at ~100 W in water, Westervelt
nonlinear propagation — the physics of
/root/reference/cuda/demo_nonlinear_bowl.py (1.1 MHz, beta=3.5,
alpha=0.2 dB/m, source velocity 0.3856 m/s, whole boundary absorbing,
periodic pressure-plane snapshots once the wave fills the domain).

Two bowl realisations (--geometry):
- `conformal` (default): a body-fitted spherical-cap mesh — the x- face of
  a deformed box is morphed onto the H131 cap (the same thing the
  reference's Gmsh mesh does, cuda/demo_nonlinear_bowl.py:98-105), and the
  transducer is a constant velocity source on the curved patch;
- `phased`: flat aperture with per-node focus delays (phased-array
  equivalent; see fustpu.models.sources).
H131 geometry: aperture radius 16 mm, focal length 35 mm.

    python demos/demo_nonlinear_bowl.py [--elements N] [--degree P]
                                        [--geometry conformal|phased] ...
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from demos.common import (apply_platform, demo_argparser, force_host_devices,  # noqa: E402
                          pick_dtype, run_demo)
from fustpu.config import Material, Source  # noqa: E402
from fustpu.mesh.box import build_box_mesh, build_mapped_mesh  # noqa: E402
from fustpu.models import sources  # noqa: E402
from fustpu.models.westervelt import WesterveltModel  # noqa: E402
from fustpu.utils import eval as fev  # noqa: E402
from fustpu.utils import io as fio  # noqa: E402


def bowl_mapping(focal_length, aperture_radius, yc, zc, Lx):
    """Morph the x- face onto the spherical cap x_s(r) = F - sqrt(F^2-r^2)
    (apex at the origin, rim towards the focus), tapering the displacement
    to zero by x = Lx/2 and beyond ~1.4 aperture radii."""
    import numpy as np

    def mapping(p):
        q = p.copy()
        r = np.sqrt((p[:, 1] - yc) ** 2 + (p[:, 2] - zc) ** 2)
        rc = np.minimum(r, aperture_radius)
        sag = focal_length - np.sqrt(focal_length**2 - rc**2)
        # smooth radial taper beyond the aperture
        t = np.clip((1.4 * aperture_radius - r) / (0.4 * aperture_radius),
                    0.0, 1.0)
        decay = np.clip(1.0 - 2.0 * p[:, 0] / Lx, 0.0, 1.0)
        q[:, 0] = p[:, 0] + sag * t * decay
        return q

    return mapping


def bodyfit_mapping(focal_length, aperture_radius, yc, zc, Lx, Lt):
    """GENUINELY NON-PRISMATIC body-fitted bowl: the cap sag of
    `bowl_mapping` composed with transverse node clustering toward the
    focal axis whose strength varies along x (peaked near the focus,
    zero at the cap plane and the domain end).  The domain, its boundary
    faces and the cap surface are identical to the conformal mesh —
    only interior node placement differs — but no lattice axis is a
    translation extrusion any more, so the import runs the explicit-
    dofmap path through the TPU gather/scatter engine: the honest
    stand-in for an arbitrary Gmsh body-fitted mesh (the reference's
    transducer_3d_W workflow, cuda/demo_nonlinear_bowl.py:98-105)."""

    def mapping(p):
        # cluster first (vanishes on every boundary face), then sag
        q = p.copy()
        cx = np.sin(np.pi * np.clip(p[:, 0] / Lx, 0.0, 1.0)) ** 2
        for ax, c in ((1, yc), (2, zc)):
            s = np.sin(np.pi * np.clip(p[:, ax] / Lt, 0.0, 1.0)) ** 2
            q[:, ax] = p[:, ax] - 0.12 * (p[:, ax] - c) * s * cx
        return bowl_mapping(focal_length, aperture_radius, yc, zc,
                            Lx)(q)

    return mapping


def main():
    parser = demo_argparser(degree=6, periods=8.0)
    parser.add_argument("--geometry",
                        choices=["conformal", "phased", "unstructured",
                                 "bodyfit"],
                        default="conformal",
                        help="unstructured = export the body-fitted bowl "
                             "mesh to a tagged Gmsh .msh file, re-import "
                             "it, and run on the explicit-dofmap path "
                             "(the reference's workflow); bodyfit = same "
                             "round-trip on a GENUINELY non-prismatic "
                             "mesh (focal-axis node clustering breaks "
                             "every extrusion axis) — the general-mesh "
                             "gather/scatter-engine path")
    parser.add_argument("--mesh", default="",
                        help="pre-built tagged .msh (tag 1 = bowl cap, "
                             "tag 2 = absorbing); implies unstructured")
    parser.add_argument("--two-layer", action="store_true",
                        help="water -> soft-tissue layer (c=1560, "
                             "rho=1045) past x=20 mm: heterogeneous "
                             "Westervelt, exercising the pair stiffness "
                             "path on every mesh kind")
    parser.add_argument("--devices", type=int, default=1,
                        help="shard the flagship over k devices (box "
                             "partition for structured geometries, RCB "
                             "for imported meshes; on a CPU host virtual "
                             "devices are forced)")
    args = parser.parse_args()
    if args.mesh:
        args.geometry = "unstructured"
    if args.devices > 1 and args.platform == "cpu":
        force_host_devices(args.devices)
    apply_platform(args)
    mat = Material(sound_speed=1480.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.2)
    source_velocity = 0.38557513826589934        # m/s (100 W drive)
    amplitude = mat.density * mat.sound_speed * source_velocity
    src = Source(frequency=1.1e6, amplitude=amplitude)

    domain_length = 0.08                         # m (reference :82)
    aperture_radius = 0.016                      # H131: 32 mm aperture
    focal_length = 0.035                         # H131: 35 mm focus
    Lt = 0.05                                    # transverse extent
    wavelength = mat.sound_speed / src.frequency
    epw = 2
    nex = args.elements or int(epw * domain_length / wavelength)
    net = max(8, int(round(nex * Lt / domain_length / 8)) * 8)  # multiple of 8 keeps the fused kernel eligible
    yc = zc = Lt / 2
    focus = np.array([focal_length, yc, zc])
    in_aperture = lambda c: ((c[:, 1] - yc) ** 2
                             + (c[:, 2] - zc) ** 2) < aperture_radius**2
    if args.geometry == "phased":
        mesh = build_box_mesh((nex, net, net), args.degree,
                              hi=(domain_length, Lt, Lt))
    elif not args.mesh:   # a supplied .msh needs no generated geometry
        mapping = (bodyfit_mapping(focal_length, aperture_radius, yc, zc,
                                   domain_length, Lt)
                   if args.geometry == "bodyfit" else
                   bowl_mapping(focal_length, aperture_radius, yc, zc,
                                domain_length))
        mesh = build_mapped_mesh((nex, net, net), args.degree, mapping,
                                 hi=(domain_length, Lt, Lt))
    if args.geometry in ("unstructured", "bodyfit"):
        # export the body-fitted bowl as a tagged Gmsh mesh and re-import
        # it: the reference's XDMF read_mesh/read_meshtags workflow
        # (cuda/demo_nonlinear_bowl.py:98-105) through the .msh pipeline
        from fustpu.mesh import msh_io

        if args.mesh:
            mesh_file = args.mesh
        else:
            cap = mesh.boundary_facets("x-", predicate=in_aperture)
            rest = [mesh.boundary_facets(p) for p in
                    ["x+", "y-", "y+", "z-", "z+"]]
            other = np.concatenate(
                [mesh.boundary_facets(
                    "x-", predicate=lambda c: ~in_aperture(c))] + rest)
            mesh_file = msh_io.export_box_msh(
                mesh, {1: cap, 2: other},
                (args.output or "/tmp/bowl") + "_mesh")
        mesh = msh_io.read_msh(mesh_file, degree=args.degree)
        if args.geometry == "bodyfit" and hasattr(mesh, "nstacks"):
            raise SystemExit("bodyfit mesh unexpectedly detected as an "
                             "extrusion — clustering too weak?")
        aperture = mesh.boundary_facets(1)
        absorbing = mesh.boundary_facets(2)
        kind = ("extruded" if hasattr(mesh, "nstacks")
                else "general (non-prismatic)")
        print(f"mesh: {mesh_file} ({mesh.num_cells} hex cells, "
              f"imported, {kind})")
    else:
        aperture = mesh.boundary_facets("x-", predicate=in_aperture)
        # absorbing on everything EXCEPT the source aperture — the
        # reference's ds(1)/ds(2) sets are disjoint
        # (cuda/demo_nonlinear_bowl.py:364-374); earlier rounds absorbed
        # over the aperture too, damping the source (focal |p| read ~2x
        # low: -3.39 vs the faithful -6.46 MPa, BENCH_NOTES r4)
        absorbing = np.concatenate(
            [mesh.boundary_facets("x-",
                                  predicate=lambda c: ~in_aperture(c))]
            + [mesh.boundary_facets(p) for p in
               ["x+", "y-", "y+", "z-", "z+"]])
    print(f"degree {args.degree}, {args.geometry} bowl, "
          f"Number of degrees-of-freedom: {mesh.ndofs}")

    if len(aperture) == 0:
        raise SystemExit("aperture selected no facets — increase --elements "
                         "so facet centroids resolve the 16 mm radius")
    print(f"aperture facets: {len(aperture)}")

    c_water = float(np.min(mat.sound_speed))
    delays = (None if args.geometry != "phased" else
              (lambda pts: sources.focus_delays(pts, focus, c_water)))
    if args.two_layer:
        # per-cell material from cell centroids of the FINAL mesh (order-
        # independent: survives import round trips and locality reorder)
        cent = np.asarray(mesh.cell_corners_flat).mean(axis=1)
        tissue = cent[:, 0] > 0.02
        shape = mesh.nc if hasattr(mesh, "nc") else (mesh.num_cells,)
        mat = Material(
            sound_speed=np.where(tissue, 1560.0, 1480.0).reshape(shape),
            density=np.where(tissue, 1045.0, 1000.0).reshape(shape),
            nonlinearity=3.5, attenuation_dB=0.2)
        print(f"two-layer medium (interface x=20 mm, "
              f"{int(tissue.sum())} tissue cells)")
    model = WesterveltModel(
        mesh, mat, src, aperture, absorbing,
        dtype=pick_dtype(args.dtype), source_delays=delays)
    if args.devices > 1:
        if hasattr(mesh, "nc"):      # structured: box partition
            from fustpu.parallel.models import ShardedModel
            from fustpu.parallel.sharding import DeviceGrid

            S = [args.devices, 1, 1]
            for f in (2, 2):         # prefer 2D grids when divisible
                if S[0] % f == 0 and S[0] > f:
                    S = [S[0] // f, S[1] * f, S[2]]
            model = ShardedModel(model, DeviceGrid.create(tuple(S)))
            print(f"sharded over device grid {tuple(S)}")
        else:                        # imported mesh: RCB partition
            from fustpu.parallel.extruded import shard_unstructured

            model = shard_unstructured(model, args.devices)
            print(f"sharded over {model.k} devices "
                  f"({model.num_shared} shared interface entries)")
    dt, _ = model.cfl_dt(0.4)
    tf = (domain_length / float(np.min(mat.sound_speed))
          + args.periods / src.frequency)
    nsteps = int(tf / dt) + 1
    print(f"Number of steps: {nsteps}")
    state = run_demo(model, dt, nsteps, args, "nonlinear_bowl")

    if args.output:
        # axial pressure plane snapshot (reference 357 x 179 grid,
        # cuda/demo_nonlinear_bowl.py:136-141)
        u_host = (model.collect(state.u) if hasattr(model, "collect")
                  else np.asarray(state.u))
        structured = hasattr(mesh, "nc")
        if structured:
            pts, vals = fev.eval_plane(mesh, u_host, axis=2,
                                       coord=zc, n0=357, n1=179)
        else:
            pts = fev.plane_points(mesh, axis=2, coord=zc, n0=357, n1=179)
            vals = mesh.evaluate(u_host, pts)
        p = fio.save_point_cloud(f"{args.output}_pressure_plane.txt",
                                 pts, vals, cols=(0, 1))
        print(f"wrote {p}")
        ev = (lambda f, q: fev.evaluate(mesh, f, q)) if structured \
            else mesh.evaluate
        focal_p = ev(u_host, focus[None, :])[0]
        print(f"pressure at focus: {focal_p:.1f} Pa")


if __name__ == "__main__":
    main()
