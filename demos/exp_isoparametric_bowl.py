"""Trilinear vs isoparametric (hex27) bowl cap: focal-pressure delta.

The bowl's spherical cap is approximated by trilinear cells of a mapped
lattice (demo_nonlinear_bowl); r4 adds triquadratic geometry
(fustpu.mesh.unstructured.geom_nodes).  This experiment runs the SAME
Westervelt bowl physics on the same unstructured mesh twice — trilinear
corner geometry vs the exact conformal map sampled at the 27-node
lattice — and reports the focal-pressure difference: the declared
geometry-fidelity gap of VERDICT r3 (#8), quantified.  Reference
counterpart: the cmap-general precompute consuming Gmsh 2nd-order
meshes (cpp/common/precompute.hpp:33-94).

    python demos/exp_isoparametric_bowl.py [--elements 24] [--periods 2]
"""

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--elements", type=int, default=24)
    p.add_argument("--degree", type=int, default=4)
    p.add_argument("--periods", type=float, default=2.0)
    p.add_argument("--frequency", type=float, default=0.3e6,
                   help="source frequency; default 0.3 MHz so the wave "
                        "is resolved (>2 cells/wavelength) at the "
                        "default --elements 24 (1.1 MHz needs "
                        "--elements >= 56)")
    p.add_argument("--platform", choices=["default", "cpu"],
                   default="default")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from demos.demo_nonlinear_bowl import bowl_mapping
    from fustpu.config import Material, Source
    from fustpu.elements.hex import hex8_tabulate
    from fustpu.mesh.box import build_box_mesh, build_mapped_mesh
    from fustpu.mesh.unstructured import UPointSampler, from_box
    from fustpu.models.westervelt import WesterveltModel

    mat = Material(sound_speed=1480.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.2)
    amplitude = mat.density * mat.sound_speed * 0.38557513826589934
    src = Source(frequency=args.frequency, amplitude=amplitude)
    domain_length, Lt = 0.08, 0.05
    aperture_radius, focal_length = 0.016, 0.035
    yc = zc = Lt / 2
    ne = args.elements
    nc = (ne, int(round(ne * Lt / domain_length * 1.0)) or 1,
          int(round(ne * Lt / domain_length)) or 1)
    mapping = bowl_mapping(focal_length, aperture_radius, yc, zc,
                           domain_length)
    pm = build_box_mesh(nc, args.degree, hi=(domain_length, Lt, Lt))
    mm_ = build_mapped_mesh(nc, args.degree, mapping,
                            hi=(domain_length, Lt, Lt))
    um_tri = from_box(mm_)
    # exact-map 27-lattice geometry: trilinear lattice of the PARAMETER
    # cells pushed through the conformal map
    _LAT = np.array([[i / 2, j / 2, k / 2] for i in range(3)
                     for j in range(3) for k in range(3)])
    vals, _ = hex8_tabulate(_LAT)                   # (27, 8)
    pcorners = from_box(pm).cell_corners_flat       # parameter corners
    lat = np.einsum("qv,cvd->cqd", vals, pcorners)
    geom = mapping(lat.reshape(-1, 3)).reshape(lat.shape)
    um_quad = dataclasses.replace(um_tri, geom_nodes=geom)

    # facet sets from exterior-face centroids (tags don't exist here)
    def facet_sets(um):
        bd = um.boundary_facets()
        cent = um.facet_centroids(bd)
        on_xmin = cent[:, 0] < 0.25 * domain_length / nc[0] + \
            (focal_length - np.sqrt(
                np.maximum(focal_length**2 - np.minimum(
                    (cent[:, 1] - yc)**2 + (cent[:, 2] - zc)**2,
                    aperture_radius**2), 0.0)))
        in_ap = ((cent[:, 1] - yc)**2 + (cent[:, 2] - zc)**2
                 <= aperture_radius**2)
        srcm = on_xmin & in_ap
        return bd[srcm], bd[~srcm]

    pts = np.array([[focal_length, yc, zc]])
    results = {}
    for name, um in (("trilinear", um_tri), ("hex27", um_quad)):
        # what read_msh does for imports: prismatic topology (incl.
        # curved hex27 prisms) routes to the fast extruded path
        from fustpu.mesh.extruded import as_extruded

        um = as_extruded(um) or um
        srcf, absf = facet_sets(um)
        model = WesterveltModel(um, mat, src, srcf, absf,
                                dtype=jnp.float32)
        dt, _ = model.cfl_dt(0.4)
        tf = domain_length / mat.sound_speed \
            + args.periods / src.frequency
        nsteps = int(np.ceil(tf / dt))
        probe = UPointSampler(um, pts).jax_probe()
        t0 = time.perf_counter()
        s, ys = model.solve(model.init_state(), dt, nsteps,
                            probe=lambda st: probe(st.u))
        ys = np.asarray(ys)
        print(f"{name}: impl={model.impl} steps={nsteps} "
              f"wall={time.perf_counter()-t0:.1f}s "
              f"focal min p={ys.min()/1e6:.4f} MPa "
              f"max |p|={np.abs(ys).max()/1e6:.4f} MPa", flush=True)
        results[name] = ys
    pk_t = np.abs(results["trilinear"]).max()
    pk_q = np.abs(results["hex27"]).max()
    print(f"focal |p| delta (hex27 vs trilinear): "
          f"{(pk_q - pk_t)/pk_q:+.3%} of the quadratic value")


if __name__ == "__main__":
    main()
