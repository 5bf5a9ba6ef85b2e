"""Time the full-width two-slab kernel (build_slab2w) against the
production fused kernel at the headline configuration (P=4, 32^3, f32)
— VERDICT r4 #8's one unexplored dispatch-widening form.  The
production kernel stands at a measured 0.42-0.43 ms structural floor
(BENCH_NOTES r3); slab2w doubles the y-contraction dispatch width and
lifts the real-lane fraction 160/256 -> 320/384 with no partial-lane
writes.  Run ON CHIP; records the result either way.

    python demos/exp_slab2w.py [f32|f64] [degree] [nc]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    dtype = {"f32": jnp.float32, "f64": jnp.float64}[
        sys.argv[1] if len(sys.argv) > 1 else "f32"]
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    nc = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from fustpu.elements.hex import HexElement
    from fustpu.mesh.box import build_box_mesh
    from fustpu.ops import pallas_stiffness as ps
    from fustpu.ops import precompute as pre
    from fustpu.utils import benchmarks as B

    mesh = build_box_mesh((nc,) * 3, degree, perturb=0.05, seed=1)
    _, G = pre.cell_geometry_factors(mesh)
    elem = HexElement(degree)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        mesh.grid_shape), dtype)
    print(f"mesh {nc}^3 P={degree}, dofs {mesh.ndofs}, {dtype.__name__}")

    op1 = ps.build_auto(mesh.nc, degree, elem.deriv_1d, G, dtype)
    op2 = ps.build_slab2w(mesh.nc, degree, elem.deriv_1d, G, dtype)
    y1 = ps.stiffness_apply_pallas(op1, x)
    y2 = ps._apply_slab2w(op2, x)
    rel = float(jnp.linalg.norm(y2 - y1) / jnp.linalg.norm(y1))
    print(f"cross-check slab2w vs production: rel {rel:.2e}")

    base = B.sync_baseline()
    for name, fn, p in (
            ("production", lambda p_, v: ps.stiffness_apply_pallas(p_, v),
             op1),
            ("slab2w", lambda p_, v: ps._apply_slab2w(p_, v), op2)):
        mean, std = B.time_apply(fn, p, x, chain=20, reps=5,
                                 baseline=base)
        print(f"{name:12s}: {mean*1e3:8.3f} ms/apply (+-{std*1e3:.3f})  "
              f"{mesh.ndofs/mean/1e9:6.2f} GDOF/s", flush=True)


if __name__ == "__main__":
    main()
