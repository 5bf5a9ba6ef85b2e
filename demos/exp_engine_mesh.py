"""Time the gather-engine ops on an arbitrary imported .msh mesh.

The cylinder-bound A/B lives in exp_cell_order; this one answers
"what does the engine cost on THIS mesh" — used for the 3.2M bodyfit
bowl, whose end-to-end per-DOF step cost (13.9 ms/MDOF-step) exceeds
the 545k bowl's (9.0) even though both meshes plan at WR=48x2 with
zero spill (BENCH_NOTES r5).

    python demos/exp_engine_mesh.py /path/to/mesh.msh [degree]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from fustpu.mesh import msh_io
from fustpu.mesh.unstructured import locality_order
from fustpu.ops import pallas_gather as pg
from fustpu.ops import precompute as pre
from fustpu.ops.operators import stiffness_apply_indexed
from fustpu.utils import benchmarks as B


def main():
    path = sys.argv[1]
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    mesh = msh_io.read_msh(path, degree=degree)
    if hasattr(mesh, "nstacks"):
        raise SystemExit("extruded mesh — this times the ENGINE path")
    mesh = locality_order(mesh)
    print(f"{mesh.num_cells} cells, {mesh.ndofs} dofs")
    interp = jax.default_backend() == "cpu"

    plan = pg.build_plan(mesh.dofmap.reshape(-1).astype(np.int64),
                         mesh.ndofs)
    wr, ntiles, _, _, nwin = plan.statics[:5]
    print(f"plan: WR={wr}x{nwin}, tiles={ntiles}, "
          f"spill={plan.spos.shape[0]}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.ndofs), jnp.float32)
    bl = B.sync_baseline()

    tg, _ = B.time_apply(
        lambda p, v: pg.gather(v, plan, interpret=interp).sum()
        + v * 0.999, None, x, chain=20, reps=5, baseline=bl)
    vals = jnp.asarray(rng.standard_normal(plan.statics[3]), jnp.float32)
    ts, _ = B.time_apply(
        lambda p, v: pg.scatter_add(v, plan, mesh.ndofs,
                                    interpret=interp)[:1].sum() + v,
        None, vals, chain=20, reps=5, baseline=bl)
    _, G = pre.cell_geometry_factors(mesh)
    G = jnp.asarray(np.moveaxis(G, 2, 0), jnp.float32)   # comp-major
    D = jnp.asarray(mesh.element.deriv_1d, jnp.float32)
    dm = jnp.asarray(mesh.dofmap)
    params = (G, dm)

    def apply_uniform(p, v):
        pG, pdm = p
        return stiffness_apply_indexed(v, pG, None, pdm, D, mesh.ndofs,
                                       engine=plan,
                                       engine_interpret=interp)

    ta, _ = B.time_apply(apply_uniform, params, x, chain=20, reps=5,
                         baseline=bl)
    md = mesh.ndofs / 1e6
    print(f"gather  {tg*1e3:8.3f} ms   ({tg*1e3/md:.2f} ms/MDOF)")
    print(f"scatter {ts*1e3:8.3f} ms   ({ts*1e3/md:.2f} ms/MDOF)")
    print(f"apply   {ta*1e3:8.3f} ms   ({ta*1e3/md:.2f} ms/MDOF)")


if __name__ == "__main__":
    main()
