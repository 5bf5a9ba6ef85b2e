"""Heterogeneous indexed stiffness pair: one fused pass vs two applies.

The Westervelt heterogeneous stiffness term needs stiffness(u; c3) +
stiffness(v; c4) with per-cell coefficients (the reference launches the
two CUDA kernels back to back, cuda/demo_nonlinear_bowl.py:618-640).
On fustpu's engine-backed indexed path the pair shares ONE gather2 (the
one-hot H is built once), ONE contraction chain (per-cell coefficients
commute with the in-cell contractions, so the fields fold to
c1*u1+c2*u2 first), and ONE scatter-add.  This experiment times the
fused pair against two separate applies on the engine-benchmark 627k
cylinder (locality-ordered, same mesh as exp_cell_order) and checks
the f32 agreement.  Prior chip numbers (BENCH_NOTES r4): two applies
17.93 ms, gather2+shared-scatter pair 12.29 ms, before the single
contraction-chain fold.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from fustpu.mesh import shapes
from fustpu.mesh.unstructured import UnstructuredHexMesh, locality_order
from fustpu.ops import pallas_gather as pg
from fustpu.ops import precompute as pre
from fustpu.ops.operators import (stiffness_apply_indexed,
                                  stiffness_apply_indexed_pair)
from fustpu.utils import benchmarks as B


def main():
    degree = 4
    if "--small" in sys.argv:       # CPU interpret-mode smoke
        verts, cells_, tagged = shapes.cylinder_mesh(
            0.015, 0.03, 0.01, m=2, mr=1, nr_ann=1, nz=4)
    else:
        verts, cells_, tagged = shapes.cylinder_mesh(
            0.015, 0.03, 0.01, m=8, mr=4, nr_ann=4, nz=30)
    base = UnstructuredHexMesh(degree=degree, vertices=verts,
                               cells=cells_, facet_tag_map={})
    mesh = locality_order(base)
    print(f"{mesh.num_cells} cells, {mesh.ndofs} dofs")
    interp = jax.default_backend() == "cpu"

    plan = pg.build_plan(mesh.dofmap.reshape(-1).astype(np.int64),
                         mesh.ndofs)
    wr, _, _, _, nwin = plan.statics[:5]
    print(f"plan: WR={wr}x{nwin}, spill={plan.spos.shape[0]}")

    _, G = pre.cell_geometry_factors(mesh)
    G = jnp.asarray(np.moveaxis(G, 2, 0), jnp.float32)  # component-major
    D = jnp.asarray(mesh.element.deriv_1d, jnp.float32)
    dm = jnp.asarray(mesh.dofmap)
    rng = np.random.default_rng(0)
    c1 = jnp.asarray(rng.uniform(0.5, 1.5, mesh.num_cells), jnp.float32)
    c2 = jnp.asarray(rng.uniform(0.5, 1.5, mesh.num_cells), jnp.float32)
    x = jnp.asarray(rng.standard_normal(mesh.ndofs), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal(mesh.ndofs), jnp.float32)

    # operator arrays ride in `params` (not closures) so they stay jit
    # arguments across the chain-length recompiles (CLAUDE.md rule);
    # both fields must depend on the scan carry, or XLA hoists the
    # second apply out of the timing loop as loop-invariant
    params = (x2, G, c1, c2, dm, plan)

    def two(p, v):
        px2, pG, pc1, pc2, pdm, ppl = p
        w = 0.5 * v + px2
        return (stiffness_apply_indexed(v, pG, pc1, pdm, D, mesh.ndofs,
                                        engine=ppl,
                                        engine_interpret=interp)
                + stiffness_apply_indexed(w, pG, pc2, pdm, D, mesh.ndofs,
                                          engine=ppl,
                                          engine_interpret=interp))

    def pair(p, v):
        px2, pG, pc1, pc2, pdm, ppl = p
        w = 0.5 * v + px2
        return stiffness_apply_indexed_pair(
            v, pc1, w, pc2, pG, pdm, D, mesh.ndofs,
            engine=ppl, engine_interpret=interp)

    ya = jax.jit(two)(params, x)
    yb = jax.jit(pair)(params, x)
    rel = float(jnp.linalg.norm(ya - yb) / jnp.linalg.norm(ya))
    print(f"pair vs two applies rel err: {rel:.3e}")

    bl = B.sync_baseline()
    t2, _ = B.time_apply(two, params, x, chain=20, reps=5, baseline=bl)
    tp, _ = B.time_apply(pair, params, x, chain=20, reps=5, baseline=bl)
    print(f"two applies  {t2*1e3:7.3f} ms")
    print(f"fused pair   {tp*1e3:7.3f} ms   ({t2/tp:4.2f}x)")


if __name__ == "__main__":
    main()
