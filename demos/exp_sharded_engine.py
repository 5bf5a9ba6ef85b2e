"""Sharded-engine plan parity on ONE chip (VERDICT r4 #5).

The sharded non-prismatic path (parallel.extruded.IndexedShardedModel)
builds per-device gather-engine plans with COMMON statics via
build_stacked_plans — since r4's ladder unification these should sit
within ~1.2x the single-device per-DOF cost.  Multi-chip hardware is
not available, so this measures what a chip CAN certify: each device's
local heterogeneous pair apply (the complete per-stage stiffness work
of a shard — everything except the one psum per stage) run standalone
on the single TPU, summed over devices, against the single-device plan
on the same 627k engine-benchmark cylinder (reference analogue:
multi-rank operator parity, /root/reference/cuda/test_operators.py).

    python demos/exp_sharded_engine.py [k ...]     # default 2 4
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
from fustpu.ops.operators import stiffness_apply_indexed_pair
from fustpu.utils import benchmarks as B


def main():
    ks = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2, 4]
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

    _, G_host = pre.cell_geometry_factors(mesh)
    D = jnp.asarray(mesh.element.deriv_1d, jnp.float32)
    nd = mesh.dofmap.shape[1]
    rng = np.random.default_rng(0)
    c1g = rng.uniform(0.5, 1.5, mesh.num_cells)
    c2g = rng.uniform(0.5, 1.5, mesh.num_cells)
    xg = rng.standard_normal(mesh.ndofs)
    x2g = rng.standard_normal(mesh.ndofs)
    bl = B.sync_baseline()

    def timed_pair(params, x, statics, n):
        def f(p, v):
            px2, pG, pc1, pc2, pdm, (w, c, sp, si) = p
            plan = pg.GatherPlan(w, c, sp, si, statics)
            u = 0.5 * v + px2
            return stiffness_apply_indexed_pair(
                v, pc1, u, pc2, pG, pdm, D, n,
                engine=plan, engine_interpret=interp)
        t, y = B.time_apply(f, params, x, chain=20, reps=5, baseline=bl)
        return t, y

    # single-device reference
    plan1 = pg.build_plan(mesh.dofmap.reshape(-1).astype(np.int64),
                          mesh.ndofs)
    wr, _, _, _, nwin = plan1.statics[:5]
    print(f"single plan: WR={wr}x{nwin}, spill={plan1.spos.shape[0]}")
    p1 = (jnp.asarray(x2g, jnp.float32),
          jnp.asarray(np.moveaxis(G_host, 2, 0), jnp.float32),
          jnp.asarray(c1g, jnp.float32), jnp.asarray(c2g, jnp.float32),
          jnp.asarray(mesh.dofmap),
          (plan1.woff, plan1.code, plan1.spos, plan1.sidx))
    t1, _ = timed_pair(p1, jnp.asarray(xg, jnp.float32), plan1.statics,
                       mesh.ndofs)
    per1 = t1 * 1e3 / (mesh.ndofs / 1e6)
    print(f"single-device pair: {t1*1e3:7.3f} ms  ({per1:.2f} ms/MDOF)")

    # fused single-kernel leg (the production default when eligible)
    def timed_fused_pair(fe, x, x2, c1, c2, n):
        def f(p, v):
            px2, pc1, pc2, pfe = p
            return pg.fused_apply_pair(v, pc1, 0.5 * v + px2, pc2,
                                       pfe, n, interpret=interp)
        return B.time_apply(f, (x2, c1, c2, fe), x, chain=20, reps=5,
                            baseline=bl)

    fe1 = pg.build_fused_engine(
        np.asarray(mesh.dofmap, np.int64), mesh.ndofs, G_host,
        np.asarray(mesh.element.deriv_1d), jnp.float32)
    tf1 = float("nan")
    if fe1 is not None:
        tf1, _ = timed_fused_pair(
            fe1, jnp.asarray(xg, jnp.float32),
            jnp.asarray(x2g, jnp.float32),
            jnp.asarray(c1g, jnp.float32),
            jnp.asarray(c2g, jnp.float32), mesh.ndofs)
        print(f"single-device FUSED pair: {tf1*1e3:7.3f} ms  "
              f"({tf1*1e3/(mesh.ndofs/1e6):.2f} ms/MDOF)")

    from fustpu.parallel.extruded import rcb_partition

    for k in ks:
        cent = mesh.cell_corners_flat.mean(axis=1)
        part = rcb_partition(cent, k)
        cells_of = [np.nonzero(part == d)[0] for d in range(k)]
        cmax = max(len(c) for c in cells_of)
        ldm = np.zeros((k, cmax, nd), np.int64)
        gids = []
        for d in range(k):
            sub = mesh.dofmap[cells_of[d]]
            uniq, inv = np.unique(sub, return_inverse=True)
            gids.append(uniq)
            ldm[d, :len(cells_of[d])] = inv.reshape(sub.shape)
        nloc = max(len(g) for g in gids)
        eng_dm = np.full((k, cmax, nd), nloc, np.int64)
        for d in range(k):
            eng_dm[d, :len(cells_of[d])] = ldm[d, :len(cells_of[d])]
        ew, ec, es, ei, statics = pg.build_stacked_plans(
            [eng_dm[d].reshape(-1) for d in range(k)], nloc)
        wr, _, _, _, nwin = statics[:5]
        print(f"k={k} stacked plan: WR={wr}x{nwin}, nloc={nloc}, "
              f"spill={es.shape[1]}")
        tot = 0.0
        for d in range(k):
            Gd = np.zeros((6, cmax, nd), np.float32)
            Gd[:, :len(cells_of[d])] = np.moveaxis(
                G_host[cells_of[d]], 2, 0)
            xl = np.zeros(nloc)
            x2l = np.zeros(nloc)
            xl[:len(gids[d])] = xg[gids[d]]
            x2l[:len(gids[d])] = x2g[gids[d]]
            c1l = np.zeros(cmax)
            c2l = np.zeros(cmax)
            c1l[:len(cells_of[d])] = c1g[cells_of[d]]
            c2l[:len(cells_of[d])] = c2g[cells_of[d]]
            pd = (jnp.asarray(x2l, jnp.float32), jnp.asarray(Gd),
                  jnp.asarray(c1l, jnp.float32),
                  jnp.asarray(c2l, jnp.float32),
                  jnp.asarray(eng_dm[d]),
                  (jnp.asarray(ew[d]), jnp.asarray(ec[d]),
                   jnp.asarray(es[d]), jnp.asarray(ei[d])))
            td, _ = timed_pair(pd, jnp.asarray(xl, jnp.float32), statics,
                               nloc)
            tot += td
            print(f"  device {d}: {td*1e3:7.3f} ms "
                  f"({len(cells_of[d])} cells, {len(gids[d])} dofs)")
        # a real k-chip run pays max(td), one chip pays the sum; per-DOF
        # parity compares sum-over-devices against the single plan
        perk = tot * 1e3 / (mesh.ndofs / 1e6)
        print(f"k={k}: sum {tot*1e3:7.3f} ms  ({perk:.2f} ms/MDOF, "
              f"{perk/per1:4.2f}x single-device per-DOF)")

        # stacked FUSED leg (what IndexedShardedModel now runs)
        fres = pg.build_fused_engines_stacked(
            [eng_dm[d] for d in range(k)], nloc,
            [_g6_block(G_host, cells_of[d], cmax, nd)
             for d in range(k)],
            np.asarray(mesh.element.deriv_1d), jnp.float32)
        if fres is None:
            print(f"k={k}: stacked fused ineligible")
            continue
        fw, fc, fg, fd3, pstat, festat = fres
        ftot = 0.0
        for d in range(k):
            fe_d = pg.FusedEngine(
                pg.GatherPlan(jnp.asarray(fw[d]), jnp.asarray(fc[d]),
                              jnp.zeros((0,), jnp.int32),
                              jnp.zeros((0,), jnp.int32), pstat),
                jnp.asarray(fg[d], jnp.float32),
                jnp.asarray(fd3, jnp.float32), festat)
            xl = np.zeros(nloc)
            x2l = np.zeros(nloc)
            xl[:len(gids[d])] = xg[gids[d]]
            x2l[:len(gids[d])] = x2g[gids[d]]
            c1l = np.zeros(cmax)
            c2l = np.zeros(cmax)
            c1l[:len(cells_of[d])] = c1g[cells_of[d]]
            c2l[:len(cells_of[d])] = c2g[cells_of[d]]
            td, _ = timed_fused_pair(
                fe_d, jnp.asarray(xl, jnp.float32),
                jnp.asarray(x2l, jnp.float32),
                jnp.asarray(c1l, jnp.float32),
                jnp.asarray(c2l, jnp.float32), nloc)
            ftot += td
        perkf = ftot * 1e3 / (mesh.ndofs / 1e6)
        base = tf1 if fe1 is not None else t1
        print(f"k={k}: FUSED sum {ftot*1e3:7.3f} ms  ({perkf:.2f} "
              f"ms/MDOF, {ftot/base:4.2f}x single-device per-DOF)")


def _g6_block(G_host, cells, cmax, nd):
    """Component-major (6, cmax, nd) zero-padded geometry block."""
    out = np.zeros((6, cmax, nd))
    out[:, :len(cells)] = np.moveaxis(G_host[cells], 2, 0)
    return out


if __name__ == "__main__":
    main()
