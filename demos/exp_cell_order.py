"""Does cell ordering shrink the gather-engine windows?

The one-hot gather/scatter engine's MXU work is proportional to the
window row count WR, which pick_wr sizes from the per-tile id span of
the first-touch numbering (fustpu.ops.pallas_gather).  The span is the
'front' of the cell ordering: ids live as long as a later cell still
touches them.  This experiment rebuilds the engine-benchmark cylinder
under several cell orderings and reports span statistics, the WR each
would get, and the projected one-hot FLOP ratio — deciding whether a
locality-preserving reorder (host-side, semantically free) is the
next engine lever (BENCH_NOTES r4 'next levers').
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from fustpu.mesh import msh_io, shapes
from fustpu.ops.pallas_gather import TM, pick_wr


def order_variants(mesh):
    cent = mesh.vertices[mesh.cells].mean(axis=1)   # (ncells, 3)
    lo, hi = cent.min(axis=0), cent.max(axis=0)
    span = np.maximum(hi - lo, 1e-300)
    q = np.clip(((cent - lo) / span * (2**16 - 1)).astype(np.uint64),
                0, 2**16 - 1)

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 32)) & np.uint64(0x1F00000000FFFF)
        v = (v | (v << 16)) & np.uint64(0x1F0000FF0000FF)
        v = (v | (v << 8)) & np.uint64(0x100F00F00F00F00F)
        v = (v | (v << 4)) & np.uint64(0x10C30C30C30C30C3)
        v = (v | (v << 2)) & np.uint64(0x1249249249249249)
        return v

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    yield "file order", None
    yield "morton", np.argsort(morton, kind="stable")
    # axis sweeps — SAME key order as mesh.unstructured.locality_order,
    # so the experiment scores exactly the permutation production applies
    for ax, name in ((0, "sweep x"), (1, "sweep y"), (2, "sweep z")):
        keys = tuple(cent[:, a] for a in range(3) if a != ax) \
            + (cent[:, ax],)
        yield name, np.lexsort(keys)
    from fustpu.mesh.unstructured import _rcm_order

    rcm = _rcm_order(mesh)
    if rcm is not None:
        yield "rcm", rcm


def span_stats(dofmap, ndofs):
    """Spans + the ACTUAL plan the builder would produce (window rows,
    window count, residual spill) — not a re-derived model of it."""
    from fustpu.ops.pallas_gather import build_plan

    g = dofmap.reshape(-1).astype(np.int64)
    spans = np.array([g[s:s + TM].max() - g[s:s + TM].min()
                      for s in range(0, g.size, TM)])
    plan = build_plan(g, ndofs)
    wr, _, _, N, nwin = plan.statics[:5]
    return spans, wr, nwin, int(plan.spos.shape[0]) / N


def time_orders(base):
    """Device timing of the engine gather / scatter / full indexed apply
    under each ordering (plus `locality_order`'s automatic pick)."""
    import jax
    import jax.numpy as jnp

    from fustpu.mesh.unstructured import locality_order, reorder_cells
    from fustpu.ops import pallas_gather as pg
    from fustpu.ops import precompute as pre
    from fustpu.ops.operators import stiffness_apply_indexed
    from fustpu.utils import benchmarks as B

    interp = jax.default_backend() == "cpu"
    variants = list(order_variants(base)) + [("auto", "auto")]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:        # cheap single-config A/B runs (TM / lanepick / kernel)
        variants = [v for v in variants if v[0] in only]
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(base.ndofs)
    bl = B.sync_baseline()
    for name, perm in variants:
        mesh = (locality_order(base) if isinstance(perm, str)
                else base if perm is None else reorder_cells(base, perm))
        plan = pg.build_plan(mesh.dofmap.reshape(-1).astype(np.int64),
                             mesh.ndofs)
        x = jnp.asarray(x_np, jnp.float32)
        tg, _ = B.time_apply(
            lambda p, v: pg.gather(v, plan, interpret=interp).sum()
            + v * 0.999, None, x, chain=20, reps=5, baseline=bl)
        vals = jnp.asarray(rng.standard_normal(plan.statics[3]),
                           jnp.float32)
        ts, _ = B.time_apply(
            lambda p, v: pg.scatter_add(v, plan, mesh.ndofs,
                                        interpret=interp)[:1].sum() + v,
            None, vals, chain=20, reps=5, baseline=bl)
        _, G = pre.cell_geometry_factors(mesh)
        G = jnp.asarray(np.moveaxis(G, 2, 0), jnp.float32)  # comp-major
        D = jnp.asarray(mesh.element.deriv_1d, jnp.float32)
        dm = jnp.asarray(mesh.dofmap)
        coeff = jnp.ones(mesh.num_cells, jnp.float32)
        ta, _ = B.time_apply(
            lambda p, v: stiffness_apply_indexed(
                v, G, coeff, dm, D, mesh.ndofs, engine=plan,
                engine_interpret=interp), None, x,
            chain=20, reps=5, baseline=bl)
        # fused single-kernel apply (cell-row plan), when eligible
        _, Ghost = pre.cell_geometry_factors(mesh)
        fe = pg.build_fused_engine(np.asarray(mesh.dofmap), mesh.ndofs,
                                   Ghost, mesh.element.deriv_1d,
                                   jnp.float32)
        tf = float("nan")
        if fe is not None:
            tf, _ = B.time_apply(
                lambda p, v: pg.fused_apply(v, coeff, fe, mesh.ndofs,
                                            interpret=interp),
                None, x, chain=20, reps=5, baseline=bl)
        print(f"{name:<12} WR={plan.statics[0]:4d}x{plan.statics[4]}"
              f"  gather {tg*1e3:7.3f} "
              f"ms  scatter {ts*1e3:7.3f} ms  apply {ta*1e3:7.3f} ms"
              f"  fused {tf*1e3:7.3f} ms",
              flush=True)


def main():
    if "--time" not in sys.argv:
        # span analysis is host-side numpy + plan builds; never touch
        # the (possibly tunnel-dead) TPU backend for it.  build_plan's
        # jnp.asarray otherwise initialises axon and can hang >590 s
        # during a tunnel outage.
        import jax

        jax.config.update("jax_platforms", "cpu")
    from fustpu.mesh.unstructured import UnstructuredHexMesh, reorder_cells

    degree = 4
    verts, cells_, tagged = shapes.cylinder_mesh(
        0.015, 0.03, 0.01, m=8, mr=4, nr_ann=4, nz=30)
    base = UnstructuredHexMesh(degree=degree, vertices=verts, cells=cells_,
                               facet_tag_map={})
    print(f"{base.num_cells} cells, {base.ndofs} dofs")
    wr0 = None
    span_variants = ([] if any(a.startswith("--only=") for a in sys.argv)
                     else list(order_variants(base)))
    for name, perm in span_variants:
        mesh = base if perm is None else reorder_cells(base, perm)
        spans, wr, nwin, spill = span_stats(mesh.dofmap, mesh.ndofs)
        wr0 = wr0 or (wr * nwin)
        print(f"{name:<12} span p50={np.percentile(spans, 50):8.0f} "
              f"p99={np.percentile(spans, 99):8.0f} max={spans.max():8.0f}"
              f"  WR={wr:4d}x{nwin}  spill={spill*100:5.2f}%"
              f"  one-hot FLOP ratio={wr*nwin/wr0:5.2f}x")
    if "--time" in sys.argv:
        time_orders(base)


if __name__ == "__main__":
    main()
