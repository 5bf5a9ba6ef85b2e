"""Compiler-certified traffic audit of the hot applies — no TPU needed.

AOT-compiles each operator against a deviceless v5e topology
(jax.experimental.topologies + libtpu's compile-only client) and prints
XLA's own cost analysis: bytes accessed, FLOPs, and the implied
speed-of-light time at the measured ~0.8 TB/s streaming roofline.
This is the bound every kernel is optimised against; wall-clock
measurements (utils/benchmarks.py) tell the rest.

    python demos/exp_aot_cost.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

HBM_GBS = 800.0     # measured streaming roofline (BENCH_NOTES)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = jax.sharding.SingleDeviceSharding(topo.devices[0])

    def aot(f, *avals):
        args = [jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
                for a in avals]
        return jax.jit(f, in_shardings=(sh,) * len(args),
                       out_shardings=sh).lower(*args).compile()

    def report(name, compiled, ndofs):
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        by = ca.get("bytes accessed", float("nan"))
        fl = ca.get("flops", float("nan"))
        sol = by / (HBM_GBS * 1e9) * 1e3
        print(f"{name:<44} {by/1e6:9.1f} MB  {fl/1e9:8.2f} GF  "
              f"SoL {sol:6.3f} ms  ({by/ndofs:5.1f} B/dof)", flush=True)

    # ---- structured flagship: fused kernel apply + full RK4 step ------
    from fustpu.config import Material, Source
    from fustpu.mesh.box import build_box_mesh
    from fustpu.models.westervelt import WesterveltModel
    from fustpu.models.timestepping import RKState

    mesh = build_box_mesh((32,) * 3, 4, hi=(0.03,) * 3)
    mat = Material(sound_speed=1480.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.2)
    src = Source(frequency=1.1e6, amplitude=1.0e5)
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets("x-"),
                            mesh.all_boundary_facets(),
                            dtype=jnp.float32, stiffness_impl="pallas")
    dt, _ = model.cfl_dt(0.4)
    x = jax.ShapeDtypeStruct(mesh.grid_shape, jnp.float32)

    from fustpu.ops import pallas_stiffness as ps

    report("structured fused apply (P=4, 32^3)",
           aot(lambda a: ps.stiffness_apply_pallas(model._stiff_op, a),
               x), mesh.ndofs)

    def solve20(u, v, ku, kv, t):
        # the PRODUCTION form: a scanned solve (a single out-of-scan
        # step traces without buffer reuse and reads 15x more — audit
        # what actually runs)
        s, _ = model.solve(RKState(u, v, ku, kv, t), dt, 20)
        return s.u

    s0 = jax.eval_shape(lambda: model.init_state())
    c20 = aot(solve20, s0.u, s0.v, s0.ku, s0.kv, s0.t)
    ca = c20.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    by = ca.get("bytes accessed", float("nan")) / 20
    print(f"{'Westervelt RK4 step (in-scan, P=4, 32^3)':<44} "
          f"{by/1e6:9.1f} MB  {'':>10}  SoL {by/(HBM_GBS*1e9)*1e3:6.3f}"
          f" ms  ({by/mesh.ndofs:5.1f} B/dof)", flush=True)

    # ---- extruded import: G stream vs corner capacity stream ----------
    from fustpu.mesh import msh_io
    from fustpu.mesh.shapes import cylinder_mesh
    from fustpu.models.discretization import Discretization
    from fustpu.ops import pallas_extruded as pex

    v, c, t = cylinder_mesh(0.015, 0.03, 0.01, m=8, mr=4, nr_ann=4,
                            nz=30)
    p = msh_io.write_msh("/tmp/_aotcost_cyl.msh", v, c, t)
    emesh = msh_io.read_msh(p, 4)
    d = Discretization(emesh, jnp.float32)
    xe = jax.ShapeDtypeStruct((emesh.ndofs,), jnp.float32)
    opg = d.extruded_pallas_op()
    report(f"extruded G-stream apply ({emesh.ndofs/1e6:.2f}M dofs)",
           aot(lambda a: pex.stiffness_apply_extruded_pallas(
               a, opg, emesh.ndofs), xe), emesh.ndofs)
    opc = d.extruded_pallas_op(corner=True)
    report("extruded corner (capacity) apply",
           aot(lambda a: pex.stiffness_apply_extruded_pallas(
               a, opc, emesh.ndofs), xe), emesh.ndofs)

    # ---- non-prismatic engine: full indexed apply ----------------------
    from fustpu.mesh.unstructured import UnstructuredHexMesh
    from fustpu.ops import operators as xops

    base = UnstructuredHexMesh(degree=4, vertices=v, cells=c,
                               facet_tag_map={})
    from fustpu.mesh.unstructured import locality_order

    um = locality_order(base)
    du = Discretization(um, jnp.float32)
    G, dm, D = du.indexed_op
    plan = du.indexed_engine
    coeff = jnp.ones(um.num_cells, jnp.float32)
    xu = jax.ShapeDtypeStruct((um.ndofs,), jnp.float32)
    import fustpu.ops.pallas_gather as pg

    report(f"indexed engine apply ({um.ndofs/1e6:.2f}M dofs, "
           f"{pg.LAYOUT})",
           aot(lambda a: xops.stiffness_apply_indexed(
               a, G, coeff, dm, D, um.ndofs, engine=plan), xu),
           um.ndofs)


if __name__ == "__main__":
    main()
