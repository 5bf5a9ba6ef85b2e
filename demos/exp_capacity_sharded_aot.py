"""Compiler-certified MULTI-CHIP capacity: AOT-compile the real sharded
corner-streamed Westervelt solve against a deviceless v5e slice.

Multi-chip hardware is not attachable here, but libtpu's compile-only
client is: the production `ExtrudedShardedModel` is built on k virtual
CPU devices (for shapes/specs), its `device_mesh` is swapped for a
v5e:2x2 topology mesh, and `solver_fn` is lowered with NamedSharding
avals — the ACTUAL Mosaic kernels, shard_map collectives and scan that
a 4-chip run would execute, compiled by the real TPU compiler, with
XLA's per-device memory analysis answering "does a ~0.4B-DOF imported
mesh fit a 4-chip v5e slice?" (reference analogue: the 10^8+-DOF MPI
configurations, BASELINE.md; /root/reference/cuda/scatterer.py:104-277).

    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
        python demos/exp_capacity_sharded_aot.py [--m 104] [--nz 120]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=104)
    p.add_argument("--mr", type=int, default=52)
    p.add_argument("--nr-ann", type=int, default=52)
    p.add_argument("--nz", type=int, default=120)
    p.add_argument("--degree", type=int, default=4)
    p.add_argument("--devices", type=int, default=4)
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args()

    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{args.devices}").strip()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding

    from fustpu.config import Material, Source
    from fustpu.mesh.extruded import as_extruded
    from fustpu.mesh.msh_io import _facets_from_quads
    from fustpu.mesh.shapes import cylinder_mesh
    from fustpu.mesh.unstructured import UnstructuredHexMesh
    from fustpu.models.westervelt import WesterveltModel
    from fustpu.parallel.extruded import AXIS, ExtrudedShardedModel

    t0 = time.perf_counter()
    v, c, t = cylinder_mesh(0.035, 0.12, 0.01, m=args.m, mr=args.mr,
                            nr_ann=args.nr_ann, nz=args.nz)
    um = UnstructuredHexMesh(degree=args.degree, vertices=v, cells=c,
                             facet_tag_map=_facets_from_quads(c, t))
    mesh = as_extruded(um)
    assert mesh is not None
    print(f"mesh: {mesh.num_cells/1e6:.1f}M cells, "
          f"{mesh.ndofs/1e6:.1f}M dofs  [{time.perf_counter()-t0:.0f}s]",
          flush=True)

    t0 = time.perf_counter()
    mat = Material(sound_speed=1500.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.3)
    src = Source(frequency=1.0e6, amplitude=1.0e5)
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets(1),
                            mesh.boundary_facets(2), dtype=jnp.float32,
                            stiffness_impl="pallas_corner")
    assert model.impl == "extruded_pallas" and model._ext_corner
    smodel = ExtrudedShardedModel(model, num_devices=args.devices)
    assert smodel._ext_corner
    print(f"sharded model built ({args.devices} shards, "
          f"~{mesh.ndofs/args.devices/1e6:.1f}M dofs/shard)  "
          f"[{time.perf_counter()-t0:.0f}s]", flush=True)

    s0 = smodel.init_state()          # shapes only; built on the CPU mesh
    st_shapes = [(a.shape, a.dtype, a.ndim) for a in s0]
    del s0

    # swap in the deviceless TPU slice and lower the REAL solver
    topo_name = {4: "v5e:2x2", 8: "v5e:2x4", 16: "v5e:4x4"}[args.devices]
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name=topo_name)
    assert len(topo.devices) >= args.devices
    topo_mesh = Mesh(np.asarray(topo.devices[:args.devices]), (AXIS,))
    smodel.device_mesh = topo_mesh
    smodel._pallas_interpret = False      # certify the Mosaic lowering
    fn = smodel.solver_fn(args.steps)

    sh_of = lambda spec: NamedSharding(topo_mesh, spec)
    ctx_avals = jax.tree.map(
        lambda a, spec: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                             sharding=sh_of(spec)),
        smodel.ctx, smodel.ctx_spec)
    from jax.sharding import PartitionSpec as P

    taval = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh_of(P()))
    st_avals = tuple(
        jax.ShapeDtypeStruct(shp, dt, sharding=sh_of(
            P(AXIS) if nd else P()))
        for shp, dt, nd in st_shapes)

    t0 = time.perf_counter()
    cc = fn.lower(ctx_avals, st_avals, taval, taval).compile()
    ma = cc.memory_analysis()
    ca = cc.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes) / 2**30
    by = ca.get("bytes accessed", float("nan")) / args.steps
    print(f"AOT {topo_name} compile OK [{time.perf_counter()-t0:.0f}s]: "
          f"PER-DEVICE args {ma.argument_size_in_bytes/2**30:.2f} + "
          f"temps {ma.temp_size_in_bytes/2**30:.2f} + out "
          f"{ma.output_size_in_bytes/2**30:.2f} = {tot:.2f} GiB of 16; "
          f"certified {by/2**30:.2f} GiB/step/device -> SoL "
          f"{by/0.8e12*1e3:.0f} ms/step", flush=True)


if __name__ == "__main__":
    main()
