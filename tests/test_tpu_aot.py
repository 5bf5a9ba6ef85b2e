"""AOT Mosaic-lowering gate: compile every TPU Pallas kernel against a
DEVICELESS v5e topology (jax.experimental.topologies + libtpu's
compile-only client).

Interpret mode validates numerics but NOT Mosaic lowering — the r4
round hit a real compile failure (512x2 windows / SMEM prefetch limits)
only on hardware, and the r5 tunnel outage showed kernels can ship
having never been lowered.  This gate closes that class hermetically:
every kernel configuration below must COMPILE for the bench chip's
platform (v5e), with no TPU attached.

These tests exercise the compiler only; numerical gates live in the
interpret-mode tests next to each kernel.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import jax


@pytest.fixture(scope="module")
def tpu_dev():
    from jax.experimental import topologies

    try:
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2")
    except Exception as e:  # pragma: no cover - libtpu missing
        pytest.skip(f"no deviceless TPU topology available: {e}")
    # production TPU runs are x32; the suite-wide x64 (conftest) leaks
    # i64 into grid index maps, which Mosaic rejects — compile these
    # kernels in the configuration they actually ship in
    jax.config.update("jax_enable_x64", False)
    yield topo.devices[0]
    jax.config.update("jax_enable_x64", True)


def aot_compile(dev, f, *avals):
    """jit-compile f for the deviceless TPU device; returns the Compiled
    (raises on any Mosaic/XLA lowering failure)."""
    sh = jax.sharding.SingleDeviceSharding(dev)
    args = [jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh)
            for a in avals]
    return jax.jit(f, in_shardings=(sh,) * len(args),
                   out_shardings=sh).lower(*args).compile()


# ---------------------------------------------------------------------------
# gather/scatter engine: col + packed layouts, one- and two-window plans
# ---------------------------------------------------------------------------

def _plan(layout, nwin):
    from fustpu.ops import pallas_gather as pg

    old = pg.LAYOUT
    pg.LAYOUT = layout
    try:
        rng = np.random.default_rng(0)
        nsrc, N = 60000, 50000
        g = np.sort(rng.integers(0, nsrc // 2, N)).astype(np.int64)
        if nwin == 2:
            g[::7] += nsrc // 2 - 1000
        plan = pg.build_plan(g, nsrc, nwin=nwin)
        assert plan.statics[4] == nwin
        assert pg._plan_packed(plan) == (layout == "packed")
    finally:
        pg.LAYOUT = old
    return plan, nsrc, N


@pytest.mark.parametrize("layout", ["col", "packed"])
@pytest.mark.parametrize("nwin", [1, 2])
def test_engine_kernels_lower(tpu_dev, layout, nwin):
    from fustpu.ops import pallas_gather as pg

    plan, nsrc, N = _plan(layout, nwin)
    x = jax.ShapeDtypeStruct((nsrc,), jnp.float32)
    v = jax.ShapeDtypeStruct((N,), jnp.float32)
    aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan), x)
    aot_compile(tpu_dev,
                lambda xx: pg.gather2(xx, xx * 2.0, plan)[0], x)
    aot_compile(tpu_dev,
                lambda vv: pg.scatter_add(vv, plan, nsrc), v)


@pytest.mark.parametrize("nwin", [1, 2])
def test_engine_subw_lowers(tpu_dev, nwin):
    """The SUBW-widened packed kernels (lane-concatenated one-hot
    blocks, one MXU dispatch per SUBW sub-tiles) lower clean — the
    lane-axis jnp.concatenate of whole-vreg rows is layout-preserving
    for Mosaic (verified here, not assumed)."""
    from fustpu.ops import pallas_gather as pg

    old = pg.SUBW
    try:
        pg.SUBW = 8
        for f in (pg.gather, pg.gather2, pg.scatter_add):
            f.clear_cache()
        plan, nsrc, N = _plan("packed", nwin)
        x = jax.ShapeDtypeStruct((nsrc,), jnp.float32)
        v = jax.ShapeDtypeStruct((N,), jnp.float32)
        aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan), x)
        aot_compile(tpu_dev,
                    lambda xx: pg.gather2(xx, xx * 2.0, plan)[0], x)
        aot_compile(tpu_dev,
                    lambda vv: pg.scatter_add(vv, plan, nsrc), v)
    finally:
        pg.SUBW = old
        for f in (pg.gather, pg.gather2, pg.scatter_add):
            f.clear_cache()


@pytest.mark.slow
def test_engine_tm4096_lowers_packed_only(tpu_dev):
    """The TM=4096 ladder rung compiles in the PACKED layout; in the col
    layout its lane-padded (4096, 1) streams exceed the 16 MB scoped
    VMEM at compile time (RESOURCE_EXHAUSTED, found by this gate — the
    r4 on-chip queue would have burned tunnel time discovering it).
    Pinned as a negative result: the TM ladder requires packed."""
    from fustpu.ops import pallas_gather as pg

    rng = np.random.default_rng(1)
    nsrc, N = 60000, 50000
    g = np.sort(rng.integers(0, nsrc, N)).astype(np.int64)
    x = jax.ShapeDtypeStruct((nsrc,), jnp.float32)
    old = pg.LAYOUT
    try:
        pg.LAYOUT = "packed"
        plan = pg.build_plan(g, nsrc, tm=4096)
        assert pg._plan_packed(plan)
        aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan), x)
        aot_compile(tpu_dev,
                    lambda xx: pg.scatter_add(
                        xx[:N] * 0 + 1.0, plan, nsrc)[:nsrc], x)
        # the TM=8192 rung (queue run 5) must also lower packed
        plan8 = pg.build_plan(g, nsrc, tm=8192)
        assert pg._plan_packed(plan8)
        aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan8), x)
        aot_compile(tpu_dev,
                    lambda xx: pg.scatter_add(
                        xx[:N] * 0 + 1.0, plan8, nsrc)[:nsrc], x)
        pg.LAYOUT = "col"
        plan_c = pg.build_plan(g, nsrc, tm=4096)
        assert not pg._plan_packed(plan_c)
        with pytest.raises(Exception, match="RESOURCE_EXHAUSTED|vmem"):
            aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan_c), x)
    finally:
        pg.LAYOUT = old


@pytest.mark.parametrize("nwin", [1, 2])
def test_engine_staged_lowers(tpu_dev, nwin):
    """The staged engine kernels (grid-constant VMEM field block,
    windows as in-kernel slices; VMEM-resident revisited scatter
    output — the r5 scan-tax fix) lower clean on v5e."""
    from fustpu.ops import pallas_gather as pg

    plan, nsrc, N = _plan("packed", nwin)
    old = pg.STAGE
    try:
        pg.STAGE = "1"
        for f in (pg.gather, pg.gather2, pg.scatter_add):
            f.clear_cache()
        x = jax.ShapeDtypeStruct((nsrc,), jnp.float32)
        v = jax.ShapeDtypeStruct((N,), jnp.float32)
        aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan), x)
        aot_compile(tpu_dev,
                    lambda xx: pg.gather2(xx, xx * 2.0, plan)[0], x)
        aot_compile(tpu_dev,
                    lambda vv: pg.scatter_add(vv, plan, nsrc), v)
    finally:
        pg.STAGE = old
        for f in (pg.gather, pg.gather2, pg.scatter_add):
            f.clear_cache()


def test_engine_staged_lowers_at_scan_tax_scale(tpu_dev):
    """Staged kernels lower at the 3.2M-DOF bodyfit scale (12.4 MB f32
    field; the gather2 pair stages BOTH fields).  This is the shape the
    scan-tax fix exists for — Mosaic must accept the raised
    vmem_limit_bytes (probed: enforcement is vs the core's physical
    128 MiB, not the 16 MiB default scope)."""
    from fustpu.ops import pallas_gather as pg

    rng = np.random.default_rng(5)
    nsrc, nc = 3_200_000, 2048
    base = np.sort(rng.integers(0, nsrc - 4096, nc))
    g = (base[:, None]
         + (np.arange(128)[None, :] * 17) % 4096).reshape(-1)
    plan = pg.build_plan(g.astype(np.int64), nsrc)
    assert pg._staged(plan, jnp.float32)
    assert pg._staged(plan, jnp.float32, nfields=2)
    x = jax.ShapeDtypeStruct((nsrc,), jnp.float32)
    v = jax.ShapeDtypeStruct((g.size,), jnp.float32)
    aot_compile(tpu_dev, lambda xx: pg.gather(xx, plan), x)
    aot_compile(tpu_dev, lambda xx: pg.gather2(xx, xx * 2.0, plan)[0], x)
    aot_compile(tpu_dev, lambda vv: pg.scatter_add(vv, plan, nsrc), v)


def _fused_engine_case(cells, ndofs, rng):
    from fustpu.ops import pallas_gather as pg

    n, n3 = 5, 125
    dm = np.zeros((cells, n3), np.int64)
    step = max(1, (ndofs - n3 - 1) // cells)
    for c in range(cells):
        dm[c] = min(c * step, ndofs - n3 - 1) + np.arange(n3)
    G = np.ones((cells, n3, 6))
    D = rng.standard_normal((n, n))
    fe = pg.build_fused_engine(dm, ndofs, G, D, jnp.float32)
    assert fe is not None
    return fe


def test_fused_engine_lowers(tpu_dev):
    """The fused single-kernel engine apply (cell-row plan; gather +
    contraction + scatter in one Mosaic kernel) lowers clean on v5e in
    all three modes."""
    from fustpu.ops import pallas_gather as pg

    cells, ndofs = 300, 9000
    fe = _fused_engine_case(cells, ndofs, np.random.default_rng(2))
    x = jax.ShapeDtypeStruct((ndofs,), jnp.float32)
    c = jax.ShapeDtypeStruct((cells,), jnp.float32)
    aot_compile(tpu_dev,
                lambda xx, cc: pg.fused_apply(xx, cc, fe, ndofs), x, c)
    aot_compile(tpu_dev,
                lambda xx, cc: pg.fused_apply(xx, None, fe, ndofs), x, c)
    aot_compile(
        tpu_dev,
        lambda xx, cc: pg.fused_apply_pair(xx, cc, xx * 2.0, cc,
                                           fe, ndofs), x, c)


@pytest.mark.slow
def test_fused_engine_lowers_at_scale(tpu_dev):
    """The pair mode (it subsumes the others: two staged fields, shared
    one-hot gather, coefficient fold, contraction, scatter) lowers at
    the 3.2M-DOF production scale — the staged-VMEM budget gate."""
    from fustpu.ops import pallas_gather as pg

    cells, ndofs = 49152, 3211713
    fe = _fused_engine_case(cells, ndofs, np.random.default_rng(2))
    x = jax.ShapeDtypeStruct((ndofs,), jnp.float32)
    c = jax.ShapeDtypeStruct((cells,), jnp.float32)
    aot_compile(
        tpu_dev,
        lambda xx, cc: pg.fused_apply_pair(xx, cc, xx * 2.0, cc,
                                           fe, ndofs), x, c)


# ---------------------------------------------------------------------------
# structured fused stiffness kernels: production, corner, pair, slab2w
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def box_setup():
    from fustpu.elements.hex import HexElement
    from fustpu.mesh.box import build_box_mesh
    from fustpu.ops import precompute as pre

    P = 3
    mesh = build_box_mesh((4, 4, 4), P, perturb=0.05, seed=1)
    _, G = pre.cell_geometry_factors(mesh)
    elem = HexElement(P)
    return mesh, G, elem


def test_structured_kernels_lower(tpu_dev, box_setup):
    from fustpu.ops import pallas_stiffness as ps

    mesh, G, elem = box_setup
    x = jax.ShapeDtypeStruct(mesh.grid_shape, jnp.float32)
    op = ps.build_auto(mesh.nc, mesh.degree, elem.deriv_1d, G,
                       jnp.float32)
    aot_compile(tpu_dev,
                lambda xx: ps.stiffness_apply_pallas(op, xx), x)
    opc = ps.build_corner(mesh.nc, mesh.degree, elem.deriv_1d,
                          mesh.cell_corners_flat, jnp.float32)
    aot_compile(tpu_dev, lambda xx: ps._apply_corner(opc, xx), x)
    opw = ps.build_slab2w(mesh.nc, mesh.degree, elem.deriv_1d, G,
                          jnp.float32)
    aot_compile(tpu_dev, lambda xx: ps._apply_slab2w(opw, xx), x)


def test_structured_pair_lowers(tpu_dev, box_setup):
    from fustpu.ops import pallas_stiffness as ps

    mesh, G, elem = box_setup
    nc = mesh.nc
    c1 = np.full(nc, 1.3)
    c2 = np.full(nc, -0.4)
    opp = ps.build_pair(nc, mesh.degree, elem.deriv_1d, G, jnp.float32,
                        c1, c2)
    x = jax.ShapeDtypeStruct(mesh.grid_shape, jnp.float32)
    aot_compile(tpu_dev,
                lambda a, b: ps.stiffness_apply_pallas_pair(opp, a, b),
                x, x)


# ---------------------------------------------------------------------------
# extruded kernels: G stream, corner (trilinear + hex27), pair forms
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def cyl_setup():
    from fustpu.mesh import msh_io
    from fustpu.mesh.shapes import cylinder_mesh

    v, c, t = cylinder_mesh(0.012, 0.02, 0.008, m=3, mr=1, nr_ann=1,
                            nz=4)
    p = msh_io.write_msh("/tmp/_aot_cyl.msh", v, c, t)
    mesh = msh_io.read_msh(p, 3)
    from fustpu.models.discretization import Discretization

    return mesh, Discretization(mesh, jnp.float32)


def test_extruded_kernels_lower(tpu_dev, cyl_setup):
    from fustpu.ops import pallas_extruded as pex

    mesh, d = cyl_setup
    x = jax.ShapeDtypeStruct((mesh.ndofs,), jnp.float32)
    op = d.extruded_pallas_op()
    aot_compile(tpu_dev, lambda xx: pex.stiffness_apply_extruded_pallas(
        xx, op, mesh.ndofs), x)
    rng = np.random.default_rng(0)
    opp = d.extruded_pallas_pair_op(
        rng.uniform(0.5, 2.0, mesh.num_cells),
        rng.uniform(-1.5, -0.5, mesh.num_cells))
    aot_compile(
        tpu_dev,
        lambda a, b: pex.stiffness_apply_extruded_pallas_pair(
            a, b, opp, mesh.ndofs), x, x)


def test_extruded_corner_lowers(tpu_dev, cyl_setup):
    from fustpu.ops import pallas_extruded as pex

    mesh, d = cyl_setup
    x = jax.ShapeDtypeStruct((mesh.ndofs,), jnp.float32)
    opc = d.extruded_pallas_op(corner=True)
    aot_compile(tpu_dev, lambda xx: pex.stiffness_apply_extruded_pallas(
        xx, opc, mesh.ndofs), x)
    rng = np.random.default_rng(0)
    opcp = d.extruded_pallas_pair_op(
        rng.uniform(0.5, 2.0, mesh.num_cells),
        rng.uniform(-1.5, -0.5, mesh.num_cells), corner=True)
    aot_compile(
        tpu_dev,
        lambda a, b: pex.stiffness_apply_extruded_pallas_pair(
            a, b, opcp, mesh.ndofs), x, x)


def test_extruded_corner_hex27_lowers(tpu_dev):
    import dataclasses

    from fustpu.elements.hex import hex8_tabulate
    from fustpu.mesh.box import build_box_mesh
    from fustpu.mesh.extruded import as_extruded
    from fustpu.mesh.unstructured import from_box
    from fustpu.ops import pallas_extruded as pex

    lat3 = np.array([[i / 2, j / 2, k / 2] for i in range(3)
                     for j in range(3) for k in range(3)])
    bm = build_box_mesh((2, 2, 3), 2)
    um = from_box(bm, shuffle_seed=11)
    vals, _ = hex8_tabulate(lat3)
    gl = np.einsum("qv,cvd->cqd", vals, um.vertices[um.cells])
    curved = as_extruded(dataclasses.replace(um, geom_nodes=gl))
    assert curved is not None and curved.geom_nodes is not None
    from fustpu.elements.hex import HexElement

    opc = pex.build_extruded_corner(curved, HexElement(2).deriv_1d,
                                    jnp.float32)
    x = jax.ShapeDtypeStruct((curved.ndofs,), jnp.float32)
    aot_compile(tpu_dev, lambda xx: pex.stiffness_apply_extruded_pallas(
        xx, opc, curved.ndofs), x)


def test_dense_contract_lowers(tpu_dev):
    """The fused engine contraction (cells on the MXU M axis, metric
    transform fused in VMEM) compiles, with and without the per-cell
    coefficient, at P=4 and P=2 tile sizes."""
    from fustpu.ops import pallas_gather as pg

    for n, cells in ((5, 9600), (3, 777), (7, 500)):  # ragged + P=6 scale
        u = jax.ShapeDtypeStruct((cells, n ** 3), jnp.float32)
        G = jax.ShapeDtypeStruct((6, cells, n ** 3), jnp.float32)
        D = jax.ShapeDtypeStruct((n, n), jnp.float32)
        co = jax.ShapeDtypeStruct((cells,), jnp.float32)
        aot_compile(tpu_dev,
                    lambda uu, GG, DD: pg.dense_contract(uu, GG, DD),
                    u, G, D)
        aot_compile(tpu_dev,
                    lambda uu, GG, DD, cc: pg.dense_contract(
                        uu, GG, DD, coeff=cc), u, G, D, co)


def test_probed_stack_batch_deep_extrusion(tpu_dev):
    """Deep extrusions (ez past the conservative VMEM estimate) get a
    stack batch from the Mosaic compile probe instead of falling back
    to the XLA path — the r5 nz=140 capacity case (the estimator is
    ~40% over Mosaic's true allocation; chip-measured S=16/24 compile
    where it predicted None)."""
    from fustpu.ops.pallas_extruded import (pick_stack_batch,
                                            probed_stack_batch)

    # when the conservative estimator succeeds, the probe never runs
    assert probed_stack_batch(5, 2880, 600, 481) == \
        pick_stack_batch(5, 2880, 600, 481)
    # nz=140 / P=4 / gz=561: conservative None, probe admits a batch
    assert pick_stack_batch(5, 2842, 700, 561, corner=True) is None
    S = probed_stack_batch(5, 2842, 700, 561, corner=True)
    assert S is not None and S >= 8


def test_sharded_solver_lowers_for_tpu_topology(tpu_dev):
    """The production sharded corner solver (ExtrudedShardedModel:
    Mosaic kernels + shard_map psum + scan) AOT-compiles against a
    deviceless multi-chip v5e mesh — the mechanism behind
    demos/exp_capacity_sharded_aot.py's 0.42B-DOF 4-chip
    certification."""
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from fustpu.config import Material, Source
    from fustpu.mesh.extruded import as_extruded
    from fustpu.mesh.msh_io import _facets_from_quads
    from fustpu.mesh.shapes import cylinder_mesh
    from fustpu.mesh.unstructured import UnstructuredHexMesh
    from fustpu.models.westervelt import WesterveltModel
    from fustpu.parallel.extruded import AXIS, ExtrudedShardedModel

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual CPU devices")
    v, c, t = cylinder_mesh(0.015, 0.03, 0.01, m=3, mr=1, nr_ann=1,
                            nz=6)
    um = UnstructuredHexMesh(degree=3, vertices=v, cells=c,
                             facet_tag_map=_facets_from_quads(c, t))
    mesh = as_extruded(um)
    mat = Material(sound_speed=1500.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.3)
    src = Source(frequency=1.0e6, amplitude=1.0e5)
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets(1),
                            mesh.boundary_facets(2), dtype=jnp.float32,
                            stiffness_impl="pallas_corner")
    smodel = ExtrudedShardedModel(model, num_devices=4)
    s0 = smodel.init_state()
    st_shapes = [(a.shape, a.dtype, a.ndim) for a in s0]
    del s0

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    tmesh = Mesh(np.asarray(topo.devices[:4]), (AXIS,))
    smodel.device_mesh = tmesh
    smodel._pallas_interpret = False
    sh_of = lambda spec: NamedSharding(tmesh, spec)
    ctx_avals = jax.tree.map(
        lambda a, spec: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                             sharding=sh_of(spec)),
        smodel.ctx, smodel.ctx_spec)
    taval = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh_of(P()))
    st_avals = tuple(
        jax.ShapeDtypeStruct(shp, dt,
                             sharding=sh_of(P(AXIS) if nd else P()))
        for shp, dt, nd in st_shapes)
    cc = smodel.solver_fn(2).lower(ctx_avals, st_avals, taval,
                                   taval).compile()
    assert cc.memory_analysis().temp_size_in_bytes >= 0
