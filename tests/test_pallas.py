"""Pallas fused stiffness kernel vs the (oracle-verified) matmul path,
interpret mode on CPU (the reference keeps its jnp path as the
interpret-mode test target per SURVEY.md §7.5).

Covers degrees P=2..6, both kernel precisions (full-f32 HIGHEST and the
manual bf16x3 decomposition), odd cell counts, VMEM block-pick edge cases,
and the mm fallback when no feasible tiling exists.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fustpu.elements.hex import HexElement
from fustpu.mesh.box import build_box_mesh
from fustpu.ops import pallas_stiffness as ps
from fustpu.ops import precompute as pre
from fustpu.ops import spectral_mm as mm


def _mm_reference(mesh, P, coeff, x):
    elem = HexElement(P)
    _, G = pre.cell_geometry_factors(mesh)
    op_mm = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                               coeff=coeff)
    return np.asarray(mm.stiffness_apply_mm(op_mm, x)), G, elem


def _run_pallas(mesh, P, coeff, x, precision):
    elem = HexElement(P)
    _, G = pre.cell_geometry_factors(mesh)
    op_p = ps.build(mesh.nc, P, elem.deriv_1d, G, jnp.float64, coeff=coeff)
    return np.asarray(ps.stiffness_apply_pallas(
        op_p, x, interpret=True, precision=precision))


@pytest.mark.parametrize("P", [2, 3, 4, 5, 6])
def test_pallas_stiffness_matches_mm(P):
    """Full-precision kernel == matmul formulation to roundoff (f64)."""
    mesh = build_box_mesh((4, 3, 5), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=7)
    rng = np.random.default_rng(0)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, _ = _mm_reference(mesh, P, coeff, x)
    y = _run_pallas(mesh, P, coeff, x, ps._HI)
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err


@pytest.mark.parametrize("P", [2, 3, 4, 5, 6])
def test_pallas_stiffness_bf16x3(P):
    """The manual 3-term bf16 decomposition: the only dropped term is
    lo*lo, whose relative magnitude is ~2^-18 = 3.8e-6; allow a small
    accumulation factor on top."""
    mesh = build_box_mesh((4, 3, 5), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=7)
    rng = np.random.default_rng(1)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, _ = _mm_reference(mesh, P, coeff, x)
    y = _run_pallas(mesh, P, coeff, x, "bf16x3")
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 2e-5, err
    assert err > 0.0  # sanity: the decomposition is actually engaged


@pytest.mark.parametrize("nc", [(3, 1, 2), (2, 7, 3), (5, 2, 2)])
def test_pallas_odd_cell_counts(nc):
    """Odd/prime cell counts exercise the block-pick fallbacks."""
    P = 3
    mesh = build_box_mesh(nc, P, perturb=0.1, seed=3)
    rng = np.random.default_rng(2)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, _ = _mm_reference(mesh, P, coeff, x)
    y = _run_pallas(mesh, P, coeff, x, ps._HI)
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err


def test_pallas_fits_and_mm_fallback():
    """When no VMEM-feasible tiling exists the model must fall back to the
    matmul path and produce identical physics."""
    import jax

    from fustpu.config import Material, Source
    from fustpu.models.discretization import resolve_stiffness_impl, \
        Discretization
    from fustpu.models.linear import LinearWaveModel

    # a mesh the heuristic accepts
    mesh_ok = build_box_mesh((4, 4, 4), 4)
    assert Discretization(mesh_ok, jnp.float64).pallas_fits()

    # a y/z extent far beyond VMEM for a single slab must be rejected
    n = 5
    assert ps.pallas_fits(n, ncy=4096, ncz=4096, gz=4096 * 4 + 1) is False

    # fallback at the model level: impl='auto' off-TPU resolves to mm and
    # the solution matches an explicit pallas run (interpret mode)
    mesh = build_box_mesh((3, 3, 3), 3, hi=(0.01,) * 3)
    mat = Material(sound_speed=1500.0, density=1000.0)
    src = Source(frequency=1e6, amplitude=1e5)
    kw = dict(dtype=jnp.float64)
    m_mm = LinearWaveModel(mesh, mat, src, mesh.boundary_facets("x-"),
                           mesh.all_boundary_facets(),
                           stiffness_impl="mm", **kw)
    assert resolve_stiffness_impl("auto", m_mm.disc) == "mm"  # CPU here
    m_pl = LinearWaveModel(mesh, mat, src, mesh.boundary_facets("x-"),
                           mesh.all_boundary_facets(),
                           stiffness_impl="pallas", **kw)
    m_pl._pallas_interpret = True
    # route the pallas model through interpret mode
    import fustpu.ops.pallas_stiffness as psm
    orig = psm.stiffness_apply_pallas

    def interp(op, x, interpret=False, precision=ps._HI):
        return orig(op, x, interpret=True, precision=precision)

    psm.stiffness_apply_pallas = interp
    try:
        dt, _ = m_mm.cfl_dt(0.5)
        s1, _ = m_mm.solve(m_mm.init_state(), dt, 5)
        s2, _ = m_pl.solve(m_pl.init_state(), dt, 5)
    finally:
        psm.stiffness_apply_pallas = orig
    err = (np.linalg.norm(np.asarray(s1.u) - np.asarray(s2.u))
           / max(np.linalg.norm(np.asarray(s1.u)), 1e-300))
    assert err < 1e-11, err


def test_pallas_y_partitioned_matches_mm():
    """The y-slab-partitioned operator (for meshes whose y-z extent
    exceeds VMEM) must match the matmul path: cells are partitioned and
    the shared planes overlap-added, so the result is exact."""
    P = 3
    mesh = build_box_mesh((3, 7, 4), P, hi=(1.0, 1.7, 1.1),
                          perturb=0.12, seed=13)
    elem = HexElement(P)
    _, G = pre.cell_geometry_factors(mesh)
    rng = np.random.default_rng(4)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    op_mm = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                               coeff=coeff)
    y_ref = np.asarray(mm.stiffness_apply_mm(op_mm, x))
    op_sp = ps.build_auto(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                          coeff=coeff, force_parts=3)
    assert isinstance(op_sp, ps.PallasStiffnessSplit)
    assert sum(op_sp.y_sizes) == mesh.nc[1]
    y = np.asarray(ps.stiffness_apply_pallas(op_sp, x, interpret=True,
                                             precision=ps._HI))
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err


def test_build_auto_force_parts_clamped():
    """force_parts beyond ncy must clamp (a zero-size slab would crash at
    apply time)."""
    P = 2
    mesh = build_box_mesh((2, 3, 2), P)
    _, G = pre.cell_geometry_factors(mesh)
    elem = HexElement(P)
    op = ps.build_auto(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                       force_parts=7)
    assert sum(op.y_sizes) == 3 and min(op.y_sizes) >= 1
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        mesh.grid_shape), jnp.float64)
    y = ps.stiffness_apply_pallas(op, x, interpret=True, precision=ps._HI)
    op_mm = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
    y_ref = mm.stiffness_apply_mm(op_mm, x)
    err = (np.linalg.norm(np.asarray(y) - np.asarray(y_ref))
           / np.linalg.norm(np.asarray(y_ref)))
    assert err < 1e-12, err


def test_build_auto_force_parts_single_slab():
    """force_parts > 1 with ncy == 1 must degrade to the plain operator:
    the split apply's concat logic assumes >= 2 slabs (ADVICE r2)."""
    P = 2
    mesh = build_box_mesh((3, 1, 2), P)
    _, G = pre.cell_geometry_factors(mesh)
    elem = HexElement(P)
    op = ps.build_auto(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                       force_parts=4)
    assert isinstance(op, ps.PallasStiffness)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        mesh.grid_shape), jnp.float64)
    y = ps.stiffness_apply_pallas(op, x, interpret=True, precision=ps._HI)
    assert y.shape == mesh.grid_shape
    op_mm = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
    y_ref = mm.stiffness_apply_mm(op_mm, x)
    err = (np.linalg.norm(np.asarray(y) - np.asarray(y_ref))
           / np.linalg.norm(np.asarray(y_ref)))
    assert err < 1e-12, err


def test_pallas_pair_matches_two_ops():
    """Pair kernel (one fused pass, unit-coefficient G) == two
    coefficient-folded applies, f64 exact and bf16x3 within the
    validated budget."""
    P = 3
    mesh = build_box_mesh((3, 4, 2), P, perturb=0.12, seed=5)
    _, G = pre.cell_geometry_factors(mesh)
    elem = HexElement(P)
    rng = np.random.default_rng(0)
    c1 = rng.uniform(0.5, 2.0, mesh.nc)
    c2 = rng.uniform(-1.5, -0.5, mesh.nc)
    x1 = jnp.asarray(rng.standard_normal(mesh.grid_shape))
    x2 = jnp.asarray(rng.standard_normal(mesh.grid_shape))
    op1 = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                             coeff=c1)
    op2 = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                             coeff=c2)
    yr = mm.stiffness_apply_mm(op1, x1) + mm.stiffness_apply_mm(op2, x2)
    opp = ps.build_pair(mesh.nc, P, elem.deriv_1d, G, jnp.float64, c1, c2)
    yp = ps.stiffness_apply_pallas_pair(opp, x1, x2, interpret=True,
                                        precision=ps._HI)
    err = float(jnp.linalg.norm(yp - yr) / jnp.linalg.norm(yr))
    assert err < 1e-12, err
    # mm pair formulation too
    opu = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
    c1e = jnp.asarray(mm.expand_cell_field(c1, P + 1))
    c2e = jnp.asarray(mm.expand_cell_field(c2, P + 1))
    ym = mm.stiffness_apply_mm_pair(opu, x1, x2, c1e, c2e)
    err = float(jnp.linalg.norm(ym - yr) / jnp.linalg.norm(yr))
    assert err < 1e-12, err
    # bf16x3 accuracy
    opp32 = ps.build_pair(mesh.nc, P, elem.deriv_1d, G, jnp.float32,
                          c1, c2)
    y32 = ps.stiffness_apply_pallas_pair(
        opp32, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
        interpret=True, precision="bf16x3")
    err = float(jnp.linalg.norm(y32.astype(jnp.float64) - yr)
                / jnp.linalg.norm(yr))
    assert err < 3e-5, err


def test_slab2_kernel_matches_mm():
    """The experimental two-slab kernel (a recorded performance negative
    result, BENCH_NOTES r3) must stay mathematically exact, including
    odd slab counts (zero-G ghost slab)."""
    for nc in [(4, 3, 2), (5, 2, 3)]:
        P = 3
        mesh = build_box_mesh(nc, P, perturb=0.12, seed=5)
        _, G = pre.cell_geometry_factors(mesh)
        elem = HexElement(P)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            mesh.grid_shape), jnp.float64)
        op_m = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G,
                                  jnp.float64)
        yr = mm.stiffness_apply_mm(op_m, x)
        op2 = ps.build_slab2(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
        y2 = ps._apply_slab2(op2, x, interpret=True, precision=ps._HI)
        err = float(jnp.linalg.norm(y2 - yr) / jnp.linalg.norm(yr))
        assert err < 1e-12, (nc, err)


# ---------------------------------------------------------------------------
# Corner-streamed kernel (memory-capacity mode): G recomputed in VMEM from
# 37 floats/cell.  Geometry is trilinear per cell throughout fustpu, so the
# corner kernel is mathematically EXACT vs the G-stream/mm paths (same
# closed-form Jacobian), not an approximation — gate at 1e-12 f64.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("P", [2, 3, 4])
def test_pallas_corner_matches_mm(P):
    """build_auto(corners=...) == matmul path at f64/HIGHEST (interpret)."""
    mesh = build_box_mesh((4, 3, 2), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=7)
    rng = np.random.default_rng(P)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, elem = _mm_reference(mesh, P, coeff, x)
    op_c = ps.build_auto(mesh.nc, P, elem.deriv_1d, None, jnp.float64,
                         coeff=coeff.reshape(-1),
                         corners=mesh.cell_corners_flat)
    assert isinstance(op_c, ps.PallasStiffnessCorner)
    y = np.asarray(ps.stiffness_apply_pallas(op_c, x, interpret=True,
                                             precision=ps._HI))
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err


def test_pallas_corner_y_split_matches_mm():
    """Corner kernel through the y-partitioned route
    (build_auto(corners, force_parts>1)) stays exact."""
    P = 3
    mesh = build_box_mesh((3, 5, 2), P, hi=(1.0, 1.7, 1.1),
                          perturb=0.12, seed=13)
    elem = HexElement(P)
    rng = np.random.default_rng(4)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, _ = _mm_reference(mesh, P, coeff, x)
    op_sp = ps.build_auto(mesh.nc, P, elem.deriv_1d, None, jnp.float64,
                          coeff=coeff.reshape(-1), force_parts=3,
                          corners=mesh.cell_corners_flat)
    assert isinstance(op_sp, ps.PallasStiffnessSplit)
    assert isinstance(op_sp.parts[0], ps.PallasStiffnessCorner)
    y = np.asarray(ps.stiffness_apply_pallas(op_sp, x, interpret=True,
                                             precision=ps._HI))
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err


def test_pallas_corner_bf16x3_accuracy():
    """Corner kernel under the production f32/bf16x3 configuration stays
    within the validated operator-error budget."""
    P = 4
    mesh = build_box_mesh((3, 3, 2), P, perturb=0.1, seed=9)
    elem = HexElement(P)
    rng = np.random.default_rng(5)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x64 = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, _ = _mm_reference(mesh, P, coeff, x64)
    op_c = ps.build_auto(mesh.nc, P, elem.deriv_1d, None, jnp.float32,
                         coeff=coeff.reshape(-1),
                         corners=mesh.cell_corners_flat)
    y = np.asarray(ps.stiffness_apply_pallas(
        op_c, jnp.asarray(x64, jnp.float32), interpret=True,
        precision="bf16x3")).astype(np.float64)
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 5e-5, err


def test_model_pallas_corner_solve_matches_mm():
    """Model-level stiffness_impl='pallas_corner' == mm physics (the
    production knob for the capacity mode, interpret mode on CPU)."""
    import fustpu.ops.pallas_stiffness as psm

    from fustpu.config import Material, Source
    from fustpu.models.linear import LinearWaveModel

    mesh = build_box_mesh((3, 3, 3), 3, hi=(0.01,) * 3, perturb=0.1,
                          seed=11)
    mat = Material(sound_speed=1500.0, density=1000.0)
    src = Source(frequency=1e6, amplitude=1e5)
    kw = dict(dtype=jnp.float64)
    m_mm = LinearWaveModel(mesh, mat, src, mesh.boundary_facets("x-"),
                           mesh.all_boundary_facets(),
                           stiffness_impl="mm", **kw)
    m_c = LinearWaveModel(mesh, mat, src, mesh.boundary_facets("x-"),
                          mesh.all_boundary_facets(),
                          stiffness_impl="pallas_corner", **kw)
    assert m_c._corner and m_c.impl == "pallas"
    orig = psm.stiffness_apply_pallas

    def interp(op, x, interpret=False, precision=ps._HI):
        return orig(op, x, interpret=True, precision=precision)

    psm.stiffness_apply_pallas = interp
    try:
        dt, _ = m_mm.cfl_dt(0.5)
        s1, _ = m_mm.solve(m_mm.init_state(), dt, 5)
        s2, _ = m_c.solve(m_c.init_state(), dt, 5)
    finally:
        psm.stiffness_apply_pallas = orig
    err = (np.linalg.norm(np.asarray(s1.u) - np.asarray(s2.u))
           / max(np.linalg.norm(np.asarray(s1.u)), 1e-300))
    assert err < 1e-11, err


@pytest.mark.parametrize("P", [3, 4])
def test_pallas_bf16x3w_accuracy(P):
    """The opt-in wide-dispatch bf16x3w precision (one merged hi/lo
    dispatch) computes the same 3-term decomposition as bf16x3 — same
    error budget vs the f64 reference."""
    mesh = build_box_mesh((4, 3, 2), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=7)
    rng = np.random.default_rng(P)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)
    y_ref, _, _ = _mm_reference(mesh, P, coeff, x)
    yw = _run_pallas(mesh, P, coeff, x, "bf16x3w")
    err = np.linalg.norm(yw - y_ref) / np.linalg.norm(y_ref)
    assert err < 2e-5, err
    # and bit-identical term set: bf16x3w == bf16x3 up to summation order
    y3 = _run_pallas(mesh, P, coeff, x, "bf16x3")
    drift = np.linalg.norm(yw - y3) / np.linalg.norm(y3)
    assert drift < 1e-6, drift


def test_slab2w_kernel_matches_mm():
    """The full-width two-slab kernel (far pairing, placement-matmul
    packing — the dispatch-widening form slab2's partial-lane cliff left
    untried, VERDICT r4 #8) must be exact, including odd slab counts
    (zero-G ghost) and the seam overlap-add between the two sweeps."""
    for nc in [(4, 3, 2), (5, 2, 3)]:
        P = 3
        mesh = build_box_mesh(nc, P, perturb=0.12, seed=5)
        _, G = pre.cell_geometry_factors(mesh)
        elem = HexElement(P)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            mesh.grid_shape), jnp.float64)
        op_m = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G,
                                  jnp.float64)
        yr = mm.stiffness_apply_mm(op_m, x)
        op2 = ps.build_slab2w(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
        y2 = ps._apply_slab2w(op2, x, interpret=True, precision=ps._HI)
        err = float(jnp.linalg.norm(y2 - yr) / jnp.linalg.norm(yr))
        assert err < 1e-12, (nc, err)
