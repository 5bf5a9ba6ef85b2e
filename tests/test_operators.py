"""Differential operator tests against the dense numpy oracle, replicating
the reference's recipe (/root/reference/numba-cpu/test_operators.py):
randomly perturbed mesh, smooth non-trivial input field, relative-l2 check
at the f64 tolerance 1e-12."""

import jax.numpy as jnp
import numpy as np
import pytest

from fustpu.elements.hex import HexElement
from fustpu.mesh.box import build_box_mesh
from fustpu.ops import gather_scatter as gs
from fustpu.ops import operators as ops
from fustpu.ops import precompute as pre
from fustpu.oracle import assemble as oracle

TOL = 1e-12


def smooth_field(mesh):
    """100 sin(2 pi x) cos(3 pi y) sin(4 pi z), the reference's stiffness test
    field (numba-cpu/test_operators.py:274-279), scaled to the domain."""
    xyz = mesh.node_coords.reshape(-1, 3)
    L = np.array(mesh.hi) - np.array(mesh.lo)
    s = (xyz - np.array(mesh.lo)) / L
    return (100.0 * np.sin(2 * np.pi * s[:, 0]) * np.cos(3 * np.pi * s[:, 1])
            * np.sin(4 * np.pi * s[:, 2]))


def rel_l2(a, b):
    return np.linalg.norm(a - b) / np.linalg.norm(b)


@pytest.fixture(scope="module", params=[2, 3, 4])
def setup(request):
    P = request.param
    mesh = build_box_mesh((4, 3, 5), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=42)
    detJ, G = pre.cell_geometry_factors(mesh)
    return mesh, detJ, G


def test_windows_fold_roundtrip(setup):
    mesh, _, _ = setup
    P = mesh.degree
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mesh.grid_shape)
    u = gs.windows3d(jnp.asarray(x), P)
    # windows must equal the indexed gather
    ue = np.asarray(u).transpose(0, 2, 4, 1, 3, 5).reshape(
        mesh.num_cells, -1)
    assert np.array_equal(ue, x.ravel()[mesh.dofmap])
    # fold must equal the indexed scatter-add (adjointness)
    v = rng.standard_normal(u.shape)
    y = np.asarray(gs.fold3d(jnp.asarray(v), P))
    ve = v.transpose(0, 2, 4, 1, 3, 5).reshape(mesh.num_cells, -1)
    y_ref = np.zeros(mesh.ndofs)
    np.add.at(y_ref, mesh.dofmap.ravel(), ve.ravel())
    assert np.allclose(y.ravel(), y_ref, atol=1e-12)


def test_mass_operator(setup):
    mesh, detJ, G = setup
    P = mesh.degree
    rng = np.random.default_rng(1)
    coeff = rng.uniform(0.5, 2.0, mesh.num_cells)
    x = smooth_field(mesh)

    Me = oracle.element_mass_matrices(mesh)
    y_ref = oracle.apply_elementwise(Me, mesh.dofmap, coeff, x, mesh.ndofs)

    detJ_s = pre.to_structured_layout(detJ, mesh)
    y = ops.mass_apply(jnp.asarray(x.reshape(mesh.grid_shape)),
                       jnp.asarray(detJ_s),
                       jnp.asarray(coeff.reshape(mesh.nc)), P)
    assert rel_l2(np.asarray(y).ravel(), y_ref) < TOL

    y_idx = ops.mass_apply_indexed(jnp.asarray(x), jnp.asarray(detJ),
                                   jnp.asarray(coeff),
                                   jnp.asarray(mesh.dofmap), mesh.ndofs)
    assert rel_l2(np.asarray(y_idx), y_ref) < TOL


def test_stiffness_operator(setup):
    mesh, detJ, G = setup
    P = mesh.degree
    elem = HexElement(P)
    rng = np.random.default_rng(2)
    coeff = rng.uniform(0.5, 2.0, mesh.num_cells)
    x = smooth_field(mesh)

    Ke = oracle.element_stiffness_matrices(mesh)
    y_ref = oracle.apply_elementwise(Ke, mesh.dofmap, coeff, x, mesh.ndofs)

    G_s = pre.to_structured_layout(G, mesh)
    D = jnp.asarray(elem.deriv_1d)
    y = ops.stiffness_apply(jnp.asarray(x.reshape(mesh.grid_shape)),
                            jnp.asarray(G_s),
                            jnp.asarray(coeff.reshape(mesh.nc)), D, P)
    assert rel_l2(np.asarray(y).ravel(), y_ref) < TOL

    y_idx = ops.stiffness_apply_indexed(
        jnp.asarray(x), jnp.asarray(np.moveaxis(G, 2, 0)),
        jnp.asarray(coeff), jnp.asarray(mesh.dofmap), D, mesh.ndofs)
    assert rel_l2(np.asarray(y_idx), y_ref) < TOL


def test_stiffness_annihilates_constants(setup):
    mesh, detJ, G = setup
    P = mesh.degree
    elem = HexElement(P)
    G_s = pre.to_structured_layout(G, mesh)
    ones = jnp.ones(mesh.grid_shape)
    coeff = jnp.ones(mesh.nc)
    y = ops.stiffness_apply(ones, jnp.asarray(G_s), coeff,
                            jnp.asarray(elem.deriv_1d), P)
    assert float(jnp.max(jnp.abs(y))) < 1e-10


def test_mass_of_one_is_volume(setup):
    mesh, detJ, _ = setup
    P = mesh.degree
    detJ_s = pre.to_structured_layout(detJ, mesh)
    y = ops.mass_apply(jnp.ones(mesh.grid_shape), jnp.asarray(detJ_s),
                       jnp.ones(mesh.nc), P)
    vol = np.prod(np.array(mesh.hi) - np.array(mesh.lo))
    assert np.isclose(float(jnp.sum(y)), vol, rtol=1e-12)


def test_facet_mass_operator(setup):
    mesh, _, _ = setup
    rng = np.random.default_rng(3)
    # random field: the smooth test field vanishes on the x/z boundary planes
    x = rng.standard_normal(mesh.ndofs)
    for plane in ["x-", "x+", "y-", "y+", "z-", "z+"]:
        bd = mesh.boundary_facets(plane)
        fdm = mesh.facet_dofmap(bd)
        detJ_f = pre.facet_geometry_factors(mesh, bd)
        coeff = rng.uniform(0.5, 2.0, bd.shape[0])
        Fe = oracle.element_facet_mass_matrices(mesh, bd)
        y_ref = oracle.apply_elementwise(Fe, fdm, coeff, x, mesh.ndofs)
        y = ops.mass_apply_indexed(jnp.asarray(x), jnp.asarray(detJ_f),
                                   jnp.asarray(coeff), jnp.asarray(fdm),
                                   mesh.ndofs)
        assert rel_l2(np.asarray(y), y_ref) < TOL, plane


def test_facet_area():
    mesh = build_box_mesh((3, 4, 2), 3, hi=(2.0, 1.0, 0.5))
    bd = mesh.boundary_facets("x-")
    detJ_f = pre.facet_geometry_factors(mesh, bd)
    assert np.isclose(detJ_f.sum(), 1.0 * 0.5, rtol=1e-13)  # y*z extent
    bd_all = mesh.all_boundary_facets()
    detJ_all = pre.facet_geometry_factors(mesh, bd_all)
    area = 2 * (2 * 1 + 2 * 0.5 + 1 * 0.5)
    assert np.isclose(detJ_all.sum(), area, rtol=1e-13)


def test_mapped_mesh_operators():
    """Body-fitted curved geometry (deformed box): operators still match
    the dense oracle, and volumes follow the mapping."""
    from fustpu.mesh.box import build_mapped_mesh
    from fustpu.ops import spectral_mm as mm_ops
    from fustpu.elements.hex import HexElement

    # smoothly bulge the box: x' = x(1 + 0.3 y (1-y)), curved cells
    def mapping(p):
        q = p.copy()
        q[:, 0] = p[:, 0] * (1.0 + 0.3 * p[:, 1] * (1 - p[:, 1]))
        q[:, 2] = p[:, 2] + 0.1 * np.sin(np.pi * p[:, 0])
        return q

    mesh = build_mapped_mesh((3, 3, 3), 3, mapping)
    detJ, G = pre.cell_geometry_factors(mesh)
    rng = np.random.default_rng(4)
    coeff = rng.uniform(0.5, 2.0, mesh.num_cells)
    x = rng.standard_normal(mesh.ndofs)

    Ke = oracle.element_stiffness_matrices(mesh)
    y_ref = oracle.apply_elementwise(Ke, mesh.dofmap, coeff, x, mesh.ndofs)
    elem = HexElement(3)
    op = mm_ops.build_stiffness(mesh.nc, 3, elem.deriv_1d, G, jnp.float64,
                                coeff=coeff.reshape(mesh.nc))
    y = mm_ops.stiffness_apply_mm(op, jnp.asarray(
        x.reshape(mesh.grid_shape)))
    assert rel_l2(np.asarray(y).ravel(), y_ref) < TOL

    # mass of 1 = volume of the mapped domain (rough check: exceeds the
    # unit box because of the bulge)
    diag = mm_ops.mass_diagonal(mesh.nc, 3, detJ)
    vol = diag.sum()
    assert 1.0 < vol < 1.1, vol
