"""The matmul-formulation fast path must agree with the (already
oracle-verified) structured operators to roundoff."""

import jax.numpy as jnp
import numpy as np
import pytest

from fustpu.elements.hex import HexElement
from fustpu.mesh.box import build_box_mesh
from fustpu.ops import operators as ops
from fustpu.ops import precompute as pre
from fustpu.ops import spectral_mm as mm


@pytest.fixture(scope="module", params=[2, 4])
def setup(request):
    P = request.param
    mesh = build_box_mesh((4, 3, 5), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=7)
    detJ, G = pre.cell_geometry_factors(mesh)
    return mesh, detJ, G


def test_expand_fold_match_windows(setup):
    mesh, detJ, G = setup
    P = mesh.degree
    elem = HexElement(P)
    op = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mesh.grid_shape)
    u = np.asarray(mm.expand(op, jnp.asarray(x)))
    # expanded layout equals the indexed gather
    n = P + 1
    ue = u.reshape(mesh.nc[0], n, mesh.nc[1], n, mesh.nc[2], n)
    ue = ue.transpose(0, 2, 4, 1, 3, 5).reshape(mesh.num_cells, -1)
    assert np.array_equal(ue, x.ravel()[mesh.dofmap])
    # fold is the adjoint
    y = np.asarray(mm.fold(op, jnp.asarray(u)))
    y_ref = np.zeros(mesh.ndofs)
    np.add.at(y_ref, mesh.dofmap.ravel(), ue.ravel())
    assert np.allclose(y.ravel(), y_ref, atol=1e-12)


def test_stiffness_mm_matches_structured(setup):
    mesh, detJ, G = setup
    P = mesh.degree
    elem = HexElement(P)
    rng = np.random.default_rng(1)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = rng.standard_normal(mesh.grid_shape)

    y_ref = ops.stiffness_apply(
        jnp.asarray(x), jnp.asarray(pre.to_structured_layout(G, mesh)),
        jnp.asarray(coeff), jnp.asarray(elem.deriv_1d), P)

    # coeff folded into G at build time
    op = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                            coeff=coeff)
    y1 = mm.stiffness_apply_mm(op, jnp.asarray(x))
    assert np.allclose(np.asarray(y1), np.asarray(y_ref), atol=1e-10)

    # coeff applied at run time
    op2 = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64)
    ce = jnp.asarray(mm.expand_cell_field(coeff, P + 1))
    y2 = mm.stiffness_apply_mm(op2, jnp.asarray(x), coeff_e=ce)
    assert np.allclose(np.asarray(y2), np.asarray(y_ref), atol=1e-10)


def test_mass_diagonal_matches_operator(setup):
    mesh, detJ, G = setup
    P = mesh.degree
    rng = np.random.default_rng(2)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = rng.standard_normal(mesh.grid_shape)
    y_ref = ops.mass_apply(
        jnp.asarray(x), jnp.asarray(pre.to_structured_layout(detJ, mesh)),
        jnp.asarray(coeff), P)
    diag = mm.mass_diagonal(mesh.nc, P, detJ, coeff)
    assert np.allclose(x * diag, np.asarray(y_ref), atol=1e-12)
