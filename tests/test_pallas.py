"""Pallas fused stiffness kernel vs the (oracle-verified) matmul path,
interpret mode on CPU (the reference keeps its jnp path as the
interpret-mode test target per SURVEY.md §7.5)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fustpu.elements.hex import HexElement
from fustpu.mesh.box import build_box_mesh
from fustpu.ops import pallas_stiffness as ps
from fustpu.ops import precompute as pre
from fustpu.ops import spectral_mm as mm


@pytest.mark.parametrize("P", [2, 4])
def test_pallas_stiffness_matches_mm(P):
    mesh = build_box_mesh((4, 3, 5), P, hi=(1.0, 0.8, 1.3),
                          perturb=0.15, seed=7)
    elem = HexElement(P)
    detJ, G = pre.cell_geometry_factors(mesh)
    rng = np.random.default_rng(0)
    coeff = rng.uniform(0.5, 2.0, mesh.nc)
    x = jnp.asarray(rng.standard_normal(mesh.grid_shape), jnp.float64)

    op_mm = mm.build_stiffness(mesh.nc, P, elem.deriv_1d, G, jnp.float64,
                               coeff=coeff)
    y_ref = np.asarray(mm.stiffness_apply_mm(op_mm, x))
    op_p = ps.build(mesh.nc, P, elem.deriv_1d, G, jnp.float64, coeff=coeff)
    y = np.asarray(ps.stiffness_apply_pallas(op_p, x, interpret=True))
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err
