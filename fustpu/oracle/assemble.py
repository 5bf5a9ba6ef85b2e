"""Dense reference assembler (test oracle).

The reference validates its matrix-free operators differentially against the
authoritative DOLFINx assembler with matching GLL quadrature metadata
(/root/reference/numba-cpu/test_operators.py:230-318).  DOLFINx does not
exist here, so the oracle assembles explicit per-element matrices from full
3D basis tabulations (no sum factorisation, no collocation shortcuts, no
structured-layout tricks) in float64 numpy and applies them with
np.add.at — an entirely independent code path from the JAX operators.
"""

from __future__ import annotations

import numpy as np

from fustpu.elements import gll
from fustpu.elements.hex import FACETS, hex8_tabulate, tabulate_3d_basis
from fustpu.mesh.box import BoxMesh
from fustpu.ops.precompute import _geom_dofs_grads


def element_mass_matrices(mesh: BoxMesh) -> np.ndarray:
    """(cells, n^3, n^3) element mass matrices at GLL quadrature."""
    elem = mesh.element
    pts, wts = elem.quad_points, elem.quad_weights
    vals, _ = tabulate_3d_basis(elem, pts)           # (nq, nd)
    gdofs, ggrads = _geom_dofs_grads(mesh, pts)
    J = np.einsum("cvp,qvr->cqpr", gdofs, ggrads, optimize=True)
    detJ = np.abs(np.linalg.det(J)) * wts            # (cells, nq)
    return np.einsum("qa,cq,qb->cab", vals, detJ, vals, optimize=True)


def element_stiffness_matrices(mesh: BoxMesh) -> np.ndarray:
    """(cells, n^3, n^3) element stiffness matrices at GLL quadrature."""
    elem = mesh.element
    pts, wts = elem.quad_points, elem.quad_weights
    _, grads = tabulate_3d_basis(elem, pts)          # (nq, nd, 3) ref grads
    gdofs, ggrads = _geom_dofs_grads(mesh, pts)
    J = np.einsum("cvp,qvr->cqpr", gdofs, ggrads, optimize=True)
    detJ = np.abs(np.linalg.det(J)) * wts
    Jinv = np.linalg.inv(J)                          # (c, q, ref, phys)
    # physical gradients of every basis function
    gp = np.einsum("qar,cqrp->cqap", grads, Jinv, optimize=True)
    return np.einsum("cqap,cq,cqbp->cab", gp, detJ, gp, optimize=True)


def element_facet_mass_matrices(mesh: BoxMesh,
                                boundary_data: np.ndarray) -> np.ndarray:
    """(nf, n^2, n^2) facet mass matrices (surface measure via the Gram
    determinant sqrt(det(T^T T)) — a different formula from the operators'
    |t1 x t2|)."""
    elem = mesh.element
    n = elem.n
    wts_f = elem.facet_quad_weights
    nodes = elem.nodes_1d
    # 2D facet basis values at facet quad points (generic tabulation)
    v1, _ = gll.lagrange_tabulate(nodes, nodes)      # (n, n) ~ identity
    vals2 = np.einsum("qa,rb->qrab", v1, v1).reshape(n * n, n * n)
    out = np.empty((boundary_data.shape[0], n * n, n * n))
    for idx, (cell, lf) in enumerate(boundary_data):
        pts = elem.facet_quad_points(lf)
        gdofs, ggrads = _geom_dofs_grads(mesh, pts)
        J = np.einsum("vp,qvr->qpr", gdofs[cell], ggrads)
        axis, _ = FACETS[lf]
        free = [ax for ax in range(3) if ax != axis]
        T = J[:, :, free]                            # (q, 3, 2) tangents
        gram = np.einsum("qpi,qpj->qij", T, T)
        measure = np.sqrt(np.linalg.det(gram)) * wts_f
        out[idx] = np.einsum("qa,q,qb->ab", vals2, measure, vals2,
                             optimize=True)
    return out


def apply_elementwise(mats: np.ndarray, dofmap: np.ndarray,
                      coeff: np.ndarray, x: np.ndarray,
                      ndofs: int) -> np.ndarray:
    """y = sum_e coeff_e * P_e^T (M_e (P_e x)) with deterministic np.add.at."""
    xe = x[dofmap]                                   # (e, nd)
    ye = coeff[:, None] * np.einsum("eab,eb->ea", mats, xe, optimize=True)
    y = np.zeros(ndofs, dtype=x.dtype)
    np.add.at(y, dofmap.ravel(), ye.ravel())
    return y
