"""Setup-time geometry precomputation (host, numpy float64).

Computes the quadrature-scaled Jacobian determinants and geometric factors
the matrix-free operators consume, mirroring the quantities of
/root/reference/numba-cpu/precompute.py (compute_scaled_jacobian_determinant
:76-112, compute_scaled_geometrical_factor :115-163,
compute_boundary_facets_scaled_jacobian_determinant :17-73) but fully
vectorised over cells with batched numpy linalg instead of Numba loops.

detJ[c, q]  = w_q * |det J(c, q)|
G[c, q, :]  = w_q * |det J| * upper-tri( J^{-T} J^{-1} )   (xx,xy,xz,yy,yz,zz)
detJ_f[f,q] = w_q * |t_s x t_t|   on boundary facets

Quadrature points are the collocated GLL lattice, so q is also the local dof
index (the property that makes the mass matrix diagonal).
"""

from __future__ import annotations

import numpy as np

from fustpu.elements.hex import FACETS, hex8_tabulate
from fustpu.mesh.box import BoxMesh

_CHUNK = 16384  # cells per chunk to bound peak memory of (c, q, 3, 3) temps


def _jacobians(corners: np.ndarray, grads: np.ndarray) -> np.ndarray:
    """J[c, q, phys, ref] for trilinear cells.

    corners: (cells, 8, 3); grads: (nq, 8, 3) reference gradients.
    """
    return np.einsum("cvp,qvr->cqpr", corners, grads, optimize=True)


def cell_geometry_factors(mesh: BoxMesh, use_native: bool = True):
    """Returns (detJ, G) with detJ (cells, nq) and G (cells, nq, 6).
    Uses the native C++ runtime when built (fustpu.native_bindings)."""
    elem = mesh.element
    if use_native:
        from fustpu import native_bindings as nb

        out = nb.cell_geometry(mesh.cell_corners_flat, elem.quad_points,
                               elem.quad_weights)
        if out is not None:
            return out
    _, grads = hex8_tabulate(elem.quad_points)       # (nq, 8, 3)
    wts = elem.quad_weights                          # (nq,)
    corners = mesh.cell_corners_flat                 # (cells, 8, 3)
    nc, nq = corners.shape[0], wts.size
    detJ = np.empty((nc, nq))
    G = np.empty((nc, nq, 6))
    for s in range(0, nc, _CHUNK):
        e = min(s + _CHUNK, nc)
        J = _jacobians(corners[s:e], grads)          # (c, q, 3, 3)
        det = np.linalg.det(J)
        detJ[s:e] = np.abs(det) * wts
        Jinv = np.linalg.inv(J)                      # J^{-1}[c,q,ref,phys]
        # K[r, s] = sum_p (dxi_r/dx_p)(dxi_s/dx_p): the metric that maps
        # reference gradients so that grad_x u . grad_x v = grad_xi u K grad_xi v.
        K = np.einsum("cqrp,cqsp->cqrs", Jinv, Jinv, optimize=True)
        G[s:e, :, 0] = K[..., 0, 0] * detJ[s:e]
        G[s:e, :, 1] = K[..., 0, 1] * detJ[s:e]
        G[s:e, :, 2] = K[..., 0, 2] * detJ[s:e]
        G[s:e, :, 3] = K[..., 1, 1] * detJ[s:e]
        G[s:e, :, 4] = K[..., 1, 2] * detJ[s:e]
        G[s:e, :, 5] = K[..., 2, 2] * detJ[s:e]
        del J, det, Jinv, K
    return detJ, G


def _det3(J: np.ndarray) -> np.ndarray:
    """Explicit batched 3x3 determinant — elementwise arithmetic instead
    of LAPACK-per-matrix (np.linalg.det is ~10x slower on (N, 3, 3)
    batches at production cell counts)."""
    return (J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2]
                            - J[..., 1, 2] * J[..., 2, 1])
            - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2]
                              - J[..., 1, 2] * J[..., 2, 0])
            + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1]
                              - J[..., 1, 1] * J[..., 2, 0]))


def cell_detJ(mesh) -> np.ndarray:
    """detJ only (cells, nq) — for mass-type setup where the 6-component
    metric G (6x the memory, plus a batched inverse) is not needed."""
    elem = mesh.element
    _, grads = hex8_tabulate(elem.quad_points)
    wts = elem.quad_weights
    corners = mesh.cell_corners_flat
    nc = corners.shape[0]
    detJ = np.empty((nc, wts.size))
    for s in range(0, nc, _CHUNK):
        e = min(s + _CHUNK, nc)
        J = _jacobians(corners[s:e], grads)
        detJ[s:e] = np.abs(_det3(J)) * wts
    return detJ


def facet_geometry_factors(mesh: BoxMesh, boundary_data: np.ndarray,
                           use_native: bool = True):
    """detJ_f (nf, n^2): surface measure * weights at facet GLL points for
    (cell, local_facet) pairs."""
    elem = mesh.element
    if use_native and boundary_data.shape[0] > 0:
        from fustpu import native_bindings as nb

        qpts_f = np.stack([elem.facet_quad_points(f) for f in range(6)])
        out = nb.facet_geometry(mesh.cell_corners_flat, qpts_f,
                                elem.facet_quad_weights, boundary_data)
        if out is not None:
            return out
    wts_f = elem.facet_quad_weights                  # (n^2,)
    corners = mesh.cell_corners_flat
    nf = boundary_data.shape[0]
    detJ_f = np.empty((nf, wts_f.size))
    # Tabulate geometry gradients at the facet quad points for each of the 6
    # reference facets once, then process facets grouped by local facet id.
    for lf in range(6):
        sel = np.nonzero(boundary_data[:, 1] == lf)[0]
        if sel.size == 0:
            continue
        pts = elem.facet_quad_points(lf)             # (n^2, 3)
        _, grads = hex8_tabulate(pts)                # (n^2, 8, 3)
        axis, _ = FACETS[lf]
        free = [ax for ax in range(3) if ax != axis]
        J = _jacobians(corners[boundary_data[sel, 0]], grads)
        t1 = J[..., free[0]]                         # (f, q, 3)
        t2 = J[..., free[1]]
        nrm = np.linalg.norm(np.cross(t1, t2), axis=-1)
        detJ_f[sel] = nrm * wts_f
    return detJ_f


def to_structured_layout(arr_cells: np.ndarray, mesh: BoxMesh) -> np.ndarray:
    """(cells, n^3, ...) -> expanded (ncx, n, ncy, n, ncz, n, ...) layout used
    by the structured operators."""
    n = mesh.element.n
    ncx, ncy, ncz = mesh.nc
    trailing = arr_cells.shape[2:]
    a = arr_cells.reshape(ncx, ncy, ncz, n, n, n, *trailing)
    return np.ascontiguousarray(a.transpose(0, 3, 1, 4, 2, 5,
                                            *range(6, 6 + len(trailing))))
