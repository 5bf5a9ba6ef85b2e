"""Kronecker-product application [A0 (x) A1 (x) A2] and GLL degree
transfer of box fields.

The reference carries a scratch-buffer Kronecker apply for
interpolation-style operators (`Buffer` + `apply_contractions`,
/root/reference/cpp/common/sum_factorisation.hpp:51-123 — a utility its
own solvers never call).  Here the same capability is live API: the
sum-factorised per-cell apply (`kron_apply`) powers
`interpolate_box_field`, which re-expresses a solution field on the
same box mesh at a DIFFERENT spectral degree — e.g. checkpoint a run at
P=4 and resume it at P=6 (`utils.io` checkpoints store (u, v, t); the
transfer is exact for polynomials up to the source degree, per axis).
A resumed run must use the TARGET discretisation's own CFL dt
(`model.cfl_dt`): dt scales as 1/P^2, and reusing the source dt was
measured to go NaN in f32 on hardware at P=4 -> 6.

Host-side (numpy, f64): degree transfer is a setup/IO-level operation,
not a hot path.
"""

from __future__ import annotations

import numpy as np


def kron_apply(A0: np.ndarray, A1: np.ndarray, A2: np.ndarray,
               x: np.ndarray) -> np.ndarray:
    """y = [A0 (x) A1 (x) A2] x over the trailing three axes of x
    (leading axes are batch), sum-factorised: three small contractions
    instead of one (m0*m1*m2, n0*n1*n2) matrix."""
    y = np.einsum("ai,...ijk->...ajk", A0, x, optimize=True)
    y = np.einsum("bj,...ajk->...abk", A1, y, optimize=True)
    return np.einsum("ck,...abk->...abc", A2, y, optimize=True)


def degree_transfer_matrix(p_from: int, p_to: int) -> np.ndarray:
    """(p_to+1, p_from+1) Lagrange evaluation matrix from the degree-
    p_from GLL nodes to the degree-p_to GLL nodes on [0, 1]."""
    from fustpu.elements import gll

    src = gll.gll_nodes_unit(p_from + 1)
    dst = gll.gll_nodes_unit(p_to + 1)
    vals, _ = gll.lagrange_tabulate(src, dst)
    return vals                                     # (p_to+1, p_from+1)


def interpolate_box_field(field: np.ndarray, mesh_from,
                          mesh_to) -> np.ndarray:
    """Re-express a DOF field on `mesh_from` (any BoxMesh: perturbed or
    mapped geometry included — the transfer happens in per-cell
    reference coordinates) as the field on `mesh_to`, the same cell
    grid at a different degree.  Exact for per-axis polynomials up to
    min(P_from, P_to); shared-face values agree from both sides
    (conforming traces), so overlapping writes are consistent."""
    if tuple(mesh_from.nc) != tuple(mesh_to.nc):
        raise ValueError(f"cell grids differ: {mesh_from.nc} "
                         f"vs {mesh_to.nc}")
    # same GEOMETRY too: transferring between meshes whose cells sit at
    # different physical points would silently corrupt a restart
    a = np.asarray(mesh_from.cell_corners_flat)
    b = np.asarray(mesh_to.cell_corners_flat)
    if a.shape != b.shape or not np.allclose(a, b, atol=1e-12):
        raise ValueError("meshes differ in geometry (cell corners), "
                         "not just degree — degree transfer needs the "
                         "same cell grid")
    p1, p2 = mesh_from.degree, mesh_to.degree
    f = np.asarray(field, np.float64).reshape(mesh_from.grid_shape)
    if p1 == p2:
        return f.copy()
    L = degree_transfer_matrix(p1, p2)
    nc = mesh_from.nc
    w1 = [np.arange(c)[:, None] * p1 + np.arange(p1 + 1) for c in nc]
    # per-cell (n1, n1, n1) blocks of the global node grid
    b = f[w1[0]][:, :, w1[1]][..., w1[2]]
    b = np.ascontiguousarray(b.transpose(0, 2, 4, 1, 3, 5))
    nb = kron_apply(L, L, L, b)                    # (ncx,ncy,ncz,n2,n2,n2)
    out = np.empty(mesh_to.grid_shape)
    w2 = [np.arange(c)[:, None] * p2 + np.arange(p2 + 1) for c in nc]
    I = w2[0][:, None, None, :, None, None]
    J = w2[1][None, :, None, None, :, None]
    K = w2[2][None, None, :, None, None, :]
    out[I, J, K] = nb
    return out
