"""Point evaluation of spectral-element fields at arbitrary physical points.

The analogue of the reference's bounding-box-tree `compute_eval_params` +
`Function.eval` pipeline (/root/reference/cuda/utils.py:117-154,
cuda/demo_nonlinear_bowl.py:134-159): on a structured box the owning cell is
a floor-divide; on perturbed (trilinear) geometry the reference coordinates
are recovered with a few Newton iterations of the trilinear map; evaluation
is tensor-product Lagrange interpolation.  Host-side numpy (output path).
"""

from __future__ import annotations

import numpy as np

from fustpu.elements import gll
from fustpu.elements.hex import hex8_tabulate
from fustpu.mesh.box import BoxMesh


def locate_cells(mesh: BoxMesh, points: np.ndarray) -> np.ndarray:
    """(npts, 3) physical points -> (npts,) flat cell indices (clipped into
    the domain).  Assumes the *unperturbed* lattice for the initial guess;
    Newton in `evaluate` corrects for perturbed geometry."""
    pts = np.asarray(points, dtype=np.float64)
    lo, hi = np.array(mesh.lo), np.array(mesh.hi)
    nc = np.array(mesh.nc)
    h = (hi - lo) / nc
    idx = np.floor((pts - lo) / h).astype(np.int64)
    idx = np.clip(idx, 0, nc - 1)
    return idx[:, 0] * nc[1] * nc[2] + idx[:, 1] * nc[2] + idx[:, 2]


def _invert_trilinear(corners: np.ndarray, pts: np.ndarray,
                      iters: int = 8) -> np.ndarray:
    """Newton-invert the trilinear map per point.  corners: (npts, 8, 3);
    pts: (npts, 3) -> reference coords (npts, 3)."""
    xi = np.full_like(pts, 0.5)
    for _ in range(iters):
        vals, grads = hex8_tabulate(xi)
        xcur = np.einsum("pv,pvd->pd", vals, corners)
        J = np.einsum("pvd,pvr->pdr", corners, grads)
        r = pts - xcur
        dxi = np.linalg.solve(J, r[..., None])[..., 0]
        xi = xi + dxi
        if np.max(np.abs(dxi)) < 1e-14:
            break
    return xi


def locate(mesh: BoxMesh, points: np.ndarray, tol: float = 1e-10
           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Resolve owning cells and reference coordinates for physical points.

    Newton + cell walk: the lattice guess can be off by several cells on
    mapped/perturbed geometry (e.g. a conformally-mapped bowl cap sags
    multiple cell heights), so the walk runs until the reference
    coordinates converge into [0,1], bounded by the grid diameter — the
    role of the reference's bounding-box-tree candidate search
    (cuda/utils.py:117-154).  Returns (cells, xi, ok); `ok` is False for
    points whose reference coordinates never converged (outside the
    mapped domain, or a fold in the geometry) — callers must NOT silently
    evaluate those."""
    pts = np.asarray(points, dtype=np.float64)
    nc_arr = np.array(mesh.nc)
    cells = locate_cells(mesh, pts)
    max_hops = int(nc_arr.sum()) + 2           # grid diameter bound
    xi = np.full((pts.shape[0], 3), 0.5)
    for _ in range(max_hops):
        corners = mesh.cell_corners_flat[cells]
        xi = _invert_trilinear(corners, pts)
        out_lo = xi < -tol
        out_hi = xi > 1 + tol
        if not (out_lo.any() or out_hi.any()):
            break
        cz = cells % nc_arr[2]
        cy = (cells // nc_arr[2]) % nc_arr[1]
        cx = cells // (nc_arr[1] * nc_arr[2])
        cidx = np.stack([cx, cy, cz], axis=1)
        moved = np.clip(cidx - out_lo + out_hi, 0, nc_arr - 1)
        if np.array_equal(moved, cidx):        # stuck at the boundary
            break
        cidx = moved
        cells = cidx[:, 0] * nc_arr[1] * nc_arr[2] + cidx[:, 1] * nc_arr[2] \
            + cidx[:, 2]
    ok = np.all((xi >= -tol) & (xi <= 1 + tol), axis=1)
    return cells, np.clip(xi, 0.0, 1.0), ok


def evaluate(mesh: BoxMesh, field: np.ndarray, points: np.ndarray
             ) -> np.ndarray:
    """Evaluate a node-grid field (gx, gy, gz) at physical points (npts, 3).
    Points that cannot be resolved to a cell (outside the mapped domain)
    evaluate to NaN instead of a silently-wrong nearby value."""
    pts = np.asarray(points, dtype=np.float64)
    field = np.asarray(field).reshape(mesh.grid_shape)
    cells, xi, ok = locate(mesh, pts)

    n = mesh.element.n
    P = mesh.degree
    nodes = mesh.element.nodes_1d
    lx, _ = gll.lagrange_tabulate(nodes, xi[:, 0])
    ly, _ = gll.lagrange_tabulate(nodes, xi[:, 1])
    lz, _ = gll.lagrange_tabulate(nodes, xi[:, 2])

    nc = np.array(mesh.nc)
    cz = cells % nc[2]
    cy = (cells // nc[2]) % nc[1]
    cx = cells // (nc[1] * nc[2])
    # gather the (n, n, n) nodal values of each owning cell
    I = cx[:, None] * P + np.arange(n)[None, :]
    J = cy[:, None] * P + np.arange(n)[None, :]
    K = cz[:, None] * P + np.arange(n)[None, :]
    vals = field[I[:, :, None, None], J[:, None, :, None], K[:, None, None, :]]
    out = np.einsum("pijk,pi,pj,pk->p", vals, lx, ly, lz, optimize=True)
    out[~ok] = np.nan
    return out


class PointSampler:
    """Repeated evaluation at a FIXED point set: cell location, Newton
    inversion and Lagrange weights are computed ONCE (the role of the
    reference's compute_eval_params, cuda/utils.py:117-154); each `sample`
    is just a gather + weighted sum."""

    def __init__(self, mesh: BoxMesh, points: np.ndarray):
        self.mesh = mesh
        self.points = np.asarray(points, dtype=np.float64)
        pts = self.points
        nc_arr = np.array(mesh.nc)
        cells, xi, ok = locate(mesh, pts)
        if not ok.all():
            bad = np.flatnonzero(~ok)
            raise ValueError(
                f"{bad.size} probe point(s) could not be resolved to a "
                f"cell (outside the mapped domain?): indices {bad[:8]}, "
                f"first point {pts[bad[0]]}")
        n = mesh.element.n
        P = mesh.degree
        nodes = mesh.element.nodes_1d
        lx, _ = gll.lagrange_tabulate(nodes, xi[:, 0])
        ly, _ = gll.lagrange_tabulate(nodes, xi[:, 1])
        lz, _ = gll.lagrange_tabulate(nodes, xi[:, 2])
        # per-point (n, n, n) tensor weights
        self._w = np.einsum("pi,pj,pk->pijk", lx, ly, lz, optimize=True)
        cz = cells % nc_arr[2]
        cy = (cells // nc_arr[2]) % nc_arr[1]
        cx = cells // (nc_arr[1] * nc_arr[2])
        self._I = cx[:, None] * P + np.arange(n)[None, :]
        self._J = cy[:, None] * P + np.arange(n)[None, :]
        self._K = cz[:, None] * P + np.arange(n)[None, :]

    def sample(self, field: np.ndarray) -> np.ndarray:
        field = np.asarray(field).reshape(self.mesh.grid_shape)
        vals = field[self._I[:, :, None, None], self._J[:, None, :, None],
                     self._K[:, None, None, :]]
        return np.einsum("pijk,pijk->p", vals, self._w, optimize=True)

    def jax_probe(self):
        """Traced sampler fn(field) -> (npts,) for use inside jitted scans
        (per-step hydrophone traces via model.solve(probe=...))."""
        import jax.numpy as jnp

        I = jnp.asarray(self._I)
        J = jnp.asarray(self._J)
        K = jnp.asarray(self._K)
        w = jnp.asarray(self._w)

        def probe(field):
            f = field.reshape(self.mesh.grid_shape)
            vals = f[I[:, :, None, None], J[:, None, :, None],
                     K[:, None, None, :]]
            return jnp.einsum("pijk,pijk->p", vals, w.astype(f.dtype))

        return probe


def plane_points(mesh: BoxMesh, axis: int, coord: float, n0: int, n1: int
                 ) -> np.ndarray:
    lo, hi = np.array(mesh.lo), np.array(mesh.hi)
    free = [a for a in range(3) if a != axis]
    s0 = np.linspace(lo[free[0]], hi[free[0]], n0)
    s1 = np.linspace(lo[free[1]], hi[free[1]], n1)
    A, B = np.meshgrid(s0, s1, indexing="ij")
    pts = np.zeros((n0 * n1, 3))
    pts[:, axis] = coord
    pts[:, free[0]] = A.ravel()
    pts[:, free[1]] = B.ravel()
    return pts


def eval_plane(mesh: BoxMesh, field: np.ndarray, axis: int, coord: float,
               n0: int, n1: int):
    """Sample the field on a plane (the reference's periodic pressure-plane
    snapshots, cuda/demo_nonlinear_bowl.py:144-159,662-681).  Returns
    (points (n0*n1, 3), values (n0*n1,)).  For repeated sampling build a
    PointSampler once instead."""
    pts = plane_points(mesh, axis, coord, n0, n1)
    return pts, evaluate(mesh, field, pts)
