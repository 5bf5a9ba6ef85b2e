"""Structured hexahedral box meshes with tensor-product spectral DOF layout.

Replaces the reference's DOLFINx ``create_box`` + basix TP-reordered dofmap
setup (/root/reference/numba-cpu/demo_linear_box.py:68-129).  Because the
mesh is structured and the DOF layout is tensor-product by construction, the
global DOF vector is logically a 3D node grid of shape
(ncx*P+1, ncy*P+1, ncz*P+1); gather/scatter between it and per-cell
(n, n, n) batches is a closed-form separable windowing / overlap-add (see
fustpu.ops.gather_scatter) — no index arrays on the hot path.

Geometry is trilinear (hex8) per cell and may be arbitrarily perturbed, so
the curved/non-affine geometry paths are exercised exactly like the
reference's randomly perturbed test meshes
(/root/reference/numba-cpu/test_operators.py:69).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from fustpu.elements.hex import FACETS, HexElement


@dataclasses.dataclass(frozen=True)
class BoxMesh:
    """Structured box of ncx x ncy x ncz trilinear hex cells, degree-P GLL
    spectral DOFs."""

    degree: int
    nc: tuple[int, int, int]                 # cells per axis
    lo: tuple[float, float, float]
    hi: tuple[float, float, float]
    vertex_coords: np.ndarray                # (nvx, nvy, nvz, 3) float64

    # ----- sizes -------------------------------------------------------
    @property
    def element(self) -> HexElement:
        return HexElement(self.degree)

    @property
    def num_cells(self) -> int:
        ncx, ncy, ncz = self.nc
        return ncx * ncy * ncz

    @property
    def grid_shape(self) -> tuple[int, int, int]:
        """Global spectral node grid (gx, gy, gz)."""
        P = self.degree
        return tuple(c * P + 1 for c in self.nc)

    @property
    def ndofs(self) -> int:
        gx, gy, gz = self.grid_shape
        return gx * gy * gz

    # ----- geometry ----------------------------------------------------
    @functools.cached_property
    def cell_corners(self) -> np.ndarray:
        """(ncx, ncy, ncz, 8, 3) trilinear geometry dofs per cell, corner
        (a, b, c) -> 4a + 2b + c (fustpu.elements.hex convention)."""
        v = self.vertex_coords
        corners = np.empty(self.nc + (8, 3), dtype=np.float64)
        for a in (0, 1):
            for b in (0, 1):
                for c in (0, 1):
                    idx = 4 * a + 2 * b + c
                    corners[..., idx, :] = v[
                        a : v.shape[0] - 1 + a,
                        b : v.shape[1] - 1 + b,
                        c : v.shape[2] - 1 + c,
                        :,
                    ]
        return corners

    @functools.cached_property
    def cell_corners_flat(self) -> np.ndarray:
        """(num_cells, 8, 3), cell index cx*ncy*ncz + cy*ncz + cz."""
        return self.cell_corners.reshape(self.num_cells, 8, 3)

    def hmin(self) -> float:
        """Minimum cell diameter (max pairwise corner distance per cell),
        the analogue of min over cpp.mesh.h
        (reference numba-cpu/demo_linear_box.py:79-86)."""
        c = self.cell_corners_flat
        d = np.linalg.norm(c[:, :, None, :] - c[:, None, :, :], axis=-1)
        return float(d.max(axis=(1, 2)).min())

    def h_cfl(self) -> float:
        """CFL length scale: sqrt(3) x the smallest corner-pair distance
        over all cells.  On a cube this IS the diameter (so isotropic
        meshes keep the reference's dt convention exactly), but on
        anisotropic cells it binds on the THIN direction — the diameter
        overestimates the stable dt by the aspect ratio (measured NaN
        on high-aspect imported cylinders, BENCH_NOTES r5)."""
        c = self.cell_corners_flat
        d = np.linalg.norm(c[:, :, None, :] - c[:, None, :, :], axis=-1)
        d[:, np.arange(8), np.arange(8)] = np.inf
        return float(np.sqrt(3.0) * d.min())

    # ----- DOF indexing -------------------------------------------------
    @functools.cached_property
    def dofmap(self) -> np.ndarray:
        """(num_cells, n^3) int32 global dof indices (explicit form, used by
        the generic/indexed assembly path and by the test oracle; the
        structured fast path never materialises it on device)."""
        P = self.degree
        n = P + 1
        ncx, ncy, ncz = self.nc
        gx, gy, gz = self.grid_shape
        cx = np.arange(ncx)[:, None] * P + np.arange(n)[None, :]   # (ncx, n)
        cy = np.arange(ncy)[:, None] * P + np.arange(n)[None, :]
        cz = np.arange(ncz)[:, None] * P + np.arange(n)[None, :]
        dm = (
            cx[:, None, None, :, None, None] * (gy * gz)
            + cy[None, :, None, None, :, None] * gz
            + cz[None, None, :, None, None, :]
        )
        return dm.reshape(self.num_cells, n**3).astype(np.int32)

    @functools.cached_property
    def node_coords(self) -> np.ndarray:
        """(gx, gy, gz, 3) physical coordinates of every spectral node
        (trilinear map of the GLL lattice; facet restrictions of the
        trilinear map agree between neighbouring cells so shared nodes are
        well defined)."""
        elem = self.element
        n = elem.n
        P = self.degree
        pts = elem.nodes_1d                       # (n,)
        # shape functions of the 1D corners at GLL nodes: (n, 2)
        l1 = np.stack([1.0 - pts, pts], axis=1)
        corners = self.cell_corners               # (ncx,ncy,ncz,8,3)
        corners = corners.reshape(self.nc + (2, 2, 2, 3))
        # per-cell node coords: (ncx,ncy,ncz, n,n,n, 3)
        cellnodes = np.einsum(
            "xyzabcd,ia,jb,kc->xyzijkd", corners, l1, l1, l1, optimize=True
        )
        gx, gy, gz = self.grid_shape
        out = np.zeros((gx, gy, gz, 3))
        ncx, ncy, ncz = self.nc
        # set (not add): duplicated boundary nodes agree
        view = cellnodes.transpose(0, 3, 1, 4, 2, 5, 6)  # (ncx,n,ncy,n,ncz,n,3)
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    out[i::P, j::P, k::P][:ncx, :ncy, :ncz] = view[:, i, :, j, :, k]
        return out

    # ----- boundary facets ----------------------------------------------
    def boundary_facets(self, plane: str,
                        predicate=None) -> np.ndarray:
        """(nf, 2) int32 array of (cell, local_facet) pairs on one of the six
        box boundary planes 'x-','x+','y-','y+','z-','z+'.  `predicate`,
        if given, maps facet-centroid coordinates (nf, 3) -> bool mask to
        select a sub-patch (e.g. a piston / bowl-cap source aperture).

        The analogue of DOLFINx locate_entities_boundary +
        facet_integration_domain (reference numba-cpu/utils.py:7-40).
        """
        names = ["x-", "x+", "y-", "y+", "z-", "z+"]
        facet = names.index(plane)
        axis, side = FACETS[facet]
        ncx, ncy, ncz = self.nc
        sizes = [ncx, ncy, ncz]
        fixed = 0 if side == 0 else sizes[axis] - 1
        free = [ax for ax in range(3) if ax != axis]
        A, B = np.meshgrid(np.arange(sizes[free[0]]),
                           np.arange(sizes[free[1]]), indexing="ij")
        cidx = np.zeros((A.size, 3), dtype=np.int64)
        cidx[:, axis] = fixed
        cidx[:, free[0]] = A.ravel()
        cidx[:, free[1]] = B.ravel()
        cells = cidx[:, 0] * ncy * ncz + cidx[:, 1] * ncz + cidx[:, 2]
        pairs = np.stack([cells, np.full_like(cells, facet)], axis=1)
        if predicate is not None:
            centroids = self.cell_corners_flat[cells][
                :, [c for c in range(8)
                    if ((c >> (2 - axis)) & 1) == side], :].mean(axis=1)
            pairs = pairs[predicate(centroids)]
        return pairs.astype(np.int32)

    def all_boundary_facets(self) -> np.ndarray:
        """All exterior facets (the reference marks the whole boundary as
        absorbing in the bowl demo, cuda/demo_nonlinear_bowl.py:285-287)."""
        return np.concatenate(
            [self.boundary_facets(p) for p in
             ["x-", "x+", "y-", "y+", "z-", "z+"]], axis=0)

    def facet_dofmap(self, boundary_data: np.ndarray) -> np.ndarray:
        """(nf, n^2) int32 global dofs of each (cell, local_facet) pair
        (reference cuda/demo_nonlinear_bowl.py:341-358)."""
        elem = self.element
        dm = self.dofmap
        out = np.empty((boundary_data.shape[0], elem.nfacet_dofs),
                       dtype=np.int32)
        for idx, (cell, lf) in enumerate(boundary_data):
            out[idx] = dm[cell][elem.all_facet_dofs[lf]]
        return out


def build_box_mesh(
    nc: tuple[int, int, int],
    degree: int,
    lo: tuple[float, float, float] = (0.0, 0.0, 0.0),
    hi: tuple[float, float, float] = (1.0, 1.0, 1.0),
    perturb: float = 0.0,
    seed: int = 0,
) -> BoxMesh:
    """Build a structured box mesh; `perturb` randomly displaces interior
    vertices by up to `perturb * h` to exercise non-affine geometry (the
    reference's perturbed test meshes, numba-cpu/test_operators.py:64-70)."""
    ncx, ncy, ncz = nc
    xs = np.linspace(lo[0], hi[0], ncx + 1)
    ys = np.linspace(lo[1], hi[1], ncy + 1)
    zs = np.linspace(lo[2], hi[2], ncz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    coords = np.stack([X, Y, Z], axis=-1)
    if perturb > 0.0:
        rng = np.random.default_rng(seed)
        h = np.array([(hi[d] - lo[d]) / nc[d] for d in range(3)])
        disp = rng.uniform(-perturb, perturb, coords.shape) * h
        # keep the boundary planes fixed
        disp[0, :, :] = 0.0
        disp[-1, :, :] = 0.0
        disp[:, 0, :] = 0.0
        disp[:, -1, :] = 0.0
        disp[:, :, 0] = 0.0
        disp[:, :, -1] = 0.0
        coords = coords + disp
    return BoxMesh(degree=degree, nc=nc, lo=tuple(lo), hi=tuple(hi),
                   vertex_coords=coords)


def build_mapped_mesh(
    nc: tuple[int, int, int],
    degree: int,
    mapping,
    lo: tuple[float, float, float] = (0.0, 0.0, 0.0),
    hi: tuple[float, float, float] = (1.0, 1.0, 1.0),
) -> BoxMesh:
    """Box-topology mesh with vertices moved by `mapping(points (N,3)) ->
    (N,3)`: body-fitted curved or graded geometry (the role of the
    reference's Gmsh-built meshes, e.g. the bowl-conforming
    transducer_3d mesh of cuda/demo_nonlinear_bowl.py:98-105) without an
    unstructured mesh — per-cell trilinear geometry handles the curvature,
    exactly like the perturbed-mesh tests.

    Note: `lo`/`hi` describe the parameter box; the physical extent is the
    mapping's image (BoxMesh.lo/hi keep the parameter values for
    locate_cells' initial guess, which the Newton cell-walk corrects)."""
    base = build_box_mesh(nc, degree, lo=lo, hi=hi)
    pts = base.vertex_coords.reshape(-1, 3)
    mapped = np.asarray(mapping(pts), dtype=np.float64).reshape(
        base.vertex_coords.shape)
    return BoxMesh(degree=degree, nc=nc, lo=tuple(lo), hi=tuple(hi),
                   vertex_coords=mapped)
