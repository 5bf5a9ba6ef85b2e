"""Unstructured conforming hexahedral meshes (explicit connectivity).

The reference's flagship runs import Gmsh-built, tagged, body-fitted hex
meshes through DOLFINx (XDMFFile.read_mesh/read_meshtags,
/root/reference/cuda/demo_nonlinear_bowl.py:98-105,
cuda/demo_linear_piston.py:83-90).  This module provides the same
capability natively: an explicit (vertices, cells, facet tags) mesh with a
degree-P GLL dofmap, consumed by the indexed operator path
(fustpu.ops.operators.{mass,stiffness}_apply_indexed).

DOF numbering: every cell tabulates its (n,n,n) GLL node coordinates via
the trilinear map; nodes are de-duplicated by quantised physical
coordinate.  Two neighbouring cells restrict their trilinear maps to the
same bilinear function on a shared face (same 4 corners), so shared nodes
coincide up to roundoff and quantisation at ~1e-9 of the bbox diagonal
merges them reliably (valid conforming meshes have node separations many
orders of magnitude larger).  This replaces DOLFINx's topological entity
numbering + basix TP dof-ordering permutation (cpp/common/permute.hpp:
15-42) and is orientation-free by construction: cells may list their
corners in any right-handed hex order.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from fustpu.elements.hex import FACETS, HexElement, hex8_tabulate

# reference facet -> the 4 corner ids (our 4a+2b+c convention) of that face
_FACET_CORNERS = []
for _axis, _side in FACETS:
    ids = []
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                abc = (a, b, c)
                if abc[_axis] == _side:
                    ids.append(4 * a + 2 * b + c)
    _FACET_CORNERS.append(tuple(ids))


@dataclasses.dataclass(frozen=True)
class UnstructuredHexMesh:
    """Conforming hex mesh: vertices (nv, 3), cells (ncells, 8) corner
    indices in the 4a+2b+c convention, and facet tags
    {tag: (nf, 2) (cell, local_facet) arrays}."""

    degree: int
    vertices: np.ndarray                     # (nv, 3) float64
    cells: np.ndarray                        # (ncells, 8) int
    facet_tag_map: dict                      # tag -> (nf, 2) int32

    # ----- sizes ---------------------------------------------------------
    @property
    def element(self) -> HexElement:
        return HexElement(self.degree)

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    @property
    def grid_shape(self) -> tuple[int]:
        """Flat DOF vector — the indexed path has no node grid."""
        return (self.ndofs,)

    @property
    def ndofs(self) -> int:
        return self._numbering[1]

    @functools.cached_property
    def lo(self) -> tuple:
        """Bounding-box corner (plane/snapshot helpers)."""
        return tuple(self.vertices.min(axis=0))

    @functools.cached_property
    def hi(self) -> tuple:
        return tuple(self.vertices.max(axis=0))

    # ----- geometry ------------------------------------------------------
    @functools.cached_property
    def cell_corners_flat(self) -> np.ndarray:
        """(ncells, 8, 3) trilinear geometry dofs (precompute interface)."""
        return self.vertices[self.cells]

    def hmin(self) -> float:
        c = self.cell_corners_flat
        d = np.linalg.norm(c[:, :, None, :] - c[:, None, :, :], axis=-1)
        return float(d.max(axis=(1, 2)).min())

    @functools.cached_property
    def _cell_nodes_phys(self) -> np.ndarray:
        """(ncells, n^3, 3) physical coordinates of every cell's GLL nodes
        (trilinear map of the reference lattice)."""
        elem = self.element
        # the collocated quadrature lattice IS the (n,n,n) GLL node set
        vals, _ = hex8_tabulate(elem.quad_points)        # (n^3, 8)
        return np.einsum("qv,cvd->cqd", vals, self.cell_corners_flat,
                         optimize=True)

    @functools.cached_property
    def _numbering(self) -> tuple[np.ndarray, int]:
        """(dofmap (ncells, n^3) int32, ndofs) by merging coincident
        per-cell node coordinates.

        A single rounded grid can SPLIT a shared node whose two roundoff-
        different coordinates straddle a bin boundary (silent C0 break).
        Robust merge instead: points are grouped on all 8 half-bin-offset
        grids and the groupings are unioned — for any pair within b/4 per
        axis there exists an offset combination that straddles no boundary
        on any axis, so the pair is guaranteed to merge; pairs farther
        than ~b*sqrt(3) apart (true distinct nodes are many orders beyond)
        can never merge."""
        pts = self._cell_nodes_phys.reshape(-1, 3)
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        diag = float(np.linalg.norm(hi - lo)) or 1.0
        b = diag * 1e-9
        scaled = (pts - lo) / b
        labels = np.arange(pts.shape[0], dtype=np.int64)
        for _ in range(10):           # label propagation to a fixpoint
            # (monotone decreasing labels: converges; clusters are
            # roundoff-sized so 2-3 sweeps suffice in practice)
            changed = False
            for off in range(8):
                shift = np.array([(off >> a) & 1 for a in range(3)]) * 0.5
                q = np.floor(scaled + shift).astype(np.int64)
                _, inv = np.unique(q, axis=0, return_inverse=True)
                gmin = np.full(inv.max() + 1, labels.max() + 1,
                               dtype=np.int64)
                np.minimum.at(gmin, inv, labels)
                new = gmin[inv]
                if not np.array_equal(new, labels):
                    labels = new
                    changed = True
            if not changed:
                break
        reps, inverse = np.unique(labels, return_inverse=True)
        # Global ids in coordinate-lexicographic order (x, y, z
        # ascending, z fastest): deterministic and gather-friendly
        # locality.  The SORT grid is much coarser (1e-6 diag) than the
        # merge grid so roundoff jitter cannot scramble the ordering.
        qs = np.floor(scaled[reps] * 1e-3).astype(np.int64)
        order = np.lexsort((scaled[reps][:, 2], qs[:, 1], qs[:, 0]))
        rank = np.empty_like(order)
        rank[order] = np.arange(order.size)
        dofmap = rank[inverse].reshape(self.num_cells, -1).astype(np.int32)
        return dofmap, int(reps.size)

    @functools.cached_property
    def dofmap(self) -> np.ndarray:
        return self._numbering[0]

    @functools.cached_property
    def node_coords(self) -> np.ndarray:
        """(ndofs, 3) physical coordinates of the global DOFs."""
        out = np.zeros((self.ndofs, 3))
        out[self.dofmap.reshape(-1)] = self._cell_nodes_phys.reshape(-1, 3)
        return out

    # ----- facets --------------------------------------------------------
    def boundary_facets(self, tag=None) -> np.ndarray:
        """(nf, 2) (cell, local_facet) pairs: tagged set if `tag` given,
        else every exterior facet (faces owned by exactly one cell)."""
        if tag is not None:
            return np.asarray(self.facet_tag_map[tag], np.int32)
        return self._exterior_facets

    @functools.cached_property
    def _exterior_facets(self) -> np.ndarray:
        faces = {}
        for ci in range(self.num_cells):
            cell = self.cells[ci]
            for lf, corners in enumerate(_FACET_CORNERS):
                key = tuple(sorted(int(cell[c]) for c in corners))
                faces.setdefault(key, []).append((ci, lf))
        ext = [own[0] for own in faces.values() if len(own) == 1]
        return np.asarray(sorted(ext), np.int32).reshape(-1, 2)

    def facet_dofmap(self, boundary_data: np.ndarray) -> np.ndarray:
        """(nf, n^2) global dofs of (cell, local_facet) pairs."""
        elem = self.element
        dm = self.dofmap
        out = np.empty((boundary_data.shape[0], elem.nfacet_dofs),
                       dtype=np.int32)
        for idx, (cell, lf) in enumerate(boundary_data):
            out[idx] = dm[cell][elem.all_facet_dofs[lf]]
        return out

    def facet_centroids(self, boundary_data: np.ndarray) -> np.ndarray:
        """(nf, 3) corner-mean centroid of each facet (for predicates)."""
        out = np.empty((boundary_data.shape[0], 3))
        for i, (cell, lf) in enumerate(boundary_data):
            ids = self.cells[cell][list(_FACET_CORNERS[lf])]
            out[i] = self.vertices[ids].mean(axis=0)
        return out

    # ----- point location / evaluation ------------------------------------
    def locate(self, points: np.ndarray, tol: float = 1e-10):
        """(cells, xi, ok) for physical points: bbox candidate filter +
        trilinear Newton per candidate (the reference's bounding-box-tree
        search, cuda/utils.py:117-154).  Host-side output path."""
        from fustpu.utils.eval import _invert_trilinear

        pts = np.asarray(points, np.float64)
        corners = self.cell_corners_flat
        clo = corners.min(axis=1)                    # (ncells, 3)
        chi = corners.max(axis=1)
        pad = 1e-12 + 1e-9 * np.linalg.norm(chi - clo, axis=1,
                                            keepdims=True)
        cells = np.zeros(pts.shape[0], np.int64)
        xi = np.full((pts.shape[0], 3), 0.5)
        ok = np.zeros(pts.shape[0], bool)
        for p in range(pts.shape[0]):
            cand = np.nonzero(
                np.all((pts[p] >= clo - pad) & (pts[p] <= chi + pad),
                       axis=1))[0]
            for ci in cand:
                x = _invert_trilinear(corners[ci][None], pts[p][None])[0]
                if np.all((x >= -tol) & (x <= 1 + tol)):
                    cells[p], xi[p], ok[p] = ci, np.clip(x, 0, 1), True
                    break
        return cells, xi, ok

    def evaluate(self, field: np.ndarray, points: np.ndarray) -> np.ndarray:
        """Evaluate a flat DOF field at physical points; NaN outside."""
        from fustpu.elements import gll

        field = np.asarray(field).reshape(-1)
        cells, xi, ok = self.locate(points)
        nodes = self.element.nodes_1d
        lx, _ = gll.lagrange_tabulate(nodes, xi[:, 0])
        ly, _ = gll.lagrange_tabulate(nodes, xi[:, 1])
        lz, _ = gll.lagrange_tabulate(nodes, xi[:, 2])
        vals = field[self.dofmap[cells]].reshape(
            cells.size, *(self.element.n,) * 3)
        out = np.einsum("pijk,pi,pj,pk->p", vals, lx, ly, lz,
                        optimize=True)
        out[~ok] = np.nan
        return out


class UPointSampler:
    """Repeated evaluation at a FIXED point set on an unstructured mesh:
    location + Lagrange weights computed once (compute_eval_params
    analogue); `jax_probe` returns a traced fn for in-scan hydrophone
    traces.  Refuses unresolvable points loudly."""

    def __init__(self, mesh: UnstructuredHexMesh, points: np.ndarray):
        from fustpu.elements import gll

        self.mesh = mesh
        self.points = np.asarray(points, np.float64)
        cells, xi, ok = mesh.locate(self.points)
        if not ok.all():
            bad = np.flatnonzero(~ok)
            raise ValueError(
                f"{bad.size} probe point(s) outside the mesh: "
                f"indices {bad[:8]}, first point {self.points[bad[0]]}")
        nodes = mesh.element.nodes_1d
        lx, _ = gll.lagrange_tabulate(nodes, xi[:, 0])
        ly, _ = gll.lagrange_tabulate(nodes, xi[:, 1])
        lz, _ = gll.lagrange_tabulate(nodes, xi[:, 2])
        n = mesh.element.n
        self._w = np.einsum("pi,pj,pk->pijk", lx, ly, lz,
                            optimize=True).reshape(cells.size, n**3)
        self._dofs = mesh.dofmap[cells]                 # (npts, n^3)

    def sample(self, field: np.ndarray) -> np.ndarray:
        f = np.asarray(field).reshape(-1)
        return np.einsum("pq,pq->p", f[self._dofs], self._w, optimize=True)

    def jax_probe(self):
        import jax.numpy as jnp

        dofs = jnp.asarray(self._dofs)
        w = jnp.asarray(self._w)

        def probe(field):
            f = field.reshape(-1)
            return jnp.einsum("pq,pq->p", f[dofs], w.astype(f.dtype))

        return probe


def from_box(mesh, shuffle_seed: int | None = None) -> UnstructuredHexMesh:
    """Re-express a BoxMesh as an unstructured mesh (cross-validation:
    the indexed path on this mesh must reproduce the structured path
    bit-for-bit up to summation order).  `shuffle_seed` permutes cell
    order and rotates corner orderings to exercise orientation
    independence."""
    nvx, nvy, nvz, _ = mesh.vertex_coords.shape
    verts = mesh.vertex_coords.reshape(-1, 3)
    ncx, ncy, ncz = mesh.nc
    vid = np.arange(nvx * nvy * nvz).reshape(nvx, nvy, nvz)
    cells = np.empty((mesh.num_cells, 8), np.int64)
    k = 0
    for i in range(ncx):
        for j in range(ncy):
            for l in range(ncz):
                for a in (0, 1):
                    for b in (0, 1):
                        for c in (0, 1):
                            cells[k, 4 * a + 2 * b + c] = vid[i + a, j + b,
                                                              l + c]
                k += 1
    if shuffle_seed is not None:
        rng = np.random.default_rng(shuffle_seed)
        cells = cells[rng.permutation(mesh.num_cells)]
        # rotate each cell 90 deg about z a random number of times
        # (a,b,c) -> (b, 1-a, c): corner id permutation
        rot = np.array([2, 3, 6, 7, 0, 1, 4, 5])  # one 90deg rotation
        for ci in range(cells.shape[0]):
            for _ in range(rng.integers(0, 4)):
                cells[ci] = cells[ci][rot]
    return UnstructuredHexMesh(degree=mesh.degree, vertices=verts,
                               cells=cells, facet_tag_map={})
