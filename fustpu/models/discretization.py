"""Shared spectral-element discretization: device-side geometry factors,
facet blocks, and host-side (float64) assembly of the lumped LHS.

Plays the role of the per-demo setup blocks in the reference
(cuda/demo_nonlinear_bowl.py:252-469): precompute detJ/G, build facet
dofmaps + facet detJ, assemble the steady diagonal LHS once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from fustpu.mesh.box import BoxMesh
from fustpu.ops import precompute as pre


class FacetBlock(NamedTuple):
    """A set of boundary facets with geometry factors, ready for the indexed
    facet-mass operator."""

    dofmap: jnp.ndarray        # (nf, n^2) int32 flat node indices (device)
    detJ: jnp.ndarray          # (nf, n^2) dtype (device)
    cells: np.ndarray          # (nf,) owning cell (host, for coefficients)
    dofmap_host: np.ndarray    # host copy for f64 setup assembly
    detJ_host: np.ndarray      # host copy (float64)

    @property
    def num_facets(self) -> int:
        return self.cells.shape[0]


class Discretization:
    """Geometry factors + facet machinery for one mesh, one dtype."""

    def __init__(self, mesh: BoxMesh, dtype=jnp.float32):
        self.mesh = mesh
        self.dtype = dtype
        self.P = mesh.degree
        elem = mesh.element
        detJ, G = pre.cell_geometry_factors(mesh)          # f64 host
        self._detJ_host = detJ                              # (cells, n^3)
        self.detJ_s = jnp.asarray(
            pre.to_structured_layout(detJ, mesh), dtype)
        self.G_s = jnp.asarray(pre.to_structured_layout(G, mesh), dtype)
        self.D = jnp.asarray(elem.deriv_1d, dtype)

    def facet_block(self, boundary_data: np.ndarray) -> FacetBlock:
        mesh = self.mesh
        fdm = mesh.facet_dofmap(boundary_data)
        detJ_f = pre.facet_geometry_factors(mesh, boundary_data)
        return FacetBlock(
            dofmap=jnp.asarray(fdm),
            detJ=jnp.asarray(detJ_f, self.dtype),
            cells=boundary_data[:, 0].copy(),
            dofmap_host=fdm,
            detJ_host=detJ_f,
        )

    # ---- host-side float64 setup assembly --------------------------------
    def assemble_mass_host(self, cell_coeff: np.ndarray) -> np.ndarray:
        """sum_c coeff_c P_c^T detJ_c (x=1) in float64 on the host — the
        steady diagonal LHS (reference assembles it once on device,
        cuda/demo_nonlinear_bowl.py:459-469; doing it on host keeps it f64
        even when the solve runs f32)."""
        mesh = self.mesh
        vals = self._detJ_host * np.asarray(cell_coeff).reshape(-1)[:, None]
        m = np.zeros(mesh.ndofs)
        np.add.at(m, mesh.dofmap.ravel(), vals.ravel())
        return m

    def assemble_facet_mass_host(self, block: FacetBlock,
                                 facet_coeff: np.ndarray) -> np.ndarray:
        """Facet-mass of the constant-1 field, float64 host.  Because the
        facet mass operator is linear and the reference's source fields are
        spatially constant scalars g(t) (filled vector, demo_nonlinear_bowl
        :597-598), the per-stage source assembly reduces to
        g(t) * (this precomputed vector) — an axpy instead of two kernel
        launches per stage."""
        vals = block.detJ_host * np.asarray(facet_coeff)[:, None]
        y = np.zeros(self.mesh.ndofs)
        np.add.at(y, block.dofmap_host.ravel(), vals.ravel())
        return y

    def to_grid(self, flat: np.ndarray) -> jnp.ndarray:
        return jnp.asarray(
            np.asarray(flat).reshape(self.mesh.grid_shape), self.dtype)
