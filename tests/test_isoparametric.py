"""Isoparametric (triquadratic hex27) geometry: curved-cell Jacobians in
precompute + oracle, .msh 2nd-order import.  The reference's precompute
is coordinate-map-general through basix cmaps
(/root/reference/cpp/common/precompute.hpp:33-94); these tests pin the
degree-2 instance to the same oracle gates as the trilinear path."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from fustpu.elements.hex import hex8_tabulate, hex27_tabulate
from fustpu.mesh import msh_io
from fustpu.mesh.box import build_box_mesh
from fustpu.mesh.unstructured import UnstructuredHexMesh, from_box
from fustpu.models.discretization import Discretization
from fustpu.ops import operators as ops
from fustpu.ops import precompute as pre
from fustpu.oracle import assemble as oracle

_LAT = np.array([[i / 2, j / 2, k / 2] for i in range(3)
                 for j in range(3) for k in range(3)])


def _geom_from_map(mesh: UnstructuredHexMesh, phi):
    """geom_nodes = phi(trilinear 27-lattice) — conforming by shared
    lattice points; phi also applied to the vertices so the corner
    shadow stays consistent."""
    vals, _ = hex8_tabulate(_LAT)                      # (27, 8)
    lat = np.einsum("qv,cvd->cqd", vals, mesh.cell_corners_flat)
    return dataclasses.replace(
        mesh, vertices=phi(mesh.vertices), geom_nodes=phi(lat))


def _phi(x):
    x = np.asarray(x, np.float64)
    out = x.copy()
    out[..., 0] = x[..., 0] + 0.06 * np.sin(2.1 * x[..., 1]) \
        * np.cos(1.3 * x[..., 2])
    out[..., 1] = x[..., 1] + 0.05 * np.sin(1.7 * x[..., 0] + 0.3)
    out[..., 2] = x[..., 2] + 0.04 * np.cos(1.1 * x[..., 0]
                                            + 0.9 * x[..., 1])
    return out


def test_hex27_trilinear_consistency():
    """hex27 geometry nodes ON the trilinear map must reproduce the
    hex8 detJ/G exactly (quadratic Lagrange reproduces trilinear maps)
    — catches node-ordering errors non-circularly."""
    bm = build_box_mesh((2, 3, 2), 3, perturb=0.15, seed=5)
    um = from_box(bm)
    vals, _ = hex8_tabulate(_LAT)
    lat = np.einsum("qv,cvd->cqd", vals, um.cell_corners_flat)
    curved = dataclasses.replace(um, geom_nodes=lat)
    dJ1, G1 = pre.cell_geometry_factors(um)
    dJ2, G2 = pre.cell_geometry_factors(curved)
    assert np.allclose(dJ1, dJ2, rtol=1e-13)
    assert np.allclose(G1, G2, rtol=1e-12, atol=1e-14)


def test_curved_operators_match_oracle():
    """Indexed mass/stiffness on a genuinely curved (triquadratic) mesh
    vs the dense oracle at the reference's f64 gate."""
    bm = build_box_mesh((2, 2, 3), 3, hi=(1.0, 0.9, 1.2))
    curved = _geom_from_map(from_box(bm), _phi)
    assert curved.geom_degree == 2
    d = Discretization(curved, jnp.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(curved.ndofs)
    coeff = rng.uniform(0.5, 2.0, curved.num_cells)
    # stiffness
    G, dm, D = d.indexed_op
    y = np.asarray(ops.stiffness_apply_indexed(
        jnp.asarray(x), G, jnp.asarray(coeff), dm, D, curved.ndofs))
    mats = oracle.element_stiffness_matrices(curved)
    y_ref = oracle.apply_elementwise(mats, curved.dofmap, coeff, x,
                                     curved.ndofs)
    err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
    assert err < 1e-12, err
    # mass (diagonal under GLL collocation — still true on curved cells)
    md = d.mass_diag_host(coeff)
    mm_ = oracle.element_mass_matrices(curved)
    m_ref = oracle.apply_elementwise(mm_, curved.dofmap, coeff,
                                     np.ones(curved.ndofs), curved.ndofs)
    err = np.linalg.norm(md - m_ref) / np.linalg.norm(m_ref)
    assert err < 1e-12, err
    # facet mass on the exterior
    bd = curved.boundary_facets()
    blk = d.facet_block(bd)
    fd = d.facet_diag_host(blk, np.ones(bd.shape[0]))
    fm = oracle.element_facet_mass_matrices(curved, bd)
    f_ref = oracle.apply_elementwise(fm, curved.facet_dofmap(bd),
                                     np.ones(bd.shape[0]),
                                     np.ones(curved.ndofs), curved.ndofs)
    err = np.linalg.norm(fd.reshape(-1) - f_ref) / np.linalg.norm(f_ref)
    assert err < 1e-12, err


def test_curved_volume_fidelity():
    """Quadratic geometry captures a cylindrical annulus sector's volume
    to quadrature accuracy where the trilinear approximation carries an
    O(h^2) chord error — the geometry-fidelity motivation (bowl caps)."""
    # one ring of cells spanning a quarter annulus, r in [1, 2], z [0,1]
    nseg = 4
    th = np.linspace(0.0, np.pi / 2, nseg + 1)

    def ring_mesh(curved):
        verts, cells = [], []
        for t in th:
            for r in (1.0, 2.0):
                for z in (0.0, 1.0):
                    verts.append([r * np.cos(t), r * np.sin(t), z])
        verts = np.asarray(verts)
        for s in range(nseg):
            b0, b1 = 4 * s, 4 * (s + 1)
            # corner id 4a+2b+c with a=theta, b=r, c=z
            cells.append([b0 + 0, b0 + 1, b0 + 2, b0 + 3,
                          b1 + 0, b1 + 1, b1 + 2, b1 + 3])
        cells = np.asarray(cells)[:, [0, 4, 2, 6, 1, 5, 3, 7]]
        # reorder into 4a+2b+c (a slowest)... build directly instead:
        cells = []
        for s in range(nseg):
            b0, b1 = 4 * s, 4 * (s + 1)
            cells.append([b0 + 0, b0 + 1, b0 + 2, b0 + 3,
                          b1 + 0, b1 + 1, b1 + 2, b1 + 3])
        m = UnstructuredHexMesh(degree=4, vertices=verts,
                                cells=np.asarray(cells), facet_tag_map={})
        if not curved:
            return m
        # quadratic nodes ON the true cylinder: map reference (a,b,c) ->
        # (theta, r, z) per cell, then to xyz
        gn = np.empty((nseg, 27, 3))
        for s in range(nseg):
            for q, (a, b, c) in enumerate(_LAT):
                t = th[s] + a * (th[s + 1] - th[s])
                r = 1.0 + b
                gn[s, 9 * int(2 * a) + 3 * int(2 * b) + int(2 * c)] = [
                    r * np.cos(t), r * np.sin(t), c]
        # NOTE: _LAT rows are already (i/2, j/2, k/2) in index order, so
        # q == 9i+3j+k and the explicit index above is the identity.
        return dataclasses.replace(m, geom_nodes=gn)

    exact = np.pi / 4 * (4.0 - 1.0) * 1.0              # quarter annulus
    v_tri = pre.cell_detJ(ring_mesh(False)).sum()
    v_quad = pre.cell_detJ(ring_mesh(True)).sum()
    err_tri = abs(v_tri - exact) / exact
    err_quad = abs(v_quad - exact) / exact
    assert err_quad < 2e-4, err_quad   # quadratic arc-interp error ~5e-5
    assert err_quad < err_tri / 50           # ~2 orders better
    assert err_tri > 1e-3                    # the chord error is real


def test_msh_hex27_roundtrip(tmp_path):
    """A hand-written 2nd-order .msh (gmsh node ordering) parses into an
    isoparametric mesh whose curved volume equals the trilinear volume
    when the midside nodes sit ON the trilinear map — a non-circular
    check of the gmsh-order permutation."""
    from fustpu.elements.hex import GMSH_HEX27_UVW

    rng = np.random.default_rng(3)
    corners_unit = np.array([[a, b, c] for a in (0., 1.) for b in (0., 1.)
                             for c in (0., 1.)])
    corners = corners_unit + 0.15 * rng.standard_normal((8, 3))
    vals, _ = hex8_tabulate(GMSH_HEX27_UVW)            # (27, 8)
    # trilinear images of the gmsh-ordered lattice; our corner id 4a+2b+c
    nodes = vals @ corners
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", "27"]
    for i, p in enumerate(nodes):
        lines.append(f"{i+1} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}")
    lines += ["$EndNodes", "$Elements", "1",
              "1 12 2 0 0 " + " ".join(str(i + 1) for i in range(27)),
              "$EndElements"]
    path = tmp_path / "hex27.msh"
    path.write_text("\n".join(lines) + "\n")
    mesh = msh_io.read_msh(str(path), 3)
    assert mesh.geom_degree == 2
    v_quad = pre.cell_detJ(mesh).sum()
    # trilinear volume from the corner shadow
    tri = dataclasses.replace(mesh, geom_nodes=None)
    v_tri = pre.cell_detJ(tri).sum()
    assert abs(v_quad - v_tri) < 1e-12 * abs(v_tri)
