"""XDMF/HDF5 mesh import (fustpu.mesh.xdmf_io): round-trip a cylinder
through a DOLFINx-layout XDMF+HDF5 pair and back — the reference's own
mesh-file format (cuda/demo_linear_piston.py:83-90 reads mesh.xdmf;
demo_nonlinear_bowl.py:98-105 reads mesh + facet meshtags)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from fustpu.mesh import msh_io, xdmf_io
from fustpu.mesh.extruded import ExtrudedHexMesh
from fustpu.mesh.shapes import cylinder_mesh

_G2D = xdmf_io._HEX_DOLFINX_TO_GMSH
_INV_HEX = np.argsort(_G2D)            # gmsh -> dolfinx
_INV_QUAD = np.argsort(xdmf_io._QUAD_DOLFINX_TO_GMSH)


def _write_xdmf(tmpdir, verts, cells_gmsh, tagged, name="planar_3d_0",
                inline_tags=True):
    """Emit a DOLFINx-style XDMF + HDF5 pair (hex grid + quad meshtag
    grid, lexicographic corner order)."""
    h5 = f"{tmpdir}/mesh.h5"
    xd = f"{tmpdir}/mesh.xdmf"
    topo = np.asarray(cells_gmsh)[:, _INV_HEX]
    qconn = np.array([q for _, q in tagged])[:, _INV_QUAD]
    qvals = np.array([t for t, _ in tagged], np.int64)
    with h5py.File(h5, "w") as f:
        f["/Mesh/mesh/topology"] = topo
        f["/Mesh/mesh/geometry"] = verts
        f["/MeshTags/facets/topology"] = qconn
        f["/MeshTags/facets/values"] = qvals
    nt, nv = topo.shape[0], verts.shape[0]
    nq = qconn.shape[0]
    tag_grid = f"""
    <Grid Name="facet_tags">
      <Topology TopologyType="Quadrilateral" NumberOfElements="{nq}">
        <DataItem Dimensions="{nq} 4" DataType="Int" Format="HDF">mesh.h5:/MeshTags/facets/topology</DataItem>
      </Topology>
      <Attribute Name="facet_tags" Center="Cell">
        <DataItem Dimensions="{nq}" DataType="Int" Format="HDF">mesh.h5:/MeshTags/facets/values</DataItem>
      </Attribute>
    </Grid>""" if inline_tags else ""
    with open(xd, "w") as f:
        f.write(f"""<?xml version="1.0"?>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="{name}">
      <Topology TopologyType="Hexahedron" NumberOfElements="{nt}">
        <DataItem Dimensions="{nt} 8" DataType="Int" Format="HDF">mesh.h5:/Mesh/mesh/topology</DataItem>
      </Topology>
      <Geometry GeometryType="XYZ">
        <DataItem Dimensions="{nv} 3" Format="HDF">mesh.h5:/Mesh/mesh/geometry</DataItem>
      </Geometry>
    </Grid>{tag_grid}
  </Domain>
</Xdmf>
""")
    return xd


def test_xdmf_roundtrip(tmp_path):
    v, c, t = cylinder_mesh(0.012, 0.02, 0.008, m=3, mr=1, nr_ann=1, nz=4)
    xd = _write_xdmf(str(tmp_path), v, c, t)
    mesh = xdmf_io.read_xdmf(xd, 3, mesh_name="planar_3d_0")
    # reference mesh read straight from .msh
    p = msh_io.write_msh(str(tmp_path / "direct.msh"), v, c, t)
    ref = msh_io.read_msh(p, 3)
    assert isinstance(mesh, ExtrudedHexMesh)   # detection still works
    assert mesh.num_cells == ref.num_cells
    assert mesh.ndofs == ref.ndofs
    # same node cloud
    a = np.sort(mesh.node_coords.reshape(-1, 3), axis=0)
    b = np.sort(ref.node_coords.reshape(-1, 3), axis=0)
    assert np.allclose(a, b, atol=1e-12)
    # facet tags preserved (same tagged-facet centroids per tag)
    for tag in (1, 2):
        ca = np.sort(mesh.facet_centroids(mesh.boundary_facets(tag)),
                     axis=0)
        cb = np.sort(ref.facet_centroids(ref.boundary_facets(tag)), axis=0)
        assert np.allclose(ca, cb, atol=1e-12)


def test_xdmf_separate_tags_file(tmp_path):
    """Tags in a second XDMF file (the reference's two-file layout)."""
    v, c, t = cylinder_mesh(0.012, 0.02, 0.008, m=3, mr=1, nr_ann=1, nz=4)
    xd = _write_xdmf(str(tmp_path), v, c, t, inline_tags=False)
    # write tags-only xdmf referencing the same h5
    nq = len(t)
    qconn = np.array([q for _, q in t])[:, _INV_QUAD]
    with h5py.File(str(tmp_path / "mesh.h5"), "a") as f:
        pass
    with open(str(tmp_path / "tags.xdmf"), "w") as f:
        f.write(f"""<?xml version="1.0"?>
<Xdmf Version="3.0"><Domain>
  <Grid Name="facet_tags">
    <Topology TopologyType="Quadrilateral" NumberOfElements="{nq}">
      <DataItem Dimensions="{nq} 4" DataType="Int" Format="HDF">mesh.h5:/MeshTags/facets/topology</DataItem>
    </Topology>
    <Attribute Name="facet_tags" Center="Cell">
      <DataItem Dimensions="{nq}" DataType="Int" Format="HDF">mesh.h5:/MeshTags/facets/values</DataItem>
    </Attribute>
  </Grid>
</Domain></Xdmf>
""")
    mesh = xdmf_io.read_xdmf(xd, 2, tags_path=str(tmp_path / "tags.xdmf"))
    assert mesh.boundary_facets(1).shape[0] > 0
    assert mesh.boundary_facets(2).shape[0] > 0
