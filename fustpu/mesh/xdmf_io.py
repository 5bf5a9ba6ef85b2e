"""XDMF/HDF5 mesh import: convert DOLFINx-written XDMF hex meshes (the
reference's own input format — cuda/demo_linear_piston.py:83-90 reads
`BM1SC2/mesh.xdmf` name 'planar_3d_0', demo_nonlinear_bowl.py:98-105
reads `transducer_3d_W` plus facet meshtags) into Gmsh .msh, so the
reference's data files run verbatim through fustpu's .msh pipeline
(fustpu.mesh.msh_io, extrusion detection included).

Scope: XDMF 3 XML with HDF5 ('Format="HDF"') or inline ('Format="XML"')
DataItems; Hexahedron topology grids (the mesh) and Quadrilateral
topology grids carrying an integer Attribute (facet meshtags).  Vertex
orderings are converted from DOLFINx's lexicographic corner order to
Gmsh's cyclic order.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

# DOLFINx (basix) lexicographic corners -> gmsh cyclic corners
_HEX_DOLFINX_TO_GMSH = [0, 1, 3, 2, 4, 5, 7, 6]
_QUAD_DOLFINX_TO_GMSH = [0, 1, 3, 2]


def _read_dataitem(item: ET.Element, base_dir: str) -> np.ndarray:
    fmt = (item.get("Format") or "XML").upper()
    if fmt == "XML":
        text = (item.text or "").split()
        dt = (item.get("DataType") or "Float").lower()
        arr = np.array(text, np.float64 if dt == "float" else np.int64)
    elif fmt == "HDF":
        import h5py

        ref = (item.text or "").strip()
        fname, dset = ref.split(":", 1)
        path = os.path.join(base_dir, fname)
        with h5py.File(path, "r") as f:
            arr = np.asarray(f[dset])
    else:
        raise ValueError(f"unsupported XDMF DataItem format {fmt!r}")
    dims = item.get("Dimensions")
    if dims:
        arr = arr.reshape([int(d) for d in dims.split()])
    return arr


def parse_xdmf(path: str, mesh_name: str | None = None):
    """Returns (vertices (nv, 3), hex cells (nc, 8) gmsh order,
    tagged quads [(tag, (4,) gmsh-order vertex ids), ...])."""
    tree = ET.parse(path)
    base = os.path.dirname(os.path.abspath(path))
    grids = tree.getroot().iter("Grid")
    verts = cells = None
    tagged: list = []
    for g in grids:
        topo = g.find("Topology")
        if topo is None:
            continue
        ttype = (topo.get("TopologyType") or topo.get("Type") or "").lower()
        if ttype.startswith("hex"):
            if mesh_name is not None and g.get("Name") != mesh_name:
                continue
            geom = g.find("Geometry")
            if geom is None:
                raise ValueError(f"{path}: hex grid without Geometry")
            verts = _read_dataitem(geom.find("DataItem"), base)
            if (geom.get("GeometryType") or "XYZ").upper() == "XY":
                verts = np.pad(verts, [(0, 0), (0, 1)])
            conn = _read_dataitem(topo.find("DataItem"), base)
            cells = conn.reshape(-1, 8).astype(np.int64)[
                :, _HEX_DOLFINX_TO_GMSH]
        elif ttype.startswith("quad"):
            conn = _read_dataitem(topo.find("DataItem"), base)
            quads = conn.reshape(-1, 4).astype(np.int64)[
                :, _QUAD_DOLFINX_TO_GMSH]
            attr = g.find("Attribute")
            if attr is None:
                continue
            vals = _read_dataitem(attr.find("DataItem"),
                                  base).reshape(-1).astype(np.int64)
            tagged.extend((int(t), q) for t, q in zip(vals, quads))
    if cells is None:
        raise ValueError(
            f"{path}: no Hexahedron grid"
            + (f" named {mesh_name!r}" if mesh_name else ""))
    return np.asarray(verts, np.float64), cells, tagged


def xdmf_to_msh(xdmf_path: str, out_path: str,
                mesh_name: str | None = None,
                tags_path: str | None = None) -> str:
    """Convert an XDMF hex mesh (+ optional separate facet-tag XDMF, the
    reference stores meshtags either inline or in a second file) to Gmsh
    .msh v2.2 ASCII.  Returns out_path."""
    from fustpu.mesh.msh_io import write_msh

    verts, cells, tagged = parse_xdmf(xdmf_path, mesh_name)
    if tags_path is not None:
        tree = ET.parse(tags_path)
        base = os.path.dirname(os.path.abspath(tags_path))
        for g in tree.getroot().iter("Grid"):
            topo = g.find("Topology")
            if topo is None:
                continue
            tt = (topo.get("TopologyType") or "").lower()
            if not tt.startswith("quad"):
                continue
            conn = _read_dataitem(topo.find("DataItem"), base)
            quads = conn.reshape(-1, 4).astype(np.int64)[
                :, _QUAD_DOLFINX_TO_GMSH]
            attr = g.find("Attribute")
            if attr is None:
                continue
            vals = _read_dataitem(attr.find("DataItem"),
                                  base).reshape(-1).astype(np.int64)
            tagged.extend((int(t), q) for t, q in zip(vals, quads))
    return write_msh(out_path, verts, cells, tagged)


def read_xdmf(path: str, degree: int, mesh_name: str | None = None,
              tags_path: str | None = None, detect_extrusion: bool = True):
    """Read an XDMF hex mesh directly (converted through a temporary
    .msh): the reference's XDMFFile.read_mesh/read_meshtags equivalent."""
    import tempfile

    from fustpu.mesh.msh_io import read_msh

    with tempfile.NamedTemporaryFile(suffix=".msh", delete=False) as f:
        tmp = f.name
    try:
        xdmf_to_msh(path, tmp, mesh_name, tags_path)
        return read_msh(tmp, degree, detect_extrusion=detect_extrusion)
    finally:
        os.unlink(tmp)
