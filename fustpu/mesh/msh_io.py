"""Gmsh `.msh` file I/O (ASCII, formats 2.2 and 4.1) for unstructured hex
meshes with tagged boundary surfaces.

The role of the reference's mesh-import pipeline
(dolfinx.io.XDMFFile.read_mesh / read_meshtags,
/root/reference/cuda/demo_nonlinear_bowl.py:98-105): hexahedral volume
elements become cells; quadrilateral surface elements carrying physical
tags become (cell, local_facet) facet sets, matched to owning cells by
corner-vertex sets.

A writer (format 2.2) is included so test/demo meshes can be generated
and round-tripped without Gmsh installed; files written by real Gmsh in
either ASCII format parse identically.

Gmsh hexahedron corner order (nodes 0..7):
    (0,0,0),(1,0,0),(1,1,0),(0,1,0),(0,0,1),(1,0,1),(1,1,1),(0,1,1)
mapped to this package's 4a+2b+c convention; quads are (0,0),(1,0),(1,1),
(0,1) cycles (order irrelevant here — facets are matched as corner sets).
"""

from __future__ import annotations

import numpy as np

from fustpu.mesh.unstructured import (_FACET_CORNERS, UnstructuredHexMesh,
                                      face_keys)

# gmsh node k -> our corner id 4a+2b+c
_GMSH_HEX = [0b000, 0b100, 0b110, 0b010, 0b001, 0b101, 0b111, 0b011]
_HEX_TYPE = 5    # gmsh element type: 8-node hexahedron
_QUAD_TYPE = 3   # 4-node quadrangle


def _rowview(a: np.ndarray) -> np.ndarray:
    """Rows of an int array as a 1D sortable/searchable void view."""
    a = np.ascontiguousarray(a.astype(np.int64))
    return a.view([("", np.int64)] * a.shape[1]).ravel()


def _facets_from_quads(cells: np.ndarray, quads: list) -> dict:
    """Match tagged quads (vertex-id 4-tuples) to (cell, local_facet) —
    vectorised sorted-key search (a per-cell dict build is minutes at
    production mesh sizes)."""
    if not quads:
        return {}
    keys = face_keys(cells).reshape(-1, 4)
    order = np.lexsort(keys.T[::-1])
    sk = _rowview(keys[order])
    qarr = np.sort(np.asarray([v for _, v in quads], np.int64), axis=1)
    qk = _rowview(qarr)
    pos = np.searchsorted(sk, qk)
    if np.any(pos >= sk.size) or np.any(sk[np.minimum(pos, sk.size - 1)]
                                        != qk):
        bad = int(np.argmax(sk[np.minimum(pos, sk.size - 1)] != qk))
        raise ValueError(
            f"tagged quad {tuple(qarr[bad])} does not match any hex face")
    rows = order[pos]
    pairs = np.stack([rows // 6, rows % 6], axis=1).astype(np.int32)
    tags: dict[int, list] = {}
    for (tag, _), pair in zip(quads, pairs):
        tags.setdefault(int(tag), []).append(tuple(pair))
    return {t: np.asarray(sorted(v), np.int32) for t, v in tags.items()}


def read_msh(path: str, degree: int,
             detect_extrusion: bool = True) -> UnstructuredHexMesh:
    """Parse an ASCII .msh file (v2.2 or v4.1) into an
    UnstructuredHexMesh with degree-P GLL dofs.

    When the mesh topology is a z-extrusion (every practical
    piston/column mesh), the returned object is the ExtrudedHexMesh
    subclass, which the models route to the factorized fast stiffness
    path (fustpu.mesh.extruded); pass detect_extrusion=False to force
    the generic per-element representation."""
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0

    def section(name, required=False):
        nonlocal i
        while i < len(lines) and lines[i].strip() != f"${name}":
            i += 1
        if i == len(lines):
            i = 0  # reset so later section() lookups scan from the top
            if required:
                raise ValueError(f"{path}: missing ${name} section")
            return None
        i += 1
        start = i
        while lines[i].strip() != f"$End{name}":
            i += 1
        body = lines[start:i]
        i = 0  # reset for next section search from the top
        return body

    fmt = section("MeshFormat")
    if fmt is None:
        raise ValueError(f"{path}: not a Gmsh .msh file")
    version = float(fmt[0].split()[0])

    node_ids, coords = [], []
    quads, hexes = [], []     # (tag, verts) / verts
    if version < 4.0:
        body = section("Nodes", required=True)
        for ln in body[1:]:
            parts = ln.split()
            node_ids.append(int(parts[0]))
            coords.append([float(x) for x in parts[1:4]])
        body = section("Elements", required=True)
        for ln in body[1:]:
            parts = [int(x) for x in ln.split()]
            etype, ntags = parts[1], parts[2]
            tags = parts[3:3 + ntags]
            verts = parts[3 + ntags:]
            if etype == _HEX_TYPE:
                hexes.append(verts)
            elif etype == _QUAD_TYPE:
                quads.append((tags[0] if tags else 0, verts))
    else:
        body = section("Nodes", required=True)
        k = 1
        while k < len(body):
            _, _, _, nn = (int(x) for x in body[k].split())
            ids = [int(body[k + 1 + j]) for j in range(nn)]
            for j in range(nn):
                parts = body[k + 1 + nn + j].split()
                node_ids.append(ids[j])
                coords.append([float(x) for x in parts[:3]])
            k += 1 + 2 * nn
        # entity -> physical tag map for surfaces
        surf_tag = {}
        ent = section("Entities")
        if ent is not None:
            np_, nc_, ns_, nv_ = (int(x) for x in ent[0].split())
            k = 1 + np_ + nc_
            for j in range(ns_):
                parts = ent[k + j].split()
                ent_id = int(parts[0])
                nphys = int(parts[7])
                if nphys:
                    surf_tag[ent_id] = int(parts[8])
        body = section("Elements", required=True)
        k = 1
        while k < len(body):
            dim, ent_id, etype, ne = (int(x) for x in body[k].split())
            for j in range(ne):
                parts = [int(x) for x in body[k + 1 + j].split()]
                verts = parts[1:]
                if etype == _HEX_TYPE:
                    hexes.append(verts)
                elif etype == _QUAD_TYPE:
                    if ent_id not in surf_tag:
                        raise ValueError(
                            f"{path}: surface entity {ent_id} carries "
                            "quads but no physical tag — tag boundary "
                            "surfaces with physical groups in Gmsh")
                    quads.append((surf_tag[ent_id], verts))
            k += 1 + ne

    if not hexes:
        raise ValueError(f"{path}: no hexahedral elements")
    remap = {nid: j for j, nid in enumerate(node_ids)}
    verts = np.asarray(coords, np.float64)
    cells = np.empty((len(hexes), 8), np.int64)
    for ci, h in enumerate(hexes):
        for k_g, our in enumerate(_GMSH_HEX):
            cells[ci, our] = remap[h[k_g]]
    quads_l = [(t, [remap[v] for v in vs]) for t, vs in quads]
    mesh = UnstructuredHexMesh(
        degree=degree, vertices=verts, cells=cells,
        facet_tag_map=_facets_from_quads(cells, quads_l))
    if detect_extrusion:
        from fustpu.mesh.extruded import as_extruded

        ex = as_extruded(mesh)
        if ex is not None:
            return ex
    return mesh


def export_box_msh(box_mesh, tag_map: dict, path: str) -> str:
    """Export a (possibly mapped/perturbed) BoxMesh as a tagged .msh file:
    `tag_map` maps tag -> (nf, 2) (cell, local_facet) arrays in the box
    mesh's own conventions.  Round-tripping a body-fitted mapped box
    through this writer + read_msh reproduces the reference's workflow of
    importing a Gmsh-built transducer mesh
    (cuda/demo_nonlinear_bowl.py:98-105)."""
    from fustpu.mesh.unstructured import from_box

    umesh = from_box(box_mesh)          # unshuffled: same cell ordering
    quads = []
    for tag, pairs in tag_map.items():
        for cell, lf in np.asarray(pairs):
            verts = [int(umesh.cells[cell][c]) for c in _FACET_CORNERS[lf]]
            quads.append((int(tag), verts))
    return write_msh(path, umesh.vertices, umesh.cells, quads)


def write_msh(path: str, vertices: np.ndarray, cells: np.ndarray,
              tagged_quads: list | None = None) -> str:
    """Write an ASCII Gmsh v2.2 file.  `tagged_quads`: list of
    (tag, (v0, v1, v2, v3)) with vertex indices into `vertices`; vertex
    orders follow this package's conventions and are converted to
    Gmsh's."""
    if not path.endswith(".msh"):
        path += ".msh"
    tagged_quads = tagged_quads or []
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{len(vertices)}\n")
        for j, p in enumerate(np.asarray(vertices, np.float64)):
            f.write(f"{j + 1} {p[0]:.16g} {p[1]:.16g} {p[2]:.16g}\n")
        f.write("$EndNodes\n")
        ne = len(cells) + len(tagged_quads)
        f.write(f"$Elements\n{ne}\n")
        eid = 1
        for tag, verts in tagged_quads:
            vs = " ".join(str(int(v) + 1) for v in verts)
            f.write(f"{eid} {_QUAD_TYPE} 2 {int(tag)} {int(tag)} {vs}\n")
            eid += 1
        for cell in np.asarray(cells):
            gm = [int(cell[_GMSH_HEX[k]]) + 1 for k in range(8)]
            f.write(f"{eid} {_HEX_TYPE} 2 1 1 " +
                    " ".join(map(str, gm)) + "\n")
            eid += 1
        f.write("$EndElements\n")
    return path
