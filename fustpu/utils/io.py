"""Field output and checkpoint/resume.

Output parity with the reference: final-field writes (VTXWriter -> .bp,
numba-cpu/demo_linear_box.py:479-480) are covered by a legacy-VTK
structured-grid writer readable by ParaView; point-cloud text dumps
(cuda/demo_nonlinear_bowl.py:662-681) by `save_point_cloud`.

Checkpoint/resume is a capability the reference lacks entirely
(SURVEY.md §5: "Checkpoint / resume: none") — runs are thousands of steps,
so (u, v, t, step) snapshots with exact-restart semantics are provided
here (npz; orbax can be layered later for async multi-host checkpointing).
"""

from __future__ import annotations

import json
import os

import numpy as np

from fustpu.mesh.box import BoxMesh


def write_vtk_structured(path: str, mesh: BoxMesh,
                         fields: dict[str, np.ndarray],
                         binary: bool = True) -> str:
    """Legacy VTK STRUCTURED_GRID file of the spectral node lattice with
    point-data fields.  ParaView-compatible."""
    if not path.endswith(".vtk"):
        path = path + ".vtk"
    gx, gy, gz = mesh.grid_shape
    pts = mesh.node_coords.reshape(-1, 3)
    mode = "BINARY" if binary else "ASCII"
    with open(path, "wb") as f:
        w = lambda s: f.write(s.encode())
        w("# vtk DataFile Version 3.0\nfustpu field output\n")
        w(f"{mode}\nDATASET STRUCTURED_GRID\n")
        # VTK wants x fastest; our layout is z fastest -> declare dims
        # (gz, gy, gx) and write points in our natural order.
        w(f"DIMENSIONS {gz} {gy} {gx}\n")
        w(f"POINTS {pts.shape[0]} float\n")
        if binary:
            f.write(pts.astype(">f4").tobytes())
        else:
            np.savetxt(f, pts, fmt="%.7e")
        w(f"\nPOINT_DATA {pts.shape[0]}\n")
        for name, data in fields.items():
            data = np.asarray(data).reshape(-1)
            w(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
            if binary:
                f.write(data.astype(">f4").tobytes())
            else:
                np.savetxt(f, data, fmt="%.7e")
            w("\n")
    return path


def write_vtk_unstructured(path: str, mesh,
                           fields: dict[str, np.ndarray],
                           binary: bool = True) -> str:
    """Legacy VTK UNSTRUCTURED_GRID of an (imported) hex mesh at FULL GLL
    resolution: every spectral cell is written as P^3 linear sub-hexes
    through its GLL lattice, so ParaView shows the actual polynomial
    field, not a corner decimation.  The role of the reference's
    VTXWriter on arbitrary meshes (numba-cpu/demo_linear_box.py:479-480).
    """
    if not path.endswith(".vtk"):
        path = path + ".vtk"
    n = mesh.element.n
    P = n - 1
    pts = mesh.node_coords.reshape(-1, 3)
    dofmap = mesh.dofmap.reshape(mesh.num_cells, n, n, n)
    # sub-cell corner gather, VTK_HEXAHEDRON order (bottom CCW, then top)
    corners = []
    for a, b, c in ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                    (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)):
        corners.append(dofmap[:, a:a + P, b:b + P, c:c + P])
    conn = np.stack(corners, axis=-1).reshape(-1, 8)   # (cells*P^3, 8)
    ncell = conn.shape[0]
    mode = "BINARY" if binary else "ASCII"
    with open(path, "wb") as f:
        w = lambda s: f.write(s.encode())
        w("# vtk DataFile Version 3.0\nfustpu field output\n")
        w(f"{mode}\nDATASET UNSTRUCTURED_GRID\n")
        w(f"POINTS {pts.shape[0]} float\n")
        rows = np.concatenate(
            [np.full((ncell, 1), 8, np.int64), conn], axis=1)
        if binary:
            f.write(pts.astype(">f4").tobytes())
            w(f"\nCELLS {ncell} {ncell * 9}\n")
            f.write(rows.astype(">i4").tobytes())
            w(f"\nCELL_TYPES {ncell}\n")
            f.write(np.full(ncell, 12, ">i4").tobytes())
        else:
            np.savetxt(f, pts, fmt="%.7e")
            w(f"\nCELLS {ncell} {ncell * 9}\n")
            np.savetxt(f, rows, fmt="%d")
            w(f"\nCELL_TYPES {ncell}\n")
            np.savetxt(f, np.full(ncell, 12), fmt="%d")
        w(f"\nPOINT_DATA {pts.shape[0]}\n")
        for name, data in fields.items():
            data = np.asarray(data).reshape(-1)
            w(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
            if binary:
                f.write(data.astype(">f4").tobytes())
            else:
                np.savetxt(f, data, fmt="%.7e")
            w("\n")
    return path


def save_point_cloud(path: str, points: np.ndarray, values: np.ndarray,
                     cols=(0, 2), mode: str = "w") -> str:
    """Text dump `x,z,u` rows like the reference's pressure-field snapshots
    (cuda/demo_nonlinear_bowl.py:662-681), but to a caller-chosen path.
    `mode='a'` appends (the reference's multi-rank accumulation pattern);
    the default overwrites so re-runs don't interleave datasets."""
    data = np.column_stack([points[:, c] for c in cols] + [values])
    with open(path, mode) as f:
        np.savetxt(f, data, fmt="%.8f", delimiter=",")
    return path


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, state, step: int, meta: dict | None = None
                    ) -> str:
    """Snapshot an RKState (works for single-device and collected sharded
    fields).  Atomic rename so a crash mid-write can't corrupt the latest
    checkpoint."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp.npz"
    np.savez(tmp,
             u=np.asarray(state.u), v=np.asarray(state.v),
             ku=np.asarray(state.ku), kv=np.asarray(state.kv),
             t=np.asarray(state.t), step=step,
             meta=json.dumps(meta or {}))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str):
    """Returns (arrays dict, step, meta).  Feed arrays into
    model.init_state / timestepping.RKState for an exact restart."""
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in ("u", "v", "ku", "kv", "t")}
        step = int(z["step"])
        meta = json.loads(str(z["meta"]))
    return arrays, step, meta


# ---------------------------------------------------------------------------
# Orbax checkpointing (async-capable, multi-host-aware, sharded restore)
# ---------------------------------------------------------------------------

class OrbaxCheckpointer:
    """Async checkpoint/resume of RKState pytrees via orbax — for long
    multi-host runs where the npz path (host gather + synchronous write)
    would stall the solve.  Saves happen in a background thread; sharded
    arrays are written per-shard without materialising the global field.
    """

    def __init__(self, directory: str, async_save: bool = True):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        handler = ocp.StandardCheckpointHandler()
        self._ckptr = (ocp.AsyncCheckpointer(handler) if async_save
                       else ocp.Checkpointer(handler))
        self._ocp = ocp

    def _path(self, step: int) -> str:
        return os.path.join(self._dir, f"step_{step:010d}")

    def save(self, state, step: int) -> str:
        """Enqueue (async) or perform a save of the state pytree."""
        path = self._path(step)
        self._ckptr.save(path, args=self._ocp.args.StandardSave(
            tuple(state)), force=True)
        return path

    def wait(self):
        """Block until in-flight async saves are durable."""
        self._ckptr.wait_until_finished()

    def steps(self) -> list[int]:
        """Completed checkpoints only (in-flight async saves leave
        .orbax-checkpoint-tmp directories behind; never list those)."""
        out = []
        for d in os.listdir(self._dir):
            if d.startswith("step_") and d.split("_", 1)[1].isdigit():
                out.append(int(d.split("_", 1)[1]))
        return sorted(out)

    def restore(self, step: int | None = None, like=None):
        """Restore the state at `step` (default: latest).  Pass `like` (an
        abstract/concrete state pytree) to restore with the original
        shardings — required for multi-host restarts."""
        if step is None:
            step = self.steps()[-1]
        if like is not None:
            out = self._ckptr.restore(
                self._path(step),
                args=self._ocp.args.StandardRestore(tuple(like)))
        else:
            out = self._ckptr.restore(self._path(step))
        return tuple(out), step
