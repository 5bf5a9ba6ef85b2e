"""Distributed (per-shard) field snapshots — no host gather.

The reference writes parallel .bp snapshots via VTXWriter on every MPI
rank (/root/reference/numba-cpu/demo_linear_box.py:479-480): each rank
dumps only the piece it owns, and the file set IS the global field.
fustpu's VTK writers (utils/io.py) instead host-gather through
`collect()`, which does not exist at multi-chip scale (>=0.5B DOF).

This module is the sharded analogue: a `ShardSnapshotWriter` bound to a
sharded model writes ONE .npy per addressable device shard per snapshot
(raw local data, no masking or index math on the write path) plus
one-time per-shard layout files and an index.json that together are
sufficient to reassemble the exact global field offline
(`assemble_snapshot`, round-tripped against `collect()` at 1e-12 in
tests/test_sharding.py).  Multi-process safe: every process writes only
its addressable shards; process 0 writes the index.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np


def _model_layout(smodel):
    """(kind, global-meta dict, per-device layout arrays dict)."""
    from fustpu.parallel.extruded import (ExtrudedShardedModel,
                                          IndexedShardedModel)
    from fustpu.parallel.models import ShardedModel

    if isinstance(smodel, ShardedModel):
        gx, gy, gz = smodel.mesh.grid_shape
        meta = {"kind": "box_grid", "nc_pad": list(smodel.nc_pad),
                "S": list(smodel.S), "degree": smodel.mesh.degree,
                "grid_shape": [gx, gy, gz]}
        return meta, {d: {} for d in range(int(np.prod(smodel.S)))}
    if isinstance(smodel, ExtrudedShardedModel):
        meta = {"kind": "rows", "n2d": smodel.mesh.n2d, "gz": smodel.gz,
                "ndofs": smodel.mesh.ndofs, "k": smodel.k}
        per = {d: {"idx": smodel.rowsg[d][smodel.rowmask[d]].astype(
                       np.int64),
                   "mask": smodel.rowmask[d]}
               for d in range(smodel.k)}
        return meta, per
    if isinstance(smodel, IndexedShardedModel):
        meta = {"kind": "dofs", "ndofs": smodel.mesh.ndofs,
                "k": smodel.k}
        per = {d: {"idx": smodel.gids[d][smodel.gmask[d]].astype(np.int64),
                   "mask": smodel.gmask[d]}
               for d in range(smodel.k)}
        return meta, per
    raise TypeError(f"unsupported sharded model {type(smodel).__name__}")


def _device_of_shard(shard, nlead: int):
    """Position of a shard along the first `nlead` (device) axes of the
    global array — (d,) for row/dof models, (i, j, k) for box grids.
    Device-grid axes of size 1 show up as slice(None) in shard.index, so
    the leading-axis count must be supplied, not inferred."""
    idx = shard.index
    return tuple(0 if idx[i].start is None else int(idx[i].start)
                 for i in range(nlead))


class ShardSnapshotWriter:
    """Per-shard snapshot writer bound to one sharded model.

    write(name, dist_field) dumps `<name>.d<D>.npy` for every shard this
    process can address; layouts were written once at construction.
    """

    def __init__(self, directory: str, smodel):
        import jax

        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._meta, per = _model_layout(smodel)
        if jax.process_index() == 0:
            with open(os.path.join(self.dir, "index.json"), "w") as f:
                json.dump(self._meta, f)
        # layouts only for shards this process will write (device order of
        # the model's mesh/grid); data arrays name their own slot at write
        # time, so over-writing layouts for all local devices is safe
        local = {dev.id for dev in jax.local_devices()}
        jmesh = (smodel.device_mesh if hasattr(smodel, "device_mesh")
                 else smodel.grid.mesh)
        devlist = list(jmesh.devices.flat)
        for d, dev in enumerate(devlist):
            if dev.id in local and per[d]:
                np.savez(os.path.join(self.dir, f"layout.d{d:05d}.npz"),
                         **per[d])

    def write(self, name: str, dist_field) -> list[str]:
        """Dump every addressable shard of `dist_field` as raw .npy."""
        paths = []
        box = self._meta["kind"] == "box_grid"
        for s in dist_field.addressable_shards:
            pos = _device_of_shard(s, 3 if box else 1)
            if box:
                S = self._meta["S"]
                d = (pos[0] * S[1] + pos[1]) * S[2] + pos[2]
            else:
                d = pos[0]
            p = os.path.join(self.dir, f"{name}.d{d:05d}.npy")
            data = np.asarray(s.data)
            # strip the leading device axes (shard extent 1 each)
            data = data.reshape(data.shape[len(pos):])
            np.save(p, data)
            paths.append(p)
        return paths


def assemble_snapshot(directory: str, name: str) -> np.ndarray:
    """Reassemble the global field written by ShardSnapshotWriter.

    box grids -> (gx, gy, gz) node array; row/dof models -> flat (ndofs,)
    vector.  Shared planes/rows agree by construction (the writer runs on
    consistent post-exchange fields), so last-writer-wins is exact.
    """
    with open(os.path.join(directory, "index.json")) as f:
        meta = json.load(f)
    pieces = {}
    for p in sorted(glob.glob(os.path.join(directory, f"{name}.d*.npy"))):
        d = int(os.path.basename(p).rsplit(".d", 1)[1].split(".")[0])
        pieces[d] = np.load(p)
    if not pieces:
        raise FileNotFoundError(f"no shards for '{name}' in {directory}")
    # every device shard must be present — zero-filling a missing piece
    # would silently corrupt the "bit-exact" reassembly contract
    nshards = (int(np.prod(meta["S"])) if meta["kind"] == "box_grid"
               else meta["k"])
    missing = sorted(set(range(nshards)) - set(pieces))
    if missing:
        raise FileNotFoundError(
            f"snapshot '{name}' is missing shard files for devices "
            f"{missing} (found {sorted(pieces)}) — collect every "
            f"process's output directory before reassembly")
    any_piece = next(iter(pieces.values()))

    if meta["kind"] == "box_grid":
        from fustpu.parallel import sharding as sh

        S, nc = meta["S"], meta["nc_pad"]
        stacked = np.zeros((*S, *any_piece.shape), any_piece.dtype)
        for d, blk in pieces.items():
            i, rem = divmod(d, S[1] * S[2])
            j, k = divmod(rem, S[2])
            stacked[i, j, k] = blk
        full = sh.merge_node_field(stacked, nc, S, meta["degree"])
        gx, gy, gz = meta["grid_shape"]
        return full[:gx, :gy, :gz]

    out = np.zeros(meta["ndofs"], any_piece.dtype)
    for d, piece in pieces.items():
        lay = np.load(os.path.join(directory, f"layout.d{d:05d}.npz"))
        idx, mask = lay["idx"], lay["mask"]
        if meta["kind"] == "rows":
            o2 = out.reshape(meta["n2d"], meta["gz"])
            o2[idx] = piece[mask]
        else:
            out[idx] = piece[mask]
    return out
