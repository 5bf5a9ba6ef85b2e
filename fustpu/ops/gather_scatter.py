"""Global-DOF <-> element-batch gather/scatter.

The reference handles the scatter-add (direct stiffness summation) with
``cuda.atomic.add`` per dof (/root/reference/cuda/operators.py:70,190).  TPUs
have no atomics, and a generic XLA scatter-add serializes badly — but on a
structured box with tensor-product numbering the scatter is *separable*:
global node index along each axis is cx*P + i, so cells overlap only at the
single shared plane per axis.  The whole 3D scatter-add therefore factors
into three 1D "overlap-adds", each of which is just reshape + pad + add —
fully vectorized, deterministic, and fusable by XLA.  The gather is the
matching "windowing" (two slices + a concat per axis).

The indexed path (``gather_dofs`` / ``scatter_add_dofs``) remains for
arbitrary facet patches and as a cross-check in tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# 1D building blocks along the leading axis
# ---------------------------------------------------------------------------

def _win_front(x: jax.Array, P: int) -> jax.Array:
    """(g, ...) -> (nc, n, ...) overlapping windows, g = nc*P + 1."""
    g = x.shape[0]
    nc = (g - 1) // P
    rest = x.shape[1:]
    a = x[: g - 1].reshape(nc, P, *rest)
    b = x[1:].reshape(nc, P, *rest)[:, P - 1 : P]  # node (c+1)*P
    return jnp.concatenate([a, b], axis=1)


def _fold_front(A: jax.Array, P: int) -> jax.Array:
    """(nc, n, ...) -> (g, ...) overlap-add (adjoint of _win_front)."""
    nc = A.shape[0]
    rest = A.shape[2:]
    zeros_pad = [(0, 0)] * (A.ndim - 1)
    main = A[:, :P].reshape(nc * P, *rest)
    main = jnp.pad(main, [(0, 1)] + zeros_pad[1:])
    ends = A[:, P]                                   # (nc, ...)
    block = jnp.pad(ends[:, None], [(0, 0), (P - 1, 0)] + zeros_pad[1:])
    shifted = jnp.pad(block.reshape(nc * P, *rest), [(1, 0)] + zeros_pad[1:])
    return main + shifted


# ---------------------------------------------------------------------------
# 3D structured gather / scatter
# ---------------------------------------------------------------------------

def windows3d(x: jax.Array, P: int) -> jax.Array:
    """(gx, gy, gz) node grid -> (ncx, n, ncy, n, ncz, n) element batch."""
    x = _win_front(x, P)                  # (ncx, n, gy, gz)
    x = jnp.moveaxis(x, 2, 0)             # (gy, ncx, n, gz)
    x = _win_front(x, P)                  # (ncy, n, ncx, n, gz)
    x = jnp.moveaxis(x, 4, 0)             # (gz, ncy, n, ncx, n)
    x = _win_front(x, P)                  # (ncz, n, ncy, n, ncx, n)
    return x.transpose(4, 5, 2, 3, 0, 1)  # (ncx, n, ncy, n, ncz, n)


def fold3d(A: jax.Array, P: int) -> jax.Array:
    """(ncx, n, ncy, n, ncz, n) element batch -> (gx, gy, gz) scatter-add."""
    A = A.transpose(4, 5, 2, 3, 0, 1)     # (ncz, n, ncy, n, ncx, n)
    A = _fold_front(A, P)                 # (gz, ncy, n, ncx, n)
    A = jnp.moveaxis(A, 0, 4)             # (ncy, n, ncx, n, gz)
    A = _fold_front(A, P)                 # (gy, ncx, n, gz)
    A = jnp.moveaxis(A, 0, 2)             # (ncx, n, gy, gz)
    return _fold_front(A, P)              # (gx, gy, gz)


def windows2d(x: jax.Array, P: int) -> jax.Array:
    """(gs, gt) plane -> (ncs, n, nct, n) facet batch (for boundary planes)."""
    x = _win_front(x, P)                  # (ncs, n, gt)
    x = jnp.moveaxis(x, 2, 0)
    x = _win_front(x, P)                  # (nct, n, ncs, n)
    return x.transpose(2, 3, 0, 1)


def fold2d(A: jax.Array, P: int) -> jax.Array:
    A = A.transpose(2, 3, 0, 1)
    A = _fold_front(A, P)
    A = jnp.moveaxis(A, 0, 2)
    return _fold_front(A, P)


# ---------------------------------------------------------------------------
# Indexed (generic) gather / scatter-add
# ---------------------------------------------------------------------------

def gather_dofs(x_flat: jax.Array, dofmap: jax.Array) -> jax.Array:
    """x[dofmap]: (ndofs,) -> (entities, local_dofs)."""
    return x_flat[dofmap]


def scatter_add_dofs(vals: jax.Array, dofmap: jax.Array,
                     ndofs: int) -> jax.Array:
    """Deterministic scatter-add of (entities, local_dofs) into (ndofs,)."""
    return jnp.zeros((ndofs,), vals.dtype).at[dofmap.ravel()].add(
        vals.ravel(), mode="promise_in_bounds")


# ---------------------------------------------------------------------------
# Pull-based transpose scatter ("gather-sum"): the scatter-add direction
# re-expressed as gathers.  XLA's generic scatter-add serializes on TPU
# (~50% of the indexed apply, BENCH_NOTES r2); gathers vectorize.  At
# setup we invert the dofmap: for every global dof, the list of flat
# positions in the (entities*nd,) value array that accumulate into it.
# Dofs are grouped into power-of-two multiplicity classes (interior dofs
# have multiplicity 1, faces 2, edges ~4, vertices ~8+), each class a
# dense (len, m) gather + row-sum; short rows point at a zero sentinel.
# The reference handles the same direction with cuda.atomic.add
# (/root/reference/cuda/operators.py:70,190).
# ---------------------------------------------------------------------------

from typing import NamedTuple


class PullScatter(NamedTuple):
    tables: tuple      # per-class (len_c, m_c) int32 flat-position tables
    slots: jax.Array   # (ndofs,) int32: dof -> its slot in the class concat
    npos: int          # entities*nd (sentinel index, static)


def build_pull_scatter(dofmap, ndofs: int) -> PullScatter:
    """Invert a (entities, nd) dofmap into pull tables (host, numpy)."""
    import numpy as np

    flat = np.asarray(dofmap, np.int64).ravel()
    npos = flat.size
    order = np.argsort(flat, kind="stable")
    counts = np.bincount(flat, minlength=ndofs)
    if counts.min() < 1:
        raise ValueError("dofmap does not cover every dof")
    starts = np.concatenate([[0], np.cumsum(counts)])
    sorted_dofs = flat[order]
    runpos = np.arange(npos) - np.repeat(starts[:-1], counts)
    # power-of-two multiplicity classes actually present
    cls_of = 1 << np.ceil(np.log2(counts)).astype(np.int64)
    cls_sorted = cls_of[sorted_dofs]
    tables, dof_order = [], []
    for m in np.unique(cls_of):
        dofs_m = np.nonzero(cls_of == m)[0]
        rank_of = np.zeros(ndofs, np.int64)
        rank_of[dofs_m] = np.arange(len(dofs_m))
        tab = np.full((len(dofs_m), int(m)), npos, np.int64)
        sel = cls_sorted == m
        tab[rank_of[sorted_dofs[sel]], runpos[sel]] = order[sel]
        tables.append(jnp.asarray(tab, jnp.int32))
        dof_order.append(dofs_m)
    slots = np.empty(ndofs, np.int64)
    slots[np.concatenate(dof_order)] = np.arange(ndofs)
    return PullScatter(tables=tuple(tables),
                       slots=jnp.asarray(slots, jnp.int32), npos=npos)


def pull_scatter_dofs(vals: jax.Array, ps: PullScatter) -> jax.Array:
    """Gather-only equivalent of scatter_add_dofs(vals, dofmap, ndofs)."""
    v = jnp.concatenate([vals.reshape(-1),
                         jnp.zeros((1,), vals.dtype)])
    parts = [v[t].sum(axis=1) for t in ps.tables]
    return jnp.concatenate(parts)[ps.slots]
