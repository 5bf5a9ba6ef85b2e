"""Matmul formulation of the spectral operators (the TPU fast path).

Motivation: the element-batched layout (..., ncz, n) ends in a dimension of
size n = P+1 (5..7), which the TPU pads to 128 lanes — a ~25x bandwidth tax
on every intermediate.  Instead, express gather ("windows"), within-cell
contraction, and scatter ("fold") as dense matrices applied per axis, so
every step is a large 2D matmul with tile-friendly trailing dims:

  W_ax  (e, g):  W[(b,j), y] = [y == b*P + j]     (window / gather; its
                 transpose is the overlap-add fold = direct stiffness sum)
  Dt_ax (e, e):  block-diag copies of the 1D GLL derivative matrix D[q, i]

  expanded field u = Wx Wy Wz x                (cell (a,b,c), node (i,j,k)
                                                at position (a n + i, ...))
  stiffness: y = Wᵀ( Dtxᵀ f0 + Dtyᵀ f1 + Dtzᵀ f2 ),  where
             (f0,f1,f2) = coeff * G @ (Dtx u, Dty u, Dtz u)   elementwise.

Everything runs on the MXU; the extra FLOPs of multiplying by mostly-zero
banded matrices are free (the operator is HBM-bandwidth-bound).  This
replaces the reference's shared-memory CUDA contractions
(/root/reference/cuda/operators.py:73-192) with an design native to a
systolic-array machine.

The mass operator needs none of this: with GLL collocation the *assembled*
mass operator is globally diagonal, so `mass_diagonal` precomputes the
vector once per coefficient field and an apply is one elementwise multiply
(the reference re-scatters detJ on every mass launch instead,
cuda/operators.py:18-70).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_PRECISION = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Host-side matrix construction (numpy, f64)
# ---------------------------------------------------------------------------

def window_matrix(ncells: int, P: int) -> np.ndarray:
    """(ncells*(P+1), ncells*P+1) selection matrix W[(b,j), y] = [y==b*P+j]."""
    n = P + 1
    e, g = ncells * n, ncells * P + 1
    W = np.zeros((e, g))
    rows = np.arange(e)
    cols = (rows // n) * P + (rows % n)
    W[rows, cols] = 1.0
    return W


def deriv_block_matrix(ncells: int, D: np.ndarray) -> np.ndarray:
    """(e, e) block-diagonal with `ncells` copies of the (n, n) nodal
    derivative matrix D[q, i]."""
    n = D.shape[0]
    e = ncells * n
    out = np.zeros((e, e))
    for b in range(ncells):
        out[b * n:(b + 1) * n, b * n:(b + 1) * n] = D
    return out


def to_expanded_layout(arr_cells: np.ndarray, nc, n: int) -> np.ndarray:
    """(cells, n^3[, k]) -> (ex, ey, ez[, k]) expanded-grid layout with cell
    (a,b,c) node (i,j,k) at (a*n+i, b*n+j, c*n+k)."""
    trailing = arr_cells.shape[2:]
    a = arr_cells.reshape(*nc, n, n, n, *trailing)
    a = a.transpose(0, 3, 1, 4, 2, 5, *range(6, a.ndim))
    return np.ascontiguousarray(
        a.reshape(nc[0] * n, nc[1] * n, nc[2] * n, *trailing))


def expand_cell_field(coeff: np.ndarray, n: int) -> np.ndarray:
    """(ncx, ncy, ncz) per-cell values -> (ex, ey, ez) by n-fold repeat."""
    return np.repeat(np.repeat(np.repeat(coeff, n, 0), n, 1), n, 2)


# ---------------------------------------------------------------------------
# Operator container
# ---------------------------------------------------------------------------

class MMStiffness(NamedTuple):
    """Device-side stiffness operator for one (sub-)grid."""

    W: tuple        # 3 x (e_ax, g_ax)
    Dt: tuple       # 3 x (e_ax, e_ax)
    G: jax.Array    # (6, ex, ey, ez) — quadrature-scaled metric, with the
                    # material coefficient optionally folded in


def build_stiffness(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray,
                    dtype, coeff: np.ndarray | None = None) -> MMStiffness:
    """G_cells: (cells, n^3, 6) float64 (precompute.cell_geometry_factors);
    coeff: optional (ncx, ncy, ncz) per-cell coefficient folded into G."""
    n = P + 1
    W = tuple(jnp.asarray(window_matrix(c, P), dtype) for c in nc)
    Dt = tuple(jnp.asarray(deriv_block_matrix(c, D_1d), dtype) for c in nc)
    Ge = to_expanded_layout(G_cells, nc, n)          # (ex, ey, ez, 6)
    Ge = np.moveaxis(Ge, -1, 0)                      # (6, ex, ey, ez)
    if coeff is not None:
        Ge = Ge * expand_cell_field(np.asarray(coeff), n)[None]
    return MMStiffness(W=W, Dt=Dt, G=jnp.asarray(Ge, dtype))


# ---------------------------------------------------------------------------
# Application (jit-traceable)
# ---------------------------------------------------------------------------

def _axis_mm(M: jax.Array, x: jax.Array, axis: int,
             transpose: bool = False) -> jax.Array:
    """Apply matrix M along one axis of a 3D field."""
    if axis == 0:
        sub = "ya,yjk->ajk" if transpose else "ay,yjk->ajk"
    elif axis == 1:
        sub = "yb,iyk->ibk" if transpose else "by,iyk->ibk"
    else:
        sub = "yc,ijy->ijc" if transpose else "cy,ijy->ijc"
    return jnp.einsum(sub, M, x, precision=_PRECISION)


def expand(op: MMStiffness, x: jax.Array) -> jax.Array:
    """(gx, gy, gz) -> (ex, ey, ez) element gather (u = Wx Wy Wz x)."""
    for ax in range(3):
        x = _axis_mm(op.W[ax], x, ax)
    return x


def fold(op: MMStiffness, u: jax.Array) -> jax.Array:
    """(ex, ey, ez) -> (gx, gy, gz) overlap-add (y = Wxᵀ Wyᵀ Wzᵀ u)."""
    for ax in range(3):
        u = _axis_mm(op.W[ax], u, ax, transpose=True)
    return u


def stiffness_apply_mm(op: MMStiffness, x: jax.Array,
                       coeff_e: jax.Array | None = None) -> jax.Array:
    """y_grid = A_stiff(x_grid).  `coeff_e`: optional (ex, ey, ez) expanded
    per-cell coefficient (omit if folded into G at build time)."""
    u = expand(op, x)
    w = [_axis_mm(op.Dt[ax], u, ax) for ax in range(3)]
    G = op.G
    f = []
    idx = ((0, 1, 2), (1, 3, 4), (2, 4, 5))
    for d in range(3):
        a, b, c = idx[d]
        fd = G[a] * w[0] + G[b] * w[1] + G[c] * w[2]
        if coeff_e is not None:
            fd = fd * coeff_e
        f.append(fd)
    r = sum(_axis_mm(op.Dt[ax], f[ax], ax, transpose=True) for ax in range(3))
    return fold(op, r)


def _fold_axis0_np(A: np.ndarray, P: int) -> np.ndarray:
    """(nc*n, ...) expanded axis -> (nc*P + 1, ...) overlap-add, numpy
    host (the adjoint of the window; O(N) adds instead of the dense
    window matmul, which costs minutes at 10^8-DOF setup)."""
    n = P + 1
    ncells = A.shape[0] // n
    rest = A.shape[1:]
    B = A.reshape(ncells, n, *rest)
    out = np.zeros((ncells * P + 1, *rest))
    out[:ncells * P] += B[:, :P].reshape(ncells * P, *rest)
    out[P::P] += B[:, P]
    return out


def stiffness_apply_mm_pair(op: MMStiffness, x1: jax.Array, x2: jax.Array,
                            c1_e: jax.Array, c2_e: jax.Array) -> jax.Array:
    """y = A_c1(x1) + A_c2(x2) in ONE contraction pass.

    Per-cell coefficients are constant within each cell, so they commute
    with the within-cell derivative contractions once the fields are in
    the expanded (windowed) layout: combine u = c1_e*E(x1) + c2_e*E(x2)
    there and run a single unit-coefficient middle+fold.  Halves the
    heavy work of the heterogeneous Westervelt stage, which needs
    A_{-1/rho}(u) + A_{-delta/(rho c^2)}(v) (the reference launches two
    stiffness kernels, cuda/demo_nonlinear_bowl.py:618-625)."""
    u = expand(op, x1) * c1_e + expand(op, x2) * c2_e
    w = [_axis_mm(op.Dt[ax], u, ax) for ax in range(3)]
    G = op.G
    idx = ((0, 1, 2), (1, 3, 4), (2, 4, 5))
    f = [G[a] * w[0] + G[b] * w[1] + G[c] * w[2] for a, b, c in idx]
    r = sum(_axis_mm(op.Dt[ax], f[ax], ax, transpose=True) for ax in range(3))
    return fold(op, r)


def mass_diagonal(nc, P: int, detJ_cells: np.ndarray,
                  coeff: np.ndarray | None = None) -> np.ndarray:
    """The assembled (global) mass diagonal, float64 host: fold of
    detJ * coeff over cells.  Apply = x * diag.

    Strided in-place accumulation: global node (a*P+i, b*P+j, c*P+k) is
    the step-P slice out[i::P, j::P, k::P], so the fold is n^3 strided
    adds of (ncx, ncy, ncz) blocks — no expanded-layout transpose, no
    window matmuls (the transpose path measured ~30 s at 67M DOF;
    setup-time work, BENCH_NOTES r4)."""
    n = P + 1
    ncx, ncy, ncz = nc
    dJ = detJ_cells.reshape(ncx, ncy, ncz, n, n, n)
    if coeff is not None:
        dJ = dJ * np.asarray(coeff)[..., None, None, None]
    out = np.zeros((ncx * P + 1, ncy * P + 1, ncz * P + 1))
    for i in range(n):
        oi = out[i::P][:ncx] if i < P else out[P::P]
        for j in range(n):
            oj = oi[:, j::P][:, :ncy] if j < P else oi[:, P::P]
            for k in range(n):
                ok = (oj[:, :, k::P][:, :, :ncz] if k < P
                      else oj[:, :, P::P])
                ok += dJ[:, :, :, i, j, k]
    return out
