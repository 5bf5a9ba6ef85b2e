"""Fully-fused Pallas TPU kernel for the sum-factorised stiffness apply.

One apply is ONE pass: the kernel reads the node grid and the geometry
factors from HBM and writes the node-grid result — window expansion, all
three derivative contractions, the G metric transform, reverse
contractions, and the overlap-add fold all happen in VMEM.  (Round-1 of
this kernel materialised the x/y-expanded field and a pre-fold output in
HBM — roughly four extra full-field passes per apply.)

Structure (the role of the reference's one-block-per-cell shared-memory
CUDA kernel, /root/reference/cuda/operators.py:73-192, re-thought for a
VMEM+MXU machine):

- grid (ncx + 1, n): the outer dimension walks x-slabs of cells in order;
  the inner dimension phases the geometry stream one x-node-plane at a
  time so the G block stays small.  Both dimensions are sequential
  ("arbitrary") — slab i+1 depends on slab i through the overlap carry.
- per slab, the full (ey, ez) = (ncy*n, ncz*n) expanded y-z extent is
  resident in VMEM; y and z contractions are 2D MXU matmuls against the
  window / block-diagonal derivative matrices, the x (cross-plane)
  contraction is static-scalar VPU arithmetic with the 1D derivative
  matrix baked in as compile-time constants.
- the x-direction overlap-add between consecutive slabs is carried in a
  VMEM scratch plane (sequential grid), so output rows are written exactly
  once; a final flush step (grid index ncx) writes the carry as the last
  node plane.  The output is padded to (ncx+1)*P rows; callers slice
  [:gx], which XLA fuses into consumers.

Precision: matmuls run either at f32 HIGHEST (Mosaic emulates f32 on the
bf16 MXU at ~18x FLOP cost) or as a manual bf16x3 decomposition
(a@b = ah@bh + ah@bl + al@bh, dropping only the ~2^-18 lo*lo term).  The
0/1 window matrices are exactly representable in bf16, so their products
need only two terms.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fustpu.ops import spectral_mm as mm

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
class PallasStiffness:
    """Operator container: device arrays as pytree children, the 1D
    derivative matrix as STATIC aux data (baked into the kernel as
    compile-time scalars)."""

    def __init__(self, G, Wy, WzT, Dey, Dez, D_host: tuple):
        self.G = G            # (ncx, n, 6, ey, ez)
        self.Wy = Wy          # (ey, gy) 0/1 window
        self.WzT = WzT        # (gz, ez) 0/1 window, transposed
        self.Dey = Dey        # (ey, ey) block-diag D
        self.Dez = Dez        # (ez, ez) block-diag D
        self.D_host = D_host  # tuple-of-tuples of floats (hashable)

    def tree_flatten(self):
        return (self.G, self.Wy, self.WzT, self.Dey, self.Dez), self.D_host

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, D_host=aux)


def pack_G(G_cells: np.ndarray, nc, n: int,
           coeff: np.ndarray | None = None) -> np.ndarray:
    """(cells, n^3, 6) geometry factors -> (ncx, n, 6, ey, ez) kernel
    layout (per x-slab, per x-node-plane), with an optional per-cell
    coefficient folded in."""
    ncx, ncy, ncz = nc
    Ge = mm.to_expanded_layout(G_cells, nc, n)        # (ex, ey, ez, 6)
    if coeff is not None:
        Ge = Ge * mm.expand_cell_field(np.asarray(coeff), n)[..., None]
    Ge = Ge.reshape(ncx, n, ncy * n, ncz * n, 6)
    return np.ascontiguousarray(Ge.transpose(0, 1, 4, 2, 3))


def build(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray, dtype,
          coeff: np.ndarray | None = None) -> PallasStiffness:
    """Same inputs as spectral_mm.build_stiffness."""
    n = P + 1
    _, ncy, ncz = nc
    return PallasStiffness(
        G=jnp.asarray(pack_G(G_cells, nc, n, coeff), dtype),
        Wy=jnp.asarray(mm.window_matrix(ncy, P), dtype),
        WzT=jnp.asarray(mm.window_matrix(ncz, P).T, dtype),
        Dey=jnp.asarray(mm.deriv_block_matrix(ncy, D_1d), dtype),
        Dez=jnp.asarray(mm.deriv_block_matrix(ncz, D_1d), dtype),
        D_host=tuple(map(tuple, np.asarray(D_1d, np.float64))),
    )


def _mk_matmul(precision, f32):
    """2D dot with contraction dims; bf16x3 drops only the lo*lo term and
    skips the lo term entirely for operands flagged exact-in-bf16 (the 0/1
    window matrices)."""

    def split(a):
        hi = a.astype(jnp.bfloat16).astype(f32)
        return hi, a - hi

    def matmul(a, b, dims, a_exact=False, b_exact=False):
        dn = (dims, ((), ()))
        if precision == "bf16x3":
            d = lambda p, q: jax.lax.dot_general(
                p, q, dn, preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)
            ah, al = (a, None) if a_exact else split(a)
            bh, bl = (b, None) if b_exact else split(b)
            out = d(ah, bh)
            if bl is not None:
                out = out + d(ah, bl)
            if al is not None:
                out = out + d(al, bh)
            return out
        return jax.lax.dot_general(a, b, dn, preferred_element_type=f32,
                                   precision=precision)

    return matmul


def _mk_kernel(n: int, P: int, ncx: int, D: tuple, precision):
    """Kernel specialised for degree (n = P+1) with D as static scalars."""

    def kernel(*refs):
        x_refs = refs[:n]                      # n x-node planes (1, gy, gz)
        G_ref, Wy_ref, WzT_ref, Dey_ref, Dez_ref, o_ref, u_sc, r_sc, xc_sc \
            = refs[n:]
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))

        @pl.when(jnp.logical_and(i < ncx, s == 0))
        def _expand():
            # u_p = Wy @ x_p @ Wz^T for every plane of the slab
            Wy, WzT = Wy_ref[...], WzT_ref[...]
            for p in range(n):
                t = matmul(Wy, x_refs[p][0], C10, a_exact=True)
                u_sc[p] = matmul(t, WzT, C10, b_exact=True)
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)

        # process x-node plane q = s with its geometry block (unrolled so
        # the static D scalars and scratch slots are compile-time indexed)
        for q in range(n):
            @pl.when(jnp.logical_and(i < ncx, s == q))
            def _plane(q=q):
                Dey, Dez = Dey_ref[...], Dez_ref[...]
                u_q = u_sc[q]
                wx = None
                for r in range(n):
                    term = D[q][r] * u_sc[r]
                    wx = term if wx is None else wx + term
                wy = matmul(Dey, u_q, C10)
                wz = matmul(u_q, Dez, ((1,), (1,)))
                G = lambda m: G_ref[0, 0, m]
                f0 = G(0) * wx + G(1) * wy + G(2) * wz
                f1 = G(1) * wx + G(3) * wy + G(4) * wz
                f2 = G(2) * wx + G(4) * wy + G(5) * wz
                ryz = matmul(Dey, f1, ((0,), (0,))) + matmul(f2, Dez, C10)
                for p in range(n):
                    add = D[q][p] * f0 + (ryz if p == q else 0.0)
                    r_sc[p] += add

        @pl.when(jnp.logical_and(i < ncx, s == n - 1))
        def _fold():
            # z-fold, y-fold, x overlap-add via the carry plane
            Wy, WzT = Wy_ref[...], WzT_ref[...]
            for p in range(n):
                z = matmul(r_sc[p], WzT, ((1,), (1,)), b_exact=True)
                F = matmul(Wy, z, ((0,), (0,)), a_exact=True)
                if p == 0:
                    # select, not multiply: the carry is uninitialised
                    # (possibly NaN) at the first slab
                    o_ref[0] = F + jnp.where(i > 0, xc_sc[...],
                                             jnp.zeros(F.shape, f32))
                elif p < P:
                    o_ref[p] = F
                else:
                    xc_sc[...] = F

        @pl.when(jnp.logical_and(i == ncx, s == n - 1))
        def _flush():
            o_ref[0] = xc_sc[...]
            for p in range(1, P):
                o_ref[p] = jnp.zeros_like(xc_sc)

    return kernel


def _pad(d: int, m: int) -> int:
    return -(-d // m) * m


def _vmem_bytes(n, ncy, ncz, gy, gz, itemsize=4) -> int:
    """Estimated VMEM footprint of the fused kernel (scratch + double-
    buffered blocks + live temporaries)."""
    ey, ez = ncy * n, ncz * n
    ezp, gzp = _pad(ez, 128), _pad(gz, 128)
    eyp, gyp = _pad(ey, 8), _pad(gy, 8)
    slab = eyp * ezp * itemsize
    plane_io = gyp * gzp * itemsize
    u = n * slab
    racc = n * slab
    g_blk = 2 * 6 * slab                       # double-buffered
    x_in = 2 * n * plane_io                    # n unit planes, double-buffered
    out = 2 * (n - 1) * plane_io
    xc = plane_io
    mats = 2 * (eyp * gyp + gzp * ezp + eyp * eyp + ezp * ezp) * itemsize
    temps = 8 * slab                           # wx/wy/wz/f*/splits
    return u + racc + g_blk + x_in + out + xc + mats + temps


def pallas_fits(n, ncy, ncz, gz) -> bool:
    P = n - 1
    gy = ncy * P + 1
    return _vmem_bytes(n, ncy, ncz, gy, gz) < 14 * 2**20


def _slab_sizes(ncy: int, k: int) -> list:
    """Near-equal partition of ncy cells into k y-slabs."""
    return [ncy // k + (1 if j < ncy % k else 0) for j in range(k)]


def pick_y_parts(n, ncy, ncz, gz, max_parts: int = 16) -> list | None:
    """Partition ncy into the fewest near-equal y-slabs whose single-slab
    working sets fit VMEM (None if even ncy_j = 1 does not fit, e.g. an
    oversized z extent).  Lets the fused kernel cover meshes whose full
    y-z extent exceeds VMEM: the operator is cell-local, so the apply is
    run per y-slab and the single shared plane overlap-added in XLA."""
    for k in range(1, min(max_parts, ncy) + 1):
        sizes = _slab_sizes(ncy, k)
        if pallas_fits(n, max(sizes), ncz, gz):
            return sizes
    return None


@jax.tree_util.register_pytree_node_class
class PallasStiffnessSplit:
    """Y-slab-partitioned operator: a tuple of per-slab PallasStiffness
    ops plus their (static) cell counts.  Applying runs the fused kernel
    per slab and overlap-adds the shared planes (cells are partitioned,
    so each contribution is computed exactly once)."""

    def __init__(self, parts: tuple, y_sizes: tuple):
        self.parts = tuple(parts)
        self.y_sizes = tuple(y_sizes)

    def tree_flatten(self):
        return self.parts, self.y_sizes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children, aux)


def build_auto(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray, dtype,
               coeff: np.ndarray | None = None, force_parts: int = 0):
    """build(), or a PallasStiffnessSplit when the full y-z extent does
    not fit VMEM (force_parts > 1 forces a split, for tests)."""
    n = P + 1
    ncx, ncy, ncz = nc
    gz = ncz * P + 1
    if force_parts > 1:
        sizes = _slab_sizes(ncy, min(force_parts, ncy))
    else:
        sizes = pick_y_parts(n, ncy, ncz, gz)
        if sizes is None:
            raise ValueError("no VMEM-feasible y partition for this mesh")
    if len(sizes) == 1:
        # a single-part "split" is just the plain operator (the split
        # apply's concat logic assumes >= 2 slabs)
        return build(nc, P, D_1d, G_cells, dtype, coeff)
    Gc = G_cells.reshape(ncx, ncy, ncz, *G_cells.shape[1:])
    cf = (None if coeff is None
          else np.asarray(coeff).reshape(ncx, ncy, ncz))
    parts, off = [], 0
    for s in sizes:
        Gj = np.ascontiguousarray(
            Gc[:, off:off + s]).reshape(ncx * s * ncz, *G_cells.shape[1:])
        cj = None if cf is None else cf[:, off:off + s]
        parts.append(build((ncx, s, ncz), P, D_1d, Gj, dtype, cj))
        off += s
    return PallasStiffnessSplit(tuple(parts), tuple(sizes))


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def stiffness_apply_pallas(op, x: jax.Array,
                           interpret: bool = False,
                           precision="auto") -> jax.Array:
    """Dispatch: single fused-kernel apply, or per-y-slab applies with a
    shared-plane overlap-add for PallasStiffnessSplit operators."""
    if isinstance(op, PallasStiffnessSplit):
        P = op.parts[0].G.shape[1] - 1
        ys, off = [], 0
        for part, s in zip(op.parts, op.y_sizes):
            ys.append(_apply_single(part, x[:, off * P:(off + s) * P + 1],
                                    interpret, precision))
            off += s
        # one concatenate: interior of each slab + summed shared planes
        pieces = [ys[0][:, :-1]]
        for a, b in zip(ys[:-1], ys[1:]):
            pieces.append(a[:, -1:] + b[:, :1])
            pieces.append(b[:, 1:-1])
        pieces[-1] = ys[-1][:, 1:]
        return jnp.concatenate(pieces, axis=1)
    return _apply_single(op, x, interpret, precision)


def _apply_single(op: PallasStiffness, x: jax.Array,
                  interpret: bool = False,
                  precision="auto") -> jax.Array:
    """y_grid = A_stiff(x_grid) in one fused pass.  `precision` controls
    the in-kernel y/z matmuls (the cross-plane x contraction is always
    exact static-scalar arithmetic).

    "auto" = "bf16x3" for f32/bf16 fields, HIGHEST for f64.  bf16x3 is the
    validated f32 default: operator rel-err ~1e-5 vs f64 across P=2..6,
    1000-step Westervelt energy ratio 1.0000003 and waveform rel-err
    1.7e-5 vs the full-f32 kernel, at ~2.3x the speed.  Precision.HIGHEST
    gives full f32 via Mosaic's ~18x-cost emulation."""
    if precision == "auto":
        precision = _HI if x.dtype == jnp.float64 else "bf16x3"
    ncx, n, _, ey, ez = op.G.shape
    gx, gy, gz = x.shape
    P = n - 1
    ncy, ncz = ey // n, ez // n
    if not pallas_fits(n, ncy, ncz, gz):
        raise ValueError(
            "no VMEM-feasible tiling for this mesh; use the mm path")

    def x_spec(p):
        return pl.BlockSpec(
            (1, gy, gz),
            lambda i, s, p=p: (jnp.minimum(i * P + p, gx - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def g_index(i, s):
        return (jnp.minimum(i, ncx - 1),
                jnp.where(i == ncx, n - 1, s), 0, 0, 0)

    kernel = _mk_kernel(n, P, ncx, op.D_host, precision)
    vmem = pltpu.VMEM
    dtype = x.dtype
    out = pl.pallas_call(
        kernel,
        grid=(ncx + 1, n),
        in_specs=[x_spec(p) for p in range(n)] + [
            pl.BlockSpec((1, 1, 6, ey, ez), g_index, memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),   # Wy
            pl.BlockSpec(memory_space=vmem),   # WzT
            pl.BlockSpec(memory_space=vmem),   # Dey
            pl.BlockSpec(memory_space=vmem),   # Dez
        ],
        out_specs=pl.BlockSpec((P, gy, gz), lambda i, s: (i, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct(((ncx + 1) * P, gy, gz), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, ey, ez), dtype),    # u planes
            pltpu.VMEM((n, ey, ez), dtype),    # reverse accumulators
            pltpu.VMEM((gy, gz), dtype),       # x overlap carry
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([x] * n), op.G, op.Wy, op.WzT, op.Dey, op.Dez)
    return out[:gx]
