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
    window matrices).  All splits happen IN-KERNEL on full-precision
    operands (Mosaic CSEs repeated splits at no cost).  Tuple operands
    ((hi, lo) bf16 pairs) remain accepted for the bf16x3 path, but must
    NOT be produced outside the kernel: bf16 matrices passed as pallas
    inputs are numerically lossy on TPU Mosaic (~8.6e-4 operator error
    vs ~1e-5 — the r3 pre-split regression, BENCH_NOTES r4)."""

    def split(a):
        hi = a.astype(jnp.bfloat16)
        return hi, (a - hi.astype(f32)).astype(jnp.bfloat16)

    def matmul(a, b, dims, a_exact=False, b_exact=False):
        dn = (dims, ((), ()))
        if precision in ("bf16x3", "bf16x3w"):
            d = lambda p, q: jax.lax.dot_general(
                p, q, dn, preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)
            exact = lambda m: (m.astype(jnp.bfloat16), None)
            ah, al = (a if isinstance(a, tuple)
                      else (exact(a) if a_exact else split(a)))
            bh, bl = (b if isinstance(b, tuple)
                      else (exact(b) if b_exact else split(b)))
            if precision == "bf16x3w" and not (al is None and bl is None):
                # WIDE form: one dispatch computes all hi/lo products.
                # At this kernel's operand sizes ~80% of MXU time is
                # per-dispatch overhead (BENCH_NOTES r3 width microbench:
                # 39 -> 61 -> 85 TFLOP/s at N=160/320/640), so a single
                # (2M, K) x (K, 2N) op — 4/3 the FLOPs incl. the
                # discarded lo*lo block — beats three narrow ones.
                afree = 1 - dims[0][0]
                bfree = 1 - dims[1][0]
                M = ah.shape[afree]
                N = bh.shape[bfree]
                aa = (ah if al is None
                      else jnp.concatenate([ah, al], axis=afree))
                bb = (bh if bl is None
                      else jnp.concatenate([bh, bl], axis=bfree))
                r = d(aa, bb)                   # (A*, B*) free-dim order
                out = r[:M, :N]
                if bl is not None:
                    out = out + r[:M, N:]
                if al is not None:
                    out = out + r[M:, :N]
                return out
            out = d(ah, bh)
            if bl is not None:
                out = out + d(ah, bl)
            if al is not None:
                out = out + d(al, bh)
            return out
        def unsplit(m):
            # reconstruct full precision from a bf16 (hi, lo) pair in f32
            # (adding in bf16 would re-round away the lo part)
            if not isinstance(m, tuple):
                return m
            hi, lo = m
            hi = hi.astype(f32)
            return hi if lo is None else hi + lo.astype(f32)

        return jax.lax.dot_general(unsplit(a), unsplit(b), dn,
                                   preferred_element_type=f32,
                                   precision=precision)

    return matmul


def _mk_kernel(n: int, P: int, ncx: int, D: tuple, precision):
    """Kernel specialised for degree (n = P+1) with D as static scalars.
    Window/derivative matrices arrive at full precision; bf16x3 splits
    happen per matmul in-kernel (CSE'd by Mosaic)."""
    # python floats are weak-typed (np.float64 scalars would promote the
    # whole accumulation chain to f64 under x64)
    D = tuple(tuple(float(v) for v in row) for row in D)

    def kernel(*refs):
        x_refs = refs[:n]                      # n x-node planes (1, gy, gz)
        (G_ref, Wy_ref, WzT_ref, Dey_ref, Dez_ref, o_ref, u_sc, r_sc,
         xc_sc) = refs[n:]
        mats = lambda: (Wy_ref[...], WzT_ref[...], Dey_ref[...],
                        Dez_ref[...])
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))

        @pl.when(jnp.logical_and(i < ncx, s == 0))
        def _expand():
            # u_p = Wy @ x_p @ Wz^T for every plane of the slab
            Wy, WzT, _, _ = mats()
            for p in range(n):
                t = matmul(Wy, x_refs[p][0], C10, a_exact=True)
                u_sc[p] = matmul(t, WzT, C10, b_exact=True)
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)

        # process x-node plane q = s with its geometry block (unrolled so
        # the static D scalars and scratch slots are compile-time indexed)
        for q in range(n):
            @pl.when(jnp.logical_and(i < ncx, s == q))
            def _plane(q=q):
                _, _, Dey, Dez = mats()
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
            Wy, WzT, _, _ = mats()
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


def _split_mats(op, precision):
    """Matrix inputs for the kernel: ALWAYS the full-precision originals.
    (An r3 micro-optimisation passed bf16 (hi, lo) pre-splits as kernel
    inputs in bf16x3 mode; measured perf-NEUTRAL at the time, and in r4
    found to be numerically LOSSY on TPU Mosaic — ~8.6e-4 operator error
    vs the validated ~1e-5 with in-kernel splits, which Mosaic CSEs at no
    cost.  Splits happen inside _mk_matmul.)"""
    del precision
    return [op.Wy, op.WzT, op.Dey, op.Dez]


# ---------------------------------------------------------------------------
# Two-slab kernel (EXPERIMENTAL, measured NET LOSS — kept as a recorded
# negative result): consecutive x-slab PAIRS side by side in 128-aligned
# lane halves, so the y contractions dispatch once at double width
# (~80% of the kernel's MXU time is per-dispatch overhead, BENCH_NOTES
# r3).  Bit-exact vs the production kernel, but measured 2.76 ms vs
# 0.42 at P=4/32^3 — the partial-width lane-half scratch updates
# (u_sc[p, :, off:off+ez]) fall off a Mosaic vectorization cliff that
# dwarfs the dispatch savings.  Not reachable from any production path.
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class PallasStiffness2:
    """Two-slab operator: G packed per slab PAIR with each slab's planes
    in a 128-aligned lane half; ncx padded to even with a zero-G ghost
    slab."""

    def __init__(self, G2, Wy, WzT, Dey, Dez, statics: tuple):
        self.G2 = G2          # (ncx2, n, 6, ey, 2, ezp) zero-padded lanes
        self.Wy = Wy
        self.WzT = WzT
        self.Dey = Dey
        self.Dez = Dez
        self.statics = statics  # (D_host, ncx_true, ez)

    def tree_flatten(self):
        return ((self.G2, self.Wy, self.WzT, self.Dey, self.Dez),
                self.statics)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


def build_slab2(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray, dtype,
                coeff: np.ndarray | None = None) -> PallasStiffness2:
    n = P + 1
    ncx, ncy, ncz = nc
    ez = ncz * n
    ezp = _pad(ez, 128)
    Gp = pack_G(G_cells, nc, n, coeff)               # (ncx, n, 6, ey, ez)
    ncx2 = -(-ncx // 2)
    G2 = np.zeros((2 * ncx2, n, 6, ncy * n, ezp))
    G2[:ncx, ..., :ez] = Gp
    G2 = np.ascontiguousarray(
        G2.reshape(ncx2, 2, n, 6, ncy * n, ezp).transpose(0, 2, 3, 4, 1, 5))
    return PallasStiffness2(
        G2=jnp.asarray(G2, dtype),
        Wy=jnp.asarray(mm.window_matrix(ncy, P), dtype),
        WzT=jnp.asarray(mm.window_matrix(ncz, P).T, dtype),
        Dey=jnp.asarray(mm.deriv_block_matrix(ncy, D_1d), dtype),
        Dez=jnp.asarray(mm.deriv_block_matrix(ncz, D_1d), dtype),
        statics=(tuple(map(tuple, np.asarray(D_1d, np.float64))), ncx, ez),
    )


def _mk_kernel_slab2(n: int, P: int, ncx: int, ncx2: int, ez: int,
                     ezp: int, D: tuple, precision):
    """Per grid step I: slabs (2I, 2I+1) in lane halves [0:ezp] and
    [ezp:2ezp] of the scratch planes.  The y contractions and the
    x-direction VPU work run once over the full double-width planes; the
    z contractions and window expand/fold run per half (Dez couples only
    within a slab's own z extent)."""
    D = tuple(tuple(float(v) for v in row) for row in D)

    def kernel(*refs):
        x_refs = refs[:2 * n]                 # n planes per slab
        (G_ref, Wy_ref, WzT_ref, Dey_ref, Dez_ref, o_ref, u_sc, r_sc,
         xc_sc) = refs[2 * n:]
        mats = lambda: (Wy_ref[...], WzT_ref[...], Dey_ref[...],
                        Dez_ref[...])
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))
        H = (slice(0, ez), slice(ezp, ezp + ez))   # real lanes per half

        @pl.when(jnp.logical_and(i < ncx2, s == 0))
        def _expand():
            Wy, WzT, _, _ = mats()
            for p in range(n):
                for h in range(2):
                    t = matmul(Wy, x_refs[h * n + p][0], C10, a_exact=True)
                    u_sc[p, :, H[h]] = matmul(t, WzT, C10, b_exact=True)
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)

        for q in range(n):
            @pl.when(jnp.logical_and(i < ncx2, s == q))
            def _plane(q=q):
                _, _, Dey, Dez = mats()
                u_q = u_sc[q]                      # (ey, 2*ezp) both slabs
                wx = None
                for r in range(n):
                    term = D[q][r] * u_sc[r]
                    wx = term if wx is None else wx + term
                wy = matmul(Dey, u_q, C10)         # ONE double-width dispatch
                G = lambda m, h: G_ref[0, 0, m, :, h, :ez]
                for h in range(2):
                    wz_h = matmul(u_sc[q, :, H[h]], Dez, ((1,), (1,)))
                    wx_h = wx[:, H[h]]
                    wy_h = wy[:, H[h]]
                    f0 = (G(0, h) * wx_h + G(1, h) * wy_h
                          + G(2, h) * wz_h)
                    f1 = (G(1, h) * wx_h + G(3, h) * wy_h
                          + G(4, h) * wz_h)
                    f2 = (G(2, h) * wx_h + G(4, h) * wy_h
                          + G(5, h) * wz_h)
                    ryz = (matmul(Dey, f1, ((0,), (0,)))
                           + matmul(f2, Dez, C10))
                    for p in range(n):
                        if p == q:
                            r_sc[p, :, H[h]] += D[q][p] * f0 + ryz
                        else:
                            r_sc[p, :, H[h]] += D[q][p] * f0

        @pl.when(jnp.logical_and(i < ncx2, s == n - 1))
        def _fold():
            Wy, WzT, _, _ = mats()
            # fold both slabs; within the pair, slab A's last plane
            # overlap-adds into slab B's first; B's last becomes the
            # cross-step carry
            F = [[None] * n, [None] * n]
            for h in range(2):
                for p in range(n):
                    z = matmul(r_sc[p, :, H[h]], WzT, ((1,), (1,)),
                               b_exact=True)
                    F[h][p] = matmul(Wy, z, ((0,), (0,)), a_exact=True)
            o_ref[0] = F[0][0] + jnp.where(i > 0, xc_sc[...],
                                           jnp.zeros(F[0][0].shape, f32))
            for p in range(1, P):
                o_ref[p] = F[0][p]
            o_ref[P] = F[0][P] + F[1][0]
            for p in range(1, P):
                o_ref[P + p] = F[1][p]
            xc_sc[...] = F[1][P]

        @pl.when(jnp.logical_and(i == ncx2, s == n - 1))
        def _flush():
            o_ref[0] = xc_sc[...]
            for p in range(1, 2 * P):
                o_ref[p] = jnp.zeros_like(xc_sc)

    return kernel


def _apply_slab2(op: PallasStiffness2, x: jax.Array,
                 interpret: bool = False, precision="auto") -> jax.Array:
    if precision == "auto":
        precision = _HI if x.dtype == jnp.float64 else "bf16x3"
    D_host, ncx, ez = op.statics
    ncx2, n = op.G2.shape[0], op.G2.shape[1]
    ey = op.Dey.shape[0]
    ezp = op.G2.shape[5]
    gx, gy, gz = x.shape
    P = n - 1
    ncy, ncz = ey // n, ez // n
    if not pallas_fits(n, ncy, ncz, gz):
        raise ValueError("no VMEM-feasible tiling; use the mm path")

    def x_spec(h, p):
        return pl.BlockSpec(
            (1, gy, gz),
            lambda i, s, h=h, p=p: (
                jnp.minimum(i * 2 * P + h * P + p, gx - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def g_index(i, s):
        return (jnp.minimum(i, ncx2 - 1),
                jnp.where(i == ncx2, n - 1, s), 0, 0, 0, 0)

    kernel = _mk_kernel_slab2(n, P, ncx, ncx2, ez, ezp, D_host, precision)
    vmem = pltpu.VMEM
    dtype = x.dtype
    mats = _split_mats(op, precision)
    out = pl.pallas_call(
        kernel,
        grid=(ncx2 + 1, n),
        in_specs=[x_spec(h, p) for h in range(2) for p in range(n)] + [
            pl.BlockSpec((1, 1, 6, ey, 2, ezp), g_index,
                         memory_space=vmem),
        ] + [pl.BlockSpec(memory_space=vmem) for _ in mats],
        out_specs=pl.BlockSpec((2 * P, gy, gz), lambda i, s: (i, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct(((ncx2 + 1) * 2 * P, gy, gz),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((n, ey, 2 * ezp), dtype),
            pltpu.VMEM((n, ey, 2 * ezp), dtype),
            pltpu.VMEM((gy, gz), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*[x] * (2 * n), op.G2, *mats)
    return out[:gx]


# ---------------------------------------------------------------------------
# Two-slab FULL-WIDTH kernel (EXPERIMENTAL — the one dispatch-widening
# form the slab2 negative left untried, VERDICT r4 #8): slabs i and
# i + ncx/2 packed CONTIGUOUSLY on the lane axis (lanes [0:ez] slab A,
# [ez:2ez] slab B — both halves real work), so every plane op runs once
# at (ey, 2ez) with NO partial-lane writes: the packing happens inside
# full-width MATMULS against [WzT | 0] / [0 | WzT] placement matrices
# and a block-diagonal Dez2, never via lane-slice assignment (the
# vectorization cliff that sank slab2).  Far pairing makes the two
# sweeps independent (two lane-blocked x-carries); the halves' outputs
# are stitched in XLA.  Real-lane fraction rises from ez/pad(ez) to
# 2ez/pad(2ez) (160/256 -> 320/384 at ncz=32, P=4) — also the lane-pad
# tax lever CLAUDE.md names for the P=8..10 knee.
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class PallasStiffness2W:
    """Full-width two-slab operator: G packed (ncx2, n, 6, ey, 2ez)
    with slab i in lanes [0:ez] and slab ncx2+i in [ez:2ez] (zero-G
    ghost slab pads odd ncx); WzTA/WzTB are the (gz, 2ez) half-placement
    windows, Dez2 the (2ez, 2ez) block-diagonal z derivative."""

    def __init__(self, G2, Wy, WzTA, WzTB, Dey, Dez2, statics: tuple):
        self.G2 = G2
        self.Wy = Wy
        self.WzTA = WzTA
        self.WzTB = WzTB
        self.Dey = Dey
        self.Dez2 = Dez2
        self.statics = statics  # (D_host, ncx_true, ez)

    def tree_flatten(self):
        return ((self.G2, self.Wy, self.WzTA, self.WzTB, self.Dey,
                 self.Dez2), self.statics)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


def build_slab2w(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray, dtype,
                 coeff: np.ndarray | None = None) -> PallasStiffness2W:
    n = P + 1
    ncx, ncy, ncz = nc
    ez = ncz * n
    gz = ncz * P + 1
    Gp = pack_G(G_cells, nc, n, coeff)               # (ncx, n, 6, ey, ez)
    ncx2 = -(-ncx // 2)
    G2 = np.zeros((2 * ncx2, n, 6, ncy * n, ez))
    G2[:ncx] = Gp
    # far pairing: lanes [0:ez] slab i, [ez:2ez] slab ncx2 + i
    G2 = np.concatenate([G2[:ncx2], G2[ncx2:]], axis=4)
    WzT = mm.window_matrix(ncz, P).T                 # (gz, ez)
    WzTA = np.zeros((gz, 2 * ez))
    WzTA[:, :ez] = WzT
    WzTB = np.zeros((gz, 2 * ez))
    WzTB[:, ez:] = WzT
    Dez = mm.deriv_block_matrix(ncz, D_1d)
    Dez2 = np.zeros((2 * ez, 2 * ez))
    Dez2[:ez, :ez] = Dez
    Dez2[ez:, ez:] = Dez
    return PallasStiffness2W(
        G2=jnp.asarray(np.ascontiguousarray(G2), dtype),
        Wy=jnp.asarray(mm.window_matrix(ncy, P), dtype),
        WzTA=jnp.asarray(WzTA, dtype),
        WzTB=jnp.asarray(WzTB, dtype),
        Dey=jnp.asarray(mm.deriv_block_matrix(ncy, D_1d), dtype),
        Dez2=jnp.asarray(Dez2, dtype),
        statics=(tuple(map(tuple, np.asarray(D_1d, np.float64))), ncx, ez),
    )


def _mk_kernel_slab2w(n: int, P: int, ncx2: int, D: tuple, precision):
    """Per grid step i: slabs i (lanes [0:ez]) and ncx2+i ([ez:2ez]).
    Identical phase structure to the production kernel with every plane
    (ey, 2ez); the ONLY half-aware pieces are the placement-matmul
    expansion/fold and the two (gy, gz) carry planes."""
    D = tuple(tuple(float(v) for v in row) for row in D)

    def kernel(*refs):
        x_refs = refs[:2 * n]
        (G_ref, Wy_ref, WzTA_ref, WzTB_ref, Dey_ref, Dez2_ref, o_ref,
         u_sc, r_sc, xc_sc) = refs[2 * n:]
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))

        @pl.when(jnp.logical_and(i < ncx2, s == 0))
        def _expand():
            Wy = Wy_ref[...]
            WzH = (WzTA_ref[...], WzTB_ref[...])
            for p in range(n):
                acc = None
                for h in range(2):
                    t = matmul(Wy, x_refs[h * n + p][0], C10,
                               a_exact=True)
                    term = matmul(t, WzH[h], C10, b_exact=True)
                    acc = term if acc is None else acc + term
                u_sc[p] = acc
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)

        for q in range(n):
            @pl.when(jnp.logical_and(i < ncx2, s == q))
            def _plane(q=q):
                Dey, Dez2 = Dey_ref[...], Dez2_ref[...]
                u_q = u_sc[q]                     # (ey, 2ez) both slabs
                wx = None
                for r in range(n):
                    term = D[q][r] * u_sc[r]
                    wx = term if wx is None else wx + term
                wy = matmul(Dey, u_q, C10)
                wz = matmul(u_q, Dez2, ((1,), (1,)))
                G = lambda m: G_ref[0, 0, m]
                f0 = G(0) * wx + G(1) * wy + G(2) * wz
                f1 = G(1) * wx + G(3) * wy + G(4) * wz
                f2 = G(2) * wx + G(4) * wy + G(5) * wz
                ryz = (matmul(Dey, f1, ((0,), (0,)))
                       + matmul(f2, Dez2, C10))
                for p in range(n):
                    add = D[q][p] * f0 + (ryz if p == q else 0.0)
                    r_sc[p] += add

        @pl.when(jnp.logical_and(i < ncx2, s == n - 1))
        def _fold():
            Wy = Wy_ref[...]
            WzH = (WzTA_ref[...], WzTB_ref[...])
            for h in range(2):
                for p in range(n):
                    z = matmul(r_sc[p], WzH[h], ((1,), (1,)),
                               b_exact=True)
                    F = matmul(Wy, z, ((0,), (0,)), a_exact=True)
                    if p == 0:
                        o_ref[h * P] = F + jnp.where(
                            i > 0, xc_sc[h],
                            jnp.zeros(F.shape, f32))
                    elif p < P:
                        o_ref[h * P + p] = F
                    else:
                        xc_sc[h] = F

        @pl.when(jnp.logical_and(i == ncx2, s == n - 1))
        def _flush():
            o_ref[0] = xc_sc[0]
            o_ref[P] = xc_sc[1]
            for p in range(1, P):
                o_ref[p] = jnp.zeros_like(xc_sc[0])
                o_ref[P + p] = jnp.zeros_like(xc_sc[0])

    return kernel


def _apply_slab2w(op: PallasStiffness2W, x: jax.Array,
                  interpret: bool = False, precision="auto") -> jax.Array:
    if precision == "auto":
        precision = _HI if x.dtype == jnp.float64 else "bf16x3"
    D_host, ncx, ez = op.statics
    ncx2, n = op.G2.shape[0], op.G2.shape[1]
    ey = op.Dey.shape[0]
    gx, gy, gz = x.shape
    P = n - 1

    def x_spec(h, p):
        # half h reads the planes of slab i (h=0) / slab ncx2+i (h=1);
        # ghost-slab reads clamp to the last plane (zero G kills them)
        return pl.BlockSpec(
            (1, gy, gz),
            lambda i, s, h=h, p=p: (
                jnp.minimum((h * ncx2 + i) * P + p, gx - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def g_index(i, s):
        return (jnp.minimum(i, ncx2 - 1),
                jnp.where(i == ncx2, n - 1, s), 0, 0, 0)

    kernel = _mk_kernel_slab2w(n, P, ncx2, D_host, precision)
    vmem = pltpu.VMEM
    dtype = x.dtype
    mats = [op.Wy, op.WzTA, op.WzTB, op.Dey, op.Dez2]
    out = pl.pallas_call(
        kernel,
        grid=(ncx2 + 1, n),
        in_specs=[x_spec(h, p) for h in range(2) for p in range(n)] + [
            pl.BlockSpec((1, 1, 6, ey, 2 * ez), g_index,
                         memory_space=vmem),
        ] + [pl.BlockSpec(memory_space=vmem) for _ in mats],
        out_specs=pl.BlockSpec((2 * P, gy, gz), lambda i, s: (i, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct(((ncx2 + 1) * 2 * P, gy, gz),
                                       dtype),
        scratch_shapes=[
            pltpu.VMEM((n, ey, 2 * ez), dtype),
            pltpu.VMEM((n, ey, 2 * ez), dtype),
            pltpu.VMEM((2, gy, gz), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*[x] * (2 * n), op.G2, *mats)
    # stitch: half A owns global planes [0, ncx2*P] (flush plane last),
    # half B owns [ncx2*P, 2*ncx2*P] — they overlap-add at the seam
    o4 = out.reshape(ncx2 + 1, 2 * P, gy, gz)
    a = o4[:, :P].reshape((ncx2 + 1) * P, gy, gz)
    b = o4[:, P:].reshape((ncx2 + 1) * P, gy, gz)
    seam = ncx2 * P
    y = jnp.concatenate(
        [a[:seam], (a[seam] + b[0])[None], b[1:seam + 1]], axis=0)
    return y[:gx]


# ---------------------------------------------------------------------------
# Pair kernel: y = A_c1(x1) + A_c2(x2) in ONE fused pass.  Per-cell
# coefficients commute with the within-cell contractions in the expanded
# layout, so the two fields combine right after window expansion
# (u = c1_e*E(x1) + c2_e*E(x2)) and everything downstream runs once, with
# ONE unit-coefficient G stream instead of two coefficient-folded copies.
# This is the heterogeneous Westervelt stage (the reference launches two
# stiffness kernels there, cuda/demo_nonlinear_bowl.py:618-625).
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class PallasStiffnessPair:
    """Two-field operator: unit-coefficient G stream + a (ncx, 2, ncy,
    ncz) per-cell coefficient block expanded in-kernel (0/1 matmul along
    z, sublane repeat along y — the corner kernel's machinery)."""

    def __init__(self, G, Wy, WzT, Dey, Dez, C, UzT, D_host: tuple):
        self.G = G            # (ncx, n, 6, ey, ez)
        self.Wy = Wy
        self.WzT = WzT
        self.Dey = Dey
        self.Dez = Dez
        self.C = C            # (ncx, 2, ncy, ncz)
        self.UzT = UzT        # (ncz, ez) 0/1 cell->node expansion
        self.D_host = D_host

    def tree_flatten(self):
        return ((self.G, self.Wy, self.WzT, self.Dey, self.Dez, self.C,
                 self.UzT), self.D_host)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, D_host=aux)


def build_pair(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray, dtype,
               c1_cells: np.ndarray, c2_cells: np.ndarray
               ) -> PallasStiffnessPair:
    """c1/c2: per-cell coefficient fields (any shape broadcastable to
    nc).  Only single-slab meshes (pallas_fits) — callers fall back to
    two coefficient-folded operators otherwise."""
    n = P + 1
    ncx, ncy, ncz = nc
    C = np.stack([np.broadcast_to(np.asarray(c, np.float64), nc)
                  for c in (c1_cells, c2_cells)], axis=1)
    UzT = np.zeros((ncz, ncz * n))
    UzT[np.repeat(np.arange(ncz), n), np.arange(ncz * n)] = 1.0
    return PallasStiffnessPair(
        G=jnp.asarray(pack_G(G_cells, nc, n), dtype),
        Wy=jnp.asarray(mm.window_matrix(ncy, P), dtype),
        WzT=jnp.asarray(mm.window_matrix(ncz, P).T, dtype),
        Dey=jnp.asarray(mm.deriv_block_matrix(ncy, D_1d), dtype),
        Dez=jnp.asarray(mm.deriv_block_matrix(ncz, D_1d), dtype),
        C=jnp.asarray(C, dtype),
        UzT=jnp.asarray(UzT, dtype),
        D_host=tuple(map(tuple, np.asarray(D_1d, np.float64))),
    )


def _mk_kernel_pair(n: int, P: int, ncx: int, D: tuple, precision):
    """Same plane-phased structure as _mk_kernel; the s==0 step expands
    BOTH fields and combines them with the in-kernel-expanded per-cell
    coefficients."""
    D = tuple(tuple(float(v) for v in row) for row in D)

    def kernel(*refs):
        x1_refs = refs[:n]
        x2_refs = refs[n:2 * n]
        (G_ref, C_ref, UzT_ref, Wy_ref, WzT_ref, Dey_ref, Dez_ref,
         o_ref, u_sc, r_sc, xc_sc, ce_sc) = refs[2 * n:]
        mats = lambda: (Wy_ref[...], WzT_ref[...], Dey_ref[...],
                        Dez_ref[...])
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))

        @pl.when(jnp.logical_and(i < ncx, s == 0))
        def _expand():
            Wy, WzT, _, _ = mats()
            UzT_ = UzT_ref[...]
            for m in range(2):
                cell = matmul(C_ref[0, m], UzT_, C10, b_exact=True)
                ce_sc[m] = jnp.repeat(cell, n, axis=0)
            for p in range(n):
                t1 = matmul(Wy, x1_refs[p][0], C10, a_exact=True)
                u1 = matmul(t1, WzT, C10, b_exact=True)
                t2 = matmul(Wy, x2_refs[p][0], C10, a_exact=True)
                u2 = matmul(t2, WzT, C10, b_exact=True)
                u_sc[p] = ce_sc[0] * u1 + ce_sc[1] * u2
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)

        for q in range(n):
            @pl.when(jnp.logical_and(i < ncx, s == q))
            def _plane(q=q):
                _, _, Dey, Dez = mats()
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
            Wy, WzT, _, _ = mats()
            for p in range(n):
                z = matmul(r_sc[p], WzT, ((1,), (1,)), b_exact=True)
                F = matmul(Wy, z, ((0,), (0,)), a_exact=True)
                if p == 0:
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


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def stiffness_apply_pallas_pair(op: PallasStiffnessPair, x1: jax.Array,
                                x2: jax.Array, interpret: bool = False,
                                precision="auto") -> jax.Array:
    """y_grid = A_c1(x1) + A_c2(x2), one fused pass."""
    if precision == "auto":
        precision = _HI if x1.dtype == jnp.float64 else "bf16x3"
    ncx, n, _, ey, ez = op.G.shape
    gx, gy, gz = x1.shape
    P = n - 1
    ncy, ncz = ey // n, ez // n
    if not pallas_fits(n, ncy, ncz, gz, pair=True):
        raise ValueError(
            "no VMEM-feasible tiling for the pair kernel on this mesh; "
            "use two coefficient-folded operators (or the mm path)")

    def x_spec(p):
        return pl.BlockSpec(
            (1, gy, gz),
            lambda i, s, p=p: (jnp.minimum(i * P + p, gx - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def g_index(i, s):
        return (jnp.minimum(i, ncx - 1),
                jnp.where(i == ncx, n - 1, s), 0, 0, 0)

    kernel = _mk_kernel_pair(n, P, ncx, op.D_host, precision)
    vmem = pltpu.VMEM
    dtype = x1.dtype
    mats = _split_mats(op, precision)
    out = pl.pallas_call(
        kernel,
        grid=(ncx + 1, n),
        in_specs=[x_spec(p) for p in range(n)] * 2 + [
            pl.BlockSpec((1, 1, 6, ey, ez), g_index, memory_space=vmem),
            pl.BlockSpec((1, 2, ncy, ncz),
                         lambda i, s: (jnp.minimum(i, ncx - 1), 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),       # UzT
        ] + [pl.BlockSpec(memory_space=vmem) for _ in mats],
        out_specs=pl.BlockSpec((P, gy, gz), lambda i, s: (i, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct(((ncx + 1) * P, gy, gz), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, ey, ez), dtype),    # combined u planes
            pltpu.VMEM((n, ey, ez), dtype),    # reverse accumulators
            pltpu.VMEM((gy, gz), dtype),       # x overlap carry
            pltpu.VMEM((2, ey, ez), dtype),    # expanded coefficients
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([x1] * n), *([x2] * n), op.G, op.C, op.UzT, *mats)
    return out[:gx]


# ---------------------------------------------------------------------------
# Corner-streamed kernel: recompute G in VMEM from per-cell trilinear
# Jacobian coefficients (36 floats/cell + 1 material coefficient) instead of
# streaming 6 floats per quadrature point.  At P=4 the G stream is 85% of
# the apply's HBM traffic (750 floats/cell); the trilinear geometry map
# makes it redundant: J(xi) is linear per variable, so adj(J), det(J) and
# hence G = (w/|det|) adj adj^T are closed-form in 36 per-cell numbers.
# The reference streams precomputed G every launch
# (/root/reference/cuda/operators.py:154-168); a bandwidth-starved,
# VPU-rich machine wants the opposite trade.
# ---------------------------------------------------------------------------

def jacobian_coefficients(corners: np.ndarray,
                          coeff: np.ndarray | None = None) -> np.ndarray:
    """(cells, 8, 3) trilinear corner coordinates -> (cells, 37) float64:
    channels [4p+m] = J[p][0] in monomials {1, y, z, yz}, [12+4p+m] =
    J[p][1] in {1, x, z, xz}, [24+4p+m] = J[p][2] in {1, x, y, xy},
    [36] = per-cell material coefficient (default 1).  Corner id 4a+2b+c
    at reference position (a, b, c) (fustpu.elements.hex)."""
    cells = corners.shape[0]
    Cg = np.asarray(corners, np.float64).reshape(cells, 2, 2, 2, 3)

    def bil(av):
        # (cells, p, 2, 2) nodal values -> (cells, p, 4) monomial coeffs
        a00, a01 = av[..., 0, 0], av[..., 0, 1]
        a10, a11 = av[..., 1, 0], av[..., 1, 1]
        return np.stack([a00, a10 - a00, a01 - a00,
                         a11 - a10 - a01 + a00], -1)

    T = np.empty((cells, 37))
    T[:, 0:12] = bil((Cg[:, 1] - Cg[:, 0]).transpose(0, 3, 1, 2)
                     ).reshape(cells, 12)
    T[:, 12:24] = bil((Cg[:, :, 1] - Cg[:, :, 0]).transpose(0, 3, 1, 2)
                      ).reshape(cells, 12)
    T[:, 24:36] = bil((Cg[:, :, :, 1] - Cg[:, :, :, 0]).transpose(0, 3, 1, 2)
                      ).reshape(cells, 12)
    T[:, 36] = 1.0 if coeff is None else np.asarray(coeff,
                                                    np.float64).reshape(-1)
    return T


@jax.tree_util.register_pytree_node_class
class PallasStiffnessCorner:
    """Corner-streamed fused operator.  JC is the (ncx, 37, ncy, ncz)
    coefficient stream (one DMA per x-slab — ~20x less geometry traffic
    than the G stream at P=4); the small expansion/derivative matrices and
    the per-axis GLL node/weight columns live in VMEM for the whole
    apply."""

    def __init__(self, JC, Wy, WzT, Dey, Dez, UzT, ycol, zrow, wycol, wzrow,
                 statics: tuple):
        self.JC = JC          # (ncx, 37, ncy, ncz)
        self.Wy = Wy          # (ey, gy) 0/1 window
        self.WzT = WzT        # (gz, ez)
        self.Dey = Dey        # (ey, ey)
        self.Dez = Dez        # (ez, ez)
        self.UzT = UzT        # (ncz, ez) 0/1 cell->node expansion
        self.ycol = ycol      # (ey, 1) local xi_y per node row
        self.zrow = zrow      # (1, ez) local xi_z per node column
        self.wycol = wycol    # (ey, 1) 1D GLL weight per node row
        self.wzrow = wzrow    # (1, ez)
        self.statics = statics  # (D, XQ, WQ) tuples of floats (hashable)

    def tree_flatten(self):
        return ((self.JC, self.Wy, self.WzT, self.Dey, self.Dez, self.UzT,
                 self.ycol, self.zrow, self.wycol, self.wzrow), self.statics)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


def build_corner(nc, P: int, D_1d: np.ndarray, corners: np.ndarray, dtype,
                 coeff: np.ndarray | None = None) -> PallasStiffnessCorner:
    """corners: (cells, n^3-agnostic) trilinear (cells, 8, 3) coordinates
    (mesh.cell_corners_flat); coeff: optional per-cell coefficient."""
    from fustpu.elements import gll

    n = P + 1
    ncx, ncy, ncz = nc
    T = jacobian_coefficients(corners, coeff)
    JC = np.ascontiguousarray(
        T.reshape(ncx, ncy, ncz, 37).transpose(0, 3, 1, 2))
    UzT = np.zeros((ncz, ncz * n))
    UzT[np.repeat(np.arange(ncz), n), np.arange(ncz * n)] = 1.0
    nodes = gll.gll_nodes_unit(n)
    wts = gll.gll_points_weights_unit(n)[1]
    return PallasStiffnessCorner(
        JC=jnp.asarray(JC, dtype),
        Wy=jnp.asarray(mm.window_matrix(ncy, P), dtype),
        WzT=jnp.asarray(mm.window_matrix(ncz, P).T, dtype),
        Dey=jnp.asarray(mm.deriv_block_matrix(ncy, D_1d), dtype),
        Dez=jnp.asarray(mm.deriv_block_matrix(ncz, D_1d), dtype),
        UzT=jnp.asarray(UzT, dtype),
        ycol=jnp.asarray(np.tile(nodes, ncy)[:, None], dtype),
        zrow=jnp.asarray(np.tile(nodes, ncz)[None, :], dtype),
        wycol=jnp.asarray(np.tile(wts, ncy)[:, None], dtype),
        wzrow=jnp.asarray(np.tile(wts, ncz)[None, :], dtype),
        statics=(tuple(map(tuple, np.asarray(D_1d, np.float64))),
                 tuple(np.asarray(nodes, np.float64)),
                 tuple(np.asarray(wts, np.float64))),
    )


def _mk_kernel_corner(n: int, P: int, ncx: int, statics: tuple, precision):
    """Corner-streamed kernel: same (ncx+1, n) sequential grid and x-carry
    structure as _mk_kernel, but the s==0 step additionally expands the 37
    coefficient channels into 16 per-slab geometry planes (3 J.0 planes +
    2x3 J.1 pairs + 2x3 J.2 pairs + the scaled-coefficient plane), and
    each plane step evaluates adj(J)/det(J) pointwise on the VPU."""
    D, XQ, WQ = statics
    D = tuple(tuple(float(v) for v in row) for row in D)
    XQ = tuple(float(v) for v in XQ)
    WQ = tuple(float(v) for v in WQ)

    def kernel(*refs):
        x_refs = refs[:n]
        (jc_ref, Wy_ref, WzT_ref, Dey_ref, Dez_ref, UzT_ref, ycol_ref,
         zrow_ref, wycol_ref, wzrow_ref, o_ref, u_sc, r_sc, xc_sc,
         jp_sc) = refs[n:]
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))

        @pl.when(jnp.logical_and(i < ncx, s == 0))
        def _expand():
            Wy, WzT = Wy_ref[...], WzT_ref[...]
            for p in range(n):
                t = matmul(Wy, x_refs[p][0], C10, a_exact=True)
                u_sc[p] = matmul(t, WzT, C10, b_exact=True)
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)
            # geometry setup: cell-resolution channels -> node planes
            # (z-expand via exact 0/1 matmul; y-expand via sublane repeat)
            UzT_ = UzT_ref[...]
            ycol, zrow = ycol_ref[...], zrow_ref[...]

            def ex(m):
                cell = matmul(jc_ref[0, m], UzT_, C10, b_exact=True)
                return jnp.repeat(cell, n, axis=0)

            for p in range(3):
                A, B, C_, E = (ex(4 * p + m) for m in range(4))
                jp_sc[p] = (A + C_ * zrow) + ycol * (B + E * zrow)
            for p in range(3):
                jp_sc[3 + 2 * p] = ex(12 + 4 * p) + ex(14 + 4 * p) * zrow
                jp_sc[4 + 2 * p] = ex(13 + 4 * p) + ex(15 + 4 * p) * zrow
            for p in range(3):
                jp_sc[9 + 2 * p] = ex(24 + 4 * p) + ex(26 + 4 * p) * ycol
                jp_sc[10 + 2 * p] = ex(25 + 4 * p) + ex(27 + 4 * p) * ycol
            jp_sc[15] = ex(36) * wycol_ref[...] * wzrow_ref[...]

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
                xq = XQ[q]
                # J[p][r] planes at this x-node (columns r=1,2 are linear
                # in xi_x; column r=0 is xi_x-independent)
                J00, J10, J20 = jp_sc[0], jp_sc[1], jp_sc[2]
                J01 = jp_sc[3] + xq * jp_sc[4]
                J11 = jp_sc[5] + xq * jp_sc[6]
                J21 = jp_sc[7] + xq * jp_sc[8]
                J02 = jp_sc[9] + xq * jp_sc[10]
                J12 = jp_sc[11] + xq * jp_sc[12]
                J22 = jp_sc[13] + xq * jp_sc[14]
                # adjugate: J^{-1}[r][p] = a_rp / det
                a00 = J11 * J22 - J12 * J21
                a01 = J02 * J21 - J01 * J22
                a02 = J01 * J12 - J02 * J11
                a10 = J12 * J20 - J10 * J22
                a11 = J00 * J22 - J02 * J20
                a12 = J02 * J10 - J00 * J12
                a20 = J10 * J21 - J11 * J20
                a21 = J01 * J20 - J00 * J21
                a22 = J00 * J11 - J01 * J10
                det = J00 * a00 + J01 * a10 + J02 * a20
                scale = (WQ[q] * jp_sc[15]) / jnp.abs(det)
                # f_r = sum_s G[r,s] w_s with G = scale * a a^T, factored
                # as t_p = sum_s a_sp w_s; f_r = scale * sum_p a_rp t_p
                t0 = a00 * wx + a10 * wy + a20 * wz
                t1 = a01 * wx + a11 * wy + a21 * wz
                t2 = a02 * wx + a12 * wy + a22 * wz
                f0 = scale * (a00 * t0 + a01 * t1 + a02 * t2)
                f1 = scale * (a10 * t0 + a11 * t1 + a12 * t2)
                f2 = scale * (a20 * t0 + a21 * t1 + a22 * t2)
                ryz = matmul(Dey, f1, ((0,), (0,))) + matmul(f2, Dez, C10)
                for p in range(n):
                    add = D[q][p] * f0 + (ryz if p == q else 0.0)
                    r_sc[p] += add

        @pl.when(jnp.logical_and(i < ncx, s == n - 1))
        def _fold():
            Wy, WzT = Wy_ref[...], WzT_ref[...]
            for p in range(n):
                z = matmul(r_sc[p], WzT, ((1,), (1,)), b_exact=True)
                F = matmul(Wy, z, ((0,), (0,)), a_exact=True)
                if p == 0:
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


def _apply_corner(op: PallasStiffnessCorner, x: jax.Array,
                  interpret: bool = False, precision="auto") -> jax.Array:
    if precision == "auto":
        precision = _HI if x.dtype == jnp.float64 else "bf16x3"
    ncx = op.JC.shape[0]
    ey = op.Dey.shape[0]
    ez = op.Dez.shape[0]
    gx, gy, gz = x.shape
    ncy, ncz = op.JC.shape[2], op.JC.shape[3]
    n = ey // ncy
    P = n - 1
    if not pallas_fits(n, ncy, ncz, gz, corner=True):
        raise ValueError(
            "no VMEM-feasible tiling for this mesh; use the mm path")

    def x_spec(p):
        return pl.BlockSpec(
            (1, gy, gz),
            lambda i, s, p=p: (jnp.minimum(i * P + p, gx - 1), 0, 0),
            memory_space=pltpu.VMEM)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    kernel = _mk_kernel_corner(n, P, ncx, op.statics, precision)
    dtype = x.dtype
    out = pl.pallas_call(
        kernel,
        grid=(ncx + 1, n),
        in_specs=[x_spec(p) for p in range(n)] + [
            pl.BlockSpec((1, 37, ncy, ncz),
                         lambda i, s: (jnp.minimum(i, ncx - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(),      # Wy WzT Dey Dez
            full(), full(), full(), full(), full(),  # UzT ycol zrow wy wz
        ],
        out_specs=pl.BlockSpec((P, gy, gz), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((ncx + 1) * P, gy, gz), dtype),
        scratch_shapes=[
            pltpu.VMEM((n, ey, ez), dtype),    # u planes
            pltpu.VMEM((n, ey, ez), dtype),    # reverse accumulators
            pltpu.VMEM((gy, gz), dtype),       # x overlap carry
            pltpu.VMEM((16, ey, ez), dtype),   # per-slab geometry planes
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*([x] * n), op.JC, op.Wy, op.WzT, op.Dey, op.Dez, op.UzT,
      op.ycol, op.zrow, op.wycol, op.wzrow)
    return out[:gx]


def _pad(d: int, m: int) -> int:
    return -(-d // m) * m


def _vmem_bytes(n, ncy, ncz, gy, gz, itemsize=4, corner=False) -> int:
    """Estimated VMEM footprint of the fused kernel (scratch + double-
    buffered blocks + live temporaries).  The corner-streamed kernel swaps
    the double-buffered 6-plane G block for 16 per-slab geometry planes, a
    small coefficient block, and more live adj/J temporaries."""
    ey, ez = ncy * n, ncz * n
    ezp, gzp = _pad(ez, 128), _pad(gz, 128)
    eyp, gyp = _pad(ey, 8), _pad(gy, 8)
    slab = eyp * ezp * itemsize
    plane_io = gyp * gzp * itemsize
    u = n * slab
    racc = n * slab
    if corner:
        g_blk = 16 * slab                      # per-slab geometry planes
        g_blk += 2 * 37 * _pad(ncy, 8) * _pad(ncz, 128) * itemsize
        temps = 14 * slab                      # J/adj/t/f live set
    else:
        g_blk = 2 * 6 * slab                   # double-buffered G stream
        temps = 8 * slab                       # wx/wy/wz/f*/splits
    x_in = 2 * n * plane_io                    # n unit planes, double-buffered
    out = 2 * (n - 1) * plane_io
    xc = plane_io
    mats = 2 * (eyp * gyp + gzp * ezp + eyp * eyp + ezp * ezp) * itemsize
    return u + racc + g_blk + x_in + out + xc + mats + temps


def pallas_fits(n, ncy, ncz, gz, corner=False, pair=False) -> bool:
    P = n - 1
    gy = ncy * P + 1
    need = _vmem_bytes(n, ncy, ncz, gy, gz, corner=corner)
    if pair:
        # pair kernel: 2 coefficient scratch planes + doubled x-plane IO
        ey, ez = ncy * n, ncz * n
        need += (2 * _pad(ey, 8) * _pad(ez, 128)
                 + 2 * n * _pad(gy, 8) * _pad(gz, 128)) * 4
    return need < 14 * 2**20


def _slab_sizes(ncy: int, k: int) -> list:
    """Near-equal partition of ncy cells into k y-slabs."""
    return [ncy // k + (1 if j < ncy % k else 0) for j in range(k)]


def pick_y_parts(n, ncy, ncz, gz, max_parts: int = 16,
                 corner=False) -> list | None:
    """Partition ncy into the fewest near-equal y-slabs whose single-slab
    working sets fit VMEM (None if even ncy_j = 1 does not fit, e.g. an
    oversized z extent).  Lets the fused kernel cover meshes whose full
    y-z extent exceeds VMEM: the operator is cell-local, so the apply is
    run per y-slab and the single shared plane overlap-added in XLA."""
    for k in range(1, min(max_parts, ncy) + 1):
        sizes = _slab_sizes(ncy, k)
        if pallas_fits(n, max(sizes), ncz, gz, corner=corner):
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
               coeff: np.ndarray | None = None, force_parts: int = 0,
               corners: np.ndarray | None = None):
    """build()/build_corner(), or a PallasStiffnessSplit when the full y-z
    extent does not fit VMEM (force_parts > 1 forces a split, for tests).
    Passing `corners` ((cells, 8, 3) trilinear coordinates) selects the
    corner-streamed kernel — the production default: G is recomputed in
    VMEM from 37 floats/cell instead of streamed at 6 floats/point."""
    n = P + 1
    ncx, ncy, ncz = nc
    gz = ncz * P + 1
    corner = corners is not None
    if force_parts > 1:
        sizes = _slab_sizes(ncy, min(force_parts, ncy))
    else:
        sizes = pick_y_parts(n, ncy, ncz, gz, corner=corner)
        if sizes is None:
            raise ValueError("no VMEM-feasible y partition for this mesh")

    def build_one(nc_j, G_j, coeff_j, corners_j):
        if corner:
            return build_corner(nc_j, P, D_1d, corners_j, dtype, coeff_j)
        return build(nc_j, P, D_1d, G_j, dtype, coeff_j)

    if len(sizes) == 1:
        # a single-part "split" is just the plain operator (the split
        # apply's concat logic assumes >= 2 slabs)
        return build_one(nc, G_cells, coeff, corners)
    cf = (None if coeff is None
          else np.asarray(coeff).reshape(ncx, ncy, ncz))
    Gc = (None if corner
          else G_cells.reshape(ncx, ncy, ncz, *G_cells.shape[1:]))
    Cc = (None if not corner
          else corners.reshape(ncx, ncy, ncz, 8, 3))
    parts, off = [], 0
    for s in sizes:
        cj = None if cf is None else cf[:, off:off + s]
        if corner:
            Cj = np.ascontiguousarray(Cc[:, off:off + s]).reshape(-1, 8, 3)
            parts.append(build_one((ncx, s, ncz), None, cj, Cj))
        else:
            Gj = np.ascontiguousarray(
                Gc[:, off:off + s]).reshape(ncx * s * ncz,
                                            *G_cells.shape[1:])
            parts.append(build_one((ncx, s, ncz), Gj, cj, None))
        off += s
    return PallasStiffnessSplit(tuple(parts), tuple(sizes))


def _part_degree(part) -> int:
    if isinstance(part, PallasStiffnessCorner):
        return part.Dey.shape[0] // part.JC.shape[2] - 1
    return part.G.shape[1] - 1


def _apply_one(part, x, interpret, precision):
    if isinstance(part, PallasStiffnessCorner):
        return _apply_corner(part, x, interpret, precision)
    return _apply_single(part, x, interpret, precision)


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def stiffness_apply_pallas(op, x: jax.Array,
                           interpret: bool = False,
                           precision="auto") -> jax.Array:
    """Dispatch: single fused-kernel apply, or per-y-slab applies with a
    shared-plane overlap-add for PallasStiffnessSplit operators."""
    if isinstance(op, PallasStiffnessSplit):
        P = _part_degree(op.parts[0])
        ys, off = [], 0
        for part, s in zip(op.parts, op.y_sizes):
            ys.append(_apply_one(part, x[:, off * P:(off + s) * P + 1],
                                 interpret, precision))
            off += s
        # one concatenate: interior of each slab + summed shared planes
        pieces = [ys[0][:, :-1]]
        for a, b in zip(ys[:-1], ys[1:]):
            pieces.append(a[:, -1:] + b[:, :1])
            pieces.append(b[:, 1:-1])
        pieces[-1] = ys[-1][:, 1:]
        return jnp.concatenate(pieces, axis=1)
    return _apply_one(op, x, interpret, precision)


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
    mats = _split_mats(op, precision)
    out = pl.pallas_call(
        kernel,
        grid=(ncx + 1, n),
        in_specs=[x_spec(p) for p in range(n)] + [
            pl.BlockSpec((1, 1, 6, ey, ez), g_index, memory_space=vmem),
        ] + [pl.BlockSpec(memory_space=vmem) for _ in mats],
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
    )(*([x] * n), op.G, *mats)
    return out[:gx]
