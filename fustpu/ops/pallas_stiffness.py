"""Fused Pallas TPU kernel for the sum-factorised stiffness apply.

Motivation: the XLA matmul formulation (fustpu.ops.spectral_mm) is ~12
full-field HBM passes (~1.6 ms for P=4, 32^3, f32, HIGHEST).  This kernel
processes one (x-slab, y-block) tile of cells per grid step entirely in
VMEM: z-window expansion, all three derivative contractions, the G metric
transform, reverse contractions, and the z overlap-add — one HBM read of
the tile + its G block, one write.  The x/y window expansion and
overlap-add stay outside as cheap slicing passes (their trailing dims are
large, so they are layout-friendly), which also makes tiles independent:
no overlap between Pallas blocks, and VMEM use scales down with the
y-block count (P=6 fits too).

The role of the reference's shared-memory CUDA kernel
(/root/reference/cuda/operators.py:73-192), re-thought for a VMEM+MXU
machine: the cell batch is a tile of (ncy/NYB x ncz) cells, the z-direction
(lane axis) contractions are 2D MXU matmuls, and the x/y directions unroll
over planes / sublane cell blocks with the 1D derivative matrix baked into
the kernel as compile-time scalars (pure VPU multiply-adds — matmul FLOPs
are ~18x under f32 emulation, so keeping them off the MXU is a win).
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

    def __init__(self, G, Wz, Dez, D_host: tuple):
        self.G = G            # (ncx, 6, n, ey, ez)
        self.Wz = Wz          # (ez, gz)
        self.Dez = Dez        # (ez, ez) block-diag D
        self.D_host = D_host  # tuple-of-tuples of floats (hashable)

    def tree_flatten(self):
        return (self.G, self.Wz, self.Dez), self.D_host

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, D_host=aux)


def build(nc, P: int, D_1d: np.ndarray, G_cells: np.ndarray, dtype,
          coeff: np.ndarray | None = None) -> PallasStiffness:
    """Same inputs as spectral_mm.build_stiffness; G rearranged per x-slab."""
    n = P + 1
    ncx, ncy, ncz = nc
    Ge = mm.to_expanded_layout(G_cells, nc, n)        # (ex, ey, ez, 6)
    if coeff is not None:
        Ge = Ge * mm.expand_cell_field(np.asarray(coeff), n)[..., None]
    Ge = Ge.reshape(ncx, n, ncy * n, ncz * n, 6)
    Ge = np.ascontiguousarray(Ge.transpose(0, 4, 1, 2, 3))
    return PallasStiffness(
        G=jnp.asarray(Ge, dtype),
        Wz=jnp.asarray(mm.window_matrix(ncz, P), dtype),
        Dez=jnp.asarray(mm.deriv_block_matrix(ncz, D_1d), dtype),
        D_host=tuple(map(tuple, np.asarray(D_1d, np.float64))),
    )


def _mk_kernel(n: int, D: tuple, precision):
    """Kernel specialised for degree (n = P+1) with D as static scalars."""

    def kernel(x_ref, G_ref, Wz_ref, Dez_ref, o_ref):
        f32 = o_ref.dtype
        Wz, Dez = Wz_ref[...], Dez_ref[...]

        def _dn(tb):
            return (((1,), (1 if tb else 0,)), ((), ()))

        if precision == "bf16x3":
            # manual 3-term bf16 decomposition: a@b = ah@bh + ah@bl + al@bh
            # (~f32 accuracy at ~1/6 the cost of Mosaic's f32 emulation;
            # Mosaic has no Precision.HIGH)
            def _split(a):
                hi = a.astype(jnp.bfloat16).astype(f32)
                return hi, a - hi

            Wzs = _split(Wz)
            Dezs = _split(Dez)
            mats = {id(Wz): Wzs, id(Dez): Dezs}

            def matmul(a, b, tb=False):
                dn = _dn(tb)
                ah, al = _split(a)
                bh, bl = mats[id(b)]
                d = lambda p, q: jax.lax.dot_general(
                    p, q, dn, preferred_element_type=f32,
                    precision=jax.lax.Precision.DEFAULT)
                return d(ah, bh) + d(ah, bl) + d(al, bh)
        else:
            def matmul(a, b, tb=False):
                return jax.lax.dot_general(a, b, _dn(tb),
                                           preferred_element_type=f32,
                                           precision=precision)

        def y_deriv(t, trans=False):          # within-cell D along sublanes
            eyb, Z = t.shape
            ncy = eyb // n
            t3 = t.reshape(ncy, n, Z)
            rows = []
            for q in range(n):
                acc = None
                for j in range(n):
                    d = D[j][q] if trans else D[q][j]
                    term = d * t3[:, j]
                    acc = term if acc is None else acc + term
                rows.append(acc)
            return jnp.stack(rows, axis=1).reshape(eyb, Z)

        # expand z per plane: u_i (ey_b, ez) = x_i (ey_b, gz) @ Wz^T
        u = [matmul(x_ref[0, i], Wz, tb=True) for i in range(n)]

        r = [None] * n
        # x-contraction across planes with static D scalars (VPU)
        wx = [sum(D[q][i] * u[i] for i in range(n)) for q in range(n)]
        for i in range(n):
            wy = y_deriv(u[i])
            wz = matmul(u[i], Dez, tb=True)
            G0 = G_ref[0, 0, i]
            G1 = G_ref[0, 1, i]
            G2 = G_ref[0, 2, i]
            G3 = G_ref[0, 3, i]
            G4 = G_ref[0, 4, i]
            G5 = G_ref[0, 5, i]
            f1 = G1 * wx[i] + G3 * wy + G4 * wz
            f2 = G2 * wx[i] + G4 * wy + G5 * wz
            # store f0 for the cross-plane reverse x-contraction
            u[i] = G0 * wx[i] + G1 * wy + G2 * wz   # reuse u as f0 storage
            r[i] = y_deriv(f1, trans=True) + matmul(f2, Dez)
        for i in range(n):
            rx = sum(D[q][i] * u[q] for q in range(n))
            # fold z: (.) @ Wz   -> (ey_b, gz)
            o_ref[0, i] = matmul(r[i] + rx, Wz)

    return kernel


def _win_axis2(t, P):
    """(A, B, g, Z) -> (A, B, nc*n, Z) window expansion along axis 2."""
    A, B, g, Z = t.shape
    nc = (g - 1) // P
    a = t[:, :, : g - 1].reshape(A, B, nc, P, Z)
    b = t[:, :, 1:].reshape(A, B, nc, P, Z)[:, :, :, P - 1: P]
    return jnp.concatenate([a, b], axis=3).reshape(A, B, nc * (P + 1), Z)


def _fold_axis2(t, P):
    """(A, B, nc*n, Z) -> (A, B, g, Z) overlap-add along axis 2."""
    A, B, e, Z = t.shape
    n = P + 1
    nc = e // n
    t5 = t.reshape(A, B, nc, n, Z)
    main = t5[:, :, :, :P].reshape(A, B, nc * P, Z)
    main = jnp.concatenate(
        [main, jnp.zeros((A, B, 1, Z), t.dtype)], axis=2)
    ends = jnp.pad(t5[:, :, :, P][:, :, :, None],
                   ((0, 0), (0, 0), (0, 0), (P - 1, 0), (0, 0)))
    shifted = jnp.concatenate(
        [jnp.zeros((A, B, 1, Z), t.dtype),
         ends.reshape(A, B, nc * P, Z)], axis=2)
    return main + shifted


def _pick_yblocks(n, ncy, ncz, gz, limit_bytes=9 * 2**20):
    """Smallest y-block count (divisor of ncy) whose VMEM footprint fits:
    double-buffered G + x/out blocks plus ~4n live (ey_b, ez) slices.
    Mosaic additionally requires a block's second-to-last dim (ey_b here)
    to be a multiple of 8 or the full dimension.  Returns None if no valid
    block count fits (callers fall back to the XLA matmul path)."""
    ez = ncz * n
    ey = ncy * n
    pad = lambda d: -(-d // 128) * 128
    for nyb in [d for d in range(1, ncy + 1) if ncy % d == 0]:
        ey_b = (ncy // nyb) * n
        if ey_b != ey and ey_b % 8:
            continue
        slab = ey_b * pad(ez) * 4
        io = ey_b * pad(gz) * 4
        need = 2 * (6 * n * slab + 2 * n * io) + 4 * n * slab
        if need < limit_bytes:
            return nyb
    return None


def pallas_fits(n, ncy, ncz, gz) -> bool:
    return _pick_yblocks(n, ncy, ncz, gz) is not None


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def stiffness_apply_pallas(op: PallasStiffness, x: jax.Array,
                           interpret: bool = False,
                           precision=_HI) -> jax.Array:
    """y_grid = A_stiff(x_grid) with the fused tile kernel.  `precision`
    controls the in-kernel z-direction matmuls (the x/y contractions are
    always exact static-scalar arithmetic): HIGHEST = full f32 (default)."""
    ncx, _, n, ey, ez = op.G.shape
    gx, gy, gz = x.shape
    P = n - 1
    ncy = ey // n
    nyb = _pick_yblocks(n, ncy, ncz=ez // n, gz=gz)
    if nyb is None:
        raise ValueError(
            "no VMEM-feasible y-block count for this mesh; use the mm path")
    ey_b = ey // nyb

    # expand along x then y by slicing (cheap: trailing dims are large)
    a = x[: gx - 1].reshape(ncx, P, gy, gz)
    b = x[1:].reshape(ncx, P, gy, gz)[:, P - 1: P]
    xe = jnp.concatenate([a, b], axis=1)          # (ncx, n, gy, gz)
    xe = _win_axis2(xe, P)                        # (ncx, n, ey, gz)

    vmem = pltpu.VMEM
    out = pl.pallas_call(
        _mk_kernel(n, op.D_host, precision),
        grid=(ncx, nyb),
        in_specs=[
            pl.BlockSpec((1, n, ey_b, gz), lambda i, j: (i, 0, j, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 6, n, ey_b, ez),
                         lambda i, j: (i, 0, 0, j, 0), memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, n, ey_b, gz), lambda i, j: (i, 0, j, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((ncx, n, ey, gz), x.dtype),
        interpret=interpret,
    )(xe, op.G, op.Wz, op.Dez)

    # fold along y then x (overlap-add by slicing)
    out = _fold_axis2(out, P)                     # (ncx, n, gy, gz)
    main = out[:, :P].reshape(ncx * P, gy, gz)
    main = jnp.concatenate(
        [main, jnp.zeros((1, gy, gz), out.dtype)], axis=0)
    ends = jnp.pad(out[:, P][:, None], ((0, 0), (P - 1, 0), (0, 0), (0, 0)))
    shifted = jnp.concatenate(
        [jnp.zeros((1, gy, gz), out.dtype),
         ends.reshape(ncx * P, gy, gz)], axis=0)
    return main + shifted
