"""Fused Pallas TPU kernel for the sum-factorised stiffness apply.

Motivation: the XLA matmul formulation (fustpu.ops.spectral_mm) is ~12
full-field HBM passes (~1.5 ms for P=4, 32^3, f32, HIGHEST).  This kernel
processes one x-slab of cells per grid step entirely in VMEM: expand in
y/z, three derivative contractions, the G metric transform, three reverse
contractions, and the y/z overlap-add — one HBM read of the slab + G, one
write.  Only the (cheap, layout-friendly) x-axis expand/fold stay outside.

The role of the reference's shared-memory CUDA kernel
(/root/reference/cuda/operators.py:73-192), re-thought for a VMEM+MXU
machine: the cell batch is a whole (ncy x ncz) slab, y/z contractions are
2D MXU matmuls on (ey, ez) slices, and the x-direction contraction unrolls
over the n slab planes with the 1D derivative matrix baked into the kernel
as compile-time scalars (pure VPU multiply-adds).

Layout notes (TPU tiles the last two dims (8,128)):
- slab fields are n slices of (ey, ez) — trailing dims 100-300;
- G is pre-arranged as (ncx, 6, n, ey, ez) so a slab's factors are one
  contiguous block.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

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

    def __init__(self, G, Wy, Wz, Dey, Dez, D_host: tuple):
        self.G = G            # (ncx, 6, n, ey, ez)
        self.Wy = Wy          # (ey, gy)
        self.Wz = Wz          # (ez, gz)
        self.Dey = Dey        # (ey, ey) block-diag D
        self.Dez = Dez        # (ez, ez) block-diag D
        self.D_host = D_host  # tuple-of-tuples of floats (hashable)

    def tree_flatten(self):
        return (self.G, self.Wy, self.Wz, self.Dey, self.Dez), self.D_host

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
        Wy=jnp.asarray(mm.window_matrix(ncy, P), dtype),
        Wz=jnp.asarray(mm.window_matrix(ncz, P), dtype),
        Dey=jnp.asarray(mm.deriv_block_matrix(ncy, D_1d), dtype),
        Dez=jnp.asarray(mm.deriv_block_matrix(ncz, D_1d), dtype),
        D_host=tuple(map(tuple, np.asarray(D_1d, np.float64))),
    )


def _mk_kernel(n: int, D: tuple, precision):
    """Kernel specialised for degree (n = P+1) with D as static scalars."""

    def kernel(x_ref, G_ref, Wy_ref, Wz_ref, Dey_ref, Dez_ref, o_ref):
        f32 = o_ref.dtype
        Wy, Wz = Wy_ref[...], Wz_ref[...]
        Dey, Dez = Dey_ref[...], Dez_ref[...]

        def matmul(a, b, ta=False, tb=False):
            dn = (((0 if ta else 1,), (1 if tb else 0,)), ((), ()))
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=f32,
                                       precision=precision)

        # expand y/z per slab plane: u_i = Wy @ xs_i @ Wz^T   (ey, ez)
        u = [matmul(matmul(Wy, x_ref[0, i]), Wz, tb=True) for i in range(n)]

        r = [None] * n
        # x-contractions use static D scalars (VPU multiply-adds);
        # y/z use the block-diag matrices (MXU).
        wx = [sum(D[q][i] * u[i] for i in range(n)) for q in range(n)]
        for i in range(n):
            wy = matmul(Dey, u[i])
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
            r[i] = matmul(Dey, f1, ta=True) + matmul(f2, Dez)
        for i in range(n):
            rx = sum(D[q][i] * u[q] for q in range(n))
            # fold y/z: Wy^T @ (.) @ Wz
            o_ref[0, i] = matmul(matmul(Wy, r[i] + rx, ta=True), Wz)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def stiffness_apply_pallas(op: PallasStiffness, x: jax.Array,
                           interpret: bool = False,
                           precision=_HI) -> jax.Array:
    """y_grid = A_stiff(x_grid) with the fused slab kernel.  `precision`
    controls the in-kernel W / block-diag-D matmuls (the x-direction
    contraction is always exact static-scalar arithmetic): HIGHEST = full
    f32 (default), HIGH = bf16x3 (~1e-6 relative, ~2x faster)."""
    ncx, _, n, ey, ez = op.G.shape
    gx, gy, gz = x.shape
    P = n - 1

    # expand along x by slicing (cheap: trailing dims are large)
    a = x[: gx - 1].reshape(ncx, P, gy, gz)
    b = x[1:].reshape(ncx, P, gy, gz)[:, P - 1: P]
    xe = jnp.concatenate([a, b], axis=1)          # (ncx, n, gy, gz)

    vmem = pltpu.VMEM
    out = pl.pallas_call(
        _mk_kernel(n, op.D_host, precision),
        grid=(ncx,),
        in_specs=[
            pl.BlockSpec((1, n, gy, gz), lambda i: (i, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec((1, 6, n, ey, ez), lambda i: (i, 0, 0, 0, 0),
                         memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
            pl.BlockSpec(memory_space=vmem),
        ],
        out_specs=pl.BlockSpec((1, n, gy, gz), lambda i: (i, 0, 0, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((ncx, n, gy, gz), x.dtype),
        interpret=interpret,
    )(xe, op.G, op.Wy, op.Wz, op.Dey, op.Dez)

    # fold along x (overlap-add by slicing)
    main = out[:, :P].reshape(ncx * P, gy, gz)
    main = jnp.concatenate(
        [main, jnp.zeros((1, gy, gz), out.dtype)], axis=0)
    ends = jnp.pad(out[:, P][:, None], ((0, 0), (P - 1, 0), (0, 0), (0, 0)))
    shifted = jnp.concatenate(
        [jnp.zeros((1, gy, gz), out.dtype),
         ends.reshape(ncx * P, gy, gz)], axis=0)
    return main + shifted
