"""Time the fused stiffness kernel variants on the real chip (P=4, 32^3,
f32): full-f32 HIGHEST vs the bf16x3 decomposition, plus the XLA matmul
formulation for reference.  Development instrument for kernel work."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from fustpu.mesh.box import build_box_mesh
from fustpu.models.discretization import Discretization
from fustpu.ops import pallas_stiffness as ps
from fustpu.ops import spectral_mm as mm
from fustpu.utils import benchmarks as B


def main():
    nc = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    P = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dtype = jnp.float32
    mesh = build_box_mesh((nc, nc, nc), P)
    disc = Discretization(mesh, dtype)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(mesh.grid_shape), dtype)
    base = B.sync_baseline()
    mb = B.min_bytes("stiffness", mesh, dtype)
    print(f"dofs={mesh.ndofs}  min_traffic={mb/1e6:.1f} MB  "
          f"sync_baseline={base*1e3:.1f} ms")

    op_p = disc.pallas_op()
    g = mesh.grid_shape
    flat_io = lambda p, v: ps.stiffness_apply_pallas(
        p, v.reshape(g), precision="bf16x3").reshape(-1)
    variants = [
        ("pallas HIGHEST", op_p,
         lambda p, v: ps.stiffness_apply_pallas(p, v, precision=ps._HI)),
        ("pallas bf16x3", op_p,
         lambda p, v: ps.stiffness_apply_pallas(p, v, precision="bf16x3")),
        ("pallas bf16x1*", op_p,   # ablation only: single-term, inaccurate
         lambda p, v: ps.stiffness_apply_pallas(
             p, v, precision=jax.lax.Precision.DEFAULT)),
        ("bf16x3 flat-io", op_p, None),   # filled below
        ("mm HIGHEST", disc.mm_op,
         lambda p, v: mm.stiffness_apply_mm(p, v)),
    ]
    variants[3] = ("bf16x3 flat-io", op_p, flat_io)
    x_flat = x.reshape(-1)
    for name, op, fn in variants:
        xin = x_flat if "flat" in name else x
        try:
            t, s = B.time_apply(fn, op, xin, chain=50, reps=5, baseline=base)
        except Exception as e:
            print(f"{name:<16} FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{name:<16} {t*1e3:8.3f} ms/apply  "
              f"{mesh.ndofs/t/1e9:6.2f} GDOF/s  {mb/t/1e9:7.1f} GB/s-implied")


if __name__ == "__main__":
    main()
