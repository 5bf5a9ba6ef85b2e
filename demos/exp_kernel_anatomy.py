"""Anatomy of the fused stiffness kernel: time variants that keep only
one resource's work, to locate the wall (the r3 finding that the G DMA
is fully hidden came from the no-DMA variant; this splits the rest).

Variants (same grid, block specs, scratch and carry structure):
  full   — the production kernel
  vpu    — matmuls replaced by scratch reads; keeps the x-contraction,
           the 6 G loads + metric transform, and the accumulator updates
  mxu    — the 4 per-plane matmuls + window expand/fold only; the
           pointwise transform replaced by pass-through
  ywin   — full math, but the y-axis window expand/fold run as exact
           sublane reshape/concat VPU ops instead of 0/1 matmuls

    python demos/exp_kernel_anatomy.py [--nc 32] [--degree 4]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import fustpu.ops.pallas_stiffness as ps  # noqa: E402
from fustpu.mesh.box import build_box_mesh  # noqa: E402
from fustpu.ops import precompute as pre  # noqa: E402
from fustpu.utils import benchmarks as B  # noqa: E402


def make_variant(op, x, variant, precision="bf16x3"):
    ncx, n, _, ey, ez = op.G.shape
    gx, gy, gz = x.shape
    P = n - 1
    D = tuple(tuple(float(v) for v in row) for row in op.D_host)

    def kernel(*refs):
        x_refs = refs[:n]
        (G_ref, WyH, WzTH, DeyH, DeyL, DezH, DezL, o_ref, u_sc, r_sc,
         xc_sc) = refs[n:]
        mats = lambda: ((WyH[...], None), (WzTH[...], None),
                        (DeyH[...], DeyL[...]), (DezH[...], DezL[...]))
        i = pl.program_id(0)
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = ps._mk_matmul(precision, f32)
        C10 = ((1,), (0,))

        ncy = ey // n

        def ywin_expand(xp):
            # (gy, gz) -> (ey, gz): overlapping y windows via sublane
            # reshape/concat (rows b*P..b*P+P per block; the shared end
            # row is row (b+1)*P of the shifted view — exact, no matmul)
            a = xp[:gy - 1].reshape(ncy, P, gz)
            b = xp[1:].reshape(ncy, P, gz)[:, P - 1:P]
            return jnp.concatenate([a, b], axis=1).reshape(ey, gz)

        def ywin_fold(z):
            # (ey, gz) -> (gy, gz): overlap-add (adjoint of ywin_expand)
            A = z.reshape(ncy, n, gz)
            main = A[:, :P].reshape(ncy * P, gz)
            main = jnp.concatenate(
                [main, jnp.zeros((1, gz), z.dtype)], axis=0)
            ends = jnp.concatenate(
                [jnp.zeros((ncy, P - 1, gz), z.dtype), A[:, P:]], axis=1)
            shifted = jnp.concatenate(
                [jnp.zeros((1, gz), z.dtype),
                 ends.reshape(ncy * P, gz)], axis=0)
            return main + shifted

        @pl.when(jnp.logical_and(i < ncx, s == 0))
        def _expand():
            Wy, WzT, _, _ = mats()
            for p in range(n):
                if variant == "vpu":
                    u_sc[p] = G_ref[0, 0, 0] + 0.0
                elif variant == "ywin":
                    t = ywin_expand(x_refs[p][0])
                    u_sc[p] = matmul(t, WzT, C10, b_exact=True)
                else:
                    t = matmul(Wy, x_refs[p][0], C10, a_exact=True)
                    u_sc[p] = matmul(t, WzT, C10, b_exact=True)
            r_sc[...] = jnp.zeros(r_sc.shape, r_sc.dtype)

        for q in range(n):
            @pl.when(jnp.logical_and(i < ncx, s == q))
            def _plane(q=q):
                _, _, Dey, Dez = mats()
                u_q = u_sc[q]
                if variant != "mxu":
                    wx = None
                    for r in range(n):
                        term = D[q][r] * u_sc[r]
                        wx = term if wx is None else wx + term
                if variant == "vpu":
                    wy = u_sc[(q + 1) % n]
                    wz = u_sc[(q + 2) % n]
                else:
                    wy = matmul(Dey, u_q, C10)
                    wz = matmul(u_q, Dez, ((1,), (1,)))
                if variant == "mxu":
                    f1, f2 = wy, wz
                    ryz = (matmul(Dey, f1, ((0,), (0,)))
                           + matmul(f2, Dez, C10))
                    r_sc[q] += ryz
                else:
                    G = lambda m: G_ref[0, 0, m]
                    f0 = G(0) * wx + G(1) * wy + G(2) * wz
                    f1 = G(1) * wx + G(3) * wy + G(4) * wz
                    f2 = G(2) * wx + G(4) * wy + G(5) * wz
                    if variant == "vpu":
                        ryz = f1 + f2
                    else:
                        ryz = (matmul(Dey, f1, ((0,), (0,)))
                               + matmul(f2, Dez, C10))
                    for p in range(n):
                        add = D[q][p] * f0 + (ryz if p == q else 0.0)
                        r_sc[p] += add

        @pl.when(jnp.logical_and(i < ncx, s == n - 1))
        def _fold():
            Wy, WzT, _, _ = mats()
            for p in range(n):
                if variant == "vpu":
                    F = r_sc[p][:gy, :gz]
                elif variant == "ywin":
                    z = matmul(r_sc[p], WzT, ((1,), (1,)), b_exact=True)
                    F = ywin_fold(z)
                else:
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

    def x_spec(p):
        return pl.BlockSpec(
            (1, gy, gz),
            lambda i, s, p=p: (jnp.minimum(i * P + p, gx - 1), 0, 0),
            memory_space=pltpu.VMEM)

    def g_index(i, s):
        return (jnp.minimum(i, ncx - 1),
                jnp.where(i == ncx, n - 1, s), 0, 0, 0)

    mats_in = ps._split_mats(op, precision)
    vmem = pltpu.VMEM
    dtype = x.dtype

    def apply(v):
        out = pl.pallas_call(
            kernel,
            grid=(ncx + 1, n),
            in_specs=[x_spec(p) for p in range(n)] + [
                pl.BlockSpec((1, 1, 6, ey, ez), g_index,
                             memory_space=vmem),
            ] + [pl.BlockSpec(memory_space=vmem) for _ in mats_in],
            out_specs=pl.BlockSpec((P, gy, gz), lambda i, s: (i, 0, 0),
                                   memory_space=vmem),
            out_shape=jax.ShapeDtypeStruct(((ncx + 1) * P, gy, gz),
                                           dtype),
            scratch_shapes=[
                pltpu.VMEM((n, ey, ez), dtype),
                pltpu.VMEM((n, ey, ez), dtype),
                pltpu.VMEM((gy, gz), dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(*([v] * n), op.G, *mats_in)
        return out[:gx]

    return jax.jit(apply)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--nc", type=int, default=32)
    p.add_argument("--degree", type=int, default=4)
    p.add_argument("--variants", default="",
                   help="comma list (default: all)")
    args = p.parse_args()

    mesh = build_box_mesh((args.nc,) * 3, args.degree)
    _, G = pre.cell_geometry_factors(mesh)
    op = ps.build(mesh.nc, args.degree, mesh.element.deriv_1d, G,
                  jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        mesh.grid_shape), jnp.float32)
    base = B.sync_baseline()
    times, outs = {}, {}
    variants = (tuple(args.variants.split(","))
                if args.variants else ("full", "vpu", "mxu", "ywin"))
    for variant in variants:
        fn = make_variant(op, x, variant)
        outs[variant] = fn(x)
        t, _ = B.time_apply(lambda p_, v: fn(v), None, x, chain=50,
                            reps=5, baseline=base)
        times[variant] = t
        print(f"{variant:<5}: {t*1e3:.3f} ms", flush=True)
    if "ywin" in outs and "full" in outs:
        err = float(jnp.linalg.norm(outs["ywin"] - outs["full"])
                    / jnp.linalg.norm(outs["full"]))
        print(f"ywin vs full rel-err: {err:.2e} (sublane windows are "
              "exact; expect ~the bf16x3 term-order noise)")
    if all(k in times for k in ("full", "vpu", "mxu")):
        resid = times["full"] - times["vpu"] - times["mxu"]
        print(f"full - vpu - mxu = {resid*1e3:+.3f} ms "
              "(negative => the units overlap; ~0 => serial)")


if __name__ == "__main__":
    main()
