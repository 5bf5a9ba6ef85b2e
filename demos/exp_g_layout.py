"""Micro-experiment: stream a G-like array through a Pallas kernel in
(a) the padded 2D layout (ey, ez) with ez lane-padded 160->256, vs
(b) a flat lane-aligned layout (ey*ez,) reshaped to (ey, ez) in-kernel.
Measures whether Mosaic's in-VMEM relayout is cheaper than the 1.6x HBM
padding tax on the dominant stiffness-kernel stream."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fustpu.utils import benchmarks as B

NCX, NP, EY, EZ = 32, 5, 160, 160   # the P=4 32^3 G shape (6 comps)
ARB = pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary"))


def _call(kernel, g_spec, G, c):
    return pl.pallas_call(
        kernel, grid=(NCX, NP),
        in_specs=[g_spec,
                  pl.BlockSpec((EY, EZ), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((EY, EZ), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((EY, EZ), G.dtype),
        compiler_params=ARB,
    )(G, c)


def padded_sum(G, c):
    def kernel(g_ref, c_ref, o_ref):
        i, s = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(i == 0, s == 0))
        def _():
            o_ref[...] = c_ref[...]

        acc = o_ref[...]
        for m in range(6):
            acc = acc + g_ref[0, 0, m] * (1.0 + m)
        o_ref[...] = acc

    return _call(kernel, pl.BlockSpec((1, 1, 6, EY, EZ),
                                      lambda i, s: (i, s, 0, 0, 0),
                                      memory_space=pltpu.VMEM), G, c)


def flat_sum(Gf, c):
    def kernel(g_ref, c_ref, o_ref):
        i, s = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(i == 0, s == 0))
        def _():
            o_ref[...] = c_ref[...]

        acc = o_ref[...]
        for m in range(6):
            acc = acc + g_ref[0, 0, m].reshape(EY, EZ) * (1.0 + m)
        o_ref[...] = acc

    return _call(kernel, pl.BlockSpec((1, 1, 6, EY * EZ),
                                      lambda i, s: (i, s, 0, 0),
                                      memory_space=pltpu.VMEM), Gf, c)


def main():
    rng = np.random.default_rng(0)
    G = jnp.asarray(rng.standard_normal((NCX, NP, 6, EY, EZ)) * 1e-3,
                    jnp.float32)
    Gf = G.reshape(NCX, NP, 6, EY * EZ)
    base = B.sync_baseline()
    nbytes = NCX * NP * 6 * EY * EZ * 4
    for name, fn, arr in (("padded (ey,ez)", padded_sum, G),
                          ("flat+reshape", flat_sum, Gf)):
        try:
            t, _ = B.time_apply(lambda p, c: fn(p, c), arr,
                                jnp.zeros((EY, EZ), jnp.float32),
                                chain=16, reps=5, baseline=base)
        except Exception as e:
            print(f"{name:<16} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}")
            continue
        print(f"{name:<16} {t*1e3:7.3f} ms  logical {nbytes/t/1e9:6.0f} GB/s")


if __name__ == "__main__":
    main()
