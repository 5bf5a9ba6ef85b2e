"""Mosaic relayout probe — does the TPU compiler support (and at what
cost) the reshapes a FUSED gather+contract+scatter engine kernel would
need?

The one-hot engine's natural output is a (TM, 1) sublane column; an
in-kernel per-cell contraction wants (n^3, k) with cells on the LANES
(dense (n^3, n^3) operators are clean MXU shapes — ~1/2 GFLOP per
million DOF, trivial).  The bridge is the relayout
(TM, 1) -> (TM/128, 128), which Mosaic may implement as a cheap
sublane->lane shuffle or as a slow elementwise copy — this probe
measures it in isolation before any fused-kernel design commits to it
(BENCH_NOTES r4: the engine sits ~15x above its one-hot roofline, so a
relayout costing more than ~0.1 ms/M elements kills the fusion).

Run ON CHIP:  python demos/exp_mosaic_relayout.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fustpu.utils.benchmarks import _sync, sync_baseline

    TM = 8192
    ntiles = 128

    def probe(name, body, out_shape):
        def kernel(x_ref, o_ref):
            body(x_ref, o_ref)

        try:
            fn = jax.jit(lambda x: pl.pallas_call(
                kernel,
                grid=(ntiles,),
                in_specs=[pl.BlockSpec((TM, 1), lambda b: (b, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(out_shape, lambda b: (b,) + (0,) *
                                       (len(out_shape) - 1),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (ntiles * out_shape[0],) + out_shape[1:], x.dtype),
            )(x))
            x = jnp.arange(ntiles * TM, dtype=jnp.float32).reshape(-1, 1)
            y = fn(x)
            _sync(y)
            rtt = sync_baseline()
            reps = 20
            t0 = time.perf_counter()
            for _ in range(reps):
                y = fn(x)
            _sync(y)
            dt = (time.perf_counter() - t0 - rtt) / reps * 1e3
            # correctness: the relayout is a pure permutation
            ok = bool(jnp.all(jnp.sort(y.reshape(-1))
                              == jnp.sort(x.reshape(-1))))
            print(f"{name:<40} {dt:7.3f} ms/call  ({ntiles*TM/1e6:.1f}M "
                  f"elems, {ntiles*TM/dt/1e6:.0f} M/ms) sorted-ok={ok}")
        except Exception as e:
            print(f"{name:<40} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}")

    # 1. (TM,1) -> (TM/128, 128): sublanes -> lanes (the fused-engine
    #    bridge, d-major plan order)
    probe("reshape (8192,1)->(64,128)",
          lambda x, o: o.__setitem__(..., x[...].reshape(TM // 128, 128)),
          (TM // 128, 128))
    # 2. the reverse (lanes -> sublane column, the scatter-side bridge)
    probe("reshape via (64,128)->(8192,1)",
          lambda x, o: o.__setitem__(
              ..., x[...].reshape(TM // 128, 128).reshape(TM, 1)),
          (TM, 1))
    # 3. transpose (64,128) -> (128,64) (cells-on-sublanes alternative)
    probe("reshape+transpose ->(128,64)",
          lambda x, o: o.__setitem__(
              ..., x[...].reshape(TM // 128, 128).T),
          (128, TM // 128))
    # 4. baseline: pure copy (measures the probe harness floor)
    probe("copy (8192,1)",
          lambda x, o: o.__setitem__(..., x[...]), (TM, 1))

    # 5. HBM layout padding check: does a (N, 1) f32 array occupy 128x
    #    its logical size on this chip?  (The premise behind the packed
    #    engine streams, FUSTPU_ENGINE_LAYOUT.)
    dev = jax.devices()[0]

    def used():
        try:
            return dev.memory_stats()["bytes_in_use"]
        except Exception:
            return None

    n = 1 << 20
    base = used()
    col = jnp.zeros((n, 1), jnp.float32)
    _sync(col)
    after_col = used()
    packed = jnp.zeros((n // 128, 128), jnp.float32)
    _sync(packed)
    after_packed = used()
    if base is not None:
        print(f"HBM bytes for (2^20, 1) f32: {after_col - base:,} "
              f"(logical {4 * n:,}); for (2^13, 128): "
              f"{after_packed - after_col:,}")
    else:
        print("memory_stats unavailable on this backend")


if __name__ == "__main__":
    main()
