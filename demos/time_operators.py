"""Operator micro-benchmark — the analogue of the reference's
time_operators scripts (numba-cpu/time_operators.py, cuda/time_operators.py:
10-rep wall-times of mass / stiffness / facet-mass applies, P=4 32^3 box).

    python demos/time_operators.py [--nc 32] [--degrees 2 3 4 5 6]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nc", type=int, default=32)
    p.add_argument("--degrees", type=int, nargs="+", default=[4])
    p.add_argument("--dtype", choices=["f32", "bf16"], default="f32")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[args.dtype]

    from fustpu.utils import benchmarks as B

    for deg in args.degrees:
        for r in B.bench_operators(nc=args.nc, degree=deg, dtype=dtype,
                                   reps=args.reps):
            print(r.row(), flush=True)


if __name__ == "__main__":
    main()
