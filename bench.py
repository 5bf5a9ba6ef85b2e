"""Headline benchmark: mass+stiffness operator application throughput
(DOF/s per chip) at P=4 on a 32^3 hex box — the configuration of the
reference's time_operators harness (/root/reference/cuda/time_operators.py,
P=4, 32^3, 10 reps) and BASELINE.md's north-star metric.

Prints ONE JSON line.  `vs_baseline`: the reference publishes no numbers
(BASELINE.md), so the ratio is against the speed-of-light bound for this
chip — the HBM-bandwidth-bound throughput of the combined mass+stiffness
apply assuming minimal traffic (read x, write y, stream detJ/G once), with
v5e peak HBM bandwidth 819 GB/s.  vs_baseline = achieved / speed-of-light.
"""

import json
import sys

import jax
import jax.numpy as jnp

V5E_HBM_GB_S = 819.0


def main():
    from fustpu.utils import benchmarks as B

    nc, degree, dtype = 32, 4, jnp.float32
    try:
        res = B.bench_operators(nc=nc, degree=degree, dtype=dtype, reps=10)
    except Exception as e:  # never leave the driver without a metric
        print(f"# pallas path failed ({type(e).__name__}: {e}); "
              "falling back to mm", file=sys.stderr)
        res = B.bench_operators(nc=nc, degree=degree, dtype=dtype, reps=10,
                                impl="mm")
    for r in res:
        print("#", r.row(), file=sys.stderr)
    total_t = sum(r.mean_s for r in res)
    ndofs = res[0].ndofs
    pair_dof_s = ndofs / total_t

    # speed-of-light for the pair on this chip
    import fustpu.mesh.box as box
    mesh = box.build_box_mesh((nc, nc, nc), degree)
    mbytes = (B.min_bytes("mass", mesh, dtype)
              + B.min_bytes("stiffness", mesh, dtype))
    sol_pair_dof_s = ndofs / (mbytes / (V5E_HBM_GB_S * 1e9))

    print(json.dumps({
        "metric": "mass+stiffness apply throughput (P=4, 32^3 hex, f32)",
        "value": round(pair_dof_s / 1e9, 4),
        "unit": "GDOF/s per chip",
        "vs_baseline": round(pair_dof_s / sol_pair_dof_s, 4),
    }))


if __name__ == "__main__":
    main()
