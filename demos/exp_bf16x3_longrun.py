"""1000-step Westervelt stability comparison: bf16x3 stiffness kernel vs
full-f32 (HIGHEST) on the real chip.  Records field error, energy drift and
a probe-waveform comparison — the validation gate for defaulting bf16x3.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp
import numpy as np

from fustpu.config import Material, Source
from fustpu.mesh.box import build_box_mesh
from fustpu.models.westervelt import WesterveltModel
from fustpu.utils.eval import PointSampler


def run(precision, steps=1000):
    mat = Material(sound_speed=1480.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.2)
    src = Source(frequency=1.1e6, amplitude=1.0e5)
    L = 0.01
    mesh = build_box_mesh((32, 32, 32), 4, hi=(L, L, L))
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets("x-"),
                            mesh.all_boundary_facets(), dtype=jnp.float32,
                            stiffness_impl="pallas",
                            pallas_precision=precision)
    dt, _ = model.cfl_dt(0.4)
    sampler = PointSampler(mesh, np.array([[0.7 * L, 0.5 * L, 0.5 * L]]))
    pfn = sampler.jax_probe()
    t0 = time.perf_counter()
    state, ys = model.solve(model.init_state(), dt, steps,
                            probe=lambda s: pfn(s.u))
    u = np.asarray(state.u, np.float64)
    v = np.asarray(state.v, np.float64)
    wall = time.perf_counter() - t0
    print(f"precision={precision}: {wall:.1f}s wall ({steps} steps)")
    return u, v, np.asarray(ys).ravel(), dt


def main():
    import jax

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    # explicit HIGHEST: None would resolve to the kernel's "auto" default
    # (= bf16x3 for f32) and compare bf16x3 against itself
    u_hi, v_hi, tr_hi, dt = run(jax.lax.Precision.HIGHEST, steps)
    u_lo, v_lo, tr_lo, _ = run("bf16x3", steps)
    rel = lambda a, b: (np.linalg.norm(a - b)
                        / max(np.linalg.norm(b), 1e-300))
    # "energy" proxy: L2 norms of u and v
    e_hi = np.linalg.norm(u_hi) ** 2 + np.linalg.norm(v_hi) ** 2
    e_lo = np.linalg.norm(u_lo) ** 2 + np.linalg.norm(v_lo) ** 2
    print(f"field rel-l2:  u {rel(u_lo, u_hi):.3e}  v {rel(v_lo, v_hi):.3e}")
    print(f"energy ratio bf16x3/f32: {e_lo/e_hi:.8f}")
    print(f"probe waveform rel-l2: {rel(tr_lo, tr_hi):.3e}  "
          f"peak |p| f32 {np.abs(tr_hi).max():.1f}  "
          f"bf16x3 {np.abs(tr_lo).max():.1f}")
    assert np.isfinite(u_lo).all() and np.isfinite(v_lo).all()


if __name__ == "__main__":
    main()
