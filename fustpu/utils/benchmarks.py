"""Operator micro-benchmarks — the `time_operators` analogue
(/root/reference/numba-cpu/time_operators.py, cuda/time_operators.py: 10-rep
wall-times of mass/stiffness/facet-mass apply at P=4 on a 32^3 box).

Reports wall time, DOF/s, and achieved HBM bandwidth (the operators are
bandwidth-bound; BASELINE.md's north star is speed-of-light apply).

Timing methodology (important on this environment): jax.block_until_ready
does NOT block on the tunneled axon TPU backend, and per-call dispatch costs
~25 ms RTT.  So: (a) applies are chained k-deep inside one jit via lax.scan,
(b) completion is observed by fetching one scalar of the result, (c) the
fixed dispatch+fetch round-trip (sync_baseline) is subtracted.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from fustpu.mesh.box import build_box_mesh
from fustpu.ops import precompute as pre
from fustpu.ops import spectral_mm as mm


@dataclass
class OpBenchResult:
    name: str
    degree: int
    ncells: int
    ndofs: int
    mean_s: float
    std_s: float
    dof_per_s: float
    hbm_gb_s: float    # minimal-traffic model (see min_bytes)

    def row(self) -> str:
        return (f"{self.name:<10} P={self.degree} cells={self.ncells:<7} "
                f"dofs={self.ndofs:<9} {self.mean_s*1e3:8.3f} ms "
                f"(+-{self.std_s*1e3:.3f})  {self.dof_per_s/1e9:6.2f} GDOF/s "
                f"{self.hbm_gb_s:7.1f} GB/s")


def min_bytes(name: str, mesh, dtype) -> int:
    """Minimal HBM traffic for one apply: read x + write y + stream the
    geometry factors (mass: the assembled diagonal; stiffness: 6-component
    G per quadrature point)."""
    bs = jnp.dtype(dtype).itemsize
    n3 = mesh.element.ndofs
    vec = mesh.ndofs * bs
    if name == "mass":
        geom = vec                         # assembled diagonal
    else:
        geom = mesh.num_cells * n3 * 6 * bs
    return 2 * vec + geom


def _sync(r):
    """Force completion.  On the tunneled axon backend
    jax.block_until_ready returns immediately (verified: 0.05 ms for a
    multi-ms computation), so completion is observed by fetching one scalar
    (adds a fixed ~25 ms RTT that callers calibrate away)."""
    leaf = jax.tree.leaves(r)[0]
    return float(jnp.ravel(leaf)[0])


def _time(fn, *args, reps: int = 5, warmup: int = 2):
    for _ in range(warmup):
        _sync(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.std(ts))


def sync_baseline(reps: int = 10) -> float:
    """Median dispatch+scalar-fetch round-trip for a no-op, to subtract."""
    f = jax.jit(lambda v: v + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    m, _ = _time(f, x, reps=reps)
    return m


def measure_streaming_roofline(mbytes_per_array: int = 256,
                               iters: int = 300) -> float:
    """Measured HBM streaming bandwidth (GB/s): a data-dependent triad
    c = c*d + e over arrays far larger than VMEM, chained under one scan.
    Per iteration traffic = 3 reads + 1 write of each element.  The
    default iteration count keeps the measurement ~3 s — far above the
    ~28 ms dispatch RTT whose jitter otherwise swings the result by
    +-20% run to run."""
    m = mbytes_per_array * 2**20 // 4
    c = jnp.zeros((m,), jnp.float32)
    d = jnp.full((m,), np.float32(0.5))
    e = jnp.full((m,), np.float32(1e-3))

    @jax.jit
    def run(c, d, e):
        return jax.lax.scan(lambda a, _: (a * d + e, None), c, None,
                            length=iters)[0]

    base = sync_baseline()
    mean, _ = _time(run, c, d, e, reps=3)
    mean = max(mean - base, 1e-9)
    return 4 * m * 4 * iters / mean / 1e9


def measure_matmul_roofline(dim: int = 4096, iters: int = 500,
                            dtype=jnp.bfloat16) -> float:
    """Measured matmul throughput (TFLOP/s) via a chained A @ C."""
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((dim, dim)) * 1e-2, dtype)
    c = jnp.asarray(rng.standard_normal((dim, dim)) * 1e-2, dtype)

    @jax.jit
    def run(A, c):
        def body(acc, _):
            acc = jnp.dot(A, acc,
                          preferred_element_type=jnp.float32).astype(dtype)
            return acc, None

        return jax.lax.scan(body, c, None, length=iters)[0]

    base = sync_baseline()
    mean, _ = _time(run, A, c, reps=3)
    mean = max(mean - base, 1e-9)
    return 2 * dim**3 * iters / mean / 1e12


def _chain(fn, k: int):
    """k dependent applies of fn(params, x) inside one jit (lax.scan).
    The operators are linear in x, so XLA cannot algebraically collapse the
    chain (verified: synthetic multiply chains DO get folded; A^k x does
    not).  `params` is an explicit argument so operator arrays don't become
    giant HLO constants."""

    def f(params, x):
        return jax.lax.scan(lambda c, _: (fn(params, c), None), x, None,
                            length=k)[0]

    return jax.jit(f)


def time_apply(fn, params, x, chain: int = 50, reps: int = 5,
               baseline: float | None = None, grow: bool = True
               ) -> tuple[float, float]:
    """fn(params, x) -> y, timed per apply.  With `grow` (default) the
    chain length is increased (x8) until the total signal clears 10x the
    dispatch round-trip — essential on this tunneled backend, where the
    ~28 ms RTT swamps sub-millisecond chains and produces unphysical
    numbers otherwise."""
    base = sync_baseline() if baseline is None else baseline
    mean, std = _time(_chain(fn, chain), params, x, reps=reps)
    while grow and (mean - base) < 10 * base and chain < 100000:
        # jump straight to the needed length: every distinct scan length
        # is a fresh (minutes-long) compile on this backend
        per = (mean - base) / chain
        factor = (64 if per <= 0
                  else min(64, int(np.ceil(10 * base / (per * chain)))))
        chain *= max(factor, 2)
        mean, std = _time(_chain(fn, chain), params, x, reps=reps)
    return max(mean - base, 1e-9) / chain, std / chain


def bench_operators(nc: int = 32, degree: int = 4, dtype=jnp.float32,
                    reps: int = 5, chain: int = 50, mesh=None,
                    impl: str = "auto", stiffness_fn=None):
    """Times the production mass apply (diagonal multiply) and stiffness
    apply ('auto' = fused Pallas kernel on TPU, matmul formulation
    otherwise; pass `stiffness_fn(params, x)->y` for a custom kernel)."""
    from fustpu.models.discretization import Discretization, \
        resolve_stiffness_impl

    if mesh is None:
        nc3 = nc if isinstance(nc, tuple) else (nc, nc, nc)
        mesh = build_box_mesh(nc3, degree)
    elem = mesh.element
    detJ, G = pre.cell_geometry_factors(mesh)
    diag = jnp.asarray(mm.mass_diagonal(mesh.nc, degree, detJ), dtype)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(mesh.grid_shape), dtype)

    mass = lambda p, v: v * p
    if stiffness_fn is not None:
        stiff, op = stiffness_fn, None
    else:
        disc = Discretization(mesh, dtype)
        impl = resolve_stiffness_impl(impl, disc)
        if impl == "pallas":
            from fustpu.ops import pallas_stiffness as ps

            op = disc.pallas_op()
            stiff = lambda p, v: ps.stiffness_apply_pallas(p, v)
        else:
            op = disc.mm_op
            stiff = lambda p, v: mm.stiffness_apply_mm(p, v)

    base = sync_baseline()
    out = []
    for name, fn, p, k in [("mass", mass, diag, chain * 10),
                           ("stiffness", stiff, op, chain)]:
        mean, std = time_apply(fn, p, x, k, reps, base)
        out.append(OpBenchResult(
            name=name, degree=degree, ncells=mesh.num_cells,
            ndofs=mesh.ndofs, mean_s=mean, std_s=std,
            dof_per_s=mesh.ndofs / mean,
            hbm_gb_s=min_bytes(name, mesh, dtype) / mean / 1e9))
    return out


def bench_rk4_step(nc: int = 32, degree: int = 4, dtype=jnp.float32,
                   reps: int = 5, nonlinear: bool = True,
                   steps_per_call: int = 20):
    """Wall-clock per RK4 step of the (non)linear model — BASELINE.md's
    second north-star metric."""
    from fustpu.config import Material, Source
    from fustpu.models.linear import LinearWaveModel
    from fustpu.models.westervelt import WesterveltModel

    mat = Material(sound_speed=1480.0, density=1000.0,
                   nonlinearity=3.5 if nonlinear else 0.0,
                   attenuation_dB=0.2 if nonlinear else 0.0)
    src = Source(frequency=1.1e6, amplitude=1.0e5)
    L = 0.01
    mesh = build_box_mesh((nc, nc, nc), degree, hi=(L, L, L))
    cls = WesterveltModel if nonlinear else LinearWaveModel
    model = cls(mesh, mat, src, mesh.boundary_facets("x-"),
                mesh.all_boundary_facets(), dtype=dtype)
    dt, _ = model.cfl_dt(0.4)
    run = lambda s: model.solve(s, dt, steps_per_call)[0]  # internally jitted
    s0 = model.init_state()
    base = sync_baseline()
    mean, std = _time(run, s0, reps=reps)
    mean = max(mean - base, 1e-9)
    return mesh.ndofs, mean / steps_per_call, std / steps_per_call
