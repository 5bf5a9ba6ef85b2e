"""Explicit RK4 time integration under `jax.lax.scan`.

The reference hand-rolls the RK4 loop on the host, launching ~30 device
kernels per stage (cuda/demo_nonlinear_bowl.py:529-654).  Here one full time
step (4 stages) is a single traced function; `make_solver` wraps it in
`lax.scan`, so the entire run is one XLA computation with no host round
trips.  Butcher arrays are the classic RK4 tableau (fustpu.config.RK4_*,
matching reference numba-cpu/demo_linear_box.py:391-393).

All model arrays are threaded through an explicit `params` pytree argument
— never closure-captured — so they enter XLA as runtime parameters instead
of giant HLO constants (closure-captured 100MB geometry blobs make compiles
take minutes and bloat the executable).

The slope convention matches the reference exactly:
    ku = f0(t, u, v) = v
    kv = f1(t, u, v) = M(u)^{-1} b(t, u, v)
with ku/kv carried across steps (stage 0 has a=0, so the stale value is
never used).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from fustpu.config import RK4_A, RK4_B, RK4_C
from fustpu.ops import vector as vec


class RKState(NamedTuple):
    u: jax.Array
    v: jax.Array
    ku: jax.Array
    kv: jax.Array
    t: jax.Array


def init_state(u0: jax.Array, v0: jax.Array, t0: float) -> RKState:
    return RKState(u=u0, v=v0, ku=jnp.zeros_like(u0),
                   kv=jnp.zeros_like(v0), t=jnp.asarray(t0, u0.dtype))


def rk4_step(rhs: Callable, params, state: RKState, dt, tf=None) -> RKState:
    """One RK4 step.  `rhs(params, t, u, v) -> kv`.  If `tf` is given the
    last step is clamped to land on tf (reference `dt = min(dt, tf - t)`,
    cuda/demo_nonlinear_bowl.py:530)."""
    u, v, ku, kv, t = state
    dt = jnp.asarray(dt, u.dtype)
    if tf is not None:
        # clamp the last step onto tf; steps past tf become no-ops (dt=0)
        # rather than integrating backwards
        dt = jnp.clip(jnp.asarray(tf, u.dtype) - t, 0.0, dt)
    u0, v0 = u, v
    for i in range(4):
        a_i = u.dtype.type(RK4_A[i])
        b_i = u.dtype.type(RK4_B[i])
        c_i = u.dtype.type(RK4_C[i])
        un = vec.axpy(a_i * dt, ku, u0)      # reference "~ RK (axpy a)"
        vn = vec.axpy(a_i * dt, kv, v0)
        tn = t + c_i * dt
        ku = vec.copy(vn)                    # f0: ku = v
        kv = rhs(params, tn, un, vn)
        u = vec.axpy(b_i * dt, ku, u)        # reference "~ RK (axpy b)"
        v = vec.axpy(b_i * dt, kv, v)
    return RKState(u=u, v=v, ku=ku, kv=kv, t=t + dt)


def make_solver(rhs: Callable, num_steps: int,
                probe: Callable[[RKState], jax.Array] | None = None,
                clamp_tf: bool = False):
    """Build a jitted solver fn(params, state, dt, tf) -> (state, ys)
    running `num_steps` RK4 steps under lax.scan.

    The step time is recomputed as t = t0 + k*dt from an integer step
    index each iteration (the scan runs over arange) instead of being
    accumulated as t += dt in the compute dtype: accumulating f32 adds a
    deterministic per-step rounding that grows linearly (a systematic
    source-phase error of up to a few % of the period over ~1e4 steps);
    the reference avoids it by stepping t on the host in float64."""

    @jax.jit
    def run(params, state: RKState, dt, tf):
        t0 = state.t

        def body(s, k):
            t = t0 + k.astype(t0.dtype) * dt
            if clamp_tf:
                t = jnp.minimum(t, tf)   # no-op steps past tf stay at tf
            s = s._replace(t=t)
            s = rk4_step(rhs, params, s, dt, tf if clamp_tf else None)
            return s, (probe(s) if probe is not None else None)

        return jax.lax.scan(body, state, jnp.arange(num_steps))

    return run
