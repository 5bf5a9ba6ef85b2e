"""Explicit RK4 time integration under `jax.lax.scan`.

The reference hand-rolls the RK4 loop on the host, launching ~30 device
kernels per stage (cuda/demo_nonlinear_bowl.py:529-654).  Here one full time
step (4 stages) is a single traced function; `solve` wraps it in
`lax.scan`, so the entire run is one XLA computation with no host round
trips.  Butcher arrays are the classic RK4 tableau (fustpu.config.RK4_*,
matching reference numba-cpu/demo_linear_box.py:391-393).

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


class RKState(NamedTuple):
    u: jax.Array
    v: jax.Array
    ku: jax.Array
    kv: jax.Array
    t: jax.Array


def init_state(u0: jax.Array, v0: jax.Array, t0: float) -> RKState:
    return RKState(u=u0, v=v0, ku=jnp.zeros_like(u0),
                   kv=jnp.zeros_like(v0), t=jnp.asarray(t0, u0.dtype))


def rk4_step(rhs: Callable, state: RKState, dt, tf=None) -> RKState:
    """One RK4 step.  `rhs(t, u, v) -> kv`.  If `tf` is given the last step
    is clamped to land on tf (reference `dt = min(dt, tf - t)`,
    cuda/demo_nonlinear_bowl.py:530)."""
    u, v, ku, kv, t = state
    dt = jnp.asarray(dt, u.dtype)
    if tf is not None:
        dt = jnp.minimum(dt, jnp.asarray(tf, u.dtype) - t)
    u0, v0 = u, v
    for i in range(4):
        a_i = u.dtype.type(RK4_A[i])
        b_i = u.dtype.type(RK4_B[i])
        c_i = u.dtype.type(RK4_C[i])
        un = u0 + a_i * dt * ku
        vn = v0 + a_i * dt * kv
        tn = t + c_i * dt
        ku = vn
        kv = rhs(tn, un, vn)
        u = u + b_i * dt * ku
        v = v + b_i * dt * kv
    return RKState(u=u, v=v, ku=ku, kv=kv, t=t + dt)


def solve(rhs: Callable, state: RKState, dt: float, num_steps: int,
          tf: float | None = None,
          probe: Callable[[RKState], jax.Array] | None = None):
    """Run `num_steps` RK4 steps under lax.scan.  Returns (final_state, ys)
    where ys stacks `probe(state)` per step (or None)."""

    def body(s, _):
        s = rk4_step(rhs, s, dt, tf)
        return s, (probe(s) if probe is not None else None)

    return jax.lax.scan(body, state, None, length=num_steps)
