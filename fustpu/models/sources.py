"""Time-dependent boundary source terms (pure jnp, branchless).

The reference evaluates its Hann-windowed sinusoid source on the host every
RK stage and memsets a device vector with the scalar
(numba-cpu/demo_linear_box.py:341-358, cuda/demo_nonlinear_bowl.py:556-598).
Here the source scalars are traced functions of t, evaluated inside the
jitted scan body — no host round-trip, no data-dependent branching
(jnp.where instead of `if t < T*alpha`).
"""

from __future__ import annotations

import jax.numpy as jnp

from fustpu.config import Source


def hann_window(t, source: Source):
    """window(t) ramps 0 -> 1 over `window_periods` periods; and its time
    derivative.  Branchless analogue of the reference's
    `if t < T*alpha: window = 0.5(1 - cos(f pi t / alpha))`."""
    alpha = source.window_periods
    f = source.frequency
    ramp = t < alpha / f
    w = jnp.where(ramp, 0.5 * (1.0 - jnp.cos(f * jnp.pi * t / alpha)), 1.0)
    dw = jnp.where(
        ramp, 0.5 * jnp.pi * f / alpha * jnp.sin(f * jnp.pi * t / alpha), 0.0)
    return w, dw


def linear_source(t, source: Source, sound_speed: float):
    """g(t) for the linear model: window * A * omega / c * cos(omega t)
    (reference numba-cpu/demo_linear_box.py:350-358)."""
    w, _ = hann_window(t, source)
    omega = source.angular_frequency
    return w * source.amplitude * omega / sound_speed * jnp.cos(omega * t)


def westervelt_source(t, source: Source, sound_speed: float):
    """(g, dg) for the Westervelt model — the source enters with a factor 2
    and its time derivative feeds the boundary attenuation term
    (reference cuda/demo_nonlinear_bowl.py:573-595)."""
    w, dw = hann_window(t, source)
    omega = source.angular_frequency
    amp = 2.0 * source.amplitude * omega / sound_speed
    g = w * amp * jnp.cos(omega * t)
    dg = dw * amp * jnp.cos(omega * t) - w * amp * omega * jnp.sin(omega * t)
    return g, dg
