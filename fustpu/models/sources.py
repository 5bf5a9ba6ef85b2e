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


# ---------------------------------------------------------------------------
# Phased (focused) sources.  A per-node delay tau(x) makes the source field
# g(t - tau(x)); because it is time-separable,
#   cos(omega (t - tau)) = cos(omega t) cos(phi) + sin(omega t) sin(phi),
# phi = omega tau, the facet-mass contribution splits into TWO precomputed
# diagonal vectors (built with cos(phi) / sin(phi) node weights) times the
# scalar coefficients below.  This is the flat-aperture phased-array
# equivalent of the reference's geometrically-curved H131 bowl mesh
# (cuda/demo_nonlinear_bowl.py) — no unstructured mesh needed, and the
# per-stage cost is still two axpys.  (Approximation: the window w(t) is not
# delayed per node, exact once t > tau + ramp.)
# ---------------------------------------------------------------------------

def linear_source_coeffs(t, source: Source, sound_speed: float):
    """(alpha_cos, alpha_sin): source term = a_c * s_cos + a_s * s_sin."""
    w, _ = hann_window(t, source)
    omega = source.angular_frequency
    K = source.amplitude * omega / sound_speed
    return w * K * jnp.cos(omega * t), w * K * jnp.sin(omega * t)


def westervelt_source_coeffs(t, source: Source, sound_speed: float):
    """((g_c, g_s), (dg_c, dg_s)) coefficients for the g and dg terms."""
    w, dw = hann_window(t, source)
    omega = source.angular_frequency
    K = 2.0 * source.amplitude * omega / sound_speed
    c_, s_ = jnp.cos(omega * t), jnp.sin(omega * t)
    g_c, g_s = w * K * c_, w * K * s_
    dg_c = dw * K * c_ - w * K * omega * s_
    dg_s = dw * K * s_ + w * K * omega * c_
    return (g_c, g_s), (dg_c, dg_s)


def resolve_profiles(disc, block, omega: float, delays, apod):
    """Normalise user-supplied delay/apodisation profiles (callables over
    facet-node coordinates or (nf, n^2) arrays) into node-weight arrays:
    returns (apod_weights (nf,n^2) or None, phase phi = omega*tau or None)."""
    import numpy as np

    pts = None
    if callable(delays) or callable(apod):
        pts = disc.facet_points(block).reshape(-1, 3)
    shape = block.dofmap_host.shape

    def norm(p):
        if p is None:
            return None
        if callable(p):
            return np.asarray(p(pts)).reshape(shape)
        return np.broadcast_to(np.asarray(p, np.float64), shape)

    tau = norm(delays)
    a = norm(apod)
    return a, (None if tau is None else omega * tau)


def focus_delays(points, focus, sound_speed: float):
    """Delays tau(x) >= 0 so all wavelets arrive at `focus` in phase —
    emulating a spherical-cap (bowl) transducer with a flat phased
    aperture."""
    import numpy as np

    r = np.linalg.norm(np.asarray(points) - np.asarray(focus), axis=-1)
    return (r.max() - r) / sound_speed
