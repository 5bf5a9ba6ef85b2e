"""Linear second-order wave equation with windowed velocity source and
first-order absorbing boundary.

Weak form (reference cpp forms, /root/reference/cpp/demo_linear_box/forms.py
:44-48, and coefficient recipes numba-cpu/demo_linear_box.py:250-268):

    LHS  m  = (1/(rho c^2)) u v dx                        (diagonal)
    RHS  b  = -(1/rho) grad(u_n).grad(v) dx
              + (g(t)/rho) v ds(Gamma_src)
              - (v_n/(rho c)) v ds(Gamma_abs)
    du/dt = v ;  dv/dt = b / m

As a first-order system integrated with RK4 under lax.scan; the whole step
is one jitted computation on the TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from fustpu.config import Material, Source
from fustpu.mesh.box import BoxMesh
from fustpu.models import sources, timestepping
from fustpu.models.discretization import Discretization
from fustpu.ops import operators as ops


class LinearWaveModel:
    def __init__(
        self,
        mesh: BoxMesh,
        material: Material,
        source: Source,
        source_facets: np.ndarray,
        absorbing_facets: np.ndarray | None,
        dtype=jnp.float32,
    ):
        self.mesh = mesh
        self.material = material
        self.source = source
        self.dtype = dtype
        disc = Discretization(mesh, dtype)
        self.disc = disc

        rho, c = material.density, material.sound_speed
        nc = mesh.nc
        # cell coefficient fields (uniform here; per-cell arrays supported
        # by the operators for heterogeneous media)
        c1 = np.full(nc, 1.0 / (rho * c * c)).reshape(-1)
        self.c2 = jnp.asarray(np.full(nc, -1.0 / rho), dtype)

        # steady diagonal LHS, assembled once in f64 on host
        self.m = disc.to_grid(disc.assemble_mass_host(c1))

        # source boundary: g(t) is spatially constant, so its facet-mass
        # contribution is g(t) * s_vec with s_vec precomputed (exact).
        self.src_block = disc.facet_block(source_facets)
        f1 = np.full(self.src_block.num_facets, 1.0 / rho)
        self.s_vec = disc.to_grid(
            disc.assemble_facet_mass_host(self.src_block, f1))

        # absorbing boundary: -(1/(rho c)) v_n v ds
        self.abs_block = None
        if absorbing_facets is not None and len(absorbing_facets) > 0:
            self.abs_block = disc.facet_block(absorbing_facets)
            self.f2 = jnp.asarray(
                np.full(self.abs_block.num_facets, -1.0 / (rho * c)), dtype)

    # ------------------------------------------------------------------
    def rhs(self, t, u, v):
        """kv = M^{-1} b(t, u, v) on the node grid."""
        disc = self.disc
        b = ops.stiffness_apply(u, disc.G_s, self.c2, disc.D, disc.P)
        g = sources.linear_source(t, self.source, self.material.sound_speed)
        b = b + g.astype(self.dtype) * self.s_vec
        if self.abs_block is not None:
            blk = self.abs_block
            bf = ops.mass_apply_indexed(v.reshape(-1), blk.detJ, self.f2,
                                        blk.dofmap, self.mesh.ndofs)
            b = b + bf.reshape(self.mesh.grid_shape)
        return b / self.m

    # ------------------------------------------------------------------
    def init_state(self, t0: float = 0.0, u0=None, v0=None
                   ) -> timestepping.RKState:
        z = jnp.zeros(self.mesh.grid_shape, self.dtype)
        u0 = z if u0 is None else jnp.asarray(u0, self.dtype).reshape(z.shape)
        v0 = z if v0 is None else jnp.asarray(v0, self.dtype).reshape(z.shape)
        return timestepping.init_state(u0, v0, t0)

    def step(self, state, dt, tf=None):
        return timestepping.rk4_step(self.rhs, state, dt, tf)

    def solve(self, state, dt: float, num_steps: int, tf=None, probe=None):
        return timestepping.solve(self.rhs, state, dt, num_steps, tf, probe)

    def cfl_dt(self, cfl: float = 0.65) -> tuple[float, int]:
        """dt = CFL h / (c P^2), snapped to an integer number of steps per
        source period (reference numba-cpu/demo_linear_box.py:94-100)."""
        dt = cfl * self.mesh.hmin() / (
            self.material.sound_speed * self.mesh.degree**2)
        spp = int(self.source.period / dt) + 1
        return self.source.period / spp, spp
