"""Westervelt nonlinear wave equation (the reference's flagship physics,
cuda/demo_nonlinear_bowl.py / demo_nonlinear_box.py).

Coefficient recipes (cuda/demo_nonlinear_bowl.py:357-374):

    steady LHS    m0 = (1/(rho c^2)) u v dx + (delta/(rho c^3)) u v ds(abs)
    unsteady LHS  m  = m0 - (2 beta/(rho^2 c^4)) u_n u v dx     (per stage!)
    RHS b = -(1/rho) grad(u_n).grad(v) dx
            - (delta/(rho c^2)) grad(v_n).grad(v) dx
            + (2 beta/(rho^2 c^4)) v_n^2 v dx
            + (g(t)/rho) v ds(src) + (delta dg(t)/(rho c^2)) v ds(src)
            - (v_n/(rho c)) v ds(abs)
    dv/dt = b / m

The v_n^2 term is the reference's `square` kernel + mass apply
(cuda/demo_nonlinear_bowl.py:601,633-635) — here just an elementwise square
fused by XLA into the mass apply.
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


class WesterveltModel:
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
        beta = material.nonlinearity
        delta = material.diffusivity_of_sound(source.angular_frequency)
        self.delta = delta
        nc = mesh.nc

        # cell coefficients (cuda/demo_nonlinear_bowl.py:357-362)
        c1 = np.full(nc, 1.0 / (rho * c * c)).reshape(-1)
        nl = 2.0 * beta / (rho * rho * c**4)
        self.c2m = jnp.asarray(np.full(nc, -nl), dtype)    # unsteady mass
        self.c3 = jnp.asarray(np.full(nc, -1.0 / rho), dtype)
        self.c4 = jnp.asarray(np.full(nc, -delta / (rho * c * c)), dtype)
        self.c5 = jnp.asarray(np.full(nc, nl), dtype)

        # steady LHS m0 (+ absorbing-facet delta term), f64 host assembly
        m0 = disc.assemble_mass_host(c1)
        self.abs_block = None
        if absorbing_facets is not None and len(absorbing_facets) > 0:
            self.abs_block = disc.facet_block(absorbing_facets)
            nfa = self.abs_block.num_facets
            m0 = m0 + disc.assemble_facet_mass_host(
                self.abs_block, np.full(nfa, delta / (rho * c**3)))
            self.f2_2 = jnp.asarray(np.full(nfa, -1.0 / (rho * c)), dtype)
        self.m0 = disc.to_grid(m0)

        # source boundary: g and dg are spatially constant scalars -> their
        # facet-mass contributions are precomputed vectors times g(t), dg(t)
        self.src_block = disc.facet_block(source_facets)
        nfs = self.src_block.num_facets
        self.s1_vec = disc.to_grid(disc.assemble_facet_mass_host(
            self.src_block, np.full(nfs, 1.0 / rho)))
        self.s2_vec = disc.to_grid(disc.assemble_facet_mass_host(
            self.src_block, np.full(nfs, delta / (rho * c * c))))

    # ------------------------------------------------------------------
    def rhs(self, t, u, v):
        disc = self.disc
        P, D = disc.P, disc.D
        grid = self.mesh.grid_shape

        # unsteady LHS: m = m0 + mass(u; -2 beta / rho^2 c^4)
        m = self.m0 + ops.mass_apply(u, disc.detJ_s, self.c2m, P)

        # RHS
        b = ops.stiffness_apply(u, disc.G_s, self.c3, D, P)
        b = b + ops.stiffness_apply(v, disc.G_s, self.c4, D, P)
        b = b + ops.mass_apply(v * v, disc.detJ_s, self.c5, P)
        g, dg = sources.westervelt_source(t, self.source,
                                          self.material.sound_speed)
        b = b + g.astype(self.dtype) * self.s1_vec
        b = b + dg.astype(self.dtype) * self.s2_vec
        if self.abs_block is not None:
            blk = self.abs_block
            bf = ops.mass_apply_indexed(v.reshape(-1), blk.detJ, self.f2_2,
                                        blk.dofmap, self.mesh.ndofs)
            b = b + bf.reshape(grid)
        return b / m

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

    def cfl_dt(self, cfl: float = 0.4) -> tuple[float, int]:
        dt = cfl * self.mesh.hmin() / (
            self.material.sound_speed * self.mesh.degree**2)
        spp = int(self.source.period / dt) + 1
        return self.source.period / spp, spp
