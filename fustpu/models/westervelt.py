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

TPU realisation per RK stage (uniform media): ONE matmul-form stiffness
apply — the two stiffness terms fuse into A(c3 u + c4 v) since the operator
is linear and the coefficients are scalars — plus elementwise multiplies
for every mass-type term (all globally diagonal under GLL collocation: the
unsteady LHS update, the v^2 term, both source vectors, and the absorbing
term).  The reference instead launches 2 stiffness + 4 mass kernels and 5
MPI scatters per stage (cuda/demo_nonlinear_bowl.py:529-654).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fustpu.config import Material, Source
from fustpu.mesh.box import BoxMesh
from fustpu.models import sources
from fustpu.models.base import WaveModelBase
from fustpu.models.discretization import Discretization, resolve_stiffness_impl
from fustpu.ops import spectral_mm as mm


class WesterveltModel(WaveModelBase):
    DEFAULT_CFL = 0.4

    def __init__(
        self,
        mesh: BoxMesh,
        material: Material,
        source: Source,
        source_facets: np.ndarray,
        absorbing_facets: np.ndarray | None,
        dtype=jnp.float32,
        source_delays=None,
        source_apodization=None,
        stiffness_impl: str = "auto",
        pallas_precision=None,
    ):
        """`source_delays` / `source_apodization`: optional per-node phased-
        aperture profiles (callable(points)->array or (nf, n^2) arrays) —
        the flat phased-array equivalent of the reference's curved H131
        bowl mesh (see fustpu.models.sources)."""
        self.mesh = mesh
        self.material = material
        self.source = source
        self.dtype = dtype
        self._pallas_precision = pallas_precision
        disc = Discretization(mesh, dtype)
        self.disc = disc

        cshape = mesh.nc if disc.structured else (mesh.num_cells,)
        c, rho, beta, _ = material.cell_fields(cshape)
        delta = np.broadcast_to(np.asarray(
            material.diffusivity_of_sound(source.angular_frequency),
            np.float64), cshape)
        self.delta = delta if np.ptp(delta) else float(delta.flat[0])
        self.uniform = material.is_uniform

        # cell coefficients (cuda/demo_nonlinear_bowl.py:357-362)
        nl = 2.0 * beta / (rho * rho * c**4)
        impl = resolve_stiffness_impl(stiffness_impl, disc)
        # 'pallas_corner' = fused kernel in memory-capacity mode
        self._corner = impl == "pallas_corner"
        self.impl = "pallas" if self._corner else impl
        # extruded capacity mode: 37-floats/cell geometry stream
        self._ext_corner = impl == "extruded_pallas_corner"
        if self._ext_corner:
            self.impl = "extruded_pallas"
        self.c3_scalar = self.c4_scalar = None
        self.c3_e = self.c4_e = self.c3_cells = self.c4_cells = None
        self.c3_x = self.c4_x = None
        if self.uniform:      # the one-apply fold coefficients, any impl
            self.c3_scalar = dtype(-1.0 / float(rho.flat[0]))
            self.c4_scalar = dtype(-float(delta.flat[0])
                                   / float((rho * c * c).flat[0]))
        if (self.impl == "extruded_pallas" and not self.uniform
                and not disc.ext_pallas_fits(pair=True,
                                             corner=self._ext_corner)):
            # the pair kernel's VMEM budget (doubled field IO + the ce
            # block) is tighter than the single kernel's — fall back to
            # the XLA pair path rather than fail at Mosaic compile
            if self._ext_corner:
                import warnings

                warnings.warn(
                    "heterogeneous corner capacity mode: the PAIR "
                    "footprint exceeds the VMEM budget — falling back "
                    "to the XLA extruded pair, which materialises the "
                    "full G stream (capacity-defeating at >10^8 DOF)",
                    stacklevel=2)
            self.impl = "extruded"
            self._ext_corner = False
        if self.impl == "extruded_pallas":
            from fustpu.models.discretization import on_tpu

            self._ext_interpret = not on_tpu()
            if self.uniform:
                self._stiff_op = disc.extruded_pallas_op(
                    corner=self._ext_corner)
            else:
                nc_ = (mesh.num_cells,)
                self._stiff_op = disc.extruded_pallas_pair_op(
                    np.broadcast_to(-1.0 / rho, nc_),
                    np.broadcast_to(-delta / (rho * c * c), nc_),
                    corner=self._ext_corner)
        elif self.impl == "extruded":
            from fustpu.ops import operators as ops

            self._stiff_op = disc.extruded_op
            if not self.uniform:
                nc_ = (mesh.num_cells,)
                self.c3_x = ops.expand_coeff_extruded(
                    mesh, np.broadcast_to(-1.0 / rho, nc_), dtype)
                self.c4_x = ops.expand_coeff_extruded(
                    mesh, np.broadcast_to(-delta / (rho * c * c), nc_),
                    dtype)
        elif self.impl in ("indexed", "indexed_engine"):
            self.c3_cells = jnp.asarray((-1.0 / rho).reshape(-1), dtype)
            self.c4_cells = jnp.asarray(
                (-delta / (rho * c * c)).reshape(-1), dtype)
            self._idx_engine = (disc.indexed_engine
                                if self.impl == "indexed_engine" else None)
            # fully-fused single-kernel form when the mesh is eligible;
            # it supersedes the 3-kernel tensors — don't hold the
            # (G, dofmap, D) device copies (~50 B/dof) when it's active
            self._idx_fused = (disc.fused_engine
                               if self._idx_engine is not None else None)
            self._stiff_op = (disc.indexed_op
                              if self._idx_fused is None else None)
            from fustpu.models.discretization import on_tpu

            self._engine_interpret = (self.impl == "indexed_engine"
                                      and not on_tpu())
        elif self.uniform:
            self._stiff_op = (disc.pallas_op(corner=self._corner)
                              if self.impl == "pallas" else disc.mm_op)
        else:
            n = mesh.degree + 1
            self.c3_e = jnp.asarray(mm.expand_cell_field(-1.0 / rho, n),
                                    dtype)
            self.c4_e = jnp.asarray(
                mm.expand_cell_field(-delta / (rho * c * c), n), dtype)
            self._pair = False
            if self.impl == "pallas":
                from fustpu.ops import pallas_stiffness as ps

                nn = mesh.degree + 1
                single_slab = (not self._corner and ps.pallas_fits(
                    nn, mesh.nc[1], mesh.nc[2], mesh.nc[2] * mesh.degree
                    + 1, pair=True))
                if single_slab:
                    # ONE fused pass for both stiffness terms, one
                    # unit-coefficient G (instead of two folded copies)
                    self._pair = True
                    self._stiff_op = ps.build_pair(
                        mesh.nc, mesh.degree, disc._D_host, disc._G_host,
                        dtype, -1.0 / rho, -delta / (rho * c * c))
                else:
                    # y-partitioned / corner: two folded operators
                    self._stiff_op = (
                        disc.pallas_op(coeff=-1.0 / rho,
                                       corner=self._corner),
                        disc.pallas_op(coeff=-delta / (rho * c * c),
                                       corner=self._corner))
            else:
                self._stiff_op = disc.mm_op

        # unsteady mass diagonal: mass(u; -nl) = u * mvec2 (and the v^2 RHS
        # term uses +nl, i.e. exactly -mvec2).  All diagonal vectors are
        # stored FLAT (lane-padding avoidance; see LinearWaveModel).
        to_flat = lambda a: disc.to_grid(a).reshape(-1)
        self.mvec2 = to_flat(disc.mass_diag_host(-nl))

        # steady LHS m0 (+ absorbing-facet delta term), f64 host
        m0 = disc.mass_diag_host(1.0 / (rho * c * c))
        self.fvec_abs = None
        if absorbing_facets is not None and len(absorbing_facets) > 0:
            blk = disc.facet_block(absorbing_facets)
            self.abs_block = blk
            cells = blk.cells
            m0 = m0 + disc.facet_diag_host(
                blk, (delta / (rho * c**3)).reshape(-1)[cells])
            self.fvec_abs = to_flat(disc.facet_diag_host(
                blk, (-1.0 / (rho * c)).reshape(-1)[cells]))
        else:
            self.abs_block = None
        self.m0 = to_flat(m0)

        # source boundary: g/dg time-separable -> precomputed vectors (a
        # cos/sin pair each for phased apertures)
        self.src_block = disc.facet_block(source_facets)
        nfs = self.src_block.num_facets
        self.c_src = float(np.mean(c.reshape(-1)[self.src_block.cells])) \
            if nfs else float(np.max(c))
        apod, phi = sources.resolve_profiles(
            disc, self.src_block, source.angular_frequency,
            source_delays, source_apodization)
        scells = self.src_block.cells
        f1 = (1.0 / rho).reshape(-1)[scells]
        f2 = (delta / (rho * c * c)).reshape(-1)[scells]
        if phi is None:
            self.s1_cos = to_flat(disc.facet_diag_host(
                self.src_block, f1, apod))
            self.s2_cos = to_flat(disc.facet_diag_host(
                self.src_block, f2, apod))
            self.s1_sin = self.s2_sin = None
        else:
            cw = np.cos(phi) if apod is None else apod * np.cos(phi)
            sw = np.sin(phi) if apod is None else apod * np.sin(phi)
            self.s1_cos = to_flat(disc.facet_diag_host(
                self.src_block, f1, cw))
            self.s1_sin = to_flat(disc.facet_diag_host(
                self.src_block, f1, sw))
            self.s2_cos = to_flat(disc.facet_diag_host(
                self.src_block, f2, cw))
            self.s2_sin = to_flat(disc.facet_diag_host(
                self.src_block, f2, sw))
        self._solver_cache = {}

    # ------------------------------------------------------------------
    @property
    def params(self):
        """All device arrays, threaded explicitly through jit (never
        closure-captured — large constants wreck compile times)."""
        p = {"m0": self.m0, "mvec2": self.mvec2, "s1_cos": self.s1_cos,
             "s2_cos": self.s2_cos, "stiff": self._stiff_op}
        if self.c3_e is not None:
            p["c3_e"], p["c4_e"] = self.c3_e, self.c4_e
        if self.c3_cells is not None:
            p["c3_c"], p["c4_c"] = self.c3_cells, self.c4_cells
        if self.c3_x is not None:
            p["c3_x"], p["c4_x"] = self.c3_x, self.c4_x
        if self.s1_sin is not None:
            p["s1_sin"], p["s2_sin"] = self.s1_sin, self.s2_sin
        if self.fvec_abs is not None:
            p["fvec"] = self.fvec_abs
        if getattr(self, "_idx_fused", None) is not None:
            p["fused"] = self._idx_fused
        return p

    def _rhs(self, params, t, u, v):
        from fustpu.ops import vector as vec

        # unsteady LHS: m = m0 + mass(u; -2 beta / rho^2 c^4) — diagonal
        m = params["m0"] + u * params["mvec2"]
        b = self._apply_stiffness(params, u, v)
        b = b - vec.square(v) * params["mvec2"]   # + nl * v^2 mass term
        (g_c, g_s), (dg_c, dg_s) = sources.westervelt_source_coeffs(
            t, self.source, self.c_src)
        dt_ = self.dtype
        b = b + g_c.astype(dt_) * params["s1_cos"]
        b = b + dg_c.astype(dt_) * params["s2_cos"]
        if "s1_sin" in params:
            b = b + g_s.astype(dt_) * params["s1_sin"]
            b = b + dg_s.astype(dt_) * params["s2_sin"]
        if "fvec" in params:
            b = b + v * params["fvec"]
        return vec.pointwise_divide(b, m)     # the diagonal solve

    def _apply_stiffness(self, params, u_flat, v_flat):
        if self.impl == "extruded_pallas":
            from fustpu.ops import pallas_extruded as pex

            kw = ({} if self._pallas_precision is None
                  else {"precision": self._pallas_precision})
            nd = self.mesh.ndofs
            if self.uniform:
                x = self.c3_scalar * u_flat + self.c4_scalar * v_flat
                return pex.stiffness_apply_extruded_pallas(
                    x, params["stiff"], nd,
                    interpret=self._ext_interpret, **kw)
            return pex.stiffness_apply_extruded_pallas_pair(
                u_flat, v_flat, params["stiff"], nd,
                interpret=self._ext_interpret, **kw)
        if self.impl == "extruded":
            from fustpu.ops import operators as ops

            nd = self.mesh.ndofs
            if self.uniform:
                # both stiffness terms in ONE apply (linearity)
                x = self.c3_scalar * u_flat + self.c4_scalar * v_flat
                return ops.stiffness_apply_extruded(x, params["stiff"], nd)
            # one factorized pass for both terms (coefficients commute
            # with the in-cell contractions in the expanded layout)
            return ops.stiffness_apply_extruded_pair(
                u_flat, v_flat, params["stiff"], nd,
                params["c3_x"], params["c4_x"])
        if self.impl in ("indexed", "indexed_engine"):
            from fustpu.ops import operators as ops

            nd = self.mesh.ndofs
            if "fused" in params:
                from fustpu.ops import pallas_gather as pg

                if self.uniform:
                    x = self.c3_scalar * u_flat + self.c4_scalar * v_flat
                    return pg.fused_apply(
                        x, None, params["fused"], nd,
                        interpret=self._engine_interpret)
                return pg.fused_apply_pair(
                    u_flat, params["c3_c"], v_flat, params["c4_c"],
                    params["fused"], nd,
                    interpret=self._engine_interpret)
            G, dofmap, D = params["stiff"]
            kw = dict(engine=self._idx_engine,
                      engine_interpret=self._engine_interpret)
            if self.uniform:
                # both stiffness terms in ONE apply (linearity): halves
                # the gather/contract/scatter work per stage
                x = self.c3_scalar * u_flat + self.c4_scalar * v_flat
                return ops.stiffness_apply_indexed(
                    x, G, None, dofmap, D, nd, **kw)
            # heterogeneous: one pass sharing a single scatter
            return ops.stiffness_apply_indexed_pair(
                u_flat, params["c3_c"], v_flat, params["c4_c"],
                G, dofmap, D, nd, **kw)
        g = self.mesh.grid_shape
        if self.impl == "pallas":
            from fustpu.ops import pallas_stiffness as ps

            kw = ({} if self._pallas_precision is None
                  else {"precision": self._pallas_precision})
            if self.uniform:
                x = (self.c3_scalar * u_flat
                     + self.c4_scalar * v_flat).reshape(g)
                b = ps.stiffness_apply_pallas(params["stiff"], x, **kw)
            elif getattr(self, "_pair", False):
                b = ps.stiffness_apply_pallas_pair(
                    params["stiff"], u_flat.reshape(g),
                    v_flat.reshape(g), **kw)
            else:
                op3, op4 = params["stiff"]
                b = (ps.stiffness_apply_pallas(op3, u_flat.reshape(g), **kw)
                     + ps.stiffness_apply_pallas(op4, v_flat.reshape(g),
                                                 **kw))
        elif self.uniform:
            # both stiffness terms in ONE apply (linearity, scalar coeffs)
            x = (self.c3_scalar * u_flat + self.c4_scalar * v_flat).reshape(g)
            b = mm.stiffness_apply_mm(params["stiff"], x)
        else:
            # one contraction pass for both terms (coefficients commute
            # with the in-cell contractions in the expanded layout)
            b = mm.stiffness_apply_mm_pair(
                params["stiff"], u_flat.reshape(g), v_flat.reshape(g),
                params["c3_e"], params["c4_e"])
        return b.reshape(-1)

