"""Linear second-order wave equation with windowed velocity source and
first-order absorbing boundary.

Weak form (reference cpp forms, /root/reference/cpp/demo_linear_box/forms.py
:44-48, and coefficient recipes numba-cpu/demo_linear_box.py:250-268):

    LHS  m  = (1/(rho c^2)) u v dx                        (diagonal)
    RHS  b  = -(1/rho) grad(u_n).grad(v) dx
              + (g(t)/rho) v ds(Gamma_src)
              - (v_n/(rho c)) v ds(Gamma_abs)
    du/dt = v ;  dv/dt = b / m

TPU realisation per RK stage: ONE matmul-form stiffness apply + three
elementwise multiplies (the mass LHS, the source vector, and the absorbing
facet term are all precomputed diagonals — see
fustpu.models.discretization).  The reference launches a stiffness kernel,
two facet-mass kernels and ~10 vector kernels per stage instead
(numba-cpu/demo_linear_box.py:361-382).
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


class LinearWaveModel(WaveModelBase):
    DEFAULT_CFL = 0.65

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
        """`source_delays`: optional per-node delay profile tau(x) for a
        phased (focused) aperture — a callable(points (N,3)) -> tau (N,) or
        an (nf, n^2) array.  `source_apodization`: optional amplitude
        profile, same convention.  See fustpu.models.sources.
        `stiffness_impl`: 'auto' | 'mm' | 'pallas' | 'pallas_corner'
        (corner = fused kernel in 20x-less-geometry-memory mode).
        `pallas_precision`: None = the kernel's validated default (bf16x3
        for f32 fields, full precision for f64); pass
        jax.lax.Precision.HIGHEST to force the full-f32 kernel."""
        self.mesh = mesh
        self.material = material
        self.source = source
        self.dtype = dtype
        self._pallas_precision = pallas_precision
        disc = Discretization(mesh, dtype)
        self.disc = disc

        cshape = mesh.nc if disc.structured else (mesh.num_cells,)
        c, rho, _, _ = material.cell_fields(cshape)
        self.uniform = material.is_uniform
        # steady diagonal LHS: mass diag with coeff 1/(rho c^2), f64 host
        # (all diagonal vectors are stored FLAT: elementwise ops on flat
        # vectors avoid the ~2x lane-padding of odd 3D grid dims)
        to_flat = lambda a: disc.to_grid(a).reshape(-1)
        self.m = to_flat(disc.mass_diag_host(1.0 / (rho * c * c)))
        # stiffness coefficient -1/rho: a scalar for uniform media (fused
        # into the apply), an expanded per-cell field otherwise
        impl = resolve_stiffness_impl(stiffness_impl, disc)
        # 'pallas_corner' = fused kernel in memory-capacity mode
        self._corner = impl == "pallas_corner"
        self.impl = "pallas" if self._corner else impl
        # extruded capacity mode: 37-floats/cell geometry stream
        self._ext_corner = impl == "extruded_pallas_corner"
        if self._ext_corner:
            self.impl = "extruded_pallas"
        self.c2_scalar = self.c2_e = self.c2_cells = self.c2_x = None
        if self.impl == "extruded_pallas":
            # prismatic imported mesh, fused kernel (TPU production path;
            # interpret mode drives it on CPU backends in tests)
            from fustpu.models.discretization import on_tpu

            self._ext_interpret = not on_tpu()
            if self.uniform:
                self.c2_scalar = dtype(-1.0 / float(rho.flat[0]))
                self._stiff_op = disc.extruded_pallas_op(
                    corner=self._ext_corner)
            else:
                self._stiff_op = disc.extruded_pallas_op(
                    coeff=np.broadcast_to(-1.0 / rho, (mesh.num_cells,)),
                    corner=self._ext_corner)
        elif self.impl == "extruded":
            # prismatic imported mesh: factorized row-gather path
            from fustpu.ops import operators as ops

            self._stiff_op = disc.extruded_op
            if self.uniform:
                self.c2_scalar = dtype(-1.0 / float(rho.flat[0]))
            else:
                self.c2_x = ops.expand_coeff_extruded(
                    mesh, np.broadcast_to(-1.0 / rho,
                                          (mesh.num_cells,)), dtype)
        elif self.impl in ("indexed", "indexed_engine"):
            # unstructured: explicit dofmap, per-cell coefficient array;
            # 'indexed_engine' routes gather/scatter through the windowed
            # one-hot MXU engine (fustpu.ops.pallas_gather)
            self.c2_cells = jnp.asarray((-1.0 / rho).reshape(-1), dtype)
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
            self.c2_scalar = dtype(-1.0 / float(rho.flat[0]))
            self._stiff_op = (disc.pallas_op(corner=self._corner)
                              if self.impl == "pallas" else disc.mm_op)
        else:
            # heterogeneous: expanded coefficient field (also consumed by
            # the sharded wrapper, which runs the mm path per device)
            self.c2_e = jnp.asarray(
                mm.expand_cell_field(-1.0 / rho, mesh.degree + 1), dtype)
            self._stiff_op = (
                disc.pallas_op(coeff=-1.0 / rho, corner=self._corner)
                if self.impl == "pallas" else disc.mm_op)

        # source boundary: the g(t) facet term reduces to precomputed
        # diagonal vector(s): one for a plain aperture, a cos/sin pair for a
        # phased (focused) one (see fustpu.models.sources).
        self.src_block = disc.facet_block(source_facets)
        fcoeff = 1.0 / rho.reshape(-1)[self.src_block.cells]
        # scalar sound speed at the source (enters the source amplitude)
        self.c_src = float(np.mean(c.reshape(-1)[self.src_block.cells])) \
            if self.src_block.num_facets else float(np.max(c))
        apod, phi = sources.resolve_profiles(
            disc, self.src_block, source.angular_frequency,
            source_delays, source_apodization)
        if phi is None:
            self.s_cos = to_flat(disc.facet_diag_host(
                self.src_block, fcoeff, apod))
            self.s_sin = None
        else:
            cw = np.cos(phi) if apod is None else apod * np.cos(phi)
            sw = np.sin(phi) if apod is None else apod * np.sin(phi)
            self.s_cos = to_flat(disc.facet_diag_host(
                self.src_block, fcoeff, cw))
            self.s_sin = to_flat(disc.facet_diag_host(
                self.src_block, fcoeff, sw))

        # absorbing boundary: -(1/(rho c)) v_n v ds — a facet diagonal
        self.fvec_abs = None
        if absorbing_facets is not None and len(absorbing_facets) > 0:
            blk = disc.facet_block(absorbing_facets)
            self.abs_block = blk
            rc = (rho * c).reshape(-1)[blk.cells]
            self.fvec_abs = to_flat(disc.facet_diag_host(
                blk, -1.0 / rc))
        else:
            self.abs_block = None
        self._solver_cache = {}

    # ------------------------------------------------------------------
    @property
    def params(self):
        """All device arrays, threaded explicitly through jit (never
        closure-captured — large constants wreck compile times)."""
        p = {"m": self.m, "s_cos": self.s_cos, "stiff": self._stiff_op}
        if self.c2_e is not None:
            p["c2_e"] = self.c2_e
        if self.c2_cells is not None:
            p["c2_c"] = self.c2_cells
        if self.c2_x is not None:
            p["c2_x"] = self.c2_x
        if self.s_sin is not None:
            p["s_sin"] = self.s_sin
        if self.fvec_abs is not None:
            p["fvec"] = self.fvec_abs
        if getattr(self, "_idx_fused", None) is not None:
            p["fused"] = self._idx_fused
        return p

    def _rhs(self, params, t, u, v):
        """kv = M^{-1} b(t, u, v) on the node grid."""
        b = self._apply_stiffness(params, u)
        a_c, a_s = sources.linear_source_coeffs(t, self.source, self.c_src)
        b = b + a_c.astype(self.dtype) * params["s_cos"]
        if "s_sin" in params:
            b = b + a_s.astype(self.dtype) * params["s_sin"]
        if "fvec" in params:
            b = b + v * params["fvec"]
        from fustpu.ops import vector as vec

        return vec.pointwise_divide(b, params["m"])  # the diagonal solve

    def _apply_stiffness(self, params, u_flat):
        if self.impl == "extruded_pallas":
            from fustpu.ops import pallas_extruded as pex

            kw = ({} if self._pallas_precision is None
                  else {"precision": self._pallas_precision})
            b = pex.stiffness_apply_extruded_pallas(
                u_flat, params["stiff"], self.mesh.ndofs,
                interpret=self._ext_interpret, **kw)
            return self.c2_scalar * b if self.uniform else b
        if self.impl == "extruded":
            from fustpu.ops import operators as ops

            b = ops.stiffness_apply_extruded(
                u_flat, params["stiff"], self.mesh.ndofs,
                coeff_e=params.get("c2_x"))
            return self.c2_scalar * b if self.uniform else b
        if self.impl in ("indexed", "indexed_engine"):
            from fustpu.ops import operators as ops

            if "fused" in params:
                from fustpu.ops import pallas_gather as pg

                return pg.fused_apply(
                    u_flat, params["c2_c"], params["fused"],
                    self.mesh.ndofs, interpret=self._engine_interpret)
            G, dofmap, D = params["stiff"]
            return ops.stiffness_apply_indexed(
                u_flat, G, params["c2_c"], dofmap, D, self.mesh.ndofs,
                engine=self._idx_engine,
                engine_interpret=self._engine_interpret)
        u = u_flat.reshape(self.mesh.grid_shape)
        if self.impl == "pallas":
            from fustpu.ops import pallas_stiffness as ps

            kw = ({} if self._pallas_precision is None
                  else {"precision": self._pallas_precision})
            b = ps.stiffness_apply_pallas(params["stiff"], u, **kw)
            b = self.c2_scalar * b if self.uniform else b
        elif self.uniform:
            b = self.c2_scalar * mm.stiffness_apply_mm(params["stiff"], u)
        else:
            b = mm.stiffness_apply_mm(params["stiff"], u,
                                      coeff_e=params["c2_e"])
        return b.reshape(-1)

