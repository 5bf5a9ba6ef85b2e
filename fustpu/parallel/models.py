"""Sharded (multi-chip) wave models.

Wraps a single-device LinearWaveModel / WesterveltModel and distributes its
state and geometry over a DeviceGrid.  The full RK4 solve runs inside one
`shard_map`-wrapped `lax.scan`.

Communication structure per RK stage: exactly ONE `halo_sum` (ppermute over
ICI) — only the stiffness apply couples neighbouring cells.  Every
mass-type term (unsteady LHS, v^2 term, sources, absorbing boundary) is a
globally-diagonal elementwise multiply by a *consistent* distributed vector
(shared planes hold full sums on every owner), so it commutes with the
exchange and is added after it.  The reference needs 3 scatter_forward + 2
scatter_reverse MPI rounds per stage instead
(/root/reference/cuda/demo_nonlinear_bowl.py:604-615,640).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from fustpu.models import sources, timestepping
from fustpu.models.westervelt import WesterveltModel
from fustpu.ops import spectral_mm as mm
from fustpu.parallel import sharding as sh

try:  # jax >= 0.6 exports shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def split_expanded_field(arr: np.ndarray, nc, S, n: int) -> np.ndarray:
    """Expanded-layout array (..., ex, ey, ez) with leading extra dims ->
    (Sx, Sy, Sz, ..., lex, ley, lez)."""
    lead = arr.shape[:-3]
    lc = [c // s for c, s in zip(nc, S)]
    le = [c * n for c in lc]
    a = arr.reshape(*lead, S[0], le[0], S[1], le[1], S[2], le[2])
    k = len(lead)
    perm = (k, k + 2, k + 4, *range(k), k + 1, k + 3, k + 5)
    return np.ascontiguousarray(a.transpose(perm))


def _split_pallas_G(Gp: np.ndarray, S) -> np.ndarray:
    """Pallas-layout G (ncx, n, 6, ey, ez) -> (Sx, Sy, Sz, ncx_l, n, 6,
    ley, lez) device blocks."""
    ncx, n, six, ey, ez = Gp.shape
    lx, ly, lz = ncx // S[0], ey // S[1], ez // S[2]
    a = Gp.reshape(S[0], lx, n, six, S[1], ly, S[2], lz)
    return np.ascontiguousarray(a.transpose(0, 4, 6, 1, 2, 3, 5, 7))


class ShardedModel:
    """Distributes a built single-device model over `grid` and exposes
    step/solve running under shard_map.  `stiffness_impl` defaults to the
    base model's choice (fused Pallas kernel per device on TPU, XLA matmul
    formulation elsewhere)."""

    def __init__(self, model, grid: sh.DeviceGrid, stiffness_impl=None,
                 force_y_parts: int = 0):
        self.model = model
        self.grid = grid
        self.kind = ("westervelt" if isinstance(model, WesterveltModel)
                     else "linear")
        mesh = model.mesh
        self.mesh = mesh
        S = grid.shape
        self.S = S
        Pd = mesh.degree
        n = Pd + 1
        # ghost padding: cell counts that don't divide the device grid are
        # padded up with zero-stiffness cells (G = 0, mass diag 1, sources
        # 0) — the pad region stays identically zero and never couples
        # back, so ANY mesh runs on ANY device count, like the
        # reference's `mpirun -n k` (numba-cpu/demo_linear_box.py:68-75)
        nc = tuple(-(-c // s) * s for c, s in zip(mesh.nc, S))
        self.nc_pad = nc
        self.cell_pad = tuple(p - c for p, c in zip(nc, mesh.nc))
        self.grid_pad = tuple(pc * Pd for pc in self.cell_pad)
        if any(self.cell_pad):
            print(f"[fustpu] ShardedModel: padding cells {mesh.nc} -> "
                  f"{nc} for device grid {S} (zero-coefficient ghosts)",
                  flush=True)
        self.lc = tuple(c // s for c, s in zip(nc, S))
        self.lgrid = tuple(c * Pd + 1 for c in self.lc)
        dtype = model.dtype
        self.dtype = dtype
        disc = model.disc

        dist = {}     # leading-device-axes arrays, spec P('x','y','z')
        repl = {}     # replicated arrays, spec P()

        def pad_node(a, val=0.0):
            a = np.asarray(a).reshape(mesh.grid_shape)
            if not any(self.grid_pad):
                return a
            return np.pad(a, [(0, p) for p in self.grid_pad],
                          constant_values=val)

        def pad_cell3(a):
            """(ncx, ncy, ncz[, ...]) cell field -> zero-padded."""
            a = np.asarray(a)
            width = [(0, p) for p in self.cell_pad]
            width += [(0, 0)] * (a.ndim - 3)
            return np.pad(a, width)

        def pad_cells_flat(a):
            """(cells, ...) flat cell array -> padded, zero rows."""
            a = np.asarray(a)
            trail = a.shape[1:]
            a = a.reshape(*mesh.nc, *trail)
            return pad_cell3(a).reshape(-1, *trail)

        def put_node(a, val=0.0):
            # model diagonals are stored flat; restore the grid shape
            return grid.put(sh.split_node_field(pad_node(a, val), nc, S,
                                                Pd), dtype)

        self.impl = stiffness_impl or getattr(model, "impl", "mm")
        # memory-capacity mode: corner-streamed kernel per device (37
        # floats/cell instead of 6/quad-point — multi-chip runs scale DOF
        # count, which is exactly where the G stream's memory wall bites)
        self._corner = (self.impl == "pallas_corner"
                        or (stiffness_impl is None
                            and getattr(model, "_corner", False)))
        if self.impl == "pallas_corner":
            self.impl = "pallas"
        from fustpu.ops import pallas_stiffness as ps

        self._pair = False
        # per-device y-slab partition for the fused kernel: if the local
        # block doesn't fit the single-slab VMEM budget, run the kernel
        # per y-slab (PallasStiffnessSplit) — mm only when no partition
        # exists at all.  Never silently: log whichever engages.
        self._y_sizes = None
        if self.impl == "pallas" and force_y_parts > 1:
            self._y_sizes = tuple(ps._slab_sizes(
                self.lc[1], min(force_y_parts, self.lc[1])))
        elif self.impl == "pallas":
            sizes = ps.pick_y_parts(n, self.lc[1], self.lc[2],
                                    self.lgrid[2], corner=self._corner)
            if sizes is None:
                print("[fustpu] ShardedModel: no VMEM-feasible y "
                      "partition for the per-device block; falling back "
                      "to the matmul path", flush=True)
                self.impl = "mm"
            elif len(sizes) > 1:
                print(f"[fustpu] ShardedModel: per-device y-z extent "
                      f"exceeds the single-slab VMEM budget; fused "
                      f"kernel runs y-partitioned ({sizes})", flush=True)
                self._y_sizes = tuple(sizes)
        # interpret mode lets the pallas path run on CPU device meshes
        # (tests); real TPUs compile the kernel
        dev = jax.devices()[0]
        self._pallas_interpret = not ("tpu" in dev.platform.lower()
                                      or "tpu" in str(dev).lower())

        def repl_put(a):
            return grid.replicate(a, dtype)

        if self.impl == "pallas":
            # per-device fused-kernel operator(s); G split into device
            # tiles (and further into y-slabs when partitioned)
            self._D_host = tuple(map(tuple,
                                     np.asarray(disc._D_host, np.float64)))
            y_sizes = self._y_sizes or (self.lc[1],)
            for j, sj in enumerate(y_sizes):
                repl[f"Wy{j}"] = repl_put(mm.window_matrix(sj, Pd))
                repl[f"Dey{j}"] = repl_put(
                    mm.deriv_block_matrix(sj, disc._D_host))
            repl["WzT"] = repl_put(mm.window_matrix(self.lc[2], Pd).T)
            repl["Dez"] = repl_put(
                mm.deriv_block_matrix(self.lc[2], disc._D_host))
            if self._corner:
                from fustpu.elements import gll

                lz = self.lc[2]
                nodes = gll.gll_nodes_unit(n)
                wts = gll.gll_points_weights_unit(n)[1]
                UzT = np.zeros((lz, lz * n))
                UzT[np.repeat(np.arange(lz), n), np.arange(lz * n)] = 1.0
                repl["UzTc"] = repl_put(UzT)
                repl["zrow"] = repl_put(np.tile(nodes, lz)[None, :])
                repl["wzrow"] = repl_put(np.tile(wts, lz)[None, :])
                for j, sj in enumerate(y_sizes):
                    repl[f"ycol{j}"] = repl_put(
                        np.tile(nodes, sj)[:, None])
                    repl[f"wycol{j}"] = repl_put(
                        np.tile(wts, sj)[:, None])
                self._corner_statics = (
                    self._D_host,
                    tuple(np.asarray(nodes, np.float64)),
                    tuple(np.asarray(wts, np.float64)))
            if model.uniform:
                coeffs = [None]
            else:
                c_f, rho_f, _, _ = model.material.cell_fields(mesh.nc)
                if self.kind == "linear":
                    coeffs = [-1.0 / rho_f]
                else:
                    delta_f = np.broadcast_to(np.asarray(
                        model.material.diffusivity_of_sound(
                            model.source.angular_frequency)), mesh.nc)
                    coeffs = [-1.0 / rho_f,
                              -delta_f / (rho_f * c_f * c_f)]
            if self._corner:
                # corner-streamed capacity mode: per-device (lx, 37, ly,
                # lz) coefficient tiles; ghost-padded cells get UNIT
                # geometry with a ZERO material coefficient (the kernel
                # divides by det(J) — a zero-geometry pad would be 0/0)
                unit = np.array([[a, b, c] for a in (0, 1) for b in (0, 1)
                                 for c in (0, 1)], np.float64)
                corners = np.asarray(mesh.cell_corners_flat, np.float64)
                corners_pad = np.broadcast_to(
                    unit, (int(np.prod(nc)), 8, 3)).copy()
                live = pad_cell3(np.ones(mesh.nc)).reshape(-1) > 0
                corners_pad[live] = corners
                for k, cf in enumerate(coeffs):
                    cf3 = np.ones(mesh.nc) if cf is None \
                        else np.broadcast_to(cf, mesh.nc)
                    cf_pad = pad_cell3(cf3).reshape(-1)
                    T = ps.jacobian_coefficients(corners_pad, cf_pad)
                    JC = T.reshape(*nc, 37).transpose(0, 3, 1, 2)
                    lx, ly, lz = self.lc
                    JCs = JC.reshape(S[0], lx, 37, S[1], ly, S[2], lz)
                    dist[f"JC{k}"] = grid.put(np.ascontiguousarray(
                        JCs.transpose(0, 3, 5, 1, 2, 4, 6)), dtype)
                self._n_ops = len(coeffs)
                G_pad = None
            else:
                G_pad = pad_cells_flat(disc._G_host)
            # heterogeneous Westervelt on single-slab devices: ONE
            # unit-coefficient G tile + a per-cell coefficient block, and
            # the stage runs the pair kernel (see pallas_stiffness).  The
            # pair kernel costs extra VMEM (2 coefficient scratch planes +
            # doubled x-plane IO), so gate on its own budget — in the band
            # where only the plain kernel fits, fall back to two folded
            # operators instead of failing at Mosaic compile.
            self._pair = (not self._corner
                          and len(coeffs) == 2 and self._y_sizes is None
                          and ps.pallas_fits(n, self.lc[1], self.lc[2],
                                             self.lgrid[2], pair=True))
            if self._corner:
                pass
            elif self._pair:
                dist["Gp0"] = grid.put(
                    _split_pallas_G(ps.pack_G(G_pad, nc, n), S), dtype)
                C = np.stack([pad_cell3(np.broadcast_to(cf, mesh.nc))
                              for cf in coeffs], axis=1)  # (ncx,2,ncy,ncz)
                lx, ly, lz = self.lc
                Cs = C.reshape(S[0], lx, 2, S[1], ly, S[2], lz)
                dist["Cp"] = grid.put(np.ascontiguousarray(
                    Cs.transpose(0, 3, 5, 1, 2, 4, 6)), dtype)
                UzT = np.zeros((lz, lz * n))
                UzT[np.repeat(np.arange(lz), n), np.arange(lz * n)] = 1.0
                repl["UzT"] = repl_put(UzT)
            else:
                for k, cf in enumerate(coeffs):
                    cf_pad = None if cf is None else pad_cell3(
                        np.broadcast_to(cf, mesh.nc))
                    Gp = ps.pack_G(G_pad, nc, n, coeff=cf_pad)
                    dist[f"Gp{k}"] = grid.put(_split_pallas_G(Gp, S),
                                              dtype)
        else:
            # local (per-device) matmul-form matrices — same on every device
            repl["W"] = tuple(
                repl_put(mm.window_matrix(c, Pd)) for c in self.lc)
            repl["Dt"] = tuple(
                repl_put(mm.deriv_block_matrix(c, disc._D_host))
                for c in self.lc)
            G_exp = mm.to_expanded_layout(
                pad_cells_flat(disc._G_host), nc, n)       # (ex,ey,ez,6)
            dist["G"] = grid.put(split_expanded_field(
                np.moveaxis(G_exp, -1, 0), nc, S, n), dtype)

        def put_exp(a):
            # expanded (ex, ey, ez) coefficient field -> zero-padded tiles
            a = np.asarray(a, np.float64)
            epad = [(0, pc * n) for pc in self.cell_pad]
            a = np.pad(a, [(0, 0)] * (a.ndim - 3) + epad)
            return grid.put(split_expanded_field(a, nc, S, n), dtype)

        if self.kind == "linear":
            dist["m"] = put_node(model.m, val=1.0)   # divisor: pad 1
            dist["s_cos"] = put_node(model.s_cos)
            if model.s_sin is not None:
                dist["s_sin"] = put_node(model.s_sin)
            if model.c2_e is not None:
                dist["c2_e"] = put_exp(model.c2_e)
        else:
            dist["m0"] = put_node(model.m0, val=1.0)  # divisor: pad 1
            dist["mvec2"] = put_node(model.mvec2)
            dist["s1_cos"] = put_node(model.s1_cos)
            dist["s2_cos"] = put_node(model.s2_cos)
            if model.s1_sin is not None:
                dist["s1_sin"] = put_node(model.s1_sin)
                dist["s2_sin"] = put_node(model.s2_sin)
            if model.c3_e is not None:
                dist["c3_e"] = put_exp(model.c3_e)
                dist["c4_e"] = put_exp(model.c4_e)
        if model.fvec_abs is not None:
            dist["fvec"] = put_node(model.fvec_abs)
        self.has_abs = model.fvec_abs is not None

        self.ctx = {"dist": dist, "repl": repl}
        self.ctx_spec = {
            "dist": {k: P(*sh.AXES) for k in dist},
            "repl": jax.tree.map(lambda _: P(), repl),
        }
        self._solve_cache = {}

    # ---------------- local physics (inside shard_map) -------------------
    def _local_stiffness(self, ctx, x, coeff_e=None, op_idx=0):
        if self.impl == "pallas" and self._corner:
            from fustpu.ops import pallas_stiffness as ps

            n = self.mesh.degree + 1
            r = ctx["repl"]
            JC = ctx["dist"][f"JC{op_idx}"]

            def corner_op(JCj, j):
                return ps.PallasStiffnessCorner(
                    JC=JCj, Wy=r[f"Wy{j}"], WzT=r["WzT"],
                    Dey=r[f"Dey{j}"], Dez=r["Dez"], UzT=r["UzTc"],
                    ycol=r[f"ycol{j}"], zrow=r["zrow"],
                    wycol=r[f"wycol{j}"], wzrow=r["wzrow"],
                    statics=self._corner_statics)

            if self._y_sizes is None:
                op = corner_op(JC, 0)
            else:
                parts, off = [], 0
                for j, sj in enumerate(self._y_sizes):
                    parts.append(corner_op(JC[:, :, off:off + sj], j))
                    off += sj
                op = ps.PallasStiffnessSplit(tuple(parts), self._y_sizes)
            kw = {}
            if getattr(self.model, "_pallas_precision", None) is not None:
                kw["precision"] = self.model._pallas_precision
            return ps.stiffness_apply_pallas(
                op, x, interpret=self._pallas_interpret, **kw)
        if self.impl == "pallas":
            from fustpu.ops import pallas_stiffness as ps

            n = self.mesh.degree + 1
            Gfull = ctx["dist"][f"Gp{op_idx}"]
            if self._y_sizes is None:
                op = ps.PallasStiffness(G=Gfull,
                                        Wy=ctx["repl"]["Wy0"],
                                        WzT=ctx["repl"]["WzT"],
                                        Dey=ctx["repl"]["Dey0"],
                                        Dez=ctx["repl"]["Dez"],
                                        D_host=self._D_host)
            else:
                # per-device y-slab partition: slice the (ncx, n, 6,
                # ley, lez) tile along ley and run the fused kernel per
                # slab (overlap-add handled by PallasStiffnessSplit)
                parts, off = [], 0
                for j, sj in enumerate(self._y_sizes):
                    Gj = Gfull[:, :, :, off * n:(off + sj) * n]
                    parts.append(ps.PallasStiffness(
                        G=Gj, Wy=ctx["repl"][f"Wy{j}"],
                        WzT=ctx["repl"]["WzT"],
                        Dey=ctx["repl"][f"Dey{j}"],
                        Dez=ctx["repl"]["Dez"], D_host=self._D_host))
                    off += sj
                op = ps.PallasStiffnessSplit(tuple(parts), self._y_sizes)
            kw = {}
            if getattr(self.model, "_pallas_precision", None) is not None:
                kw["precision"] = self.model._pallas_precision
            return ps.stiffness_apply_pallas(
                op, x, interpret=self._pallas_interpret, **kw)
        op = mm.MMStiffness(W=ctx["repl"]["W"], Dt=ctx["repl"]["Dt"],
                            G=ctx["dist"]["G"])
        return mm.stiffness_apply_mm(op, x, coeff_e=coeff_e)

    def _local_pair_stiffness(self, ctx, u, v):
        from fustpu.ops import pallas_stiffness as ps

        op = ps.PallasStiffnessPair(
            G=ctx["dist"]["Gp0"], Wy=ctx["repl"]["Wy0"],
            WzT=ctx["repl"]["WzT"], Dey=ctx["repl"]["Dey0"],
            Dez=ctx["repl"]["Dez"], C=ctx["dist"]["Cp"],
            UzT=ctx["repl"]["UzT"], D_host=self._D_host)
        kw = {}
        if getattr(self.model, "_pallas_precision", None) is not None:
            kw["precision"] = self.model._pallas_precision
        return ps.stiffness_apply_pallas_pair(
            op, u, v, interpret=self._pallas_interpret, **kw)

    def _local_rhs(self, ctx, t, u, v):
        d = ctx["dist"]
        model = self.model
        if self.kind == "linear":
            if model.uniform:
                b = model.c2_scalar * self._local_stiffness(ctx, u)
            elif self.impl == "pallas":
                b = self._local_stiffness(ctx, u)   # coeff folded into G
            else:
                b = self._local_stiffness(ctx, u, d["c2_e"])
            b = sh.halo_sum(b, self.S)
            a_c, a_s = sources.linear_source_coeffs(
                t, model.source, model.c_src)
            b = b + a_c.astype(self.dtype) * d["s_cos"]
            if "s_sin" in d:
                b = b + a_s.astype(self.dtype) * d["s_sin"]
            if self.has_abs:
                b = b + v * d["fvec"]
            return b / d["m"]

        m = d["m0"] + u * d["mvec2"]
        if model.uniform:
            b = self._local_stiffness(
                ctx, model.c3_scalar * u + model.c4_scalar * v)
        elif self.impl == "pallas" and self._pair:
            b = self._local_pair_stiffness(ctx, u, v)
        elif self.impl == "pallas":
            b = (self._local_stiffness(ctx, u, op_idx=0)
                 + self._local_stiffness(ctx, v, op_idx=1))
        else:
            b = (self._local_stiffness(ctx, u, d["c3_e"])
                 + self._local_stiffness(ctx, v, d["c4_e"]))
        b = sh.halo_sum(b, self.S)
        b = b - (v * v) * d["mvec2"]
        (g_c, g_s), (dg_c, dg_s) = sources.westervelt_source_coeffs(
            t, model.source, model.c_src)
        b = b + g_c.astype(self.dtype) * d["s1_cos"]
        b = b + dg_c.astype(self.dtype) * d["s2_cos"]
        if "s1_sin" in d:
            b = b + g_s.astype(self.dtype) * d["s1_sin"]
            b = b + dg_s.astype(self.dtype) * d["s2_sin"]
        if self.has_abs:
            b = b + v * d["fvec"]
        return b / m

    # ---------------- public API ------------------------------------------
    def init_state(self, t0: float = 0.0, u0=None, v0=None
                   ) -> timestepping.RKState:
        """Distributed RKState (leading (Sx, Sy, Sz) device axes)."""
        nc, S, Pd = self.nc_pad, self.S, self.mesh.degree

        def dist_field(f):
            if f is None:
                f = np.zeros(self.mesh.grid_shape)
            f = np.asarray(f).reshape(self.mesh.grid_shape)
            if any(self.grid_pad):
                f = np.pad(f, [(0, p) for p in self.grid_pad])
            return self.grid.put(sh.split_node_field(f, nc, S, Pd),
                                 self.dtype)

        t = self.grid.replicate(np.asarray(t0, jnp.dtype(self.dtype)))
        return timestepping.RKState(
            u=dist_field(u0), v=dist_field(v0), ku=dist_field(None),
            kv=dist_field(None), t=t)

    def probe_fn(self, points):
        """Traced per-step sampler for `solve(probe=...)`: each point's
        (n,n,n) interpolation window lives inside one cell, hence on one
        device block; non-owning devices contribute zero and a psum over
        the grid axes replicates the full trace (the distributed analogue
        of the reference's compute_eval_params + Function.eval,
        /root/reference/cuda/utils.py:117-154)."""
        from fustpu.utils.eval import PointSampler

        smp = PointSampler(self.mesh, points)
        Pd = self.mesh.degree
        lgc = [c * Pd for c in self.lc]          # block stride per axis
        block = [idx[:, 0] // g for idx, g in
                 zip((smp._I, smp._J, smp._K), lgc)]
        Il, Jl, Kl = [jnp.asarray(idx - (b * g)[:, None]) for idx, b, g in
                      zip((smp._I, smp._J, smp._K), block, lgc)]
        bi, bj, bk = [jnp.asarray(b) for b in block]
        w = jnp.asarray(smp._w)

        def probe(s: timestepping.RKState):
            f = s.u
            own = ((bi == jax.lax.axis_index("x"))
                   & (bj == jax.lax.axis_index("y"))
                   & (bk == jax.lax.axis_index("z")))
            vals = f[Il[:, :, None, None], Jl[:, None, :, None],
                     Kl[:, None, None, :]]
            p = jnp.einsum("pijk,pijk->p", vals, w.astype(f.dtype))
            p = jnp.where(own, p, 0.0)
            return jax.lax.psum(p, sh.AXES)

        return probe

    def solve(self, state: timestepping.RKState, dt: float, num_steps: int,
              tf=None, probe=None):
        """Run num_steps RK4 steps; the whole scan executes inside one
        shard_map (one XLA program, collectives over ICI).  Same API as
        the single-device models: returns (RKState, ys); `probe` (built by
        `probe_fn`) records per-step traces, replicated on every device."""
        key = ("solve", num_steps, tf is not None, probe)
        if key not in self._solve_cache:
            vec = P(*sh.AXES)
            clamp_tf = tf is not None

            def fn(ctx, u, v, ku, kv, t, dt_, tf_):
                # strip the leading (1,1,1) device-block axes (distributed
                # leaves only; replicated leaves arrive full)
                sq = lambda a: a.reshape(a.shape[3:])
                ctx = {"dist": jax.tree.map(sq, ctx["dist"]),
                       "repl": ctx["repl"]}
                s = timestepping.RKState(sq(u), sq(v), sq(ku), sq(kv), t)
                t0 = t

                def body(s, k):
                    tk = t0 + k.astype(t0.dtype) * dt_
                    if clamp_tf:
                        tk = jnp.minimum(tk, tf_)
                    s = s._replace(t=tk)
                    s = timestepping.rk4_step(
                        self._local_rhs, ctx, s, dt_,
                        tf_ if clamp_tf else None)
                    return s, (probe(s) if probe is not None else None)

                s, ys = jax.lax.scan(body, s, jnp.arange(num_steps))
                ex = lambda a: a.reshape((1, 1, 1) + a.shape)
                return (ex(s.u), ex(s.v), ex(s.ku), ex(s.kv), s.t), ys

            mapped = shard_map(
                fn, mesh=self.grid.mesh,
                in_specs=(self.ctx_spec, vec, vec, vec, vec, P(), P(), P()),
                out_specs=((vec, vec, vec, vec, P()), P()),
                check_vma=False)
            self._solve_cache[key] = jax.jit(
                lambda ctx, st, dt_, tf_: mapped(ctx, *st, dt_, tf_))
        dt_ = jnp.asarray(float(dt), self.dtype)
        tf_ = jnp.asarray(0.0 if tf is None else float(tf), self.dtype)
        (u, v, ku, kv, t), ys = self._solve_cache[key](
            self.ctx, tuple(state), dt_, tf_)
        return timestepping.RKState(u, v, ku, kv, t), ys

    def step(self, state: timestepping.RKState, dt, tf=None
             ) -> timestepping.RKState:
        s, _ = self.solve(state, dt, 1, tf=tf)
        return s

    def cfl_dt(self, cfl: float | None = None) -> tuple[float, int]:
        return self.model.cfl_dt(cfl)

    def collect(self, dist_field) -> np.ndarray:
        """Distributed node field -> global (gx, gy, gz) numpy array.
        Multi-process: gathers non-addressable shards over the process
        group first."""
        if not dist_field.is_fully_addressable:
            from jax.experimental import multihost_utils

            dist_field = multihost_utils.process_allgather(
                dist_field, tiled=True)
        full = sh.merge_node_field(np.asarray(dist_field), self.nc_pad,
                                   self.S, self.mesh.degree)
        gx, gy, gz = self.mesh.grid_shape
        return full[:gx, :gy, :gz]
