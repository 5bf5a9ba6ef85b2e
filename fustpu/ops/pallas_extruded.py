"""Fully-fused Pallas TPU kernel for the EXTRUDED (imported prismatic
mesh) stiffness apply — the production path for every piston/column/
bowl-fitted import.

The XLA factorized path (fustpu.ops.operators.stiffness_apply_extruded)
materialises ~10 full passes over the (ns, n, n, ez) intermediates in HBM
and pays the ~18x f32 MXU-emulation tax on its einsums (bf16x3 splits at
the XLA level ADD traffic and regress at production size — BENCH_NOTES
r3).  This kernel gives imported meshes the same single-pass treatment
that took the structured apply from 0.86 to 0.43 ms (the reference runs
its imports through the SAME full-speed kernel as box meshes,
/root/reference/cuda/operators.py:73-192):

- the row gather/scatter stay in XLA (vectorized row ops on the
  factorized dof = row2d*gz + z numbering), ordered so gathered planes
  land directly in kernel block layout: g[q, s, :] = x2[rows2d[s, q]],
  i.e. footprint-node-major, stacks on the SUBLANES, z on the LANES;
- everything between — z-window expansion, all three derivative
  contractions, the 6-component metric transform, reverse contractions,
  z-fold — happens in VMEM in ONE kernel, with the G stream DMA'd per
  footprint-node plane (the inner grid dimension) and bf16x3 matmul
  decomposition free in VMEM;
- grid (ns_pad/S, n^2): the outer dimension walks stack-batches of S
  stacks (independent — stacks only couple through the XLA scatter-add);
  the inner dimension phases the metric transform one footprint node
  (i, j) at a time so the G block stays (6, S, ez).

Structure per stack-batch:
  s == 0      u = zwin(g) [one (n^2 S, gz)x(gz, ez) matmul];
              wz = u @ Dz^T [one matmul];  wx, wy by static-scalar
              1D-derivative arithmetic over (S, ez) planes (the
              footprint axes are length n = P+1: compile-time unrolled).
  each s      (f0, f1, f2) = G(s) . (wx, wy, wz) pointwise, IN PLACE.
  s == n^2-1  reverse static contractions + f2 @ Dz [one matmul];
              z-fold [one matmul]; write the (n^2, S, gz) out block.

Per-cell coefficients fold into G at build time; the heterogeneous
Westervelt pair form (y = A_c1(x1) + A_c2(x2)) combines the two fields
right after the z-window against an in-kernel (2, S, ez) coefficient
block, exactly like the structured pair kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fustpu.ops import spectral_mm as mm
from fustpu.ops.pallas_stiffness import _mk_matmul, _pad

_HI = jax.lax.Precision.HIGHEST


@jax.tree_util.register_pytree_node_class
class PallasExtruded:
    """Fused extruded stiffness operator.

    Gt:   (n^2, 6, ns_pad, ez) metric stream, footprint-node-major
          (coefficient folded in at build; zero rows for stack padding)
    rows: (n^2, ns_pad) int32 2D-row gather/scatter indices (padding
          points at row 0 — its contributions are exactly zero)
    WzT:  (gz, ez) 0/1 z-window, transposed
    Dz:   (ez, ez) block-diagonal 1D derivative along z
    statics: (D_host tuple-of-tuples, S)
    """

    def __init__(self, Gt, rows, WzT, Dz, statics: tuple):
        self.Gt = Gt
        self.rows = rows
        self.WzT = WzT
        self.Dz = Dz
        self.statics = statics

    def tree_flatten(self):
        return (self.Gt, self.rows, self.WzT, self.Dz), self.statics

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


@jax.tree_util.register_pytree_node_class
class PallasExtrudedPair:
    """Two-field variant: unit-coefficient Gt + a (2, ns_pad, ez)
    per-cell coefficient stream (z-expanded), combined at u."""

    def __init__(self, Gt, rows, ce, WzT, Dz, statics: tuple):
        self.Gt = Gt
        self.rows = rows
        self.ce = ce
        self.WzT = WzT
        self.Dz = Dz
        self.statics = statics

    def tree_flatten(self):
        return (self.Gt, self.rows, self.ce, self.WzT, self.Dz), self.statics

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


@jax.tree_util.register_pytree_node_class
class PallasExtrudedCorner:
    """Memory-CAPACITY variant: instead of the (n^2, 6, ns_pad, ez) metric
    stream (6 floats per quadrature point), the geometry travels as the
    Jacobian monomial coefficients PER CELL — 37 channels for trilinear
    hex8 cells, 163 for curved (triquadratic hex27) prisms — and
    adj(J)/det(J) is evaluated on the VPU inside the kernel.  ~20x less
    geometry HBM at P=4 trilinear (~4.6x hex27) — the mode that takes
    imported prismatic meshes past the G-stream capacity wall (the
    reference's 10^8+-DOF MPI configs, BASELINE.md;
    /root/reference/cuda/scatterer.py:104-277 is the capability the scale
    targets).

    T:    (nch+1, ns_pad, nz) monomial stream, z minor (a stack-minor
          layout would lane-pad the stack batch S to 128 in the VMEM
          block — the same 128x padding lesson as the engine streams;
          padding stacks carry IDENTITY geometry with a ZERO
          coefficient channel, so their contributions vanish without
          0/0 in the det division)
    rows: (n^2, ns_pad) int32 row gather/scatter indices
    ce:   None, or (2, ns_pad, ez) pair coefficient planes (then the
          stream's coefficient channel is 1 and the two fields combine
          at u)
    Uz:   (nz, ez) 0/1 layer -> z-lane expansion
    zrow: (1, ez) local xi_z per z lane;  wzrow: (1, ez) 1D GLL weight
    statics: (D, XQ, WQ, S, pair, geom_deg)
    """

    def __init__(self, T, rows, ce, Uz, zrow, wzrow, WzT, Dz,
                 statics: tuple):
        self.T = T
        self.rows = rows
        self.ce = ce
        self.Uz = Uz
        self.zrow = zrow
        self.wzrow = wzrow
        self.WzT = WzT
        self.Dz = Dz
        self.statics = statics

    def tree_flatten(self):
        return ((self.T, self.rows, self.ce, self.Uz, self.zrow,
                 self.wzrow, self.WzT, self.Dz), self.statics)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


# ---------------------------------------------------------------------------
# VMEM feasibility + stack-batch size selection
# ---------------------------------------------------------------------------

def _ext_vmem_bytes(n: int, S: int, ez: int, gz: int, pair: bool,
                    itemsize: int = 4, corner: bool = False,
                    geom_deg: int = 1) -> int:
    """Estimated VMEM footprint: 4 full-plane scratch sets (u / wx / wy /
    wz, transform in place, reverse reuses u), double-buffered in/out/G
    blocks, the z matrices, and live temporaries.  Corner mode swaps the
    G stream block for the (37, nz, S) monomial block plus the expanded
    (37, S, ez) plane scratch and heavier per-phase VPU temporaries."""
    q = n * n * S
    ezp, gzp = _pad(ez, 128), _pad(gz, 128)
    planes = 4 * q * ezp
    gin = 2 * q * gzp * (2 if pair else 1)
    out = 2 * q * gzp
    if corner:
        nz = ez // n
        nch = (37 if geom_deg == 1 else 163)
        gblk = 2 * nch * S * _pad(nz, 128) + nch * S * ezp
        temps = 18 * S * ezp + 2 * q * ezp
    else:
        gblk = 2 * 6 * S * ezp
        temps = 6 * S * ezp + 2 * q * ezp
    ce = 2 * 2 * S * ezp if pair else 0
    mats = 2 * (gzp * ezp + ezp * ezp)
    return (planes + gin + out + gblk + ce + mats + temps) * itemsize


_S_CANDIDATES = (256, 192, 160, 128, 96, 80, 64, 48, 40, 32, 24, 16, 8)


def pick_stack_batch(n: int, ns: int, ez: int, gz: int,
                     pair: bool = False, corner: bool = False,
                     geom_deg: int = 1) -> int | None:
    """Largest stack-batch size (multiple of 8) whose working set fits
    VMEM; None when even S=8 does not fit (very deep extrusions — the
    XLA factorized path remains).

    The estimator is deliberately ~1.5-2 MB conservative (a production
    solve that dies at remote-compile costs more than the measured 3.5%
    a larger S buys — BENCH_NOTES r4); FUSTPU_EXT_SLAB_BATCH overrides
    the choice for users who have verified a bigger batch compiles on
    their shape."""
    import os

    forced = os.environ.get("FUSTPU_EXT_SLAB_BATCH")
    if forced:
        try:
            S = int(forced)
        except ValueError:
            raise ValueError(
                f"FUSTPU_EXT_SLAB_BATCH={forced!r}: not an integer")
        if S > 0:
            # Mosaic needs the io block's 2nd-to-last dim %8
            return min(-(-S // 8) * 8, _pad(max(ns, 1), 8))
    cap = _pad(max(ns, 1), 8)
    for S in _S_CANDIDATES:
        if S > cap:
            continue
        if _ext_vmem_bytes(n, S, ez, gz, pair, corner=corner,
                           geom_deg=geom_deg) < 14 * 2**20:
            return S
    return None


def _probe_cache_path():
    import pathlib

    return (pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
            / "ext_slab_probe.json")


def _probe_compiles(n: int, S: int, ez: int, gz: int, pair: bool,
                    corner: bool, geom_deg: int) -> bool:
    """Deviceless Mosaic compile of ONE stack batch of the kernel at
    exactly this (n, S, ez, gz) — per-grid-step VMEM is independent of
    the batch COUNT, so a single-batch synthetic op certifies the
    production shape.  Results are cached on disk (keyed by the shape
    tuple): the probe costs a ~20-40 s local compile the first time."""
    import json

    key = f"{n}-{S}-{ez}-{gz}-{int(pair)}-{int(corner)}-{geom_deg}"
    path = _probe_cache_path()
    try:
        cache = json.loads(path.read_text())
    except Exception:
        cache = {}
    if key in cache:
        return bool(cache[key])
    ok = False
    try:
        from jax.experimental import topologies

        from fustpu.elements import gll

        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x2")
        sh = jax.sharding.SingleDeviceSharding(topo.devices[0])
        n2, nz = n * n, ez // n
        D = np.asarray(gll.derivative_matrix(n), np.float64)
        rows = jnp.zeros((n2, S), jnp.int32)
        WzT = jnp.zeros((gz, ez), jnp.float32)
        Dz = jnp.zeros((ez, ez), jnp.float32)
        ce = jnp.zeros((2, S, ez), jnp.float32)
        if corner:
            nch = 37 if geom_deg == 1 else 163
            Uz, zrow, wzrow, XQ, WQ = (
                jnp.zeros((nz, ez), jnp.float32),
                jnp.zeros((1, ez), jnp.float32),
                jnp.zeros((1, ez), jnp.float32),
                tuple(np.asarray(gll.gll_nodes_unit(n), np.float64)),
                tuple(np.asarray(
                    gll.gll_points_weights_unit(n)[1], np.float64)))
            op = PallasExtrudedCorner(
                T=jnp.zeros((nch + 1, S, nz), jnp.float32), rows=rows,
                ce=ce if pair else None, Uz=Uz, zrow=zrow, wzrow=wzrow,
                WzT=WzT, Dz=Dz,
                statics=(tuple(map(tuple, D)), XQ, WQ, S, pair,
                         geom_deg))
        elif pair:
            op = PallasExtrudedPair(
                Gt=jnp.zeros((n2, 6, S, ez), jnp.float32), rows=rows,
                ce=ce, WzT=WzT, Dz=Dz,
                statics=(tuple(map(tuple, D)), S))
        else:
            op = PallasExtruded(
                Gt=jnp.zeros((n2, 6, S, ez), jnp.float32), rows=rows,
                WzT=WzT, Dz=Dz, statics=(tuple(map(tuple, D)), S))
        nd = 8 * gz
        aval = jax.ShapeDtypeStruct((nd,), jnp.float32, sharding=sh)
        if pair:
            f = lambda a, b: stiffness_apply_extruded_pallas_pair(
                a, b, op, nd)
            jax.jit(f, in_shardings=(sh, sh),
                    out_shardings=sh).lower(aval, aval).compile()
        else:
            f = lambda a: stiffness_apply_extruded_pallas(a, op, nd)
            jax.jit(f, in_shardings=(sh,),
                    out_shardings=sh).lower(aval).compile()
        ok = True
    except Exception:
        ok = False
    try:
        path.parent.mkdir(parents=True, exist_ok=True)
        cache[key] = ok
        path.write_text(json.dumps(cache))
    except OSError:
        pass
    return ok


def probed_stack_batch(n: int, ns: int, ez: int, gz: int,
                       pair: bool = False, corner: bool = False,
                       geom_deg: int = 1) -> int | None:
    """pick_stack_batch, with a deviceless-compile escape hatch for deep
    extrusions: when the conservative estimator rejects EVERY rung (the
    r5 nz=140 capacity case — measured ~40% over Mosaic's true
    allocation), candidate rungs under a relaxed 24 MB estimate are
    AOT-verified with the actual Mosaic compiler (libtpu's compile-only
    client; no chip needed) and the largest that compiles wins.  Hosts
    without libtpu, or FUSTPU_EXT_AOT_PROBE=0, keep the conservative
    answer."""
    import os

    S = pick_stack_batch(n, ns, ez, gz, pair, corner=corner,
                         geom_deg=geom_deg)
    if S is not None or os.environ.get("FUSTPU_EXT_AOT_PROBE") == "0" \
            or os.environ.get("FUSTPU_EXT_SLAB_BATCH"):
        return S
    cap = _pad(max(ns, 1), 8)
    for Sc in _S_CANDIDATES:
        if Sc > cap:
            continue
        if _ext_vmem_bytes(n, Sc, ez, gz, pair, corner=corner,
                           geom_deg=geom_deg) >= 24 * 2**20:
            continue
        if _probe_compiles(n, Sc, ez, gz, pair, corner, geom_deg):
            return Sc
    return None


def ext_pallas_fits(n: int, ns: int, nz: int, gz: int,
                    pair: bool = False, corner: bool = False,
                    geom_deg: int = 1) -> bool:
    return probed_stack_batch(n, ns, nz * n, gz, pair, corner=corner,
                              geom_deg=geom_deg) is not None


# ---------------------------------------------------------------------------
# Build (host, float64 in / device dtype out)
# ---------------------------------------------------------------------------

def _stack_G(mesh, G_cells, coeff=None) -> np.ndarray:
    """(cells, n^3, 6) -> (ns, nz, n, n, n, 6) in stack order, with an
    optional per-cell coefficient folded in."""
    n = mesh.degree + 1
    ns, nz = mesh.nstacks, mesh.nz
    Gs = np.asarray(G_cells, np.float64)[mesh.stack_cells].reshape(
        ns, nz, n, n, n, 6)
    if coeff is not None:
        cs = np.asarray(coeff, np.float64).reshape(-1)[mesh.stack_cells]
        Gs = Gs * cs[:, :, None, None, None, None]
    return Gs


def _pack(Gs: np.ndarray, rows2d: np.ndarray, S: int):
    """(ns, nz, n, n, n, 6) + (ns, n^2) -> kernel layouts (Gt, rows_t,
    ns_pad)."""
    ns, nz, n = Gs.shape[0], Gs.shape[1], Gs.shape[2]
    ez = nz * n
    ns_pad = -(-ns // S) * S
    Gt = np.zeros((n * n, 6, ns_pad, ez))
    Gt[:, :, :ns] = Gs.transpose(2, 3, 5, 0, 1, 4).reshape(n * n, 6, ns, ez)
    rows_t = np.zeros((n * n, ns_pad), np.int32)
    rows_t[:, :ns] = np.asarray(rows2d, np.int64).T
    return Gt, rows_t, ns_pad


def build_extruded(mesh, G_cells, D_1d, dtype,
                   coeff: np.ndarray | None = None) -> PallasExtruded:
    """mesh: ExtrudedHexMesh; G_cells: (cells, n^3, 6) float64 host;
    coeff: optional per-cell coefficient folded into the stream."""
    n = mesh.degree + 1
    gz = mesh.gz
    S = probed_stack_batch(n, mesh.nstacks, mesh.nz * n, gz)
    if S is None:
        raise ValueError("no VMEM-feasible stack batch; use the XLA "
                         "extruded path")
    Gs = _stack_G(mesh, G_cells, coeff)
    Gt, rows_t, _ = _pack(Gs, mesh.rows2d, S)
    return PallasExtruded(
        Gt=jnp.asarray(Gt, dtype),
        rows=jnp.asarray(rows_t),
        WzT=jnp.asarray(mm.window_matrix(mesh.nz, mesh.degree).T, dtype),
        Dz=jnp.asarray(mm.deriv_block_matrix(mesh.nz, D_1d), dtype),
        statics=(tuple(map(tuple, np.asarray(D_1d, np.float64))), S),
    )


def build_extruded_pair(mesh, G_cells, D_1d, dtype, c1_cells,
                        c2_cells) -> PallasExtrudedPair:
    """Unit-coefficient stream + (2, ns_pad, ez) z-expanded per-cell
    coefficients (the heterogeneous Westervelt stage)."""
    n = mesh.degree + 1
    gz = mesh.gz
    S = probed_stack_batch(n, mesh.nstacks, mesh.nz * n, gz, pair=True)
    if S is None:
        raise ValueError("no VMEM-feasible stack batch for the pair "
                         "kernel; use the XLA extruded pair path")
    Gs = _stack_G(mesh, G_cells)
    Gt, rows_t, ns_pad = _pack(Gs, mesh.rows2d, S)
    ce = np.zeros((2, ns_pad, mesh.nz * n))
    for m, c in enumerate((c1_cells, c2_cells)):
        cs = np.asarray(c, np.float64).reshape(-1)[mesh.stack_cells]
        ce[m, :mesh.nstacks] = np.repeat(cs, n, axis=1)
    return PallasExtrudedPair(
        Gt=jnp.asarray(Gt, dtype),
        rows=jnp.asarray(rows_t),
        ce=jnp.asarray(ce, dtype),
        WzT=jnp.asarray(mm.window_matrix(mesh.nz, mesh.degree).T, dtype),
        Dz=jnp.asarray(mm.deriv_block_matrix(mesh.nz, D_1d), dtype),
        statics=(tuple(map(tuple, np.asarray(D_1d, np.float64))), S),
    )


@functools.lru_cache(maxsize=None)
def _monomial_table(g: int):
    """Static evaluation table for the in-kernel Jacobian reconstruction
    at geometry order `g` (1 = trilinear hex8, 2 = triquadratic hex27).
    Returns (nch, table) with table[q][p] = [(channel, mx, my, mz), ...]:
    J[p][q] = sum over entries of xi_x^mx * xi_y^my * xi_z^mz * T[ch].
    Channel nch (one past the last Jacobian channel) is reserved for the
    per-cell coefficient."""
    idx = 0
    table = [[None] * 3 for _ in range(3)]
    for q in range(3):                     # derivative direction
        degs = [g, g, g]
        degs[q] = g - 1
        for p in range(3):                 # physical component
            entries = []
            for mx in range(degs[0] + 1):
                for my in range(degs[1] + 1):
                    for mz in range(degs[2] + 1):
                        entries.append((idx, mx, my, mz))
                        idx += 1
            table[q][p] = tuple(entries)
    return idx, tuple(tuple(col) for col in table)


# quadratic Lagrange on nodes {0, 1/2, 1} -> monomial {1, t, t^2}
_L2_TO_MONO = np.array([[1.0, -3.0, 2.0],
                        [0.0, 4.0, -4.0],
                        [0.0, -1.0, 2.0]])


def _map_monomials(mesh) -> np.ndarray:
    """(cells, 3, gx+1, gy+1, gz+1) monomial coefficients of the cell
    geometry map x(xi) on the unit reference cell, at the mesh's
    geometry order (trilinear from the canonical corners, triquadratic
    from the hex27 lattice)."""
    if mesh.geom_nodes is None:
        Cg = mesh.cell_corners_flat.reshape(-1, 2, 2, 2, 3)
        nc = Cg.shape[0]
        C = np.zeros((nc, 3, 2, 2, 2))
        a000 = Cg[:, 0, 0, 0]
        a100 = Cg[:, 1, 0, 0] - a000
        a010 = Cg[:, 0, 1, 0] - a000
        a001 = Cg[:, 0, 0, 1] - a000
        a110 = Cg[:, 1, 1, 0] - Cg[:, 1, 0, 0] - Cg[:, 0, 1, 0] + a000
        a101 = Cg[:, 1, 0, 1] - Cg[:, 1, 0, 0] - Cg[:, 0, 0, 1] + a000
        a011 = Cg[:, 0, 1, 1] - Cg[:, 0, 1, 0] - Cg[:, 0, 0, 1] + a000
        a111 = (Cg[:, 1, 1, 1] - Cg[:, 1, 1, 0] - Cg[:, 1, 0, 1]
                - Cg[:, 0, 1, 1] + Cg[:, 1, 0, 0] + Cg[:, 0, 1, 0]
                + Cg[:, 0, 0, 1] - a000)
        for (i, j, k), v in (((0, 0, 0), a000), ((1, 0, 0), a100),
                             ((0, 1, 0), a010), ((0, 0, 1), a001),
                             ((1, 1, 0), a110), ((1, 0, 1), a101),
                             ((0, 1, 1), a011), ((1, 1, 1), a111)):
            C[:, :, i, j, k] = v
        return C
    gn = np.asarray(mesh.geom_nodes, np.float64)      # (cells, 27, 3)
    g3 = gn.reshape(-1, 3, 3, 3, 3)                   # (c, i, j, k, p)
    M = _L2_TO_MONO
    return np.einsum("cijkp,ia,jb,kd->cpabd", g3, M, M, M,
                     optimize=True)


def corner_stream(mesh, coeff: np.ndarray | None = None) -> np.ndarray:
    """(ns, nz, nch+1) float64 Jacobian monomial coefficients in stack
    order — the _monomial_table(g) channel layout with an optional
    per-cell coefficient folded into the last channel.  Trilinear hex8
    meshes carry 37 channels; curved hex27 prisms carry 163 (the
    quadratic-map equivalent, VERDICT r4 #4)."""
    g = 1 if mesh.geom_nodes is None else 2
    nch, table = _monomial_table(g)
    ns, nz = mesh.nstacks, mesh.nz
    order = mesh.stack_cells.reshape(-1)
    C = _map_monomials(mesh)[order]       # (cells, 3, gx+1, gy+1, gz+1)
    nc = C.shape[0]
    T = np.empty((nc, nch + 1))
    for q in range(3):
        ax = 2 + q                        # monomial axis of direction q
        # derivative along q: coefficient (m+1) * C[..., m+1, ...]
        Dq = np.moveaxis(np.moveaxis(C, ax, -1)[..., 1:]
                         * np.arange(1, g + 1), -1, ax)
        for p in range(3):
            for ch, mx, my, mz in table[q][p]:
                T[:, ch] = Dq[:, p, mx, my, mz]
    T[:, nch] = (1.0 if coeff is None
                 else np.asarray(coeff, np.float64).reshape(-1)[order])
    return T.reshape(ns, nz, nch + 1)


def _t_identity(g: int) -> np.ndarray:
    """Identity-Jacobian channel vector for padding stacks: J[p][q] =
    delta_pq constant term, coefficient channel 0 — zero contribution
    without 0/0 in the det division."""
    nch, table = _monomial_table(g)
    t = np.zeros(nch + 1)
    for q in range(3):
        for ch, mx, my, mz in table[q][q]:
            if mx == my == mz == 0:
                t[ch] = 1.0
    return t


def _pack_corner(Tsn: np.ndarray, rows2d: np.ndarray, S: int, g: int):
    """(ns, nz, nch+1) + (ns, n^2) -> ((nch+1, ns_pad, nz),
    (n^2, ns_pad)), identity-padded."""
    ns, nz = Tsn.shape[0], Tsn.shape[1]
    ns_pad = -(-ns // S) * S
    Tt = np.empty((Tsn.shape[2], ns_pad, nz))
    Tt[:, :, :] = _t_identity(g)[:, None, None]
    Tt[:, :ns, :] = Tsn.transpose(2, 0, 1)
    n2 = rows2d.shape[1]
    rows_t = np.zeros((n2, ns_pad), np.int32)
    rows_t[:, :ns] = np.asarray(rows2d, np.int64).T
    return Tt, rows_t


def _z_vectors(mesh):
    """Uz (nz, ez) 0/1 layer->lane expansion; zrow/wzrow (1, ez) local
    GLL node / weight per z lane."""
    from fustpu.elements import gll

    n = mesh.degree + 1
    nz = mesh.nz
    ez = nz * n
    Uz = np.zeros((nz, ez))
    Uz[np.repeat(np.arange(nz), n), np.arange(ez)] = 1.0
    nodes = gll.gll_nodes_unit(n)
    wts = gll.gll_points_weights_unit(n)[1]
    return (Uz, np.tile(nodes, nz)[None, :], np.tile(wts, nz)[None, :],
            tuple(np.asarray(nodes, np.float64)),
            tuple(np.asarray(wts, np.float64)))


def build_extruded_corner(mesh, D_1d, dtype,
                          coeff: np.ndarray | None = None,
                          c1_cells=None, c2_cells=None
                          ) -> PallasExtrudedCorner:
    """Corner-streamed (capacity) extruded operator.  Either fold a
    per-cell `coeff` into the stream (single-field form) or pass
    (c1_cells, c2_cells) for the heterogeneous pair form (unit stream +
    in-kernel ce combine, like build_extruded_pair)."""
    pair = c1_cells is not None
    if pair and coeff is not None:
        raise ValueError("coeff and pair coefficients are exclusive")
    g = 1 if mesh.geom_nodes is None else 2
    n = mesh.degree + 1
    gz = mesh.gz
    S = probed_stack_batch(n, mesh.nstacks, mesh.nz * n, gz, pair=pair,
                           corner=True, geom_deg=g)
    if S is None:
        raise ValueError("no VMEM-feasible stack batch for the corner "
                         "kernel")
    Tt, rows_t = _pack_corner(corner_stream(mesh, coeff), mesh.rows2d, S,
                              g)
    ns_pad = Tt.shape[1]
    ce = None
    if pair:
        ce = np.zeros((2, ns_pad, mesh.nz * n))
        for m, c in enumerate((c1_cells, c2_cells)):
            cs = np.asarray(c, np.float64).reshape(-1)[mesh.stack_cells]
            ce[m, :mesh.nstacks] = np.repeat(cs, n, axis=1)
        ce = jnp.asarray(ce, dtype)
    Uz, zrow, wzrow, XQ, WQ = _z_vectors(mesh)
    return PallasExtrudedCorner(
        T=jnp.asarray(Tt, dtype),
        rows=jnp.asarray(rows_t),
        ce=ce,
        Uz=jnp.asarray(Uz, dtype),
        zrow=jnp.asarray(zrow, dtype),
        wzrow=jnp.asarray(wzrow, dtype),
        WzT=jnp.asarray(mm.window_matrix(mesh.nz, mesh.degree).T, dtype),
        Dz=jnp.asarray(mm.deriv_block_matrix(mesh.nz, D_1d), dtype),
        statics=(tuple(map(tuple, np.asarray(D_1d, np.float64))),
                 XQ, WQ, S, pair, g),
    )


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

def _mk_kernel(n: int, S: int, D: tuple, precision, pair: bool,
               corner: tuple | None = None):
    n2 = n * n
    D = tuple(tuple(float(v) for v in row) for row in D)
    if corner:
        XQ = tuple(float(v) for v in corner[0])
        WQ = tuple(float(v) for v in corner[1])
        geom_deg = corner[2]
        nch, jtable = _monomial_table(geom_deg)

    def kernel(*refs):
        if pair:
            g1_ref, g2_ref, ce_ref = refs[:3]
            refs = refs[3:]
        else:
            (g1_ref,) = refs[:1]
            refs = refs[1:]
        if corner:
            (G_ref, Uz_ref, zrow_ref, wzrow_ref, WzT_ref, Dz_ref, o_ref,
             u_sc, wx_sc, wy_sc, wz_sc, jp_sc) = refs
        else:
            (G_ref, WzT_ref, Dz_ref, o_ref, u_sc, wx_sc, wy_sc,
             wz_sc) = refs
        mats = lambda: (WzT_ref[...], Dz_ref[...])
        s = pl.program_id(1)
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        C10 = ((1,), (0,))
        gz = o_ref.shape[2]
        ez = u_sc.shape[1]
        pslice = lambda q: slice(q * S, (q + 1) * S)

        @pl.when(s == 0)
        def _forward():
            WzT, Dz = mats()
            if pair:
                # z-window both fields (staging through wx/wy scratch),
                # combine against the in-kernel coefficient planes
                wx_sc[...] = matmul(g1_ref[...].reshape(n2 * S, gz), WzT,
                                    C10, b_exact=True)
                wy_sc[...] = matmul(g2_ref[...].reshape(n2 * S, gz), WzT,
                                    C10, b_exact=True)
                ce0 = ce_ref[0]
                ce1 = ce_ref[1]
                for q in range(n2):
                    u_sc[pslice(q)] = (ce0 * wx_sc[pslice(q)]
                                       + ce1 * wy_sc[pslice(q)])
            else:
                u_sc[...] = matmul(g1_ref[...].reshape(n2 * S, gz), WzT,
                                   C10, b_exact=True)
            wz_sc[...] = matmul(u_sc[...], Dz, ((1,), (1,)))
            # footprint derivatives: wx[a,j] = sum_i D[a][i] u[i,j],
            # wy[i,b] = sum_j D[b][j] u[i,j] — static-scalar VPU work
            for a in range(n):
                for j in range(n):
                    acc = None
                    for i in range(n):
                        t = D[a][i] * u_sc[pslice(i * n + j)]
                        acc = t if acc is None else acc + t
                    wx_sc[pslice(a * n + j)] = acc
            for i in range(n):
                for b in range(n):
                    acc = None
                    for j in range(n):
                        t = D[b][j] * u_sc[pslice(i * n + j)]
                        acc = t if acc is None else acc + t
                    wy_sc[pslice(i * n + b)] = acc
            if corner:
                # expand the monomial channels (37 trilinear / 163
                # triquadratic) to (S, ez) planes once per stack batch
                # (exact-placement matmuls against the 0/1 layer->lane
                # map); the z quadrature weights fold into the
                # coefficient channel here
                Uz = Uz_ref[...]
                for m in range(nch + 1):
                    p = matmul(G_ref[m], Uz, C10, b_exact=True)
                    jp_sc[m] = p * wzrow_ref[...] if m == nch else p

        if corner:
            # geometry reconstruction + metric transform at footprint
            # node q = (a, b): J entries are the map's derivative
            # monomials (table-driven — order 1 or 2) evaluated at
            # (XQ[a], XQ[b], zrow); G = scale * adj(J) adj(J)^T / |det|
            # applied in factored form (t = a^T w, f = scale * a t) —
            # the extruded analogue of the structured corner kernel's
            # plane step (pallas_stiffness._mk_kernel_corner)
            for q in range(n2):
                @pl.when(s == q)
                def _transform(q=q):
                    xa, yb = XQ[q // n], XQ[q % n]
                    wq = WQ[q // n] * WQ[q % n]
                    dsl = pl.ds(q * S, S)
                    zrow = zrow_ref[...]
                    zpow = [None, zrow]
                    if geom_deg > 1:
                        zpow.append(zrow * zrow)

                    def J(col, p):
                        # group by z power: one plane-FMA chain per
                        # z-power, scalar xy weights folded host-side
                        acc = None
                        for mz in range(geom_deg + 1):
                            zacc = None
                            for ch, mx, my, mz_ in jtable[col][p]:
                                if mz_ != mz:
                                    continue
                                w = (xa ** mx) * (yb ** my)
                                t = w * jp_sc[ch]
                                zacc = t if zacc is None else zacc + t
                            if zacc is None:
                                continue
                            if zpow[mz] is not None:
                                zacc = zacc * zpow[mz]
                            acc = zacc if acc is None else acc + zacc
                        return acc

                    J00, J10, J20 = J(0, 0), J(0, 1), J(0, 2)
                    J01, J11, J21 = J(1, 0), J(1, 1), J(1, 2)
                    J02, J12, J22 = J(2, 0), J(2, 1), J(2, 2)
                    a00 = J11 * J22 - J12 * J21
                    a01 = J02 * J21 - J01 * J22
                    a02 = J01 * J12 - J02 * J11
                    a10 = J12 * J20 - J10 * J22
                    a11 = J00 * J22 - J02 * J20
                    a12 = J02 * J10 - J00 * J12
                    a20 = J10 * J21 - J11 * J20
                    a21 = J01 * J20 - J00 * J21
                    a22 = J00 * J11 - J01 * J10
                    det = J00 * a00 + J01 * a10 + J02 * a20
                    scale = (wq * jp_sc[nch]) / jnp.abs(det)
                    wx = wx_sc[dsl]
                    wy = wy_sc[dsl]
                    wz = wz_sc[dsl]
                    t0 = a00 * wx + a10 * wy + a20 * wz
                    t1 = a01 * wx + a11 * wy + a21 * wz
                    t2 = a02 * wx + a12 * wy + a22 * wz
                    wx_sc[dsl] = scale * (a00 * t0 + a01 * t1 + a02 * t2)
                    wy_sc[dsl] = scale * (a10 * t0 + a11 * t1 + a12 * t2)
                    wz_sc[dsl] = scale * (a20 * t0 + a21 * t1 + a22 * t2)
        else:
            # metric transform at footprint node s = (p1, p2), IN PLACE
            # (every plane is read and written exactly once, at its phase)
            dsl = pl.ds(s * S, S)
            G = lambda m: G_ref[0, m]
            wx = wx_sc[dsl]
            wy = wy_sc[dsl]
            wz = wz_sc[dsl]
            wx_sc[dsl] = G(0) * wx + G(1) * wy + G(2) * wz
            wy_sc[dsl] = G(1) * wx + G(3) * wy + G(4) * wz
            wz_sc[dsl] = G(2) * wx + G(4) * wy + G(5) * wz

        @pl.when(s == n2 - 1)
        def _reverse():
            WzT, Dz = mats()
            # r[i,j] = sum_a D[a][i] f0[a,j] + sum_b D[b][j] f1[i,b]
            # (reuses u_sc — u is dead after the forward sweep)
            for i in range(n):
                for j in range(n):
                    acc = None
                    for a in range(n):
                        t = D[a][i] * wx_sc[pslice(a * n + j)]
                        acc = t if acc is None else acc + t
                    for b in range(n):
                        acc = acc + D[b][j] * wy_sc[pslice(i * n + b)]
                    u_sc[pslice(i * n + j)] = acc
            r = u_sc[...] + matmul(wz_sc[...], Dz, C10)
            vals = matmul(r, WzT, ((1,), (1,)), b_exact=True)
            o_ref[...] = vals.reshape(n2, S, gz)

    return kernel


def _call(op, gs, pair: bool, interpret: bool, precision):
    corner = isinstance(op, PallasExtrudedCorner)
    if corner:
        D_host, XQ, WQ, S, _, geom_deg = op.statics
        nch1, ns_pad, nz = op.T.shape
        n2 = op.rows.shape[0]
        ez = nz * int(round(n2 ** 0.5))
    else:
        D_host, S = op.statics
        n2, _, ns_pad, ez = op.Gt.shape
    n = int(round(n2 ** 0.5))
    gz = op.WzT.shape[0]
    nb = ns_pad // S
    dtype = gs[0].dtype
    # the z matrices are passed at full precision and split IN-KERNEL in
    # bf16x3 mode: pre-split bf16 matrices as pallas inputs are LOSSY on
    # TPU Mosaic (~1e-3-class operator error; BENCH_NOTES r4)
    mats = ([op.Uz, op.zrow, op.wzrow] if corner else []) \
        + [op.WzT, op.Dz]
    kernel = _mk_kernel(n, S, D_host, precision, pair,
                        corner=(XQ, WQ, geom_deg) if corner else None)
    vmem = pltpu.VMEM
    io_spec = pl.BlockSpec((n2, S, gz), lambda b, s: (0, b, 0),
                           memory_space=vmem)
    in_specs = [io_spec] * len(gs)
    args = list(gs)
    if pair:
        in_specs.append(pl.BlockSpec((2, S, ez), lambda b, s: (0, b, 0),
                                     memory_space=vmem))
        args.append(op.ce)
    if corner:
        # whole monomial block per stack batch (geometry is tiny now)
        in_specs.append(pl.BlockSpec((nch1, S, nz),
                                     lambda b, s: (0, b, 0),
                                     memory_space=vmem))
        args.append(op.T)
    else:
        in_specs.append(pl.BlockSpec((1, 6, S, ez),
                                     lambda b, s: (s, 0, b, 0),
                                     memory_space=vmem))
        args.append(op.Gt)
    in_specs += [pl.BlockSpec(memory_space=vmem) for _ in mats]
    args += mats
    scratch = [pltpu.VMEM((n2 * S, ez), dtype) for _ in range(4)]
    if corner:
        scratch.append(pltpu.VMEM((nch1, S, ez), dtype))
    return pl.pallas_call(
        kernel,
        grid=(nb, n2),
        in_specs=in_specs,
        out_specs=io_spec,
        out_shape=jax.ShapeDtypeStruct((n2, ns_pad, gz), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Applies (jit-traceable; XLA row gather / scatter around the kernel)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("ndofs", "interpret", "precision"))
def stiffness_apply_extruded_pallas(x_flat: jax.Array, op: PallasExtruded,
                                    ndofs: int, interpret: bool = False,
                                    precision="auto") -> jax.Array:
    """y_flat = A_stiff(x_flat) on the factorized (n2d, gz) DOF layout,
    fused kernel.  Same contract as operators.stiffness_apply_extruded
    (coefficients folded into Gt at build)."""
    if precision == "auto":
        precision = _HI if x_flat.dtype == jnp.float64 else "bf16x3"
    gz = op.WzT.shape[0]
    x2 = x_flat.reshape(-1, gz)
    g = x2[op.rows]                                    # (n^2, ns_pad, gz)
    vals = _call(op, [g], False, interpret, precision)
    y2 = jnp.zeros((ndofs // gz, gz), x_flat.dtype)
    y2 = y2.at[op.rows].add(vals, mode="promise_in_bounds")
    return y2.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("ndofs", "interpret", "precision"))
def stiffness_apply_extruded_pallas_pair(x1: jax.Array, x2: jax.Array,
                                         op: PallasExtrudedPair,
                                         ndofs: int,
                                         interpret: bool = False,
                                         precision="auto") -> jax.Array:
    """y = A_c1(x1) + A_c2(x2), one fused pass (unit-coefficient stream,
    fields combined after the z-window against the ce block)."""
    if precision == "auto":
        precision = _HI if x1.dtype == jnp.float64 else "bf16x3"
    gz = op.WzT.shape[0]
    g1 = x1.reshape(-1, gz)[op.rows]
    g2 = x2.reshape(-1, gz)[op.rows]
    vals = _call(op, [g1, g2], True, interpret, precision)
    y2 = jnp.zeros((ndofs // gz, gz), x1.dtype)
    y2 = y2.at[op.rows].add(vals, mode="promise_in_bounds")
    return y2.reshape(-1)
