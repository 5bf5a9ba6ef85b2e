"""TPU gather/scatter engine for the indexed (general unstructured) path.

XLA's per-element gather/scatter on TPU runs ~150M elem/s (scalar-core
bound) — ~90% of the indexed stiffness apply (BENCH_NOTES r2/r4).  This
module re-expresses both directions as dense one-hot contractions over
per-tile WINDOWS of the DOF vector, so the work runs on the MXU/VPU:

- gather  out[p] = x[g[p]]:  per tile of TM outputs, ONE (WR, 128)
  window of the DOF storage is DMA'd in at a row-granular (8-aligned)
  start chosen per tile; a one-hot matrix built from the target codes
  picks each element's row via an MXU matmul (exact: x enters as a
  3-term bf16 split) and a masked reduction picks the lane.
- scatter y[g[p]] += v[p]:   the TRANSPOSED one-hot contraction
  accumulates a (WR, 128) window contribution on the MXU (f32
  accumulate, deterministic), added into y by an in-kernel
  read-modify-write DMA (sequential grid orders overlapping windows).

Stream layout (r5 default "packed"): every per-element stream (code,
live, values, the expanded field) is stored (N/128, 128) compact and
processed in 128-output sub-tiles with the one-hot TRANSPOSED (Ht from
a (1, 128) code row broadcast down sublanes; outputs land on lanes,
the pick reduces over sublanes).  The r4 "col" kernels kept the
streams as (N, 1) columns, which TPU tiled layouts lane-pad 128x in
HBM — ~1 MB of DMA per 2048-element tile per stream
(FUSTPU_ENGINE_LAYOUT=col retains them for A/B).

Windows exist because of the mesh's first-touch DOF numbering
(fustpu.mesh.unstructured._numbering): a cell batch addresses a compact
id range.  Window starts are row-granular (multiples of 8 sublanes for
the f32 (8,128) tiling), so ONE window sized to the worst tile span
covers every tile of a normal-front mesh — the earlier two-block-
aligned-window design paid DOUBLE the one-hot FLOPs for the same
coverage.  When the front exceeds the 512-row cap (large cross-section
meshes), tiles reference two clusters (fresh ids + the previous sweep
layer) and the plan auto-switches to TWO independently-placed windows
(`nwin` static; the scatter RMWs them sequentially since they may
overlap in rows); any residue spills to a chunked XLA gather/scatter
(chunked because XLA prefetches gather indices to 1 MB of SMEM).

The reference's equivalent is cuda.atomic.add / coalesced gathers on a
layout-agnostic kernel (/root/reference/cuda/operators.py:55-70,190);
this is the TPU-native mechanism for the same any-mesh capability.
Measured (627k-DOF cylinder, detection off): gather 3.6 ms vs 7.9 XLA,
scatter 4.8 vs 8.3 (BENCH_NOTES r4).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tm_from_env() -> int:
    """Outputs per tile.  FUSTPU_ENGINE_TM overrides the default 2048
    (read ONCE at import — plans and kernels must agree on TM, so it
    cannot change within a process).  Larger tiles amortise per-tile
    overhead when WR floors at 64; in the "col" layout they also
    lane-pad the (TM, 1) index streams to TM*128 floats of VMEM each —
    mind the budget there (packed streams stay compact)."""
    v = os.environ.get("FUSTPU_ENGINE_TM")
    if v is None or v == "":
        return 2048
    try:
        tm = int(v)
    except ValueError:
        raise ValueError(f"FUSTPU_ENGINE_TM={v!r}: not an integer")
    if tm <= 0 or tm % 8:
        raise ValueError(
            f"FUSTPU_ENGINE_TM={tm}: must be a positive multiple of 8 "
            "(the (TM, 1) tile blocks need an 8-aligned sublane dim)")
    return tm


TM = _tm_from_env()   # default for new plans; each plan carries its own

# Lane-pick mechanism in the gather kernels (A/B experiment knob):
#   "onehot": mask A with a lane one-hot and reduce (3 VPU passes over
#             (TM, 128)); the measured r4 baseline.
#   "dg":     tpu.dynamic_gather via take_along_axis (one lane-wise
#             shape-matched gather, range 128 — the Mosaic primitive
#             mapped in BENCH_NOTES r4).
# Read at trace time; tests flip the module global directly (and clear
# the jit caches) — the env var exists for on-device A/B runs.
LANEPICK = os.environ.get("FUSTPU_ENGINE_LANEPICK", "onehot")
if LANEPICK not in ("onehot", "dg"):
    raise ValueError(
        f"FUSTPU_ENGINE_LANEPICK={LANEPICK!r}: must be onehot|dg")

# Stream layout (r5): "col" = the r4 (N, 1) column streams; "packed" =
# (N/128, 128) compact streams with the TRANSPOSED one-hot per 128-lane
# sub-tile.  Why: TPU tiled layouts lane-pad a minor dim of 1 to 128,
# so every (N, 1) stream (code, live, values, the expanded field) costs
# 128x its logical HBM size AND per-tile DMA traffic — ~1 MB per 2048-
# element tile per stream, which matches the engine's measured ~15x gap
# above its one-hot roofline (BENCH_NOTES r4/r5).  The packed kernels
# flip the one-hot: Ht (nwin*WR, 128) built from a (1, 128) code ROW
# broadcast down sublanes, A2 = W^T @ Ht puts outputs on LANES, and the
# pick reduces over SUBLANES — no lane<->sublane relayout anywhere.
# "packed" is the default on three-source evidence (BENCH_NOTES r5):
# numerics gated bit-exact in interpret mode; Mosaic lowering compiled
# clean against a deviceless v5e topology (tests/test_tpu_aot.py); and
# XLA cost analysis certifies 14-18x less memory traffic at the 627k
# bench scale (gather 639 -> 35 MB with the 630 MB of padded (N, 1)
# temp buffers gone entirely; scatter 653 -> 37; gather2 657 -> 47).
# The r4 column kernels stay one env var away; on-chip wall-clock A/B
# still queued (the one thing AOT cannot measure).
LAYOUT = os.environ.get("FUSTPU_ENGINE_LAYOUT", "packed")
if LAYOUT not in ("col", "packed"):
    raise ValueError(
        f"FUSTPU_ENGINE_LAYOUT={LAYOUT!r}: must be col|packed")


def _subw_from_env() -> int:
    """Sub-tiles per one-hot MXU dispatch in the packed kernels.

    With the padding traffic gone (packed streams) the engine's
    remaining cost model is per-DISPATCH overhead: at SUBW=1 every 128
    outputs cost one (nwin*WR, 128) one-hot matmul — ~11k dispatches
    per apply at the 627k bench scale, ~150 ns/dispatch measured
    (BENCH_NOTES r3 dispatch study).  SUBW lane-concatenates that many
    one-hot blocks into a single (nwin*WR, 128*SUBW) operand so one
    MXU dispatch serves SUBW sub-tiles — identical FLOPs and HBM
    traffic, 1/SUBW the dispatch count.  Capped per-plan so the widened
    block stays within the VMEM budget (_subw_eff)."""
    v = os.environ.get("FUSTPU_ENGINE_SUBW")
    if v is None or v == "":
        return 1
    try:
        sw = int(v)
    except ValueError:
        raise ValueError(f"FUSTPU_ENGINE_SUBW={v!r}: not an integer")
    if sw < 1:
        raise ValueError(f"FUSTPU_ENGINE_SUBW={sw}: must be >= 1")
    return sw


# Read at trace time by the packed kernel makers; tests flip the module
# global directly (and clear the jit caches) — the env var exists for
# on-device A/B runs.
SUBW = _subw_from_env()


def _stage_from_env() -> str:
    v = os.environ.get("FUSTPU_ENGINE_STAGE", "auto")
    if v not in ("auto", "0", "1"):
        raise ValueError(
            f"FUSTPU_ENGINE_STAGE={v!r}: must be auto|0|1")
    return v


# Staged field residency (the r5 scan-tax fix).  Device profiling of the
# production RK scan showed the engine's gather/scatter kernels running
# exactly bimodal: fast when XLA memory-space assignment promoted the
# 12.9 MB field operand to VMEM, 40-60% slower when the row-granular
# window DMAs hit HBM (~8 GB/s for 512 B scattered rows) — and in the
# full model MSA promoted 0 of 8 instances (BENCH_NOTES r5).  "Staged"
# kernels make residency unconditional: the whole field is a
# grid-CONSTANT VMEM block (fetched once per kernel at full contiguous
# bandwidth, ~50 us for 12.9 MB), windows become plain VMEM slices, and
# the scatter accumulates into a VMEM-resident output written back once.
# auto: stage whenever the field(s) + working margin fit STAGE_CAP
# (packed layout only); 0/1 force.  Read at trace time; tests flip the
# module global and clear the jit caches.
STAGE = _stage_from_env()


def _stage_cap_from_env() -> int:
    v = os.environ.get("FUSTPU_ENGINE_STAGE_CAP")
    return int(v) if v else 120 * 2**20


# Upper bound on nfields*field + _STAGE_MARGIN for auto-staging.
# Probe-informed (deviceless v5e AOT, r5): the enforcement is against
# the core's physical 128 MiB VMEM — a 107 MB single staged field
# lowers clean, a 2x92 MB gather2 is rejected at 187 of 128 MiB.  The
# margin covers the double-buffered code/value/output stream blocks
# plus the one-hot temporaries (bounded ~3 MB by _subw_eff).
STAGE_CAP = _stage_cap_from_env()
_STAGE_MARGIN = 12 * 2**20


def _staged(plan: "GatherPlan", dtype, nfields: int = 1) -> bool:
    """Whether gather/scatter on this plan stage the field(s) VMEM-
    resident (packed layout only — the legacy col kernels keep their
    DMA protocol)."""
    if not _plan_packed(plan):
        return False
    if STAGE == "0":
        return False
    if STAGE == "1":
        return True
    nrows = plan.statics[2]
    field = nfields * nrows * 128 * jnp.dtype(dtype).itemsize
    return field + _STAGE_MARGIN <= STAGE_CAP


def _stage_limit(field_bytes: int) -> int:
    return int(field_bytes) + _STAGE_MARGIN


def _subw_eff(WR: int, nwin: int, rows: int) -> int:
    """Effective widening for a plan: never wider than the tile has
    sub-tiles, and capped so the widened one-hot working set
    (~6 B/element over (nwin*WR, 128*sw): bf16 Ht + int32 compare
    operands) stays under ~3 MB next to the window scratch, bf16x3
    splits and A2."""
    cap = max(1, (3 * 2**20) // (nwin * WR * 128 * 6))
    return max(1, min(SUBW, rows, cap))


def _row_concat(ref, j0: int, kk: int):
    """(1, 128*kk) lane-concatenation of kk consecutive (1, 128) rows
    of a packed (rows, 128) stream block.  A (kk, 128) -> (1, 128*kk)
    reshape would be a lane<->sublane relayout (rejected by Mosaic);
    concatenating whole-vreg rows along lanes is layout-preserving."""
    if kk == 1:
        return ref[j0:j0 + 1, :]
    return jnp.concatenate(
        [ref[j0 + i:j0 + i + 1, :] for i in range(kk)], axis=1)


def _lane_pick(A, lo, tm):
    """out[i, 0] = A[i, lo[i]] for A (tm, 128), lo (tm, 1) int32."""
    if LANEPICK == "dg":
        idx = jnp.broadcast_to(lo, (tm, 128))
        return jnp.take_along_axis(A, idx, axis=1)[:, :1]
    il = jax.lax.broadcasted_iota(jnp.int32, (tm, 128), 1)
    return jnp.sum(A * (lo == il).astype(A.dtype), axis=1,
                   keepdims=True)


@jax.tree_util.register_pytree_node_class
class GatherPlan:
    """woff (2, ntiles) int32 window ROW starts (multiples of 8,
    TRANSPOSED: the scalar-prefetch operand is lane-padded to 128 in
    SMEM, so the tile axis must be minor — (ntiles, 2) hits the 1 MB
    SMEM cap at ~2000 tiles); code holds hi*128+lo relative to the
    window stack (nwin*WR*128 = dead) — (ntiles*TM/128, 128) compact
    ("packed") or (ntiles*TM, 1) column ("col"); the layout rides on
    code.shape (see _plan_packed).  A dead code suffices to kill an
    element in BOTH directions (its one-hot column is all-zero), so no
    separate liveness mask is stored or streamed.
    spill_pos/spill_idx device arrays; statics (WR, ntiles, nrows, N,
    nwin, TM)."""

    def __init__(self, woff, code, spos, sidx, statics):
        self.woff = woff
        self.code = code
        self.spos = spos
        self.sidx = sidx
        self.statics = statics

    def tree_flatten(self):
        return ((self.woff, self.code, self.spos, self.sidx),
                self.statics)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


def pick_wr(g: np.ndarray, lo: int = 64, hi: int = 512,
            dead: int | None = None, tm: int | None = None) -> int:
    """Smallest window row count (multiple of 8) whose single
    row-granular window holds the worst tile span.  `dead`: id value to
    EXCLUDE from spans (the no-op slot used to pad ragged per-device
    cell counts — it needs no window coverage, and counting it would
    blow the mixed real/dead boundary tile to the cap)."""
    tm = tm or TM
    spans = [0]
    for s in range(0, g.size, tm):
        blk = g[s:s + tm]
        if dead is not None:
            blk = blk[blk != dead]
        if blk.size:
            spans.append(int(blk.max()) - int(blk.min()))
    # size for the MAX span (the XLA spill path is expensive enough
    # that coverage beats window slimness): the start is floored to an
    # 8-row boundary (up to 8 rows before the tile's min) and the top
    # id can straddle one extra lane row
    need = int(np.max(spans)) // 128 + 10
    wr = -(-need // 8) * 8
    return int(min(max(wr, lo), hi))


def pick_wr2(g: np.ndarray, lo: int = 16, hi: int = 512,
             dead: int | None = None, tm: int | None = None) -> int:
    """Window row count for TWO-window plans: each tile's references
    split at their largest id gap (fresh cluster + previous-sweep-layer
    cluster), and WR needs to hold only the worse CLUSTER — typically
    ~10x smaller than the full tile span that sizes the one-window WR.
    (Reusing the one-window WR for both windows — the first two-window
    implementation — paid 2x512 rows of one-hot work per tile where
    2x~100 suffice.)"""
    tm = tm or TM
    rows = [1]
    for s in range(0, g.size, tm):
        blk = g[s:s + tm]
        if dead is not None:
            blk = blk[blk != dead]
        if blk.size < 2:
            continue
        ids = np.sort(blk)
        gaps = np.diff(ids)
        k = int(np.argmax(gaps))
        span = max(int(ids[k]) - int(ids[0]),
                   int(ids[-1]) - int(ids[k + 1]))
        rows.append(span // 128 + 10)
    wr = -(-max(rows) // 8) * 8
    return int(min(max(wr, lo), hi))


def _densest(sorted_ids: np.ndarray, WSZ: int) -> int:
    """8-row-aligned window start covering the most of `sorted_ids`
    (sliding window; counting width shrunk by the 1024-id alignment
    slack so the count lower-bounds actual coverage)."""
    hi_cnt = np.searchsorted(sorted_ids, sorted_ids + WSZ - 1024,
                             side="right")
    best = int(np.argmax(hi_cnt - np.arange(sorted_ids.size)))
    return (int(sorted_ids[best]) // (8 * 128)) * 8


def _attempt_ladder(wr1: int, wr2: int, auto: bool = True):
    """(nwin, WR) candidates, cheapest-preferred: two tight per-cluster
    windows beat one wide one when the tile span caps WR but the
    per-cluster spans are small; a doubled middle rung keeps a
    slightly-too-tight wr2 from jumping straight to the (much wider)
    one-window WR.  `auto=False` drops the one-window rung (caller
    forced nwin=2)."""
    attempts = ([(1, wr1)] if auto else []) \
        + [(2, wr2)] \
        + ([(2, 2 * wr2)] if 2 * wr2 < wr1 else []) \
        + ([(2, wr1)] if wr1 > wr2 else [])
    if auto and 2 * wr2 < 0.6 * wr1:
        # two tight windows substantially cheaper than one wide one
        # (the margin keeps measured one-window configs)
        attempts = attempts[1:] + attempts[:1]
    return attempts


def build_plan(indices: np.ndarray, nsrc: int, WR: int | None = None,
               nwin: int | None = None,
               spill_tol: float = 0.005,
               tm: int | None = None) -> GatherPlan:
    """indices: (N,) int gather targets in [0, nsrc].  Index nsrc is a
    DEAD slot (gathers 0.0, scatter contributions dropped) — sharded
    models use it to pad ragged per-device cell counts.

    `nwin` (1 or 2, auto by default): number of per-tile windows.  One
    window suffices when WR can hold the worst tile span; when WR caps
    (large-front meshes), a tile's references are bimodal (fresh ids +
    the previous sweep layer) and a SECOND independently-placed window
    catches what the first misses — auto-enabled when the one-window
    spill fraction exceeds `spill_tol`.

    `tm` (default: module TM, i.e. FUSTPU_ENGINE_TM or 2048): outputs
    per tile, carried in the plan's statics so the kernels agree."""
    tm = tm or TM
    g = np.asarray(indices, np.int64).reshape(-1)
    N = g.size
    # attempt ladder (nwin, WR): cheapest first, stop at low spill
    if WR is not None:
        attempts = [(nwin or 1, WR)] if nwin else [(1, WR), (2, WR)]
    else:
        wr1 = pick_wr(g, dead=nsrc, tm=tm)
        if nwin == 1:
            attempts = [(1, wr1)]
        else:
            wr2 = pick_wr2(g, dead=nsrc, tm=tm)
            attempts = _attempt_ladder(wr1, wr2, auto=nwin is None)
    # one padded position is always kept dead so spill arrays can be
    # length-padded with no-op entries (stacked per-device plans)
    ntiles = -(-(N + 1) // tm)
    Np = ntiles * tm
    # pad with the DEAD id nsrc: pad entries need no window coverage,
    # and a 0-pad would drag the last tile's window start to row 0,
    # spilling all its real entries
    gp = np.full(Np, nsrc, np.int64)
    gp[:N] = g
    for use_nwin, WR in attempts:
        WSZ = WR * 128
        woff = np.zeros((2, ntiles), np.int32)
        code = np.zeros((Np, 1), np.int32)
        dead = use_nwin * WSZ
        spill_pos, spill_idx = [], []
        for t in range(ntiles):
            blk = gp[t * tm:(t + 1) * tm]
            isdead = blk == nsrc
            real = blk[~isdead]
            if real.size == 0:
                s = 0
            elif int(real.max()) - int(real.min()) < WSZ:
                s = (int(real.min()) // (8 * 128)) * 8
            else:
                # capped tile: cover the DENSEST id cluster — anchoring
                # at the min can strand the whole fresh-id cluster
                s = _densest(np.sort(real), WSZ)
            rel = blk - s * 128
            in_a = (rel >= 0) & (rel < WSZ) & ~isdead
            code_t = np.where(in_a, rel, dead)
            ok = in_a
            s2 = s
            if use_nwin == 2:
                rest = np.sort(blk[~in_a & ~isdead])
                if rest.size:
                    s2 = (_densest(rest, WSZ) if
                          int(rest[-1]) - int(rest[0]) >= WSZ
                          else (int(rest[0]) // (8 * 128)) * 8)
                rel2 = blk - s2 * 128
                in_b = (~in_a & ~isdead
                        & (rel2 >= 0) & (rel2 < WSZ))
                code_t[in_b] = WSZ + rel2[in_b]
                ok = in_a | in_b
            woff[:, t] = (s, s2)
            sl = slice(t * tm, (t + 1) * tm)
            code[sl, 0] = code_t
            bad = np.nonzero(~ok & ~isdead
                             & (np.arange(t * tm, (t + 1) * tm) < N))[0]
            spill_pos.extend(t * tm + bad)
            spill_idx.extend(blk[bad])
        if len(spill_pos) <= spill_tol * N:
            break
    # window slack past the top id so no start needs clamping
    nrows = -(-(-(-(nsrc + 1) // 128)) // 8) * 8 + WR
    if LAYOUT == "packed" and tm % 1024 == 0:
        # compact (Np/128, 128) streams (see the LAYOUT note at top).
        # tm % 1024: the packed blocks are (tm/128, 128) and Mosaic
        # requires the 2nd-to-last block dim %8 — smaller TM values
        # keep the col layout (they compiled there and still do)
        code = code.reshape(Np // 128, 128)
    # int32 spill indices: XLA's TPU gather/scatter prefetches the index
    # operand to SMEM (1 MB) — int64 indices hit the limit at ~130k
    # entries (measured compile failure on a capped-WR 2.8M-DOF mesh)
    return GatherPlan(
        woff=jnp.asarray(woff), code=jnp.asarray(code),
        spos=jnp.asarray(np.asarray(spill_pos, np.int32)),
        sidx=jnp.asarray(np.asarray(spill_idx, np.int32)),
        statics=(WR, ntiles, nrows, N, use_nwin, tm))


def _plan_packed(plan: GatherPlan) -> bool:
    """Layout is carried by the code stream's shape — (Np/128, 128)
    packed vs (Np, 1) column — so statics (shared by stacked sharded
    plans) stay unchanged."""
    return plan.code.shape[1] == 128


_SPILL_CHUNK = 98304        # indices per spill op: 4B * 98304 < 1 MB SMEM
SPILL_FRACTION_LIMIT = 0.10


def plan_covers(n_spill: int, n_total: int) -> bool:
    """Single policy for 'is the windowed engine worth using': when the
    residual XLA spill exceeds SPILL_FRACTION_LIMIT of the elements, it
    eats the engine's win and callers should take the plain indexed
    path.  (With the two-window mode this triggers only on
    pathologically fragmented reference patterns.)"""
    return n_spill <= SPILL_FRACTION_LIMIT * n_total


def _spill_set(out, pos, src, sidx):
    """out[pos] = src[sidx], chunked to bound the per-op index count."""
    n = int(pos.shape[0])
    for s in range(0, n, _SPILL_CHUNK):
        out = out.at[pos[s:s + _SPILL_CHUNK]].set(
            src[sidx[s:s + _SPILL_CHUNK]], mode="promise_in_bounds")
    return out


def _spill_add(y, sidx, src, pos):
    """y[sidx] += src[pos], chunked (duplicate targets stay correct —
    each chunk is its own scatter-add)."""
    n = int(pos.shape[0])
    for s in range(0, n, _SPILL_CHUNK):
        y = y.at[sidx[s:s + _SPILL_CHUNK]].add(
            src[pos[s:s + _SPILL_CHUNK]], mode="promise_in_bounds")
    return y


def build_stacked_plans(index_sets, nsrc: int, tm: int | None = None,
                        spill_tol: float = 0.005):
    """Per-device plans with COMMON statics for use under shard_map:
    `index_sets` is a sequence of equal-length (N,) target arrays (one
    per device, each in [0, nsrc]); returns (stacked GatherPlan whose
    leaves carry a leading device axis, statics).  The window geometry
    (count and WR) is chosen by the same attempt ladder as build_plan,
    with the per-rung sizes maxed over devices so statics stay common;
    a rung is accepted only when EVERY device's spill is low.  Spill
    arrays are length-padded with no-op entries (dead output position
    N.., dead target nsrc) — valid because build_plan always keeps one
    padded position dead."""
    tm = tm or TM
    gs = [np.asarray(g, np.int64).reshape(-1) for g in index_sets]
    N = gs[0].size
    if any(g.size != N for g in gs):
        raise ValueError("per-device index sets must be equal length")
    wr1 = max(pick_wr(g, dead=nsrc, tm=tm) for g in gs)
    wr2 = max(pick_wr2(g, dead=nsrc, tm=tm) for g in gs)
    for nw, wr in _attempt_ladder(wr1, wr2):
        plans = [build_plan(g, nsrc, WR=wr, nwin=nw, tm=tm) for g in gs]
        if all(int(p.spos.shape[0]) <= spill_tol * N for p in plans):
            break
    statics = plans[0].statics
    S = max(int(p.spos.shape[0]) for p in plans)
    dead_pos, dead_idx = N, nsrc
    woff, code, spos, sidx = [], [], [], []
    for p in plans:
        woff.append(np.asarray(p.woff))
        code.append(np.asarray(p.code))
        ns = int(p.spos.shape[0])
        spos.append(np.concatenate(
            [np.asarray(p.spos), np.full(S - ns, dead_pos, np.int32)]))
        sidx.append(np.concatenate(
            [np.asarray(p.sidx), np.full(S - ns, dead_idx, np.int32)]))
    return (np.stack(woff), np.stack(code),
            np.stack(spos), np.stack(sidx), statics)


def _split3(v, f32):
    bf = jnp.bfloat16
    vh = v.astype(bf)
    r1 = v - vh.astype(f32)
    vl = r1.astype(bf)
    vl2 = (r1 - vl.astype(f32)).astype(bf)
    return vh, vl, vl2


def _mk_gather_kernel(WR: int, nwin: int, tm: int):
    def kernel(woff_ref, code_ref, x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        f32 = o_ref.dtype
        bf = jnp.bfloat16
        cps = []
        for k in range(nwin):       # concurrent reads (overlap is fine)
            s = pl.multiple_of(woff_ref[k, b], 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, WR)], scratch.at[k * WR:(k + 1) * WR],
                sem)
            cp.start()
            cps.append(cp)
        codev = code_ref[...]
        hi = codev // 128
        lo = codev % 128
        d = lambda a, q: jax.lax.dot_general(
            a, q, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (tm, nwin * WR), 1)
        for cp in cps:
            cp.wait()
        if f32 == jnp.float64:          # interpret/CPU: exact f64 dot
            A = d((hi == i1).astype(f32), scratch[...])
        else:
            H = (hi == i1).astype(bf)
            wh, wl, wl2 = _split3(scratch[...], f32)
            A = d(H, wh) + d(H, wl) + d(H, wl2)  # exact f32 row pick
        o_ref[...] = _lane_pick(A, lo, tm)

    return kernel


def _mk_gather2_kernel(WR: int, nwin: int, tm: int):
    """Two-field gather sharing ONE one-hot H: the per-tile compare/
    iota VPU work (commensurate with the matmuls — BENCH_NOTES r4) is
    paid once for both fields.  Used by the heterogeneous Westervelt
    pair, which gathers u and v over the same dofmap.  The two fields'
    windows sit side by side on the lane axis ((nwin*WR, 256)), so the
    wide dot picks both rows at once."""
    def kernel(woff_ref, code_ref, x1_hbm, x2_hbm, o1_ref, o2_ref,
               s1, s2, sem1, sem2):
        b = pl.program_id(0)
        f32 = o1_ref.dtype
        bf = jnp.bfloat16
        cps = []
        for k in range(nwin):
            s = pl.multiple_of(woff_ref[k, b], 8)
            cps.append(pltpu.make_async_copy(
                x1_hbm.at[pl.ds(s, WR)], s1.at[k * WR:(k + 1) * WR],
                sem1))
            cps.append(pltpu.make_async_copy(
                x2_hbm.at[pl.ds(s, WR)], s2.at[k * WR:(k + 1) * WR],
                sem2))
        for cp in cps:
            cp.start()
        codev = code_ref[...]
        hi = codev // 128
        lo = codev % 128
        d = lambda a, q: jax.lax.dot_general(
            a, q, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (tm, nwin * WR), 1)
        for cp in cps:
            cp.wait()
        w = jnp.concatenate([s1[...], s2[...]], axis=1)  # (nwin*WR, 256)
        if f32 == jnp.float64:          # interpret/CPU: exact f64 dot
            A = d((hi == i1).astype(f32), w)
        else:
            H = (hi == i1).astype(bf)
            wh, wl, wl2 = _split3(w, f32)
            A = d(H, wh) + d(H, wl) + d(H, wl2)
        o1_ref[...] = _lane_pick(A[:, :128], lo, tm)
        o2_ref[...] = _lane_pick(A[:, 128:], lo, tm)

    return kernel


def _mk_scatter_kernel(WR: int, nwin: int, tm: int):
    def kernel(*refs):
        (woff_ref, code_ref, v_ref, y_in, y_hbm,
         scratch) = refs[:6]
        sem = refs[6]
        b = pl.program_id(0)
        f32 = scratch.dtype
        bf = jnp.bfloat16
        s0 = pl.multiple_of(woff_ref[0, b], 8)
        cin = pltpu.make_async_copy(
            y_hbm.at[pl.ds(s0, WR)], scratch.at[:WR], sem)
        cin.start()
        if nwin == 2:
            # the two windows of one tile may OVERLAP in rows, in which
            # case the second read-modify-write must wait for the
            # first's write to land (a stale read would clobber it).
            # Most tiles' windows are row-DISJOINT though — for those,
            # start the second read immediately so its DMA latency
            # hides under the one-hot compute instead of serialising
            # after window 1's round trip.  (sem2 is a separate
            # semaphore: with one semaphore a wait cannot tell which
            # in-flight copy completed.)
            sem2 = refs[7]
            s1 = pl.multiple_of(woff_ref[1, b], 8)
            disjoint = jnp.abs(s1 - s0) >= WR
            cin2 = pltpu.make_async_copy(
                y_hbm.at[pl.ds(s1, WR)], scratch.at[WR:], sem2)

            @pl.when(disjoint)
            def _early_read2():
                cin2.start()

        codev = code_ref[...]
        hi = codev // 128
        lo = codev % 128
        il = jax.lax.broadcasted_iota(jnp.int32, (tm, 128), 1)
        V = jnp.where(lo == il, 1.0, 0.0) * v_ref[...]
        i1 = jax.lax.broadcasted_iota(jnp.int32, (tm, nwin * WR), 1)
        d = lambda a, q: jax.lax.dot_general(
            a, q, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        if f32 == jnp.float64:          # interpret/CPU: exact f64 dot
            C = d((hi == i1).astype(f32), V)
        else:
            Vh, Vl, Vl2 = _split3(V, f32)
            H = (hi == i1).astype(bf)
            C = d(H, Vh) + d(H, Vl) + d(H, Vl2)  # (nwin*WR, 128), exact
        cin.wait()
        scratch[:WR] = scratch[:WR] + C[:WR]
        co = pltpu.make_async_copy(
            scratch.at[:WR], y_hbm.at[pl.ds(s0, WR)], sem)
        co.start()
        if nwin == 2:
            @pl.when(jnp.logical_not(disjoint))
            def _serial_read2():
                co.wait()       # write 1 lands before the stale-read
                cin2.start()

            cin2.wait()
            scratch[WR:] = scratch[WR:] + C[WR:]
            co2 = pltpu.make_async_copy(
                scratch.at[WR:], y_hbm.at[pl.ds(s1, WR)], sem2)
            co2.start()

            @pl.when(disjoint)
            def _drain_write1():
                co.wait()       # consume sem before the tile ends

            co2.wait()
        else:
            co.wait()

    return kernel


def _gather_subtiles(code_ref, Ws, o_refs, WRn: int, rows: int,
                     sw: int, f32, off: int = 0):
    """Shared packed-gather sub-tile loop: per group of sw 128-output
    sub-tiles, ONE transposed one-hot Ht (WRn, 128*sw) picks each
    field's window rows on the MXU (bf16x3-exact for f32) and a masked
    sublane reduction picks the lane.  `Ws`/`o_refs`: parallel tuples of
    (WRn, 128) windows and (rows, 128) output refs (gather2 shares Ht
    across its two fields).  `off`: row offset into code_ref/o_refs —
    the fused kernel processes several plan tiles per grid step from
    one supertile-sized block."""
    bf = jnp.bfloat16
    exact = f32 == jnp.float64
    if not exact:
        Wsp = tuple(_split3(w, f32) for w in Ws)
    for j0 in range(off, off + rows, sw):
        kk = min(sw, off + rows - j0)
        L = 128 * kk
        cw = _row_concat(code_ref, j0, kk)
        isub = jax.lax.broadcasted_iota(jnp.int32, (WRn, L), 0)
        msub = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
        hi = jnp.broadcast_to(cw // 128, (WRn, L))
        lo = jnp.broadcast_to(cw % 128, (128, L))
        dn = (((0,), (0,)), ((), ()))
        pick = (msub == lo).astype(f32)

        def emit(A2, o):
            yw = jnp.sum(A2 * pick, axis=0, keepdims=True)
            for i in range(kk):
                o[j0 + i:j0 + i + 1, :] = yw[:, 128 * i:128 * (i + 1)]

        if exact:
            Ht = (hi == isub).astype(f32)
            for w, o in zip(Ws, o_refs):
                emit(jax.lax.dot_general(w, Ht, dn,
                                         preferred_element_type=f32), o)
        else:
            Ht = (hi == isub).astype(bf)
            for (wh, wl, wl2), o in zip(Wsp, o_refs):
                d = lambda a: jax.lax.dot_general(
                    a, Ht, dn, preferred_element_type=f32)
                emit(d(wh) + d(wl) + d(wl2), o)


def _win_slices(x_ref, woff_ref, b, WR: int, nwin: int):
    """(nwin*WR, 128) window of a VMEM-RESIDENT field: plain dynamic
    slices (starts are 8-row-granular by construction) instead of the
    unstaged kernels' per-window HBM DMAs."""
    parts = [x_ref[pl.ds(pl.multiple_of(woff_ref[k, b], 8), WR)]
             for k in range(nwin)]
    return parts[0] if nwin == 1 else jnp.concatenate(parts, axis=0)


def _mk_gather_kernel_packed(WR: int, nwin: int, tm: int):
    """Transposed one-hot over 128-output sub-tiles: Ht (nwin*WR, 128)
    from a (1, 128) code row broadcast down sublanes, A2 = W^T @ Ht puts
    the sub-tile's outputs on the LANES, and the element pick is a
    masked SUBLANE reduction — all streams stay (rows, 128) compact.
    SUBW > 1 lane-concatenates that many sub-tiles' code rows so one
    (nwin*WR, 128*SUBW) one-hot dispatch serves them all (same FLOPs
    and traffic, 1/SUBW the MXU dispatch count)."""
    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(woff_ref, code_ref, x_hbm, o_ref, scratch, sem):
        b = pl.program_id(0)
        f32 = o_ref.dtype
        cps = []
        for k in range(nwin):
            s = pl.multiple_of(woff_ref[k, b], 8)
            cp = pltpu.make_async_copy(
                x_hbm.at[pl.ds(s, WR)], scratch.at[k * WR:(k + 1) * WR],
                sem)
            cp.start()
            cps.append(cp)
        for cp in cps:
            cp.wait()
        _gather_subtiles(code_ref, (scratch[...],), (o_ref,),
                         nwin * WR, rows, sw, f32)

    return kernel


def _mk_gather_kernel_packed_staged(WR: int, nwin: int, tm: int):
    """Staged variant: the WHOLE field is a VMEM-resident operand
    (grid-constant block — Mosaic fetches it once, one contiguous
    full-bandwidth DMA), and the per-tile windows are plain VMEM
    slices.  This removes the row-granular HBM window DMAs whose
    residency otherwise depends on XLA memory-space assignment — the
    root cause of the bimodal in-scan kernel times (BENCH_NOTES r5
    scan-tax resolution): inside the production RK body MSA promoted
    0/8 engine operands and every window read paid ~8 GB/s HBM."""
    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(woff_ref, code_ref, x_ref, o_ref):
        b = pl.program_id(0)
        W = _win_slices(x_ref, woff_ref, b, WR, nwin)
        _gather_subtiles(code_ref, (W,), (o_ref,),
                         nwin * WR, rows, sw, o_ref.dtype)

    return kernel


def _mk_gather2_kernel_packed(WR: int, nwin: int, tm: int):
    """Two-field packed gather sharing Ht per sub-tile group (the pair
    form's shared one-hot, transposed; SUBW widening as in the
    single-field kernel)."""
    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(woff_ref, code_ref, x1_hbm, x2_hbm, o1_ref, o2_ref,
               s1, s2, sem1, sem2):
        b = pl.program_id(0)
        f32 = o1_ref.dtype
        bf = jnp.bfloat16
        cps = []
        for k in range(nwin):
            s = pl.multiple_of(woff_ref[k, b], 8)
            cps.append(pltpu.make_async_copy(
                x1_hbm.at[pl.ds(s, WR)], s1.at[k * WR:(k + 1) * WR],
                sem1))
            cps.append(pltpu.make_async_copy(
                x2_hbm.at[pl.ds(s, WR)], s2.at[k * WR:(k + 1) * WR],
                sem2))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        _gather_subtiles(code_ref, (s1[...], s2[...]), (o1_ref, o2_ref),
                         nwin * WR, rows, sw, f32)

    return kernel


def _mk_gather2_kernel_packed_staged(WR: int, nwin: int, tm: int):
    """Staged two-field gather: BOTH fields VMEM-resident (see
    _mk_gather_kernel_packed_staged), windows are slices, one shared Ht
    per sub-tile group."""
    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(woff_ref, code_ref, x1_ref, x2_ref, o1_ref, o2_ref):
        b = pl.program_id(0)
        W1 = _win_slices(x1_ref, woff_ref, b, WR, nwin)
        W2 = _win_slices(x2_ref, woff_ref, b, WR, nwin)
        _gather_subtiles(code_ref, (W1, W2), (o1_ref, o2_ref),
                         nwin * WR, rows, sw, o1_ref.dtype)

    return kernel


def _scatter_contrib(code_ref, v_ref, WRn: int, rows: int, sw: int, f32,
                     off: int = 0):
    """Shared packed-scatter contribution: C (WRn, 128) = sum over
    sub-tile groups of Ht @ Vs^T with Vs[l, t] = v[t] * (lo[t] == l) —
    a sublane spread built from (1, 128) rows (bf16x3-exact for f32).
    SUBW widens the contraction's t axis over that many sub-tiles (one
    dispatch, and the inter-group C adds fold into the MXU accumulate).
    `off`: row offset into code_ref/v_ref (see _gather_subtiles)."""
    bf = jnp.bfloat16
    exact = f32 == jnp.float64
    C = None
    for j0 in range(off, off + rows, sw):
        kk = min(sw, off + rows - j0)
        L = 128 * kk
        cw = _row_concat(code_ref, j0, kk)
        vw = _row_concat(v_ref, j0, kk)
        isub = jax.lax.broadcasted_iota(jnp.int32, (WRn, L), 0)
        msub = jax.lax.broadcasted_iota(jnp.int32, (128, L), 0)
        hi = jnp.broadcast_to(cw // 128, (WRn, L))
        lo = jnp.broadcast_to(cw % 128, (128, L))
        Vs = (msub == lo).astype(f32) * vw             # (128 l, L t)
        dn = (((1,), (1,)), ((), ()))
        if exact:
            Ht = (hi == isub).astype(f32)
            Cj = jax.lax.dot_general(Ht, Vs, dn,
                                     preferred_element_type=f32)
        else:
            Ht = (hi == isub).astype(bf)
            Vh, Vl, Vl2 = _split3(Vs, f32)
            d = lambda a: jax.lax.dot_general(
                Ht, a, dn, preferred_element_type=f32)
            Cj = d(Vh) + d(Vl) + d(Vl2)
        C = Cj if C is None else C + Cj
    return C


def _mk_scatter_kernel_packed(WR: int, nwin: int, tm: int):
    """Transposed one-hot scatter: per 128-element sub-tile the window
    contribution is Ht @ Vs^T (see _scatter_contrib); same RMW window
    protocol as the column kernel."""
    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(*refs):
        (woff_ref, code_ref, v_ref, y_in, y_hbm,
         scratch) = refs[:6]
        sem = refs[6]
        b = pl.program_id(0)
        f32 = scratch.dtype
        s0 = pl.multiple_of(woff_ref[0, b], 8)
        cin = pltpu.make_async_copy(
            y_hbm.at[pl.ds(s0, WR)], scratch.at[:WR], sem)
        cin.start()
        if nwin == 2:
            sem2 = refs[7]
            s1 = pl.multiple_of(woff_ref[1, b], 8)
            disjoint = jnp.abs(s1 - s0) >= WR
            cin2 = pltpu.make_async_copy(
                y_hbm.at[pl.ds(s1, WR)], scratch.at[WR:], sem2)

            @pl.when(disjoint)
            def _early_read2():
                cin2.start()

        C = _scatter_contrib(code_ref, v_ref, nwin * WR, rows, sw, f32)
        cin.wait()
        scratch[:WR] = scratch[:WR] + C[:WR]
        co = pltpu.make_async_copy(
            scratch.at[:WR], y_hbm.at[pl.ds(s0, WR)], sem)
        co.start()
        if nwin == 2:
            @pl.when(jnp.logical_not(disjoint))
            def _serial_read2():
                co.wait()
                cin2.start()

            cin2.wait()
            scratch[WR:] = scratch[WR:] + C[WR:]
            co2 = pltpu.make_async_copy(
                scratch.at[WR:], y_hbm.at[pl.ds(s1, WR)], sem2)
            co2.start()

            @pl.when(disjoint)
            def _drain_write1():
                co.wait()

            co2.wait()
        else:
            co.wait()

    return kernel


def _mk_scatter_kernel_packed_staged(WR: int, nwin: int, tm: int):
    """Staged scatter: the WHOLE output vector is a VMEM-RESIDENT
    revisited block — zero-initialised at grid step 0, accumulated into
    by plain slice adds per tile, written back to HBM once at grid end
    by Mosaic's pipeline.  Removes both the per-tile read-modify-write
    HBM round trips AND the overlapping-window DMA-ordering protocol of
    the unstaged kernel (within one kernel body the slice adds are
    ordinary VMEM loads/stores, sequenced by the compiler).  See
    _mk_gather_kernel_packed_staged for why: in-scan the unstaged RMW
    windows hit HBM whenever XLA memory-space assignment declines to
    promote the vector (the r5 scan-tax root cause)."""
    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(woff_ref, code_ref, v_ref, o_ref):
        b = pl.program_id(0)
        f32 = o_ref.dtype

        @pl.when(b == 0)
        def _zero_init():
            o_ref[...] = jnp.zeros(o_ref.shape, f32)

        C = _scatter_contrib(code_ref, v_ref, nwin * WR, rows, sw, f32)
        s0 = pl.multiple_of(woff_ref[0, b], 8)
        o_ref[pl.ds(s0, WR)] = o_ref[pl.ds(s0, WR)] + C[:WR]
        if nwin == 2:
            s1 = pl.multiple_of(woff_ref[1, b], 8)
            o_ref[pl.ds(s1, WR)] = o_ref[pl.ds(s1, WR)] + C[WR:]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather(x_flat: jax.Array, plan: GatherPlan,
           interpret: bool = False) -> jax.Array:
    """out[p] = x[g[p]] — exact (3-term bf16 split reconstructs f32)."""
    WR, ntiles, nrows, N, nwin, tm = plan.statics
    x2 = jnp.zeros((nrows * 128,), x_flat.dtype)
    x2 = jax.lax.dynamic_update_slice(x2, x_flat.reshape(-1),
                                      (0,)).reshape(nrows, 128)
    staged = _staged(plan, x_flat.dtype)
    if _plan_packed(plan):
        rows = tm // 128
        kernel = (_mk_gather_kernel_packed_staged(WR, nwin, tm) if staged
                  else _mk_gather_kernel_packed(WR, nwin, tm))
        code_spec = pl.BlockSpec((rows, 128), lambda b, woff: (b, 0))
        out_spec = pl.BlockSpec((rows, 128), lambda b, woff: (b, 0))
        out_shape = jax.ShapeDtypeStruct((ntiles * rows, 128),
                                         x_flat.dtype)
    else:
        kernel = _mk_gather_kernel(WR, nwin, tm)
        code_spec = pl.BlockSpec((tm, 1), lambda b, woff: (b, 0))
        out_spec = pl.BlockSpec((tm, 1), lambda b, woff: (b, 0))
        out_shape = jax.ShapeDtypeStruct((ntiles * tm, 1), x_flat.dtype)
    if staged:
        # grid-constant block: Mosaic fetches the field once
        x_spec = pl.BlockSpec((nrows, 128), lambda b, woff: (0, 0))
        scratch = []
        cparams = pltpu.CompilerParams(vmem_limit_bytes=_stage_limit(
            nrows * 128 * x2.dtype.itemsize))
    else:
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((nwin * WR, 128), x_flat.dtype),
                   pltpu.SemaphoreType.DMA]
        cparams = None
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[code_spec, x_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=cparams,
        interpret=interpret,
    )(plan.woff, plan.code, x2).reshape(-1)
    if plan.spos.shape[0]:
        # on the PADDED vectors: pad spill entries (dead position N..,
        # dead source nsrc) are no-ops before the [:N] truncation
        out = _spill_set(out, plan.spos, x2.reshape(-1), plan.sidx)
    return out[:N]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather2(x1_flat: jax.Array, x2_flat: jax.Array, plan: GatherPlan,
            interpret: bool = False):
    """(x1[g], x2[g]) in one kernel pass sharing the one-hot H."""
    WR, ntiles, nrows, N, nwin, tm = plan.statics

    def pad(x):
        z = jnp.zeros((nrows * 128,), x.dtype)
        return jax.lax.dynamic_update_slice(
            z, x.reshape(-1), (0,)).reshape(nrows, 128)

    p1, p2 = pad(x1_flat), pad(x2_flat)
    staged = _staged(plan, x1_flat.dtype, nfields=2)
    if _plan_packed(plan):
        rows = tm // 128
        kernel = (_mk_gather2_kernel_packed_staged(WR, nwin, tm)
                  if staged else _mk_gather2_kernel_packed(WR, nwin, tm))
        io = lambda: pl.BlockSpec((rows, 128), lambda b, woff: (b, 0))
        shp = jax.ShapeDtypeStruct((ntiles * rows, 128), x1_flat.dtype)
    else:
        kernel = _mk_gather2_kernel(WR, nwin, tm)
        io = lambda: pl.BlockSpec((tm, 1), lambda b, woff: (b, 0))
        shp = jax.ShapeDtypeStruct((ntiles * tm, 1), x1_flat.dtype)
    if staged:
        x_spec = lambda: pl.BlockSpec((nrows, 128), lambda b, woff: (0, 0))
        scratch = []
        cparams = pltpu.CompilerParams(vmem_limit_bytes=_stage_limit(
            2 * nrows * 128 * p1.dtype.itemsize))
    else:
        x_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)
        scratch = [pltpu.VMEM((nwin * WR, 128), x1_flat.dtype),
                   pltpu.VMEM((nwin * WR, 128), x1_flat.dtype),
                   pltpu.SemaphoreType.DMA,
                   pltpu.SemaphoreType.DMA]
        cparams = None
    o1, o2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[io(), x_spec(), x_spec()],
            out_specs=[io(), io()],
            scratch_shapes=scratch,
        ),
        out_shape=[shp, shp],
        compiler_params=cparams,
        interpret=interpret,
    )(plan.woff, plan.code, p1, p2)
    o1, o2 = o1.reshape(-1), o2.reshape(-1)
    if plan.spos.shape[0]:
        o1 = _spill_set(o1, plan.spos, p1.reshape(-1), plan.sidx)
        o2 = _spill_set(o2, plan.spos, p2.reshape(-1), plan.sidx)
    return o1[:N], o2[:N]


# ---------------------------------------------------------------------------
# Fused per-cell contraction for the engine path: the XLA dense-operator
# form materialises every intermediate (w/f planes, bf16 casts) in HBM —
# cost-audited ~416 MB per apply at the 627k bench shape against a
# ~40 MB minimum (u + G + y once).  One Pallas pass gets the minimum:
# per tile of CT cells, the three (n^3, n^3) dense operators (VMEM-
# resident, bf16x3-split in-kernel) run as clean MXU matmuls with the
# metric transform fused pointwise between them.
# ---------------------------------------------------------------------------

def _mk_contract_kernel(nq: int, precision, with_coeff: bool):
    from fustpu.ops.pallas_stiffness import _mk_matmul

    def kernel(*refs):
        if with_coeff:
            u_ref, g_ref, d3_ref, c_ref, o_ref = refs
        else:
            u_ref, g_ref, d3_ref, o_ref = refs
        f32 = o_ref.dtype
        matmul = _mk_matmul(precision, f32)
        u = u_ref[...]
        w = [matmul(u, d3_ref[q], ((1,), (1,))) for q in range(3)]
        G = lambda m: g_ref[m]
        c = c_ref[...] if with_coeff else 1.0
        f0 = c * (G(0) * w[0] + G(1) * w[1] + G(2) * w[2])
        f1 = c * (G(1) * w[0] + G(3) * w[1] + G(4) * w[2])
        f2 = c * (G(2) * w[0] + G(4) * w[1] + G(5) * w[2])
        y = matmul(f0, d3_ref[0], ((1,), (0,)))
        y = y + matmul(f1, d3_ref[1], ((1,), (0,)))
        y = y + matmul(f2, d3_ref[2], ((1,), (0,)))
        o_ref[...] = y

    return kernel


def contract_tile_cells(n3: int) -> int:
    """Cells per tile: scale down as n^3 grows so the VMEM working set
    (u/w/f planes + the three (n3p, n3p) operators, double-buffered io)
    stays comfortably inside the budget."""
    n3p = -(-n3 // 128) * 128
    for ct in (1024, 512, 256, 128, 64, 32, 16, 8):
        planes = 12 * ct * n3p               # u, 3 w, 3 f, y + io buffers
        mats = 3 * n3p * n3p * 2
        if (planes + mats) * 4 < 13 * 2**20:
            return ct
    return 8


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def dense_contract(u2: jax.Array, G6: jax.Array, D: jax.Array,
                   coeff: jax.Array | None = None,
                   interpret: bool = False,
                   precision="auto") -> jax.Array:
    """y2[c] = sum_q D3q^T (coeff_c * G_c . (D3q u2[c])) — the per-cell
    stiffness contraction between the engine's gather and scatter, one
    fused HBM pass.  u2: (cells, n^3); G6: (6, cells, n^3) component-
    major; D: (n, n); coeff: optional (cells,)."""
    cells, n3 = u2.shape
    n = D.shape[0]
    assert n ** 3 == n3
    if precision == "auto":
        precision = (jax.lax.Precision.HIGHEST
                     if u2.dtype == jnp.float64 else "bf16x3")
    eye = jnp.eye(n, dtype=u2.dtype)
    D3 = jnp.stack([jnp.kron(jnp.kron(D, eye), eye),
                    jnp.kron(jnp.kron(eye, D), eye),
                    jnp.kron(jnp.kron(eye, eye), D)])
    ct = contract_tile_cells(n3)
    # ragged last tile: pallas masks out-of-range rows itself (garbage
    # reads feed rows whose writes are masked) — padding the operands
    # with jnp.pad instead was cost-audited at +70 MB of pure copies
    args = [u2, G6, D3]
    in_specs = [
        pl.BlockSpec((ct, n3), lambda b: (b, 0)),
        pl.BlockSpec((6, ct, n3), lambda b: (0, b, 0)),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if coeff is not None:
        args.append(coeff.reshape(cells, 1))
        in_specs.append(pl.BlockSpec((ct, 1), lambda b: (b, 0)))
    out = pl.pallas_call(
        _mk_contract_kernel(n3, precision, coeff is not None),
        grid=(-(-cells // ct),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((ct, n3), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((cells, n3), u2.dtype),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(jax.jit, static_argnames=("ndofs", "interpret"))
def scatter_add(vals: jax.Array, plan: GatherPlan, ndofs: int,
                interpret: bool = False) -> jax.Array:
    """y[g[p]] += v[p] over zeros(ndofs) — deterministic f32 accumulate."""
    WR, ntiles, nrows, N, nwin, tm = plan.statics
    vp = jnp.zeros((ntiles * tm,), vals.dtype)
    vp = jax.lax.dynamic_update_slice(vp, vals.reshape(-1), (0,))
    if _plan_packed(plan):
        rows = tm // 128
        vp = vp.reshape(ntiles * rows, 128)
        kernel = _mk_scatter_kernel_packed(WR, nwin, tm)
        stream = lambda: pl.BlockSpec((rows, 128),
                                      lambda b, woff: (b, 0))
    else:
        vp = vp.reshape(ntiles * tm, 1)
        kernel = _mk_scatter_kernel(WR, nwin, tm)
        stream = lambda: pl.BlockSpec((tm, 1), lambda b, woff: (b, 0))
    if _staged(plan, vals.dtype):
        # VMEM-resident output (revisited block): zero-initialised at
        # grid step 0, accumulated by slice adds, written back once —
        # no y0 input, no RMW round trips, no window-ordering protocol
        y2 = pl.pallas_call(
            _mk_scatter_kernel_packed_staged(WR, nwin, tm),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntiles,),
                in_specs=[stream(), stream()],
                out_specs=pl.BlockSpec((nrows, 128),
                                       lambda b, woff: (0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((nrows, 128), vals.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_stage_limit(
                    nrows * 128 * vp.dtype.itemsize)),
            interpret=interpret,
        )(plan.woff, plan.code, vp)
    else:
        y0 = jnp.zeros((nrows, 128), vals.dtype)
        y2 = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ntiles,),
                in_specs=[
                    stream(),
                    stream(),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec(memory_space=pl.ANY),
                scratch_shapes=(
                    [pltpu.VMEM((nwin * WR, 128), vals.dtype),
                     pltpu.SemaphoreType.DMA]
                    + [pltpu.SemaphoreType.DMA] * (nwin - 1)),
            ),
            out_shape=jax.ShapeDtypeStruct((nrows, 128), vals.dtype),
            input_output_aliases={3: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(plan.woff, plan.code, vp, y0)
    yf = y2.reshape(-1)
    if plan.spos.shape[0]:
        # padded side (spill target nsrc.. lands in dead rows, spill
        # position N.. reads the zero padding of vp)
        yf = _spill_add(yf, plan.sidx, vp.reshape(-1), plan.spos)
    return yf[:ndofs]


# ---------------------------------------------------------------------------
# Fully-fused engine apply: gather + per-cell contraction + scatter in ONE
# Pallas kernel.  The 3-kernel path pays two HBM round trips of the
# expanded element stream (gather out -> contract in, contract out ->
# scatter in), reads the code stream twice, and pays three kernels'
# pipeline fill per apply.  Fusion needs plan tiles that hold WHOLE
# cells: the plan is built on a lane-padded per-cell-row dofmap
# ((cells, 128), n^3 real codes + dead pad — P<=4 only, n^3<=128), so a
# tm=2048 tile is exactly 16 cells and windows stay as small as the
# element-flat plan's (same cell count per tile).  ST plan tiles are
# processed per grid step so the contraction runs at M=ST*16=128 on the
# MXU; the staged residency machinery (above) provides the field and
# output as VMEM-resident blocks with no DMA protocol.
# Reference analogue: one CUDA block does load+contract+atomics in one
# kernel (/root/reference/cuda/operators.py:73-192).
# ---------------------------------------------------------------------------

def _fused_from_env() -> str:
    v = os.environ.get("FUSTPU_ENGINE_FUSED", "auto")
    if v not in ("auto", "0"):
        raise ValueError(
            f"FUSTPU_ENGINE_FUSED={v!r}: must be auto|0")
    return v


# "auto": models use the fused kernel whenever build_fused_engine
# accepts the mesh; "0" disables (A/B, and the fallback story).
FUSED = _fused_from_env()


def _fst_from_env() -> int:
    """FUSTPU_ENGINE_FST: plan tiles per fused-kernel grid step
    (supertile size).  Default 8 -> M = 8*16 = 128 cells per
    contraction dispatch; chip-laddered (BENCH_NOTES r5)."""
    v = int(os.environ.get("FUSTPU_ENGINE_FST", "8"))
    if v < 1:
        raise ValueError(f"FUSTPU_ENGINE_FST={v}: must be >= 1")
    return v


FST = _fst_from_env()


@jax.tree_util.register_pytree_node_class
class FusedEngine:
    """Cell-row plan + lane-padded operator tensors for fused_apply:
    plan built on the (cells, 128) padded dofmap (zero spill enforced),
    G6p (6, cellsp, 128) component-major zero-padded geometry, D3p
    (3, 128, 128) zero-padded dense derivative operators.  statics:
    (n3, cells, cellsp, ST)."""

    def __init__(self, plan, G6p, D3p, statics):
        self.plan = plan
        self.G6p = G6p
        self.D3p = D3p
        self.statics = statics

    def tree_flatten(self):
        return ((self.plan, self.G6p, self.D3p), self.statics)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, statics=aux)


def build_fused_engine(dofmap: np.ndarray, nsrc: int,
                       G_host: np.ndarray, D_host: np.ndarray,
                       dtype, tm: int | None = None,
                       ST: int | None = None) -> "FusedEngine | None":
    """FusedEngine for a (cells, n^3) dofmap, or None when the mesh is
    ineligible: n^3 > 128 (P > 4), col layout, FUSTPU_ENGINE_FUSED=0,
    any spill on the cell-row plan (the fused kernel never materialises
    the gathered stream, so the XLA spill fix-up has nothing to patch),
    or the pair form's 3 field-sized VMEM buffers exceed the staged
    cap.  Callers fall back to the staged 3-kernel path."""
    tm = tm or TM
    ST = ST or FST
    if FUSED == "0" or LAYOUT != "packed" or tm % 1024:
        return None
    cells, n3 = dofmap.shape
    if n3 > 128:
        return None
    rows = tm // 128
    gp = np.full((cells, 128), nsrc, np.int64)
    gp[:, :n3] = dofmap
    plan = build_plan(gp.ravel(), nsrc, tm=tm)
    if int(plan.spos.shape[0]):
        return None
    WR, ntiles, nrows, N, nwin, tm_ = plan.statics
    itemsize = jnp.dtype(dtype).itemsize
    if 3 * nrows * 128 * itemsize + _STAGE_MARGIN > STAGE_CAP:
        return None
    woff, code, G6p, stat = _fused_finish(
        plan, cells, n3, np.moveaxis(np.asarray(G_host), 2, 0),
        ST, rows)
    plan = GatherPlan(jnp.asarray(woff), jnp.asarray(code),
                      plan.spos, plan.sidx, stat)
    return FusedEngine(plan, jnp.asarray(G6p, dtype),
                       jnp.asarray(_d3_padded(D_host, n3), dtype),
                       (n3, cells, stat[1] * rows, ST))


def _fused_finish(plan, cells: int, n3: int, G6_host, ST: int,
                  rows: int):
    """Supertile-pad a zero-spill cell-row plan and build the padded
    component-major geometry block (host f64).  Dead rows carry the
    dead code (kills them in both directions) and woff 0; build_plan's
    +1 dead position always adds a partial tile."""
    WR, ntiles, nrows, N, nwin, tm_ = plan.statics
    ntp = -(-ntiles // ST) * ST
    woff = np.zeros((2, ntp), np.int32)
    woff[:, :ntiles] = np.asarray(plan.woff)
    code = np.full((ntp * rows, 128), nwin * WR * 128, np.int32)
    code[:np.asarray(plan.code).shape[0]] = np.asarray(plan.code)
    cellsp = ntp * rows
    G6p = np.zeros((6, cellsp, 128), np.float64)
    G6p[:, :cells, :n3] = G6_host
    return woff, code, G6p, (WR, ntp, nrows, N, nwin, tm_)


def _d3_padded(D_host, n3: int) -> np.ndarray:
    """(3, 128, 128) zero-padded dense derivative operators."""
    n = D_host.shape[0]
    assert n ** 3 == n3
    eye = np.eye(n)
    D3p = np.zeros((3, 128, 128), np.float64)
    D3p[0, :n3, :n3] = np.kron(np.kron(D_host, eye), eye)
    D3p[1, :n3, :n3] = np.kron(np.kron(eye, D_host), eye)
    D3p[2, :n3, :n3] = np.kron(np.kron(eye, eye), D_host)
    return D3p


def build_fused_engines_stacked(dofmaps, nsrc: int, G6_hosts,
                                D_host: np.ndarray, dtype,
                                tm: int | None = None,
                                ST: int | None = None):
    """Per-device FusedEngine arrays with COMMON statics for use under
    shard_map (the fused analogue of build_stacked_plans): `dofmaps` is
    a sequence of equal-shape (cells, n^3) local dofmaps (dead id
    `nsrc` pads ragged cell counts), `G6_hosts` the matching
    component-major (6, cells, n^3) geometry blocks.  Returns
    (woff (k,2,ntp), code (k,cellsp,128), G6p (k,6,cellsp,128),
    D3p (3,128,128), plan_statics, fe_statics) as host arrays, or None
    when any device is ineligible — the window geometry is maxed over
    devices and ZERO spill is required on every device (the fused
    kernel has no spill fix-up)."""
    tm = tm or TM
    ST = ST or FST
    if FUSED == "0" or LAYOUT != "packed" or tm % 1024:
        return None
    k = len(dofmaps)
    cells, n3 = dofmaps[0].shape
    if n3 > 128:
        return None
    rows = tm // 128
    gps = []
    for dm in dofmaps:
        if dm.shape != (cells, n3):
            raise ValueError("per-device dofmaps must be equal shape")
        gp = np.full((cells, 128), nsrc, np.int64)
        gp[:, :n3] = dm
        gps.append(gp.ravel())
    wr1 = max(pick_wr(g, dead=nsrc, tm=tm) for g in gps)
    wr2 = max(pick_wr2(g, dead=nsrc, tm=tm) for g in gps)
    plans = None
    for nw, wr in _attempt_ladder(wr1, wr2):
        ps = [build_plan(g, nsrc, WR=wr, nwin=nw, tm=tm) for g in gps]
        if all(int(p.spos.shape[0]) == 0 for p in ps):
            plans = ps
            break
    if plans is None:
        return None
    nrows = plans[0].statics[2]
    if 3 * nrows * 128 * jnp.dtype(dtype).itemsize + _STAGE_MARGIN \
            > STAGE_CAP:
        return None
    woff, code, G6p = [], [], []
    for p, G6 in zip(plans, G6_hosts):
        assert p.statics == plans[0].statics
        w, c, g, stat = _fused_finish(p, cells, n3, np.asarray(G6),
                                      ST, rows)
        woff.append(w)
        code.append(c)
        G6p.append(g)
    cellsp = stat[1] * rows
    return (np.stack(woff), np.stack(code), np.stack(G6p),
            _d3_padded(D_host, n3), stat, (n3, cells, cellsp, ST))


def _mk_fused_kernel(WR: int, nwin: int, tm: int, ST: int,
                     mode: str, precision):
    """mode: 'coeff' (per-cell coefficient on the metric term), 'plain'
    (unit coefficient — the uniform-media fold), 'pair' (two fields
    folded c1*u1 + c2*u2 before one contraction chain)."""
    from fustpu.ops.pallas_stiffness import _mk_matmul

    rows = tm // 128
    sw = _subw_eff(WR, nwin, rows)

    def kernel(*refs):
        if mode == "pair":
            (woff_ref, code_ref, g_ref, d3_ref, c1_ref, c2_ref,
             x1_ref, x2_ref, o_ref, u1s, u2s) = refs
        elif mode == "coeff":
            (woff_ref, code_ref, g_ref, d3_ref, c_ref,
             x_ref, o_ref, u1s) = refs
        else:
            (woff_ref, code_ref, g_ref, d3_ref,
             x_ref, o_ref, u1s) = refs
        b = pl.program_id(0)
        f32 = o_ref.dtype

        @pl.when(b == 0)
        def _zero_init():
            o_ref[...] = jnp.zeros(o_ref.shape, f32)

        for t in range(ST):
            tt = ST * b + t
            if mode == "pair":
                W1 = _win_slices(x1_ref, woff_ref, tt, WR, nwin)
                W2 = _win_slices(x2_ref, woff_ref, tt, WR, nwin)
                _gather_subtiles(code_ref, (W1, W2), (u1s, u2s),
                                 nwin * WR, rows, sw, f32, off=t * rows)
            else:
                W = _win_slices(x_ref, woff_ref, tt, WR, nwin)
                _gather_subtiles(code_ref, (W,), (u1s,),
                                 nwin * WR, rows, sw, f32, off=t * rows)
        # per-cell contraction at M = ST*rows (dense-operator form; pad
        # lanes stay zero end-to-end: dead codes gather 0, D3p/G6p are
        # zero-padded, and dead codes drop the scatter contributions)
        if mode == "pair":
            u = c1_ref[...] * u1s[...] + c2_ref[...] * u2s[...]
        else:
            u = u1s[...]
        matmul = _mk_matmul(precision, f32)
        w = [matmul(u, d3_ref[q], ((1,), (1,))) for q in range(3)]
        G = lambda m: g_ref[m]
        c = c_ref[...] if mode == "coeff" else 1.0
        f0 = c * (G(0) * w[0] + G(1) * w[1] + G(2) * w[2])
        f1 = c * (G(1) * w[0] + G(3) * w[1] + G(4) * w[2])
        f2 = c * (G(2) * w[0] + G(4) * w[1] + G(5) * w[2])
        y = matmul(f0, d3_ref[0], ((1,), (0,)))
        y = y + matmul(f1, d3_ref[1], ((1,), (0,)))
        y = y + matmul(f2, d3_ref[2], ((1,), (0,)))
        for t in range(ST):
            tt = ST * b + t
            C = _scatter_contrib(code_ref, y, nwin * WR, rows, sw, f32,
                                 off=t * rows)
            s0 = pl.multiple_of(woff_ref[0, tt], 8)
            o_ref[pl.ds(s0, WR)] = o_ref[pl.ds(s0, WR)] + C[:WR]
            if nwin == 2:
                s1 = pl.multiple_of(woff_ref[1, tt], 8)
                o_ref[pl.ds(s1, WR)] = o_ref[pl.ds(s1, WR)] + C[WR:]

    return kernel


def _fused_call(fe: "FusedEngine", mode: str, precision, xs, coeffs,
                interpret: bool):
    """Shared pallas_call assembly for fused_apply / fused_apply_pair."""
    WR, ntiles, nrows, N, nwin, tm = fe.plan.statics
    n3, cells, cellsp, ST = fe.statics
    rows = tm // 128
    dtype = xs[0].dtype
    if precision == "auto":
        precision = (jax.lax.Precision.HIGHEST
                     if dtype == jnp.float64 else "bf16x3")

    def pad_field(x):
        z = jnp.zeros((nrows * 128,), x.dtype)
        return jax.lax.dynamic_update_slice(
            z, x.reshape(-1), (0,)).reshape(nrows, 128)

    def pad_coeff(cc):
        z = jnp.zeros((cellsp,), dtype)
        return jax.lax.dynamic_update_slice(
            z, cc.reshape(-1).astype(dtype), (0,)).reshape(cellsp, 1)

    CT = ST * rows
    cell_spec = lambda nminor: pl.BlockSpec(
        (CT, nminor), lambda b, woff: (b, 0))
    field_spec = lambda: pl.BlockSpec((nrows, 128),
                                      lambda b, woff: (0, 0))
    in_specs = [
        cell_spec(128),                                     # code
        pl.BlockSpec((6, CT, 128), lambda b, woff: (0, b, 0)),  # G6p
        pl.BlockSpec(memory_space=pltpu.VMEM),              # D3p
    ]
    args = [fe.plan.woff, fe.plan.code, fe.G6p, fe.D3p]
    for cc in coeffs:
        in_specs.append(cell_spec(1))
        args.append(pad_coeff(cc))
    for x in xs:
        in_specs.append(field_spec())
        args.append(pad_field(x))
    nf = len(xs)
    scratch = [pltpu.VMEM((CT, 128), dtype)] * nf
    y2 = pl.pallas_call(
        _mk_fused_kernel(WR, nwin, tm, ST, mode, precision),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles // ST,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((nrows, 128), lambda b, woff: (0, 0)),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((nrows, 128), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_stage_limit(
                (nf + 1) * nrows * 128 * jnp.dtype(dtype).itemsize)),
        interpret=interpret,
    )(*args)
    return y2.reshape(-1)


@functools.partial(jax.jit, static_argnames=("ndofs", "interpret",
                                             "precision"))
def fused_apply(x_flat: jax.Array, coeff, fe: "FusedEngine",
                ndofs: int, interpret: bool = False,
                precision="auto") -> jax.Array:
    """One-kernel engine stiffness apply:
    y = scatter(sum_q D3q^T (coeff . G . (D3q gather(x)))).
    coeff: (cells,) per-cell coefficients or None (unit)."""
    mode = "plain" if coeff is None else "coeff"
    coeffs = [] if coeff is None else [coeff]
    return _fused_call(fe, mode, precision, [x_flat], coeffs,
                       interpret)[:ndofs]


@functools.partial(jax.jit, static_argnames=("ndofs", "interpret",
                                             "precision"))
def fused_apply_pair(x1: jax.Array, c1: jax.Array, x2: jax.Array,
                     c2: jax.Array, fe: "FusedEngine", ndofs: int,
                     interpret: bool = False,
                     precision="auto") -> jax.Array:
    """stiffness(x1; c1) + stiffness(x2; c2) in ONE kernel: both fields
    gathered sharing the one-hot, folded c1*u1 + c2*u2 per cell before
    a single contraction chain and a single scatter (the heterogeneous
    Westervelt stage)."""
    return _fused_call(fe, "pair", precision, [x1, x2], [c1, c2],
                       interpret)[:ndofs]
