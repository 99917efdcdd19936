"""Pallas TPU kernels: per-row stream compaction for sparse gathers.

TPU gathers are count-bound (~140 M idx/s, benchmarks/micro_gather.py),
and in the cornell frame only 3-8% of lanes per bounce hit a textured
material — yet the XLA albedo fetch pays for all 640K lanes. These
kernels compact the valid indices of each 128-lane row into its first
`cap` slots so the XLA gather touches nb*cap indices instead of nb*128
(4x fewer at cap=32), then route the gathered values back per lane.

Mechanics (all vreg-local VPU ops; no scalar loops):
  * in-row inclusive prefix sum of the valid mask: 7 Hillis-Steele
    roll+add passes over the 128 lanes;
  * routing: slot p's source lane is found by branchless binary search
    (7 take_along_axis probes) over the monotone per-lane key
    2*prefix - valid, which is odd exactly at valid lanes (the p-th
    valid lane is the first with key >= 2p+1);
  * rows whose valid count exceeds `cap` raise a per-row overflow flag;
    the caller must lax.cond to an uncompacted gather when any row
    overflows (correctness for texture-dense scenes/views).

Used by the per-bounce texture-albedo fetch (reference semantics:
Texture::getColor at every scatter, reference src/pathtrace.cu:343-354);
generic over any sparse index plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RROWS = 8
# gather-width tiers: runtime picks the smallest cap*tier no row exceeds;
# producers must retain cap*TIERS[-1] compacted slots
TIERS = (1, 2)


def _row_prefix_and_count(valid_i, shape):
    """Inclusive per-row prefix sum and per-row total of an i32 0/1
    plane (128 lanes)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    inc = valid_i
    for k in (1, 2, 4, 8, 16, 32, 64):
        shifted = jnp.roll(inc, k, axis=1)
        inc = inc + jnp.where(lane >= k, shifted, 0)
    # inclusive prefix at lane 127 = row total; broadcast it
    total = jnp.broadcast_to(
        jax.lax.slice(inc, (0, 127), shape), shape)
    return inc, total


def compact_tile(idx, cap, shape):
    """In-kernel per-row compaction of one (S, 128) tile. idx: i32,
    -1 = invalid. Returns (cidx, slot, count) tiles (see module doc).
    Usable from any Pallas kernel body (pure vreg ops)."""
    valid_i = jnp.where(idx >= 0, 1, 0)
    inc, total = _row_prefix_and_count(valid_i, shape)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

    # key is non-decreasing along the row and odd (= 2p+1) exactly at
    # the p-th valid lane; lower_bound(2p+1) finds slot p's source lane
    key = 2 * inc - valid_i
    target = 2 * lane + 1
    pos = jnp.zeros(shape, jnp.int32)
    for k in (64, 32, 16, 8, 4, 2, 1):
        probe = jnp.minimum(pos + (k - 1), 127)
        kv = jnp.take_along_axis(key, probe, axis=1)
        pos = jnp.where(kv < target, pos + k, pos)
    src = jnp.minimum(pos, 127)
    cidx = jnp.take_along_axis(jnp.maximum(idx, 0), src, axis=1)

    cidx = jnp.where(lane < jnp.minimum(total, cap), cidx, 0)
    slot = jnp.where(valid_i > 0, inc - 1, -1)
    return cidx, slot, total


def tile_route(valid_i, shape, out_rows=None):
    """Tile-WIDE compaction routing over an (S, 128) tile: valid lanes
    get consecutive global slots in row-major order. Returns
    (slot [S,128] i32 global slot or -1, K [scalar] total count,
     route) where `route` feeds tile_gather_compact/tile_uncompact.

    `out_rows` (default S) caps the packed output to its first
    out_rows*128 slots — phase 2 then runs on (out_rows, 128) vregs,
    4x cheaper at 32-row tiles when the expected count is small. The
    caller must handle K > out_rows*128 itself (e.g. identity packing).

    Two phases (vreg gathers compose only when the inner index is
    row-invariant, so the cross-row move uses a collision-free 8-way
    select — see gather_table_groups's rationale in benchmarks/pallas_texgather.py):
      phase 1: per-row compaction (binary-search routing, compact_tile);
      phase 2: output position p reads phase-1 row r(p) (the row whose
      cumulative range contains p) at in-row position p - C_r."""
    srows = shape[0]
    if out_rows is None:
        out_rows = srows
    oshape = (out_rows, 128)
    inc, _ = _row_prefix_and_count(valid_i, shape)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    # per-row totals, broadcast [S,128]; exclusive cross-row offsets C_s
    rowtot = jnp.broadcast_to(jax.lax.slice(inc, (0, 127), shape), shape)
    csum = rowtot
    k = 1
    while k < srows:
        csum = csum + jnp.where(row >= k, jnp.roll(csum, k, axis=0), 0)
        k *= 2
    cs = csum - rowtot                       # exclusive cumsum down rows
    k_total = jnp.max(csum)

    slot = jnp.where(valid_i > 0, (inc - 1) + cs, -1)

    # phase-1 source lanes (per-row binary search, as compact_tile)
    key = 2 * inc - valid_i
    target = 2 * lane + 1
    pos = jnp.zeros(shape, jnp.int32)
    for k in (64, 32, 16, 8, 4, 2, 1):
        probe = jnp.minimum(pos + (k - 1), 127)
        kv = jnp.take_along_axis(key, probe, axis=1)
        pos = jnp.where(kv < target, pos + k, pos)
    src1 = jnp.minimum(pos, 127)

    # phase-2: output position p = 128*s + j -> source row r(p), in-row
    # position p - C_r
    orow = jax.lax.broadcasted_iota(jnp.int32, oshape, 0)
    olane = jax.lax.broadcasted_iota(jnp.int32, oshape, 1)
    p = orow * 128 + olane
    r_idx = jnp.zeros(oshape, jnp.int32)
    l_idx = jnp.zeros(oshape, jnp.int32)
    for r in range(srows):
        # [1,128] slices broadcast implicitly against (out_rows, 128) —
        # Mosaic can't express an explicit sublane+lane broadcast
        cr = jax.lax.slice(cs, (r, 0), (r + 1, 128))
        tr = jax.lax.slice(rowtot, (r, 0), (r + 1, 128))
        inr = (p >= cr) & (p < cr + tr)
        r_idx = jnp.where(inr, r, r_idx)
        l_idx = jnp.where(inr, p - cr, l_idx)
    return slot, k_total, (src1, r_idx, jnp.clip(l_idx, 0, 127))


def tile_gather_compact(plane, route, shape):
    """Gather `plane`'s valid lanes into row-major compact order using a
    route from tile_route. Output shape follows the route's out_rows
    (positions >= K hold garbage — callers mask by row count)."""
    src1, r_idx, l_idx = route
    oshape = r_idx.shape
    p1 = jnp.take_along_axis(plane, src1, axis=1)
    out = jnp.zeros(oshape, plane.dtype)
    for r in range(shape[0]):
        rowv = jnp.broadcast_to(
            jax.lax.slice(p1, (r, 0), (r + 1, 128)), oshape)
        g = jnp.take_along_axis(rowv, l_idx, axis=1)
        out = jnp.where(r_idx == r, g, out)
    return out


def tile_uncompact(cplane, slot, shape, fill):
    """Route compact-order values back to their original lanes: lane
    with slot p reads cplane[p >> 7, p & 127]; slot -1 lanes get
    `fill`."""
    sr = jax.lax.shift_right_logical(jnp.maximum(slot, 0), 7)
    sl = jnp.maximum(slot, 0) & 127
    out = jnp.full(shape, fill, cplane.dtype)
    for r in range(shape[0]):
        rowv = jnp.broadcast_to(
            jax.lax.slice(cplane, (r, 0), (r + 1, 128)), shape)
        g = jnp.take_along_axis(rowv, sl, axis=1)
        out = jnp.where((slot >= 0) & (sr == r), g, out)
    return out


def _compact_kernel(idx_ref, cidx_o, slot_o, cnt_o, *, cap):
    cidx_o[:], slot_o[:], cnt_o[:] = compact_tile(
        idx_ref[:], cap, (RROWS, 128))


def compact_rows_pallas(idx, cap, *, interpret=False):
    """idx: (R, 128) i32, -1 = invalid lane. Returns
    (cidx (R, 128) i32 [only [:, :cap] meaningful, rest 0],
     slot (R, 128) i32 [-1 for invalid lanes],
     count (R, 128) i32 [row valid-count broadcast]).
    R % 8 == 0."""
    r = idx.shape[0]
    assert r % RROWS == 0
    spec = pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_compact_kernel, cap=cap),
        grid=(r // RROWS,),
        in_specs=[spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((r, 128), jnp.int32)] * 3,
        interpret=interpret,
    )(idx)


def _uncompact_kernel(vals_ref, slot_ref, out_ref):
    slot = slot_ref[:]
    picked = jnp.take_along_axis(vals_ref[:], jnp.maximum(slot, 0), axis=1)
    out_ref[:] = jnp.where(slot >= 0, picked, 0)


def uncompact_rows_pallas(vals, slot, *, interpret=False):
    """vals: (R, 128) i32 per-row compacted values (gathered texels),
    slot: (R, 128) i32 per-lane slot (-1 = invalid). Returns (R, 128)
    i32 with each lane's value (0 where invalid)."""
    r = vals.shape[0]
    spec = pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _uncompact_kernel,
        grid=(r // RROWS,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((r, 128), jnp.int32),
        interpret=interpret,
    )(vals, slot)


def gather_compacted(table_i32, cidx, slot, count, cap, *, tiers=TIERS,
                     idx_fallback=None, interpret=False):
    """XLA side of the sparse gather given already-compacted rows (from
    compact_rows_pallas or a fused producer kernel): tiered take + slot
    routing. `idx_fallback` (R,128 i32, -1 invalid) enables the dense
    fallback tier when rows can exceed cap*tiers[-1]; pass None when
    overflow is impossible (then the last tier is used unconditionally).
    """
    cmax = jnp.max(count)

    def make_fast(c):
        def fast(_):
            sub = jax.lax.slice(cidx, (0, 0), (cidx.shape[0], c))
            g = jnp.take(table_i32, sub.reshape(-1)).reshape(sub.shape)
            g = jnp.pad(g, ((0, 0), (0, 128 - c)))
            return uncompact_rows_pallas(g, slot, interpret=interpret)
        return fast

    if idx_fallback is not None:
        def out(_):
            g = jnp.take(table_i32,
                         jnp.maximum(idx_fallback, 0).reshape(-1))
            return jnp.where(idx_fallback >= 0,
                             g.reshape(idx_fallback.shape), 0)
    else:
        out = make_fast(cap * tiers[-1])
    for t in reversed(tiers if idx_fallback is not None else tiers[:-1]):
        c = cap * t
        out = (lambda nxt, c: lambda _: jax.lax.cond(
            cmax <= c, make_fast(c), nxt, None))(out, c)
    return out(None)


def sparse_gather(table_i32, idx, cap, *, tiers=TIERS, interpret=False):
    """Gather table_i32[(T,) i32] at idx[(R,128) i32, -1 = skip], paying
    only R*cap' scalar-gather indices where cap' is the smallest of
    cap*tiers[...] that no 128-lane row's valid count exceeds (chosen
    per call at runtime via nested lax.cond); falls back to the full
    R*128 gather if all tiers overflow. Returns (R, 128) i32 (0 at
    invalid lanes).

    The tiers absorb per-bounce clustering differences (early-bounce
    rays cluster on textured surfaces; deep bounces scatter) without
    per-depth recompilation — the same program serves every scan
    iteration."""
    max_cap = cap * tiers[-1]
    cidx, slot, count = compact_rows_pallas(idx, max_cap,
                                            interpret=interpret)
    return gather_compacted(table_i32, cidx, slot, count, cap,
                            tiers=tiers, idx_fallback=idx,
                            interpret=interpret)
