"""Pallas TPU kernel: fused whole-scene closest-hit (analytic + mesh).

One launch per intersection pass. The computeIntersection dispatcher
(reference src/pathtrace.cu:210-281) becomes a single VMEM-resident
kernel over ray blocks of 1024 (laid out [8, 128]: rays in lanes):

* analytic cubes/spheres: statically unrolled per-geom slab/quadric tests
  (intersections.h:50-146) on full [8, 128] tiles, with the reference's
  strict-< geom-order tie-breaking folded in;
* mesh triangles: chunked 128-triangle loop; per chunk an AABB cull (any
  ray in the block) then a sublane-group Moller-Trumbore — triangle data
  sliced as [8, 1] vectors against ray rows [1, 128], so the pairwise
  test is pure VPU broadcast arithmetic with NO per-pair memory traffic;
* outputs only reduced per-ray results ((NB,128) planes), so HBM traffic
  per pass is ~25 MB instead of the XLA path's ~8 GB of (N,128)
  temporaries.

The caller refines the winning triangle with the exact glm-parity test
(ops/intersect.ray_triangle) and resolves normals/uv/material in XLA.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptdn_tpu.scene.parser import CUBE, MESH, SPHERE

# Sub-chunk (32-tri quarter) culling mode inside admitted chunks:
#   "off"  — all 16 Möller groups straight-line per needing row
#   "tile" — dynamic group range from the tile-union of sub-chunk AABB
#            crossings (one vector test per sub-chunk per chunk)
# A/B knob (benchmarks/profile_mesh.py); per-ROW bounds were measured
# out (bunny 221 -> 251 ms: per-row scalar work dominates).
SUBCHUNK = os.environ.get("PTDN_SUBCHUNK", "off")

# Mesh scan loop order over (chunk, row):
#   "chunk" — chunks outer (tile-union range), needing-row loop inner
#   "row"   — rows outer (static unroll), chunk fori inner bounded by
#             EACH ROW'S OWN crossed-chunk range + a per-(row, chunk)
#             slab-cull cond. Motivation (benchmarks/diag_ranges.py,
#             depth-3): tile unions cover ~ALL chunks (room 19/22,
#             bunny 26-34/39 — 1024 lanes' crossed sets scatter across
#             the whole ID space) while per-LANE range widths stay ~6-7
#             — so row-level bounds cut chunk visits ~3x and the cull
#             cond skips rows that don't cross the chunk at all.
MESH_LOOP = os.environ.get("PTDN_MESH_LOOP", "chunk")

# Admitted-chunk resolve style:
#   "compact" — needing-row loop (dynamic fori over [r_lo, r_hi], one
#               row extract + 16 straight-line groups per row)
#   "dense"   — whole-tile moller_rows/any_hit_chunk (all 8 rows
#               straight-line, shared triangle slices, no per-row
#               scalar machinery) behind the per-chunk slab cond
# Per-row scalar overhead ~0.3 us vs ~1.2 us of extra vector work for
# a dense 8-row sweep: dense should win once >=3-4 rows need the chunk.
RESOLVE = os.environ.get("PTDN_RESOLVE", "compact")

# Hoist per-chunk triangle-group slices out of the needing-row loop
# (1, default) vs re-slice per (row, group) (0) — A/B knob.
TRI_HOIST = os.environ.get("PTDN_TRI_HOIST", "1") == "1"

# Cube slab test division style:
#   "0" — t = (±0.5 - qo) / qd, two divides per axis
#   "1" — one reciprocal per axis + two multiplies: same inf/NaN
#         semantics for qd == ±0 (a * (1/±0) carries a's sign like
#         a / ±0), ~1 ulp t differences otherwise. f32 divides are
#         multi-op microcode on the VPU and the analytic loop pays
#         6/cube/lane in BOTH the closest-hit and the NEE visibility
#         pass. Default ON (with FAST_NORM: cornell headline
#         15.86 -> 15.54 ms, interleaved slope A/B, 5/5 reps); the
#         XLA oracle (ops/intersect.py) reads the same env so both
#         backends always compute identical slab math.
RECIP_SLAB = os.environ.get("PTDN_RECIP_SLAB", "1") == "1"

# Analytic-geom normalizations (object-space direction `qn`, winning
# normal `nn`) via lax.rsqrt instead of 1/sqrt — one VPU op vs two
# microcoded ones, per geom per lane per pass. rsqrt is a refined
# approximation (~2 ulp), so this drifts t by ~1e-7 relative vs the
# XLA oracle (absorbed by the cross-backend FRAC_BUDGET; the pallas
# self-goldens are regenerated with it on). Arguably MORE
# reference-faithful: glm::normalize lowers to CUDA rsqrtf in the
# reference kernels (glm/detail/func_geometric.inl inversesqrt).
# Default ON (see RECIP_SLAB measurement).
FAST_NORM = os.environ.get("PTDN_FAST_NORM", "1") == "1"


def _rnorm(x, y, z):
    s = x * x + y * y + z * z
    return jax.lax.rsqrt(s) if FAST_NORM else 1.0 / jnp.sqrt(s)

# Dynamic row extract inside the needing-row loops:
#   "select" — masked sublane reduction (any block height)
#   "gather" — take_along_axis(axis=0) = tpu.dynamic_gather, vreg-local:
#              exactly 8 sublanes, locking mesh kernels to 8-row blocks
# A/B knob; "select" unlocks 32-row trace blocks (PTDN_TRACE_ROWS).
ROW_EXTRACT = os.environ.get("PTDN_ROW_EXTRACT", "select")


def _extract_row(planes, r, shape):
    """Extract row `r` (traced scalar) of each [R,128] tile as [1,128].
    select mode: one row mask + per-plane masked sublane-sum — pure
    vector ops at any R. gather mode: the historical vreg-local
    dynamic_gather (R=8 only)."""
    if ROW_EXTRACT == "select":
        row_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        sel = row_i == r
        zero = jnp.zeros(shape, jnp.float32)
        return [jnp.sum(jnp.where(sel, p, zero), axis=0, keepdims=True)
                for p in planes]
    rfull = jnp.full(shape, r, jnp.int32)
    return [jax.lax.slice(jnp.take_along_axis(p, rfull, axis=0),
                          (0, 0), (1, 128))
            for p in planes]

FLT_MAX = 3.402823466e38
FLT_EPSILON = 1.1920929e-07
BACKOFF = 1e-4
RROWS = 8            # ray rows per block -> 1024 rays
TCHUNK = 128
TGROUP = 8


def _vmem_kw(n_tris):
    """compiler_params kwargs for mesh-path pallas calls: raise the
    scoped-vmem limit ONLY for large meshes (terrain30k's 1.4 MB tri +
    3.8 MB attr tables + block operands blow the 16 MB default). Kept
    conditional because a raised limit can change Mosaic scheduling for
    everything else — the headline scene must keep the default."""
    if n_tris > 8192:
        return {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)}
    return {}


def chunk_aabb_ops(ds, n_tris):
    """Chunk-AABB kernel operands + chunk count. The (5C, 3) device
    table carries 4 sub-chunk AABBs per chunk after row C; with
    sub-chunk culling off (the default) kernels only read rows [0, C),
    and SMEM operand windows are padded heavily (~0.5 KB per row:
    terrain30k's 233-chunk full table cost 2 x 584 K of the 1 M SMEM
    budget and OOMed the compile) — so pass only the rows actually
    read."""
    n_chunks = int(ds.tri_chunk_min.shape[0]) // 5 if n_tris else 0
    cmin, cmax = ds.tri_chunk_min, ds.tri_chunk_max
    if SUBCHUNK != "tile" and n_chunks:
        cmin = jax.lax.slice(cmin, (0, 0), (n_chunks, 3))
        cmax = jax.lax.slice(cmax, (0, 0), (n_chunks, 3))
    return cmin, cmax, n_chunks


def _sub_chunk_any(cmin_r, cmax_r, n_chunks, c, s, ox, oy, oz,
                   ix, iy, iz, twin=None):
    """Does ANY lane of the tile cross chunk c's s-th 32-tri sub-chunk
    AABB (rows n_chunks + 4c + s of the extended chunk-AABB operand,
    scene/scene.py)? Whole-tile vector test + one reduction — computed
    ONCE per (chunk, sub-chunk), never per row (per-row scalar work is
    the measured killer: ~24 SMEM reads + reductions per row ate the
    entire sub-chunk win, bunny 221 -> 251 ms). `twin` (optional) masks
    lanes by their live t-window: a sub-chunk entered beyond every
    lane's current best/limit can't matter."""
    r = n_chunks + 4 * c + s
    t0x = (cmin_r[r, 0] - ox) * ix
    t1x = (cmax_r[r, 0] - ox) * ix
    t0y = (cmin_r[r, 1] - oy) * iy
    t1y = (cmax_r[r, 1] - oy) * iy
    t0z = (cmin_r[r, 2] - oz) * iz
    t1z = (cmax_r[r, 2] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.minimum(t0z, t1z))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                   jnp.maximum(t0y, t1y)),
                       jnp.maximum(t0z, t1z))
    crossed = (tmax >= 0.0) & (tmin <= tmax)
    if twin is not None:
        crossed = crossed & (tmin < twin)
    return jnp.any(crossed)


def light_visibility_tiles(o, d, vis_refs, shape, *, geom_types,
                           n_tris: int, n_chunks: int, light_geom: int,
                           nee_mask=None, chunk_range=None,
                           static_mats=None):
    """Visibility-only closest hit on tiles: did the closest hit land on
    `light_geom`? Any-hit semantics against the light distance: no
    normals, no triangle index bookkeeping, and the chunk loop exits
    early once every potentially-lit lane in the block is occluded —
    shadow rays are the cheapest pass this way (NEE consumes only this
    boolean, pathtrace.cu:374). `nee_mask` (f32, optional) pre-masks
    lanes that don't carry a shadow ray so they can't keep the loop
    alive. `chunk_range` ((lo, hi) f32 planes, optional): each lane's
    crossed-chunk-ID range (engine.wavefront.chunk_range_planes); the
    loop then scans only the tile union [min(lo), max(hi)] — chunks
    outside it are crossed by no lane and can't occlude (exact).
    Returns the lit mask as f32."""
    (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r,
     cmax_r) = vis_refs
    ox, oy, oz = o
    dx, dy, dz = d

    ta, ga, _, _, _ = _analytic_part(
        geom_types, tf_r, inv_r, invt_r, (gbbmin_r, gbbmax_r),
        o, d, shape, want_normals=False, static_mats=static_mats)
    # keep masks as f32 (bool vreg concat/any miscompile in Mosaic)
    lit = jnp.where(ga == float(light_geom), 1.0, 0.0)
    if nee_mask is not None:
        lit = lit * nee_mask

    if n_tris == 0:
        return lit

    idx = 1.0 / dx
    idy = 1.0 / dy
    idz = 1.0 / dz

    def chunk_cull(c, relevant_t):
        t0x = (cmin_r[c, 0] - ox) * idx
        t1x = (cmax_r[c, 0] - ox) * idx
        t0y = (cmin_r[c, 1] - oy) * idy
        t1y = (cmax_r[c, 1] - oy) * idy
        t0z = (cmin_r[c, 2] - oz) * idz
        t1z = (cmax_r[c, 2] - oz) * idz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        return jnp.any((tmax >= 0.0) & (tmin <= tmax) & (tmin < relevant_t))

    def occ_one_row(tri, rox, roy, roz, rdx, rdy, rdz, rta, occ):
        """Any-hit of one 8-tri group against one [1,128] ray row."""
        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        a = e1x * px + e1y * py + e1z * pz
        f = 1.0 / a
        sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
        u = f * (sx * px + sy * py + sz * pz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (rdx * qx + rdy * qy + rdz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = ((a >= FLT_EPSILON) & (u >= 0.0) & (u <= 1.0)
              & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0) & (t < rta))
        return jnp.maximum(occ, jnp.max(jnp.where(ok, 1.0, 0.0), axis=0,
                                        keepdims=True))

    def chunk_occlusion(c, lit):
        """Per-lane window cull + NEEDING-ROW loop: only rows holding a
        still-lit lane whose t-window crosses the chunk AABB run the
        Möller groups (sorted tiles put needing lanes in contiguous
        rows, so the row range is short). Replaces the old tile-wide
        compaction: same tested-lane superset, no route/gather/uncompact
        machinery. Per row, sub-chunk AABB bounds trim the group
        unroll."""
        t0x = (cmin_r[c, 0] - ox) * idx
        t1x = (cmax_r[c, 0] - ox) * idx
        t0y = (cmin_r[c, 1] - oy) * idy
        t1y = (cmax_r[c, 1] - oy) * idy
        t0z = (cmin_r[c, 2] - oz) * idz
        t1z = (cmax_r[c, 2] - oz) * idz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        need = jnp.where((lit > 0.5) & (tmax >= 0.0) & (tmin <= tmax)
                         & (tmin < ta), 1.0, 0.0)
        row_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        r_lo = jnp.min(jnp.where(need > 0.5, row_i, shape[0]))
        r_hi = jnp.max(jnp.where(need > 0.5, row_i, -1))
        if SUBCHUNK == "tile":
            # tile-union Möller group bounds (see chunk_body_compact)
            twin = jnp.where(lit > 0.5, ta, -FLT_MAX)
            g_lo = jnp.int32(16)
            g_end = jnp.int32(0)
            for s in range(4):
                sc = _sub_chunk_any(cmin_r, cmax_r, n_chunks, c, s,
                                    ox, oy, oz, idx, idy, idz, twin=twin)
                g_lo = jnp.where(sc, jnp.minimum(g_lo, 4 * s), g_lo)
                g_end = jnp.where(sc, 4 * s + 4, g_end)
        else:
            g_lo, g_end = None, None

        def do(lit):
            row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            # hoist the 16 dynamic tri-group slices out of the row
            # loop: every needing row reads the SAME chunk, so slicing
            # per (row, group) re-pays the dynamic VMEM addressing
            # needing_rows times (16 x [8,12] = 16 vregs live)
            sls = ([tri_r[pl.ds(c * TCHUNK + g * TGROUP, TGROUP), :]
                    for g in range(TCHUNK // TGROUP)]
                   if TRI_HOIST and SUBCHUNK != "tile" else None)

            def row_body(r, occ):
                rox, roy, roz, rdx, rdy, rdz, rta = _extract_row(
                    (ox, oy, oz, dx, dy, dz, ta), r, shape)

                def one_group(g, ro):
                    sl = (sls[g] if sls is not None else
                          tri_r[pl.ds(c * TCHUNK + g * TGROUP,
                                      TGROUP), :])
                    return occ_one_row(sl, rox, roy, roz, rdx, rdy, rdz,
                                       rta, ro)

                ro = jnp.zeros((1, 128), jnp.float32)
                if SUBCHUNK == "tile":
                    ro = jax.lax.fori_loop(g_lo, g_end, one_group, ro)
                else:
                    for g in range(TCHUNK // TGROUP):
                        ro = one_group(g, ro)
                return jnp.where(row_iota == r,
                                 jnp.broadcast_to(ro, shape), occ)

            occ = jax.lax.fori_loop(r_lo, r_hi + 1, row_body,
                                    jnp.zeros(shape, jnp.float32))
            return lit * (1.0 - occ)

        return jax.lax.cond(r_hi >= r_lo, do, lambda l: l, lit)

    def any_hit_chunk(c, lit):
        """Dense whole-tile any-hit (small scenes: few chunks, most
        lanes relevant — compaction overhead would not pay)."""
        def group(g, lit):
            sl = tri_r[pl.ds(c * TCHUNK + g * TGROUP, TGROUP), :]
            occ_rows = []
            for r in range(shape[0]):
                ro = occ_one_row(sl, ox[r:r + 1], oy[r:r + 1],
                                 oz[r:r + 1], dx[r:r + 1], dy[r:r + 1],
                                 dz[r:r + 1], ta[r:r + 1],
                                 jnp.zeros((1, 128), jnp.float32))
                occ_rows.append(ro)
            return lit * (1.0 - jnp.concatenate(occ_rows, axis=0))

        return jax.lax.fori_loop(0, TCHUNK // TGROUP, group, lit)

    def row_major_occ(lit):
        """Rows outer (static), chunk fori inner bounded by the row's
        own crossed range; a slab-cull cond per (row, chunk) skips
        chunks no still-lit lane of the row crosses inside its
        t-window. Value-exact vs the chunk-outer loop: per lane the
        same ascending (chunk, group, tri) any-hit order."""
        lo_p, hi_p = chunk_range
        row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        out = lit
        for r in range(shape[0]):
            (rox, roy, roz, rdx, rdy, rdz, rta, rlit, rlo_v,
             rhi_v) = _extract_row(
                (ox, oy, oz, dx, dy, dz, ta, lit, lo_p, hi_p), r, shape)
            rix = 1.0 / rdx
            riy = 1.0 / rdy
            riz = 1.0 / rdz
            rlo = jnp.min(rlo_v).astype(jnp.int32)
            rhi = jnp.max(rhi_v).astype(jnp.int32)

            def cbody(c, rl, rox=rox, roy=roy, roz=roz, rdx=rdx,
                      rdy=rdy, rdz=rdz, rta=rta, rix=rix, riy=riy,
                      riz=riz):
                t0x = (cmin_r[c, 0] - rox) * rix
                t1x = (cmax_r[c, 0] - rox) * rix
                t0y = (cmin_r[c, 1] - roy) * riy
                t1y = (cmax_r[c, 1] - roy) * riy
                t0z = (cmin_r[c, 2] - roz) * riz
                t1z = (cmax_r[c, 2] - roz) * riz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                               jnp.minimum(t0y, t1y)),
                                   jnp.minimum(t0z, t1z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.maximum(t0z, t1z))
                needed = ((rl > 0.5) & (tmax >= 0.0) & (tmin <= tmax)
                          & (tmin < rta))

                def hit(rl2):
                    ro = jnp.zeros((1, 128), jnp.float32)
                    for g in range(TCHUNK // TGROUP):
                        sl = tri_r[pl.ds(c * TCHUNK + g * TGROUP,
                                         TGROUP), :]
                        ro = occ_one_row(sl, rox, roy, roz, rdx, rdy,
                                         rdz, rta, ro)
                    return rl2 * (1.0 - ro)

                return jax.lax.cond(jnp.any(needed), hit, lambda x: x,
                                    rl)

            rl = jax.lax.fori_loop(rlo, rhi + 1, cbody, rlit)
            out = jnp.where(row_iota == r, jnp.broadcast_to(rl, shape),
                            out)
        return out

    if chunk_range is not None and n_chunks > 4:
        if MESH_LOOP == "row":
            return row_major_occ(lit)
        # sorted-wavefront: scan only the tile's union crossed range —
        # chunks outside [c_lo, c_hi] are crossed by no lane (exact)
        lo_p, hi_p = chunk_range
        c_lo = jnp.min(lo_p).astype(jnp.int32)
        c_hi = jnp.max(hi_p).astype(jnp.int32)
    else:
        c_lo = jnp.int32(0)
        c_hi = jnp.int32(n_chunks - 1)

    def cond(state):
        c, lit = state
        return (c <= c_hi) & (jnp.max(lit) > 0.5)

    def body(state):
        c, lit = state
        # gather-mode dynamic row reads are vreg-local (8 sublanes):
        # taller blocks (the 32-row whole-path kernel) must then take
        # the dense branch; select-mode extraction frees the height
        if (n_chunks <= 4 or (shape[0] != 8 and ROW_EXTRACT == "gather")
                or RESOLVE == "dense"):
            relevant_t = jnp.where(lit > 0.5, ta, -FLT_MAX)
            lit = jax.lax.cond(chunk_cull(c, relevant_t),
                               lambda l: any_hit_chunk(c, l),
                               lambda l: l, lit)
        else:
            lit = chunk_occlusion(c, lit)
        return c + 1, lit

    _, lit = jax.lax.while_loop(cond, body, (c_lo, lit))
    return lit


def _vis_kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r,
                cmax_r, lit_o,
                *, geom_types, n_tris: int, n_chunks: int,
                light_geom: int):
    shape = (RROWS, 128)
    o = (ox_r[:], oy_r[:], oz_r[:])
    d = (dx_r[:], dy_r[:], dz_r[:])
    refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r)
    lit_o[:] = light_visibility_tiles(
        o, d, refs, shape, geom_types=geom_types, n_tris=n_tris,
        n_chunks=n_chunks, light_geom=light_geom)


def light_visibility_pallas(ds, geom_types, o, d, n_tris: int,
                            light_geom: int = 0, interpret: bool = False):
    """Shadow-ray visibility of `light_geom` for all rays (bool [N])."""
    n = o.shape[0]
    blk = RROWS * 128
    pad = (-n) % blk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    npad = n + pad
    nb = npad // 128
    comps = [o[:, 0].reshape(nb, 128), o[:, 1].reshape(nb, 128),
             o[:, 2].reshape(nb, 128), d[:, 0].reshape(nb, 128),
             d[:, 1].reshape(nb, 128), d[:, 2].reshape(nb, 128)]
    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    kern = functools.partial(_vis_kernel, geom_types=tuple(geom_types),
                             n_tris=n_tris, n_chunks=n_chunks,
                             light_geom=light_geom)
    ray_spec = pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        kern,
        **_vmem_kw(n_tris),
        grid=(nb // RROWS,),
        in_specs=[ray_spec] * 6 + [smem] * 5 + [full] + [smem] * 2,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 128), jnp.float32),
        interpret=interpret,
    )(*comps, ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max,
      ds.tri_moller, cmin_op, cmax_op)
    return out.reshape(npad)[:n] > 0.5


def _analytic_part(geom_types, tf, inv, invt, gbb, o, d, shape,
                   geom_cull: bool = False, want_normals: bool = True,
                   static_mats=None):
    """Unrolled analytic-geom loop; o/d are component tuples of [8,128].
    Each geom's test is skipped for the whole block unless some ray hits
    its (padded) world AABB closer than the running best (the 1e-3 margin
    covers the reference's 1e-4 hit-point backoff, intersections.h:29-31)."""
    ox, oy, oz = o
    dx, dy, dz = d
    idx_ = 1.0 / dx
    idy_ = 1.0 / dy
    idz_ = 1.0 / dz
    gbb_min, gbb_max = gbb
    best = (jnp.full(shape, FLT_MAX, jnp.float32),
            jnp.full(shape, -1.0, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32))

    for gi, gtype in enumerate(geom_types):
        if gtype == MESH:
            continue

        if geom_cull:
            # measured NEGATIVE on cornell (87 -> 102 ms: wall AABBs never
            # cull and the per-geom cond costs); off by default, useful
            # for scenes with many small analytic geoms
            t0x = (gbb_min[gi, 0] - ox) * idx_
            t1x = (gbb_max[gi, 0] - ox) * idx_
            t0y = (gbb_min[gi, 1] - oy) * idy_
            t1y = (gbb_max[gi, 1] - oy) * idy_
            t0z = (gbb_min[gi, 2] - oz) * idz_
            t1z = (gbb_max[gi, 2] - oz) * idz_
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            any_hit = jnp.any((tmax >= 0.0) & (tmin <= tmax)
                              & (tmin < best[0] + 1e-3))
            best = jax.lax.cond(
                any_hit,
                lambda b, gi=gi, gtype=gtype: _one_geom(
                    geom_types, tf, inv, invt, gi, gtype, o, d, shape, b,
                    want_normals, static_mats),
                lambda b: b, best)
        else:
            best = _one_geom(geom_types, tf, inv, invt, gi, gtype, o, d,
                             shape, best, want_normals, static_mats)

    best_t, best_g, bnx, bny, bnz = best
    return best_t, best_g, bnx, bny, bnz


def _row_dot(row, x, y, z, with_bias: bool, static: bool):
    """row[0]*x + row[1]*y + row[2]*z (+ row[3]), left-to-right.

    static=True: row entries are Python floats (scene transforms baked at
    trace-build time) — terms with an exactly-zero coefficient are
    dropped and *1.0 multiplies elided.  Adding an exact zero term is a
    no-op in f32 (up to the sign of a zero result), so this matches the
    SMEM-scalar expression bit-for-bit while axis-aligned geoms (most
    cornell walls) skip ~2/3 of the transform FLOPs and ALL the SMEM
    scalar loads."""
    if static:
        acc = None
        for c, v in ((row[0], x), (row[1], y), (row[2], z)):
            if c == 0.0:
                continue
            t = v if c == 1.0 else (-v if c == -1.0 else c * v)
            acc = t if acc is None else acc + t
        if with_bias and row[3] != 0.0:
            acc = row[3] if acc is None else acc + row[3]
        return 0.0 if acc is None else acc
    e = row[0] * x + row[1] * y + row[2] * z
    return e + row[3] if with_bias else e


def _one_geom(geom_types, tf, inv, invt, gi, gtype, o, d, shape, best,
              want_normals: bool = True, static_mats=None):
    """One analytic geom test (intersections.h:50-146) + strict-< update.
    static_mats: optional (tf, inv, invt) nested float tuples — the same
    f32 values as the SMEM refs, baked in for constant folding."""
    ox, oy, oz = o
    dx, dy, dz = d
    best_t, best_g, bnx, bny, bnz = best
    st = static_mats is not None
    if st:
        m = static_mats[0][gi]
        iv = static_mats[1][gi]
    else:
        iv = [[inv[gi, r, c] for c in range(4)] for r in range(4)]
        m = [[tf[gi, r, c] for c in range(4)] for r in range(4)]
    if True:
        qox = _row_dot(iv[0], ox, oy, oz, True, st)
        qoy = _row_dot(iv[1], ox, oy, oz, True, st)
        qoz = _row_dot(iv[2], ox, oy, oz, True, st)
        qdx = _row_dot(iv[0], dx, dy, dz, False, st)
        qdy = _row_dot(iv[1], dx, dy, dz, False, st)
        qdz = _row_dot(iv[2], dx, dy, dz, False, st)
        qn = _rnorm(qdx, qdy, qdz)
        qdx, qdy, qdz = qdx * qn, qdy * qn, qdz * qn

        if gtype == CUBE:
            # slab test (intersections.h:50-92); normal-plane tracking
            # (6 where-updates per axis) is skipped entirely for
            # visibility-only callers (want_normals=False) — the NEE
            # shadow pass consumes just the winning geom id
            tmin = jnp.full(shape, -1e38, jnp.float32)
            tmax = jnp.full(shape, 1e38, jnp.float32)
            if want_normals:
                tmin_nx = jnp.zeros(shape, jnp.float32)
                tmin_ny = jnp.zeros(shape, jnp.float32)
                tmin_nz = jnp.zeros(shape, jnp.float32)
                tmax_nx = jnp.zeros(shape, jnp.float32)
                tmax_ny = jnp.zeros(shape, jnp.float32)
                tmax_nz = jnp.zeros(shape, jnp.float32)
            for ax, (qo_a, qd_a) in enumerate(((qox, qdx), (qoy, qdy),
                                               (qoz, qdz))):
                if RECIP_SLAB:
                    rq_a = 1.0 / qd_a
                    t1 = (-0.5 - qo_a) * rq_a
                    t2 = (0.5 - qo_a) * rq_a
                else:
                    t1 = (-0.5 - qo_a) / qd_a
                    t2 = (0.5 - qo_a) / qd_a
                ta = jnp.minimum(t1, t2)
                tb = jnp.maximum(t1, t2)
                um = (ta > 0) & (ta > tmin)
                tmin = jnp.where(um, ta, tmin)
                ux = tb < tmax
                tmax = jnp.where(ux, tb, tmax)
                if want_normals:
                    nsign = jnp.where(t2 < t1, 1.0, -1.0)
                    tmin_nx = jnp.where(um, nsign if ax == 0 else 0.0,
                                        tmin_nx)
                    tmin_ny = jnp.where(um, nsign if ax == 1 else 0.0,
                                        tmin_ny)
                    tmin_nz = jnp.where(um, nsign if ax == 2 else 0.0,
                                        tmin_nz)
                    tmax_nx = jnp.where(ux, nsign if ax == 0 else 0.0,
                                        tmax_nx)
                    tmax_ny = jnp.where(ux, nsign if ax == 1 else 0.0,
                                        tmax_ny)
                    tmax_nz = jnp.where(ux, nsign if ax == 2 else 0.0,
                                        tmax_nz)
            hit = (tmax >= tmin) & (tmax > 0)
            inside = tmin <= 0
            t_obj = jnp.where(inside, tmax, tmin)
            if want_normals:
                n_ox = jnp.where(inside, tmax_nx, tmin_nx)
                n_oy = jnp.where(inside, tmax_ny, tmin_ny)
                n_oz = jnp.where(inside, tmax_nz, tmin_nz)
        else:  # SPHERE (intersections.h:104-146)
            vdot = qox * qdx + qoy * qdy + qoz * qdz
            radicand = vdot * vdot - (qox * qox + qoy * qoy + qoz * qoz
                                      - 0.25)
            sq = jnp.sqrt(jnp.maximum(radicand, 0.0))
            t1 = -vdot + sq
            t2 = -vdot - sq
            both_neg = (t1 < 0) & (t2 < 0)
            both_pos = (t1 > 0) & (t2 > 0)
            inside = ~both_pos
            t_obj = jnp.where(both_pos, jnp.minimum(t1, t2),
                              jnp.maximum(t1, t2))
            hit = (radicand >= 0) & ~both_neg

        # object-space hit point with the 1e-4 backoff
        pox = qox + (t_obj - BACKOFF) * qdx
        poy = qoy + (t_obj - BACKOFF) * qdy
        poz = qoz + (t_obj - BACKOFF) * qdz
        wx = _row_dot(m[0], pox, poy, poz, True, st)
        wy = _row_dot(m[1], pox, poy, poz, True, st)
        wz = _row_dot(m[2], pox, poy, poz, True, st)
        t_world = jnp.sqrt((ox - wx) ** 2 + (oy - wy) ** 2 + (oz - wz) ** 2)

        better = hit & (t_world > 0) & (t_world < best_t)
        best_t = jnp.where(better, t_world, best_t)
        best_g = jnp.where(better, float(gi), best_g)
        if want_normals:
            if gtype == CUBE:
                # normal via transform (reference quirk, intersections.h:88)
                nwx = _row_dot(m[0], n_ox, n_oy, n_oz, False, st)
                nwy = _row_dot(m[1], n_ox, n_oy, n_oz, False, st)
                nwz = _row_dot(m[2], n_ox, n_oy, n_oz, False, st)
            else:
                if st:
                    it = static_mats[2][gi]
                else:
                    it = [[invt[gi, r, c] for c in range(4)]
                          for r in range(4)]
                nwx = _row_dot(it[0], pox, poy, poz, False, st)
                nwy = _row_dot(it[1], pox, poy, poz, False, st)
                nwz = _row_dot(it[2], pox, poy, poz, False, st)
                flip = jnp.where(inside, -1.0, 1.0)
                nwx, nwy, nwz = nwx * flip, nwy * flip, nwz * flip
            nn = _rnorm(nwx, nwy, nwz)
            bnx = jnp.where(better, nwx * nn, bnx)
            bny = jnp.where(better, nwy * nn, bny)
            bnz = jnp.where(better, nwz * nn, bnz)

    return best_t, best_g, bnx, bny, bnz


def _mesh_best(tri_r, cmin_r, cmax_r, o, d, ta, ga, shape, n_tris: int,
               n_chunks: int, cull: bool, alive=None, chunk_range=None):
    """Chunked brute-force mesh closest hit over the whole block.
    Returns (best_t, best_tri_index) as f32 tiles (FLT_MAX = none).
    `alive` (f32 mask, optional) excludes dead lanes from the per-lane
    window cull and compaction — their outputs are garbage the caller
    already masks (the fused path kernel gates on act).
    `chunk_range` ((lo, hi) f32 planes, optional): each lane's
    crossed-chunk-ID range over an UNBOUNDED t-window
    (engine.wavefront.chunk_range_planes). The chunk loop then scans
    only the tile union [min(lo), max(hi)]: a chunk outside a lane's
    crossed set can't contain a hit for it, so one outside the union
    contains none for the tile (exact — the per-lane window culls
    inside the range are unchanged). With lanes sorted by the range
    pair the union is ~2-4 chunks on bunny instead of all 39."""
    ox, oy, oz = o
    dx, dy, dz = d
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (TGROUP, 1), 0).astype(
        jnp.float32)
    if cull:
        idx = 1.0 / dx
        idy = 1.0 / dy
        idz = 1.0 / dz

    def moller_rows(tri, base_f, bt, bi):
        """tri: [TGROUP, 12] slice; test 8 tris x all rays in the block."""
        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        new_rows = []
        for r in range(shape[0]):
            rdx, rdy, rdz = dx[r:r + 1], dy[r:r + 1], dz[r:r + 1]
            rox, roy, roz = ox[r:r + 1], oy[r:r + 1], oz[r:r + 1]
            # p = cross(d, e2): [8, 128]
            px = rdy * e2z - rdz * e2y
            py = rdz * e2x - rdx * e2z
            pz = rdx * e2y - rdy * e2x
            a = e1x * px + e1y * py + e1z * pz
            f = 1.0 / a
            sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
            u = f * (sx * px + sy * py + sz * pz)
            qx = sy * e1z - sz * e1y
            qy = sz * e1x - sx * e1z
            qz = sx * e1y - sy * e1x
            v = f * (rdx * qx + rdy * qy + rdz * qz)
            t = f * (e2x * qx + e2y * qy + e2z * qz)
            ok = ((a >= FLT_EPSILON) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                  & (u + v <= 1.0) & (t > 0.0))
            tm = jnp.where(ok, t, FLT_MAX)
            gt = jnp.min(tm, axis=0, keepdims=True)              # [1,128]
            gi = jnp.min(jnp.where(tm == gt, base_f + sub_i, FLT_MAX),
                         axis=0, keepdims=True)
            btr = bt[r:r + 1]
            bir = bi[r:r + 1]
            upd = gt < btr
            new_rows.append((jnp.where(upd, gt, btr),
                             jnp.where(upd, gi, bir)))
        return (jnp.concatenate([x for x, _ in new_rows], axis=0),
                jnp.concatenate([x for _, x in new_rows], axis=0))

    def chunk_cull(c, bt):
        """Any ray in the block hits chunk c's AABB closer than its best."""
        t0x = (cmin_r[c, 0] - ox) * idx
        t1x = (cmax_r[c, 0] - ox) * idx
        t0y = (cmin_r[c, 1] - oy) * idy
        t1y = (cmax_r[c, 1] - oy) * idy
        t0z = (cmin_r[c, 2] - oz) * idz
        t1z = (cmax_r[c, 2] - oz) * idz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        return jnp.any((tmax >= 0.0) & (tmin <= tmax) & (tmin < bt))

    def chunk_body(c, best):
        bt, bi = best

        def hit_chunk(best):
            bt, bi = best

            def group(g, best2):
                bt2, bi2 = best2
                # slice triangle rows straight from the VMEM ref
                sl = tri_r[pl.ds(c * TCHUNK + g * TGROUP, TGROUP), :]
                base_f = (c * TCHUNK + g * TGROUP).astype(jnp.float32)
                return moller_rows(sl, base_f, bt2, bi2)

            return jax.lax.fori_loop(0, TCHUNK // TGROUP, group, (bt, bi))

        if cull:
            return jax.lax.cond(chunk_cull(c, bt), hit_chunk, lambda b: b,
                                (bt, bi))
        return hit_chunk((bt, bi))

    def moller_one_row(tri, base_f, rox, roy, roz, rdx, rdy, rdz, bt, bi):
        """Test one 8-tri group against one [1,128] ray row (same math
        and tie-breaking as moller_rows)."""
        v0x, v0y, v0z = tri[:, 0:1], tri[:, 1:2], tri[:, 2:3]
        e1x, e1y, e1z = tri[:, 3:4], tri[:, 4:5], tri[:, 5:6]
        e2x, e2y, e2z = tri[:, 6:7], tri[:, 7:8], tri[:, 8:9]
        px = rdy * e2z - rdz * e2y
        py = rdz * e2x - rdx * e2z
        pz = rdx * e2y - rdy * e2x
        a = e1x * px + e1y * py + e1z * pz
        f = 1.0 / a
        sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
        u = f * (sx * px + sy * py + sz * pz)
        qx = sy * e1z - sz * e1y
        qy = sz * e1x - sx * e1z
        qz = sx * e1y - sy * e1x
        v = f * (rdx * qx + rdy * qy + rdz * qz)
        t = f * (e2x * qx + e2y * qy + e2z * qz)
        ok = ((a >= FLT_EPSILON) & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > 0.0))
        tm = jnp.where(ok, t, FLT_MAX)
        gt = jnp.min(tm, axis=0, keepdims=True)
        gi = jnp.min(jnp.where(tm == gt, base_f + sub_i, FLT_MAX),
                     axis=0, keepdims=True)
        upd = gt < bt
        return jnp.where(upd, gt, bt), jnp.where(upd, gi, bi)

    def chunk_body_compact(c, best):
        """Per-chunk closest hit with per-LANE culling + NEEDING-ROW
        loop: only rows holding a lane whose t-window crosses the chunk
        AABB run the Möller groups, and per row sub-chunk AABB bounds
        trim the 16-group unroll to the crossed quarters (sorted tiles
        put needing lanes in contiguous rows and sub-chunks, so both
        ranges are short). Replaces the old tile-wide compaction — same
        tested-lane superset without the route/gather/uncompact
        machinery. Exactness: a ray missing the chunk AABB (or with
        tmin >= best_t) cannot produce a winning hit inside it;
        chunk/group order and strict-< updates are unchanged, so
        tie-breaking matches chunk_body."""
        bt, bi = best
        t0x = (cmin_r[c, 0] - ox) * idx
        t1x = (cmax_r[c, 0] - ox) * idx
        t0y = (cmin_r[c, 1] - oy) * idy
        t1y = (cmax_r[c, 1] - oy) * idy
        t0z = (cmin_r[c, 2] - oz) * idz
        t1z = (cmax_r[c, 2] - oz) * idz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        need = (tmax >= 0.0) & (tmin <= tmax) & (tmin < bt)
        row_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        r_lo = jnp.min(jnp.where(need, row_i, shape[0]))
        r_hi = jnp.max(jnp.where(need, row_i, -1))
        if SUBCHUNK == "tile":
            # Möller group bounds from the tile-union of sub-chunk
            # crossings — ONE whole-tile vector test + reduction per
            # sub-chunk, shared by every row (per-row bounds were the
            # measured killer, see _sub_chunk_any)
            g_lo = jnp.int32(16)
            g_end = jnp.int32(0)
            for s in range(4):
                sc = _sub_chunk_any(cmin_r, cmax_r, n_chunks, c, s,
                                    ox, oy, oz, idx, idy, idz, twin=bt)
                g_lo = jnp.where(sc, jnp.minimum(g_lo, 4 * s), g_lo)
                g_end = jnp.where(sc, 4 * s + 4, g_end)
        else:
            g_lo, g_end = None, None

        def do(best):
            row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            # hoisted tri-group slices: see chunk_occlusion
            sls = ([tri_r[pl.ds(c * TCHUNK + g * TGROUP, TGROUP), :]
                    for g in range(TCHUNK // TGROUP)]
                   if TRI_HOIST and SUBCHUNK != "tile" else None)

            def row_body(r, acc):
                ct, ci = acc
                rox, roy, roz, rdx, rdy, rdz = _extract_row(
                    (ox, oy, oz, dx, dy, dz), r, shape)

                def one_group(g, acc2):
                    rt, ri = acc2
                    sl = (sls[g] if sls is not None else
                          tri_r[pl.ds(c * TCHUNK + g * TGROUP,
                                      TGROUP), :])
                    base_f = (c * TCHUNK + g * TGROUP).astype(jnp.float32)
                    return moller_one_row(sl, base_f, rox, roy, roz,
                                          rdx, rdy, rdz, rt, ri)

                rt0 = jnp.full((1, 128), FLT_MAX)
                if SUBCHUNK == "tile":
                    rt, ri = jax.lax.fori_loop(g_lo, g_end, one_group,
                                               (rt0, rt0))
                else:
                    # all 16 groups straight-line: in-kernel scalar
                    # control flow per row costs more than the skipped
                    # Möller vector work (docs/PERF_NOTES.md)
                    rt, ri = rt0, rt0
                    for g in range(TCHUNK // TGROUP):
                        rt, ri = one_group(g, (rt, ri))
                sel = row_iota == r
                return (jnp.where(sel, jnp.broadcast_to(rt, shape), ct),
                        jnp.where(sel, jnp.broadcast_to(ri, shape), ci))

            ct0 = jnp.full(shape, FLT_MAX, jnp.float32)
            ct, ci = jax.lax.fori_loop(r_lo, r_hi + 1, row_body,
                                       (ct0, ct0))
            upd = ct < bt
            return (jnp.where(upd, ct, bt), jnp.where(upd, ci, bi))

        return jax.lax.cond(r_hi >= r_lo, do, lambda b: b, (bt, bi))

    def row_major_best(bt0, bi0):
        """Rows outer (static), chunk fori inner bounded by the row's
        own crossed range + per-(row, chunk) slab-cull cond (see
        MESH_LOOP). Value-exact vs the chunk-outer loop: per lane the
        same ascending (chunk, group, tri) visit order with the same
        strict-< updates, and the per-lane t-window tightens
        continuously (a superset of the per-chunk tightening)."""
        lo_p, hi_p = chunk_range
        row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        bt, bi = bt0, bi0
        for r in range(shape[0]):
            (rox, roy, roz, rdx, rdy, rdz, rbt0, rbi0, rlo_v,
             rhi_v) = _extract_row(
                (ox, oy, oz, dx, dy, dz, bt0, bi0, lo_p, hi_p), r,
                shape)
            rix = 1.0 / rdx
            riy = 1.0 / rdy
            riz = 1.0 / rdz
            rlo = jnp.min(rlo_v).astype(jnp.int32)
            rhi = jnp.max(rhi_v).astype(jnp.int32)

            def cbody(c, acc, rox=rox, roy=roy, roz=roz, rdx=rdx,
                      rdy=rdy, rdz=rdz, rix=rix, riy=riy, riz=riz):
                rt, ri = acc
                t0x = (cmin_r[c, 0] - rox) * rix
                t1x = (cmax_r[c, 0] - rox) * rix
                t0y = (cmin_r[c, 1] - roy) * riy
                t1y = (cmax_r[c, 1] - roy) * riy
                t0z = (cmin_r[c, 2] - roz) * riz
                t1z = (cmax_r[c, 2] - roz) * riz
                tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                               jnp.minimum(t0y, t1y)),
                                   jnp.minimum(t0z, t1z))
                tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                               jnp.maximum(t0y, t1y)),
                                   jnp.maximum(t0z, t1z))
                needed = (tmax >= 0.0) & (tmin <= tmax) & (tmin < rt)

                def hit(acc2):
                    rt2, ri2 = acc2
                    for g in range(TCHUNK // TGROUP):
                        sl = tri_r[pl.ds(c * TCHUNK + g * TGROUP,
                                         TGROUP), :]
                        base_f = (c * TCHUNK + g * TGROUP).astype(
                            jnp.float32)
                        rt2, ri2 = moller_one_row(
                            sl, base_f, rox, roy, roz, rdx, rdy, rdz,
                            rt2, ri2)
                    return rt2, ri2

                return jax.lax.cond(jnp.any(needed), hit, lambda a: a,
                                    (rt, ri))

            rt, ri = jax.lax.fori_loop(rlo, rhi + 1, cbody,
                                       (rbt0, rbi0))
            sel = row_iota == r
            bt = jnp.where(sel, jnp.broadcast_to(rt, shape), bt)
            bi = jnp.where(sel, jnp.broadcast_to(ri, shape), bi)
        return bt, bi

    # seed the running best with the analytic winner's t: mesh hits beyond
    # it lose the merge anyway (strict <), so chunk culling can reject
    # every chunk that starts behind the closest wall/floor hit.
    bt0 = jnp.where(ga >= 0.0, ta, FLT_MAX)
    if alive is not None:
        # dead lanes can't win: an empty window rejects every chunk
        bt0 = jnp.where(alive > 0.5, bt0, -FLT_MAX)
    bi0 = jnp.full(shape, FLT_MAX, jnp.float32)
    # gather-mode dynamic row reads are vreg-local tpu.dynamic_gather
    # axis=0 ops (exactly 8 sublanes); select-mode extraction works at
    # any block height (ROW_EXTRACT)
    if n_chunks <= 4 or (shape[0] != 8 and ROW_EXTRACT == "gather"):
        # small scenes: unroll chunks statically and trim the group loop
        # to the real triangle count (cornell: 38 tris -> 5 groups not 16)
        best = (bt0, bi0)
        for c in range(n_chunks):
            tris_here = min(n_tris - c * TCHUNK, TCHUNK)
            ngroups = -(-tris_here // TGROUP)

            def hit_chunk_s(best, c=c, ngroups=ngroups):
                def group(g, best2):
                    sl = tri_r[pl.ds(c * TCHUNK + g * TGROUP, TGROUP), :]
                    base_f = (c * TCHUNK + g * TGROUP).astype(jnp.float32)
                    return moller_rows(sl, base_f, *best2)
                return jax.lax.fori_loop(0, ngroups, group, best)

            if cull:
                best = jax.lax.cond(chunk_cull(c, best[0]),
                                    hit_chunk_s, lambda b: b, best)
            else:
                best = hit_chunk_s(best)
        bt, bi = best
    elif (chunk_range is not None and cull and MESH_LOOP == "row"):
        bt, bi = row_major_best(bt0, bi0)
    else:
        body = (chunk_body_compact if (cull and RESOLVE != "dense")
                else chunk_body)
        if chunk_range is not None:
            # scan only the tile's union crossed-ID range (array order
            # within it, so cross-chunk t-tie-breaking matches the
            # unsorted full scan)
            lo_p, hi_p = chunk_range
            c_lo = jnp.min(lo_p).astype(jnp.int32)
            c_hi = jnp.max(hi_p).astype(jnp.int32)
            bt, bi = jax.lax.fori_loop(c_lo, c_hi + 1, body, (bt0, bi0))
        else:
            bt, bi = jax.lax.fori_loop(0, n_chunks, body, (bt0, bi0))
    return bt, bi


def _kernel(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
            tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r,
            ta_o, ga_o, nx_o, ny_o, nz_o, tm_o, im_o,
            *, geom_types, n_tris: int, n_chunks: int, cull: bool):
    shape = (RROWS, 128)
    ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
    dx, dy, dz = dx_r[:], dy_r[:], dz_r[:]

    ta, ga, nx, ny, nz = _analytic_part(
        geom_types, tf_r, inv_r, invt_r, (gbbmin_r, gbbmax_r),
        (ox, oy, oz), (dx, dy, dz), shape)
    ta_o[:] = jnp.where(ga >= 0.0, ta, -1.0)
    ga_o[:] = ga
    nx_o[:] = nx
    ny_o[:] = ny
    nz_o[:] = nz

    if n_tris == 0:
        tm_o[:] = jnp.full(shape, -1.0, jnp.float32)
        im_o[:] = jnp.full(shape, -1.0, jnp.float32)
        return

    bt, bi = _mesh_best(tri_r, cmin_r, cmax_r, (ox, oy, oz), (dx, dy, dz),
                        ta, ga, shape, n_tris, n_chunks, cull)
    found = bi < FLT_MAX
    # mask out padding triangles of the last chunk
    found = found & (bi < float(n_tris))
    tm_o[:] = jnp.where(found, bt, -1.0)
    im_o[:] = jnp.where(found, bi, -1.0)


def joint_mesh_tiles(tri_r, cmin_r, cmax_r, o, d_n, ta_n, ga_n,
                     d_s, ta_s, lit0, shape, *, n_tris: int,
                     n_chunks: int, next_range, shadow_range,
                     alive=None):
    """ONE chunk scan for BOTH mesh queries of a bounce: closest hit
    for the next rays and any-hit occlusion for the shadow rays (same
    per-lane ORIGINS — shadow rays spawn where next rays do). The two
    separate loops each pay the per-chunk machinery (slab tests,
    needing-row reductions, cond dispatch, dynamic-trip fori, hoisted
    tri slices); sharing it across the morton-balanced ranges saves
    the overlap (PTDN_JOINT A/B in docs/PERF_NOTES.md).

    Exactness: the closest-hit side performs the same ascending
    (chunk, group, tri) visits with the same strict-< updates as
    _mesh_best's compact loop — extra rows admitted by the combined
    row range only add Möller tests whose hits the per-chunk slab
    windows already prove non-winning (the compact==dense argument);
    occlusion is an order-free boolean. Returns (bt, bi, lit)."""
    ox, oy, oz = o
    dnx, dny, dnz = d_n
    dsx, dsy, dsz = d_s
    inx_n, iny_n, inz_n = 1.0 / dnx, 1.0 / dny, 1.0 / dnz
    inx_s, iny_s, inz_s = 1.0 / dsx, 1.0 / dsy, 1.0 / dsz
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (TGROUP, 1), 0).astype(
        jnp.float32)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, shape, 0)

    bt0 = jnp.where(ga_n >= 0.0, ta_n, FLT_MAX)
    if alive is not None:
        bt0 = jnp.where(alive > 0.5, bt0, -FLT_MAX)
    bi0 = jnp.full(shape, FLT_MAX, jnp.float32)

    nlo_p, nhi_p = next_range
    slo_p, shi_p = shadow_range
    c_lo = jnp.minimum(jnp.min(nlo_p), jnp.min(slo_p)).astype(jnp.int32)
    c_hi = jnp.maximum(jnp.max(nhi_p), jnp.max(shi_p)).astype(jnp.int32)

    def chunk_body(c, state):
        bt, bi, lit = state
        # next-ray slab + window cull (per lane)
        t0x = (cmin_r[c, 0] - ox) * inx_n
        t1x = (cmax_r[c, 0] - ox) * inx_n
        t0y = (cmin_r[c, 1] - oy) * iny_n
        t1y = (cmax_r[c, 1] - oy) * iny_n
        t0z = (cmin_r[c, 2] - oz) * inz_n
        t1z = (cmax_r[c, 2] - oz) * inz_n
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        need_n = (tmax >= 0.0) & (tmin <= tmax) & (tmin < bt)
        # shadow-ray slab (still-lit lanes only, within light distance)
        s0x = (cmin_r[c, 0] - ox) * inx_s
        s1x = (cmax_r[c, 0] - ox) * inx_s
        s0y = (cmin_r[c, 1] - oy) * iny_s
        s1y = (cmax_r[c, 1] - oy) * iny_s
        s0z = (cmin_r[c, 2] - oz) * inz_s
        s1z = (cmax_r[c, 2] - oz) * inz_s
        smin = jnp.maximum(jnp.maximum(jnp.minimum(s0x, s1x),
                                       jnp.minimum(s0y, s1y)),
                           jnp.minimum(s0z, s1z))
        smax = jnp.minimum(jnp.minimum(jnp.maximum(s0x, s1x),
                                       jnp.maximum(s0y, s1y)),
                           jnp.maximum(s0z, s1z))
        need_s = ((lit > 0.5) & (smax >= 0.0) & (smin <= smax)
                  & (smin < ta_s))
        need = need_n | need_s
        r_lo = jnp.min(jnp.where(need, row_iota, shape[0]))
        r_hi = jnp.max(jnp.where(need, row_iota, -1))

        def do(state):
            bt, bi, lit = state
            sls = ([tri_r[pl.ds(c * TCHUNK + g * TGROUP, TGROUP), :]
                    for g in range(TCHUNK // TGROUP)] if TRI_HOIST
                   else None)

            def row_body(r, acc):
                ct, ci, occ = acc
                (rox, roy, roz, rdx, rdy, rdz, rsx, rsy, rsz,
                 rta) = _extract_row(
                    (ox, oy, oz, dnx, dny, dnz, dsx, dsy, dsz, ta_s),
                    r, shape)
                rt = jnp.full((1, 128), FLT_MAX)
                ri = jnp.full((1, 128), FLT_MAX)
                ro = jnp.zeros((1, 128), jnp.float32)
                for g in range(TCHUNK // TGROUP):
                    sl = (sls[g] if sls is not None else
                          tri_r[pl.ds(c * TCHUNK + g * TGROUP,
                                      TGROUP), :])
                    base_f = (c * TCHUNK + g * TGROUP).astype(
                        jnp.float32)
                    # shared tri slice: closest-hit Möller (next rays)
                    v0x, v0y, v0z = sl[:, 0:1], sl[:, 1:2], sl[:, 2:3]
                    e1x, e1y, e1z = sl[:, 3:4], sl[:, 4:5], sl[:, 5:6]
                    e2x, e2y, e2z = sl[:, 6:7], sl[:, 7:8], sl[:, 8:9]
                    px = rdy * e2z - rdz * e2y
                    py = rdz * e2x - rdx * e2z
                    pz = rdx * e2y - rdy * e2x
                    a = e1x * px + e1y * py + e1z * pz
                    f = 1.0 / a
                    sx, sy, sz = rox - v0x, roy - v0y, roz - v0z
                    u = f * (sx * px + sy * py + sz * pz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (rdx * qx + rdy * qy + rdz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = ((a >= FLT_EPSILON) & (u >= 0.0) & (u <= 1.0)
                          & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0))
                    tm = jnp.where(ok, t, FLT_MAX)
                    gt = jnp.min(tm, axis=0, keepdims=True)
                    gi = jnp.min(jnp.where(tm == gt, base_f + sub_i,
                                           FLT_MAX),
                                 axis=0, keepdims=True)
                    upd = gt < rt
                    rt = jnp.where(upd, gt, rt)
                    ri = jnp.where(upd, gi, ri)
                    # occlusion any-hit (shadow rays), same slice
                    px = rsy * e2z - rsz * e2y
                    py = rsz * e2x - rsx * e2z
                    pz = rsx * e2y - rsy * e2x
                    a = e1x * px + e1y * py + e1z * pz
                    f = 1.0 / a
                    u = f * (sx * px + sy * py + sz * pz)
                    qx = sy * e1z - sz * e1y
                    qy = sz * e1x - sx * e1z
                    qz = sx * e1y - sy * e1x
                    v = f * (rsx * qx + rsy * qy + rsz * qz)
                    t = f * (e2x * qx + e2y * qy + e2z * qz)
                    ok = ((a >= FLT_EPSILON) & (u >= 0.0) & (u <= 1.0)
                          & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
                          & (t < rta))
                    ro = jnp.maximum(
                        ro, jnp.max(jnp.where(ok, 1.0, 0.0), axis=0,
                                    keepdims=True))
                sel = row_iota == r
                return (jnp.where(sel, jnp.broadcast_to(rt, shape), ct),
                        jnp.where(sel, jnp.broadcast_to(ri, shape), ci),
                        jnp.where(sel, jnp.broadcast_to(ro, shape), occ))

            ct0 = jnp.full(shape, FLT_MAX, jnp.float32)
            occ0 = jnp.zeros(shape, jnp.float32)
            ct, ci, occ = jax.lax.fori_loop(r_lo, r_hi + 1, row_body,
                                            (ct0, ct0, occ0))
            upd = ct < bt
            return (jnp.where(upd, ct, bt), jnp.where(upd, ci, bi),
                    lit * (1.0 - occ))

        return jax.lax.cond(r_hi >= r_lo, do, lambda s: s,
                            (bt, bi, lit))

    bt, bi, lit = jax.lax.fori_loop(c_lo, c_hi + 1, chunk_body,
                                    (bt0, bi0, lit0))
    return bt, bi, lit


def _mesh_attr_refine(tri_attr_t_ref, bt, bi, o, d, shape, n_tris: int,
                      n_chunks: int, compat: bool):
    """Resolve the winning triangle's attributes IN-KERNEL and redo the
    exact glm-parity Moller-Trumbore + interpolation that the engine used
    to run in XLA (ops/intersect.ray_triangle / interpolate_tri_hit).

    Per chunk, each of the 25 attribute channels lives on the LANE axis
    (tri_attr_t row c*32+ch), so one 128-wide take_along_axis per channel
    replaces the XLA one-hot matmul gather (~1.2 ms/bounce saved)."""
    ox, oy, oz = o
    dx, dy, dz = d
    found = (bi < FLT_MAX) & (bi < float(n_tris))
    ii = jnp.where(found, bi, 0.0).astype(jnp.int32)

    acc = [jnp.zeros(shape, jnp.float32) for _ in range(25)]

    def resolve_chunk(c, acc):
        local = ii - c * TCHUNK
        inchunk = found & (local >= 0) & (local < TCHUNK)
        idx = jnp.clip(local, 0, TCHUNK - 1)
        # one 32-row block load (dynamic start stays 32-sublane-aligned,
        # so this also works with a traced c), then static row slices
        blk = tri_attr_t_ref[pl.ds(c * 32, 32), :]              # [32, 128]
        new = []
        for ch in range(25):
            row = jax.lax.slice(blk, (ch, 0), (ch + 1, 128))    # [1, 128]
            pick = jnp.take_along_axis(
                jnp.broadcast_to(row, shape), idx, axis=1)
            new.append(jnp.where(inchunk, pick, acc[ch]))
        return new

    if n_chunks <= 2:
        for c in range(n_chunks):
            acc = resolve_chunk(c, acc)
    else:
        # scan only the winners' chunk-ID range: winner chunk = ii >> 7;
        # with coherence-sorted tiles this is 1-2 trips instead of a
        # per-chunk any+cond over every chunk
        cw = jax.lax.shift_right_logical(ii, 7)
        wlo = jnp.min(jnp.where(found, cw, n_chunks))
        whi = jnp.max(jnp.where(found, cw, -1))

        def body(c, acc):
            return tuple(resolve_chunk(c, list(acc)))

        acc = list(jax.lax.fori_loop(wlo, whi + 1, body, tuple(acc)))

    (v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z,
     n0x, n0y, n0z, n1x, n1y, n1z, n2x, n2y, n2z,
     u0x, u0y, u1x, u1y, u2x, u2y, gm) = acc

    # exact glm::intersectRayTriangle (glm/gtx/intersect.inl:36-74),
    # component form in the same op order as ops/intersect.ray_triangle
    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    a = e1x * px + e1y * py + e1z * pz
    front = a >= FLT_EPSILON
    f = 1.0 / jnp.where(front, a, 1.0)
    sx, sy, sz = ox - v0x, oy - v0y, oz - v0z
    u = f * (sx * px + sy * py + sz * pz)
    qx = sy * e1z - sz * e1y
    qy = sz * e1x - sx * e1z
    qz = sx * e1y - sy * e1x
    v = f * (dx * qx + dy * qy + dz * qz)
    t = f * (e2x * qx + e2y * qy + e2z * qz)
    mh = (front & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= 0.0) & found & (t > 0.0))

    # Triangle::Intersect interpolation (sceneStructs.h:160-172); compat
    # keeps the reference's swapped normal weights
    w_ = 1.0 - u - v
    uvx = u0x * w_ + u1x * u + u2x * v
    uvy = u0y * w_ + u1y * u + u2y * v
    if compat:
        nx = n0x * u + n1x * v + n2x * w_
        ny = n0y * u + n1y * v + n2y * w_
        nz = n0z * u + n1z * v + n2z * w_
    else:
        nx = n0x * w_ + n1x * u + n2x * v
        ny = n0y * w_ + n1y * u + n2y * v
        nz = n0z * w_ + n1z * u + n2z * v
    nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    nx, ny, nz = nx / nn, ny / nn, nz / nn
    m_geom = jnp.where(mh, gm, -1.0)
    return t, mh, nx, ny, nz, uvx, uvy, m_geom


def closest_hit_tiles(o, d, scene_refs, shape, *, geom_types, geom_mats,
                      n_tris: int, n_chunks: int, cull: bool, compat: bool,
                      alive=None, chunk_range=None, static_mats=None,
                      mesh_best_fn=None):
    """Fully-resolved closest hit on tiles: analytic + mesh + attributes
    + merge (the engine's intersect() contract). `scene_refs` is the
    (tf, inv, invt, gbbmin, gbbmax, tri, cmin, cmax, attr) ref tuple.
    Returns (t, geom, nx, ny, nz, uu, vv, mat) tiles.
    `mesh_best_fn(ta, ga) -> (bt, bi)` overrides the mesh closest-hit
    scan (the joint next+shadow loop hooks in here)."""
    (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r,
     attr_r) = scene_refs
    ta, ga, anx, any_, anz = _analytic_part(
        geom_types, tf_r, inv_r, invt_r, (gbbmin_r, gbbmax_r),
        o, d, shape, static_mats=static_mats)
    a_valid = ga >= 0.0

    if n_tris == 0:
        t = jnp.where(a_valid, ta, -1.0)
        geom = jnp.where(a_valid, ga, -1.0)
        nx, ny, nz = anx, any_, anz
        uu = jnp.zeros(shape, jnp.float32)
        vv = jnp.zeros(shape, jnp.float32)
    else:
        if mesh_best_fn is not None:
            bt, bi = mesh_best_fn(ta, ga)
        else:
            bt, bi = _mesh_best(tri_r, cmin_r, cmax_r, o, d, ta, ga,
                                shape, n_tris, n_chunks, cull,
                                alive=alive, chunk_range=chunk_range)
        t_m, mh, mnx, mny, mnz, uvx, uvy, m_geom = _mesh_attr_refine(
            attr_r, bt, bi, o, d, shape, n_tris, n_chunks, compat)
        mesh_wins = mh & (~a_valid | (t_m < ta))
        t = jnp.where(mesh_wins, t_m, jnp.where(a_valid, ta, -1.0))
        geom = jnp.where(mesh_wins, m_geom, jnp.where(a_valid, ga, -1.0))
        nx = jnp.where(mesh_wins, mnx, anx)
        ny = jnp.where(mesh_wins, mny, any_)
        nz = jnp.where(mesh_wins, mnz, anz)
        uu = jnp.where(mesh_wins, uvx, 0.0)
        vv = jnp.where(mesh_wins, uvy, 0.0)

    # static geom -> material table as a select chain
    mat = jnp.zeros(shape, jnp.float32)
    for gi, mi in enumerate(geom_mats):
        mat = jnp.where(geom == float(gi), float(mi), mat)
    return t, geom, nx, ny, nz, uu, vv, mat


def _kernel_full(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                 tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r,
                 cmin_r, cmax_r, attr_r,
                 t_o, g_o, nx_o, ny_o, nz_o, uu_o, vv_o, mat_o,
                 *, geom_types, geom_mats, n_tris: int, n_chunks: int,
                 cull: bool, compat: bool):
    shape = (RROWS, 128)
    o = (ox_r[:], oy_r[:], oz_r[:])
    d = (dx_r[:], dy_r[:], dz_r[:])
    refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r,
            attr_r)
    t, geom, nx, ny, nz, uu, vv, mat = closest_hit_tiles(
        o, d, refs, shape, geom_types=geom_types, geom_mats=geom_mats,
        n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat)
    t_o[:] = t
    g_o[:] = geom
    nx_o[:] = nx
    ny_o[:] = ny
    nz_o[:] = nz
    uu_o[:] = uu
    vv_o[:] = vv
    mat_o[:] = mat


def tex_index_tiles(uu, vv, mat, shape, *, mat_texids, tex_whs,
                    atlas_hw):
    """In-kernel texel-index computation (Texture::getColor addressing,
    reference src/sceneStructs.h:208-221): static mat->texid and
    texid->(w,h) select chains, V-flipped nearest-texel address into the
    flat packed-atlas layout. Returns flat i32 index, -1 for lanes whose
    material is untextured."""
    hm, wm = atlas_hw
    texid = jnp.full(shape, -1.0, jnp.float32)
    for mi, tid in enumerate(mat_texids):
        if tid >= 0:
            texid = jnp.where(mat == float(mi), float(tid), texid)
    w = jnp.zeros(shape, jnp.float32)
    h = jnp.zeros(shape, jnp.float32)
    for tid, (tw, th) in enumerate(tex_whs):
        w = jnp.where(texid == float(tid), float(tw), w)
        h = jnp.where(texid == float(tid), float(th), h)
    x = jnp.minimum(w * uu, w - 1.0).astype(jnp.int32)
    y = jnp.minimum(h * (1.0 - vv), h - 1.0).astype(jnp.int32)
    x = jnp.clip(x, 0, wm - 1)
    y = jnp.clip(y, 0, hm - 1)
    flat = texid.astype(jnp.int32) * (hm * wm) + y * wm + x
    return jnp.where(texid >= 0.0, flat, -1)


def _kernel_full_tex(ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
                     tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r,
                     cmin_r, cmax_r, attr_r,
                     t_o, g_o, nx_o, ny_o, nz_o, uu_o, vv_o, mat_o,
                     ti_o, ci_o, sl_o, cn_o,
                     *, geom_types, geom_mats, n_tris: int, n_chunks: int,
                     cull: bool, compat: bool, mat_texids, tex_whs,
                     atlas_hw, cap: int):
    """_kernel_full plus fused texel-index compaction: emits the flat
    texel index (-1 untextured), per-row compacted indices, slots and
    counts (ops/pallas/compact.py) so the XLA albedo fetch gathers only
    ~cap indices per 128-lane row instead of 128."""
    from ptdn_tpu.ops.pallas.compact import compact_tile

    shape = (RROWS, 128)
    o = (ox_r[:], oy_r[:], oz_r[:])
    d = (dx_r[:], dy_r[:], dz_r[:])
    refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r,
            attr_r)
    t, geom, nx, ny, nz, uu, vv, mat = closest_hit_tiles(
        o, d, refs, shape, geom_types=geom_types, geom_mats=geom_mats,
        n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat)
    t_o[:] = t
    g_o[:] = geom
    nx_o[:] = nx
    ny_o[:] = ny
    nz_o[:] = nz
    uu_o[:] = uu
    vv_o[:] = vv
    mat_o[:] = mat
    tidx = tex_index_tiles(uu, vv, mat, shape, mat_texids=mat_texids,
                           tex_whs=tex_whs, atlas_hw=atlas_hw)
    ti_o[:] = tidx
    # retain cap*TIERS[-1] slots: the consumer's runtime tier dispatch
    # (gather_compacted) may read past the base cap
    from ptdn_tpu.ops.pallas.compact import TIERS
    ci_o[:], sl_o[:], cn_o[:] = compact_tile(tidx, cap * TIERS[-1], shape)


def scene_intersect_full_tex_pallas(ds, geom_types, geom_mats, o, d,
                                    n_tris: int, mat_texids, tex_whs,
                                    cap: int, compat: bool = True,
                                    cull: bool = True,
                                    interpret: bool = False):
    """scene_intersect_full_pallas plus fused texel-index compaction.
    Returns (isect dict, (tidx, cidx, slot, count) as (nb,128) i32)."""
    n = o.shape[0]
    assert n % (RROWS * 128) == 0
    nb = n // 128
    comps = [o[:, 0].reshape(nb, 128), o[:, 1].reshape(nb, 128),
             o[:, 2].reshape(nb, 128), d[:, 0].reshape(nb, 128),
             d[:, 1].reshape(nb, 128), d[:, 2].reshape(nb, 128)]
    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    atlas_hw = (int(ds.tex_atlas.shape[1]), int(ds.tex_atlas.shape[2]))
    kern = functools.partial(
        _kernel_full_tex, geom_types=tuple(geom_types),
        geom_mats=tuple(geom_mats), n_tris=n_tris, n_chunks=n_chunks,
        cull=cull, compat=compat, mat_texids=tuple(mat_texids),
        tex_whs=tuple(tex_whs), atlas_hw=atlas_hw, cap=cap)
    ray_spec = pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kern,
        **_vmem_kw(n_tris),
        grid=(nb // RROWS,),
        in_specs=[ray_spec] * 6 + [smem] * 5 + [full] + [smem] * 2 + [full],
        out_specs=[ray_spec] * 12,
        out_shape=[jax.ShapeDtypeStruct((nb, 128), jnp.float32)] * 8
        + [jax.ShapeDtypeStruct((nb, 128), jnp.int32)] * 4,
        interpret=interpret,
    )(*comps, ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max,
      ds.tri_moller, cmin_op, cmax_op, ds.tri_attr_t)
    t, geom, nx, ny, nz, uu, vv, mat = [x.reshape(n) for x in outs[:8]]
    geom_i = geom.astype(jnp.int32)
    isect = {
        "t": t,
        "normal": jnp.stack([nx, ny, nz], axis=-1),
        "uv": jnp.stack([uu, vv], axis=-1),
        "mat_id": mat.astype(jnp.int32),
        "geom_id": geom_i,
        "hit": geom_i >= 0,
    }
    return isect, tuple(outs[8:])


def scene_intersect_full_pallas(ds, geom_types, geom_mats, o, d,
                                n_tris: int, compat: bool = True,
                                cull: bool = True, interpret: bool = False):
    """One-launch fully-resolved closest hit. Returns the engine's
    intersect() dict (t, normal, uv, mat_id, geom_id, hit)."""
    n = o.shape[0]
    blk = RROWS * 128
    pad = (-n) % blk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    npad = n + pad
    nb = npad // 128
    comps = [o[:, 0].reshape(nb, 128), o[:, 1].reshape(nb, 128),
             o[:, 2].reshape(nb, 128), d[:, 0].reshape(nb, 128),
             d[:, 1].reshape(nb, 128), d[:, 2].reshape(nb, 128)]
    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    kern = functools.partial(_kernel_full, geom_types=tuple(geom_types),
                             geom_mats=tuple(geom_mats), n_tris=n_tris,
                             n_chunks=n_chunks, cull=cull, compat=compat)
    ray_spec = pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kern,
        **_vmem_kw(n_tris),
        grid=(nb // RROWS,),
        in_specs=[ray_spec] * 6 + [smem] * 5 + [full] + [smem] * 2 + [full],
        out_specs=[ray_spec] * 8,
        out_shape=[jax.ShapeDtypeStruct((nb, 128), jnp.float32)] * 8,
        interpret=interpret,
    )(*comps, ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max,
      ds.tri_moller, cmin_op, cmax_op, ds.tri_attr_t)
    t, geom, nx, ny, nz, uu, vv, mat = [x.reshape(npad)[:n] for x in outs]
    geom_i = geom.astype(jnp.int32)
    hit = geom_i >= 0
    return {
        "t": t,
        "normal": jnp.stack([nx, ny, nz], axis=-1),
        "uv": jnp.stack([uu, vv], axis=-1),
        "mat_id": mat.astype(jnp.int32),
        "geom_id": geom_i,
        "hit": hit,
    }


def scene_intersect_pallas(ds, geom_types, o, d, n_tris: int,
                           cull: bool = True, interpret: bool = False):
    """Fused analytic+mesh closest hit.

    Returns dict with analytic best (t_a, geom_a, normal_a) and mesh best
    (t_m, tri_m) — merged into the reference contract by the engine.
    """
    n = o.shape[0]
    blk = RROWS * 128
    pad = (-n) % blk
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    npad = n + pad
    nb = npad // 128
    comps = [o[:, 0].reshape(nb, 128), o[:, 1].reshape(nb, 128),
             o[:, 2].reshape(nb, 128), d[:, 0].reshape(nb, 128),
             d[:, 1].reshape(nb, 128), d[:, 2].reshape(nb, 128)]

    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    kern = functools.partial(_kernel, geom_types=tuple(geom_types),
                             n_tris=n_tris, n_chunks=n_chunks, cull=cull)
    ray_spec = pl.BlockSpec((RROWS, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # geom matrices + chunk AABBs are read as SCALARS -> SMEM (a VMEM
    # scalar read costs a vector load + lane extract; SMEM is ~1 cycle)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kern,
        **_vmem_kw(n_tris),
        grid=(nb // RROWS,),
        in_specs=[ray_spec] * 6 + [smem] * 5 + [full] + [smem] * 2,
        out_specs=[ray_spec] * 7,
        out_shape=[jax.ShapeDtypeStruct((nb, 128), jnp.float32)] * 7,
        interpret=interpret,
    )(*comps, ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max,
      ds.tri_moller, cmin_op, cmax_op)

    ta, ga, nxx, nyy, nzz, tm, im = [x.reshape(npad)[:n] for x in outs]
    return {
        "t_a": ta,
        "geom_a": ga.astype(jnp.int32),
        "normal_a": jnp.stack([nxx, nyy, nzz], axis=-1),
        "t_m": tm,
        "tri_m": im.astype(jnp.int32),
    }
