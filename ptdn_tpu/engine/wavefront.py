"""Wavefront path tracer: the reference's `rt` megakernel, re-designed
for TPU as a masked flat ray batch stepped through the bounce loop.

The CUDA reference runs one divergent thread per pixel through the whole
path (reference src/pathtrace.cu:300-401). On TPU that becomes:

* a flat SoA ray batch of N = W*H lanes (origins, directions, throughput,
  radiance, flags) — every op below is dense VPU math over (N, ...);
* the bounce loop is a host-unrolled static loop over depth 1..max_depth
  (depth <= 10); dead lanes are masked, not compacted (XLA static shapes);
* per-lane LCG seeds re-derived each depth from (pixel, frame+depth) via
  the TEA hash, exactly like initRand (pathtrace.cu:328) — so the variate
  streams match the CUDA build bit-for-bit;
* closest-hit dispatch (computeIntersection, pathtrace.cu:210-281)
  becomes a statically unrolled loop over the handful of analytic geoms
  plus ONE global mesh query (the reference traverses the same global BVH
  once per mesh geom and filters by triangle range — attributing the
  global closest mesh hit to its owning geom is equivalent);
* the G-buffer is a pytree of (N, ...) arrays with the reference layout
  (position/normal/albedo/ialbedo/geomId, sceneStructs.h:113-119).
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ptdn_tpu.ops import bsdf
from ptdn_tpu.ops.bvh_traverse import (mesh_brute_force, mesh_bvh_batched,
                                       mesh_closest_hit_attrs)
from ptdn_tpu.ops.intersect import FLT_MAX, box_intersect, sphere_intersect
from ptdn_tpu.ops.rng import init_rand
from ptdn_tpu.scene.parser import CUBE, MESH, SPHERE

COLORDIVIDOR = jnp.float32(0.003921568627)   # utilities.h:24
BRUTE_FORCE_MAX_TRIS = 2048


def sample_texture(ds, texid, uv):
    """Nearest-neighbor texel fetch with V flip (Texture::getColor,
    sceneStructs.h:208-221). texid must be pre-clamped >= 0.

    Texels are byte-packed into ONE u32 per texel and fetched with a
    single flat-index gather (unpacked in-jit): measured 4.8 ms vs
    8.0 ms for the multi-dim (texid,y,x) 3-channel gather per 640k
    random lookups on v5e. Values are bit-identical (bytes 0..255)."""
    wh = ds.tex_wh[texid]
    w = wh[..., 0].astype(jnp.float32)
    h = wh[..., 1].astype(jnp.float32)
    x = jnp.minimum(w * uv[..., 0], w - 1.0).astype(jnp.int32)
    y = jnp.minimum(h * (1.0 - uv[..., 1]), h - 1.0).astype(jnp.int32)
    hm, wm = ds.tex_atlas.shape[1], ds.tex_atlas.shape[2]
    x = jnp.clip(x, 0, wm - 1)
    y = jnp.clip(y, 0, hm - 1)
    # jnp.take lowers ~15% faster than [] indexing on v5e
    # (benchmarks/micro_gather.py: 4.76 vs 5.69 ms per 640K indices)
    packed = jnp.take(ds.tex_flat_u32, texid * (hm * wm) + y * wm + x)
    rgb = jnp.stack([packed & jnp.uint32(0xFF),
                     (packed >> 8) & jnp.uint32(0xFF),
                     (packed >> 16) & jnp.uint32(0xFF)], axis=-1)
    return rgb.astype(jnp.float32) * COLORDIVIDOR


def albedo_of(ds, mat_id, uv):
    """Material color or texture sample (pathtrace.cu:320-322, 343-354)."""
    texid = ds.mat_texid[mat_id]
    base = ds.mat_color[mat_id]
    tex = sample_texture(ds, jnp.maximum(texid, 0), uv)
    return jnp.where((texid >= 0)[..., None], tex, base)


def gather_rows_matmul(table, idx):
    """Row gather as a one-hot MXU matmul. XLA's TPU gathers, once fused
    with compute, run as a scalar loop (~30 M rows/s); for these small
    tables a one-hot matmul is an order of magnitude faster."""
    import jax

    oh = jax.nn.one_hot(idx, table.shape[0], dtype=table.dtype)
    return jnp.dot(oh, table, preferred_element_type=jnp.float32)


def make_mat_reader(cfg):
    """Material property access: one-hot matmul on the pallas backend,
    plain gathers on the XLA/CPU oracle path."""
    if cfg.backend == "pallas":
        def read(ds, mat_idx):
            a = gather_rows_matmul(ds.mat_attr, mat_idx)
            return {"color": a[:, 0:3], "spec_color": a[:, 3:6],
                    "refl": a[:, 7], "refr": a[:, 8], "ior": a[:, 9],
                    "emit": a[:, 10], "texid": a[:, 11].astype(jnp.int32)}
    else:
        def read(ds, mat_idx):
            return {"color": ds.mat_color[mat_idx],
                    "spec_color": ds.mat_spec_color[mat_idx],
                    "refl": ds.mat_reflective[mat_idx],
                    "refr": ds.mat_refractive[mat_idx],
                    "ior": ds.mat_ior[mat_idx],
                    "emit": ds.mat_emittance[mat_idx],
                    "texid": ds.mat_texid[mat_idx]}
    return read


def albedo_from(ds, mv, uv, show_texture: bool = True,
                sparse_cap: int = 0, interpret=None):
    """albedo_of given an already-read material view. Untextured lanes
    sample texel (0,0): coherent indices speed the gather ~20%.
    show_texture=False is the reference's SHOW_TEXTURE=0 compile flag.

    sparse_cap > 0 (pallas backend, N % 1024 == 0) routes the texel
    fetch through the row-compaction kernels (ops/pallas/compact.py):
    only 3-8% of bounce lanes are textured in practice, and TPU gathers
    are count-bound, so gathering cap indices per 128-lane row (with a
    dense fallback if any row exceeds cap) cuts the fetch ~2.7x."""
    if not show_texture:
        return mv["color"]
    texid = mv["texid"]
    textured = texid >= 0
    if sparse_cap:
        import jax

        from ptdn_tpu.ops.pallas.compact import sparse_gather

        tid = jnp.maximum(texid, 0)
        wh = ds.tex_wh[tid]
        w = wh[..., 0].astype(jnp.float32)
        h = wh[..., 1].astype(jnp.float32)
        x = jnp.minimum(w * uv[..., 0], w - 1.0).astype(jnp.int32)
        y = jnp.minimum(h * (1.0 - uv[..., 1]), h - 1.0).astype(jnp.int32)
        hm, wm = ds.tex_atlas.shape[1], ds.tex_atlas.shape[2]
        x = jnp.clip(x, 0, wm - 1)
        y = jnp.clip(y, 0, hm - 1)
        flat = jnp.where(textured, tid * (hm * wm) + y * wm + x, -1)
        packed = sparse_gather(
            jax.lax.bitcast_convert_type(ds.tex_flat_u32, jnp.int32),
            flat.reshape(-1, 128), sparse_cap,
            interpret=(_pallas_interpret() if interpret is None
                       else interpret)).reshape(flat.shape)
        rgb = jnp.stack([packed & 0xFF, (packed >> 8) & 0xFF,
                         (packed >> 16) & 0xFF], axis=-1)
        tex = rgb.astype(jnp.float32) * COLORDIVIDOR
        return jnp.where(textured[..., None], tex, mv["color"])
    uv0 = jnp.where(textured[..., None], uv, 0.0)
    tex = sample_texture(ds, jnp.maximum(texid, 0), uv0)
    return jnp.where(textured[..., None], tex, mv["color"])


_PALLAS_INTERPRET_OVERRIDE = None


def set_pallas_interpret(value):
    """Force (True/False) or restore auto-detection (None) of Pallas
    interpret mode. Used by the multi-chip builder when the mesh runs on
    virtual CPU devices while the process default backend is a TPU."""
    global _PALLAS_INTERPRET_OVERRIDE
    _PALLAS_INTERPRET_OVERRIDE = value


def _pallas_interpret() -> bool:
    """Run Pallas kernels interpreted when the default device is CPU
    (the virtual-device test path)."""
    import jax

    if _PALLAS_INTERPRET_OVERRIDE is not None:
        return _PALLAS_INTERPRET_OVERRIDE
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform == "cpu"
    return jax.default_backend() == "cpu"


def _mesh_mode(scene, cfg) -> str:
    if scene.n_tris == 0:
        return "none"
    if cfg.backend == "pallas":
        return "pallas"
    if cfg.mesh_mode == "brute":
        return "brute"
    if cfg.mesh_mode == "bvh" or not cfg.use_bvh:
        return "bvh" if cfg.use_bvh else "brute"
    return "brute" if scene.n_tris <= BRUTE_FORCE_MAX_TRIS else "bvh"


def make_intersector(scene, cfg, interpret=None):
    """Build the scene-specialized closest-hit function.

    Returns intersect(ds, o, d) -> dict(t, point-less; normal, uv, mat_id,
    geom_id, hit). Geom order and strict-< updates reproduce
    computeIntersection's first-wins tie-breaking (pathtrace.cu:230-265).
    """
    geom_types = scene.geom_types
    geom_mats = scene.geom_material_ids
    mode = _mesh_mode(scene, cfg)
    n_tris = scene.n_tris
    max_prims = max(int(scene.bvh.prim_count.max()), 1) if n_tris else 1
    has_mesh = any(t == MESH for t in geom_types)

    if cfg.backend == "pallas":
        return _make_pallas_intersector(scene, cfg, interpret=interpret)

    def intersect(ds, o, d) -> Dict[str, jnp.ndarray]:
        n = o.shape[0]
        best_t = jnp.full(n, FLT_MAX)
        best_geom = jnp.full(n, -1, jnp.int32)
        best_normal = jnp.zeros((n, 3))
        best_uv = jnp.zeros((n, 2))

        if has_mesh and mode != "none":
            if mode == "brute":
                mt, mu, mv, mi, mh = mesh_brute_force(ds, o, d, n_tris)
            else:
                mt, mu, mv, mi, mh = mesh_bvh_batched(ds, o, d,
                                                      max_prims=max_prims)
            m_normal, m_uv, m_geom, _ = mesh_closest_hit_attrs(
                ds, o, d, mt, mu, mv, mi, mh, compat=cfg.compat)

        for gi, gtype in enumerate(geom_types):
            if gtype == CUBE:
                t, _, nrm, _, _ = box_intersect(
                    ds.geom_transform[gi], ds.geom_inverse[gi], o, d)
                uv = None
            elif gtype == SPHERE:
                t, _, nrm, _, _ = sphere_intersect(
                    ds.geom_transform[gi], ds.geom_inverse[gi],
                    ds.geom_inv_transpose[gi], o, d)
                uv = None
            else:  # MESH: global closest hit, owned-geom filter
                t = jnp.where(m_geom == gi, mt, -1.0)
                nrm = m_normal
                uv = m_uv
            better = (t > 0.0) & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_geom = jnp.where(better, gi, best_geom)
            best_normal = jnp.where(better[..., None], nrm, best_normal)
            if uv is not None:
                best_uv = jnp.where(better[..., None], uv, best_uv)

        hit = best_geom >= 0
        # static geom->material table baked into the program
        mat_table = jnp.asarray(np.asarray(geom_mats, np.int32))
        mat_id = jnp.where(hit, mat_table[jnp.maximum(best_geom, 0)], 0)
        return {
            "t": jnp.where(hit, best_t, -1.0),
            "normal": best_normal,
            "uv": best_uv,
            "mat_id": mat_id,
            "geom_id": best_geom,
            "hit": hit,
        }

    return intersect


def _make_pallas_intersector(scene, cfg, interpret=None):
    """One-launch fully-resolved Pallas scene kernel: analytic + mesh +
    attribute resolution + exact glm refine + merge all happen in-kernel
    (scene_intersect_full_pallas), so there is no XLA gather/one-hot
    glue per pass (~1.4 ms/bounce saved at 800x800 on v5e)."""
    from ptdn_tpu.ops.pallas.scene_intersect import (
        scene_intersect_full_pallas)

    geom_types = scene.geom_types
    geom_mats = scene.geom_material_ids
    n_tris = scene.n_tris
    interp = _pallas_interpret() if interpret is None else interpret

    def intersect(ds, o, d) -> Dict[str, jnp.ndarray]:
        return scene_intersect_full_pallas(ds, geom_types, geom_mats, o, d,
                                           n_tris, compat=cfg.compat,
                                           interpret=interp)

    return intersect


def make_intersector_tex(scene, cfg, cap: int, interpret=None):
    """Pallas closest hit with fused texel-index compaction: one launch
    returns the isect dict AND per-row compacted texel indices for the
    sparse albedo gather (no separate compact kernel, no XLA index
    math). Only valid on the pallas backend with N % 1024 == 0."""
    from ptdn_tpu.ops.pallas.scene_intersect import (
        scene_intersect_full_tex_pallas)

    geom_types = scene.geom_types
    geom_mats = scene.geom_material_ids
    n_tris = scene.n_tris
    mat_texids = tuple(m.texid for m in scene.materials)
    tex_whs = tuple((t.shape[1], t.shape[0]) for t in scene.textures)
    interp = _pallas_interpret() if interpret is None else interpret

    def intersect_tex(ds, o, d):
        return scene_intersect_full_tex_pallas(
            ds, geom_types, geom_mats, o, d, n_tris, mat_texids, tex_whs,
            cap, compat=cfg.compat, interpret=interp)

    return intersect_tex


def albedo_from_comp(ds, mv, comp4, cap: int, interpret=None):
    """Albedo via pre-compacted texel indices from the intersect kernel
    (make_intersector_tex). comp4 = (tidx, cidx, slot, count), each
    (R, 128) i32. Matches albedo_from(..., sparse_cap=cap) exactly."""
    import jax

    from ptdn_tpu.ops.pallas.compact import gather_compacted

    tidx, cidx, slot, count = comp4
    packed = gather_compacted(
        jax.lax.bitcast_convert_type(ds.tex_flat_u32, jnp.int32),
        cidx, slot, count, cap, idx_fallback=tidx,
        interpret=(_pallas_interpret() if interpret is None
                   else interpret))
    n = tidx.shape[0] * 128
    packed = packed.reshape(n)
    rgb = jnp.stack([packed & 0xFF, (packed >> 8) & 0xFF,
                     (packed >> 16) & 0xFF], axis=-1)
    tex = rgb.astype(jnp.float32) * COLORDIVIDOR
    textured = (slot.reshape(n) >= 0) | (tidx.reshape(n) >= 0)
    return jnp.where(textured[..., None], tex, mv["color"])


def packed_texel_gather(ds, sl, cv, cn, interpret: bool, rrows: int = 8):
    """Gather texels for tile-compacted indices: sl/cv/cn each
    (dm1, NB, 128) i32 from a kernel's tile_route emission (per
    rrows*128-lane tile, cv holds the tile's valid texel indices packed
    row-major in its first cn lanes; sl is each lane's slot, -1 if
    untextured). Pays only ceil(k/128) gathered rows per tile with a
    static-size ladder on the global row total. `rrows` must match the
    emitting kernel's block rows. Returns per-lane packed u32 texels as
    i32 (garbage where sl < 0)."""
    import jax

    from ptdn_tpu.ops.pallas.path import uncompact_tiles_pallas

    dm1, nb = sl.shape[0], sl.shape[1]
    nblk = nb // rrows
    tt = dm1 * nblk
    k = cn.reshape(dm1, nblk, rrows, 128)[:, :, 0, 0].reshape(tt)
    rows_used = jax.lax.shift_right_logical(k + 127, 7)
    cum_incl = jnp.cumsum(rows_used)
    cum_ex = cum_incl - rows_used
    s_total = cum_incl[-1]
    cv_rows = cv.reshape(tt * rrows, 128)
    table = jax.lax.bitcast_convert_type(ds.tex_flat_u32, jnp.int32)
    tmax = table.shape[0]

    def build(cap_rows):
        def f(_):
            j = jnp.arange(cap_rows)
            t_j = jnp.minimum(
                jnp.searchsorted(cum_incl, j, side="right"), tt - 1)
            r_j = jnp.clip(j - cum_ex[t_j], 0, rrows - 1)
            rows = jnp.take(cv_rows, t_j * rrows + r_j, axis=0)
            tex = jnp.take(
                table,
                jnp.clip(rows, 0, tmax - 1).reshape(-1)
            ).reshape(cap_rows, 128)
            texp = jnp.pad(tex, ((0, rrows), (0, 0)))
            w_idx = jnp.minimum(
                cum_ex[:, None] + jnp.arange(rrows)[None, :],
                cap_rows + rrows - 1)
            win = jnp.take(texp, w_idx.reshape(-1), axis=0)
            return win.reshape(dm1, nb, 128)
        return f

    # fine rungs: the gather cost is strongly superlinear past ~2k rows
    # (0.85 ms at 2048, 3.3 at 3072, 5.6 at 4096 — benchmarks, v5e), so
    # overshooting the frame's actual row count by a whole power of two
    # wastes milliseconds; 256-row spacing near the common range keeps
    # the overshoot small
    ladder = [c for c in (1024, 1536, 2048, 2304, 2560, 2816, 3072,
                          3584, 4096, 5120, 6144, 8192, 12288, 16384)
              if c < tt * rrows]
    ladder.append(tt * rrows)
    out = build(ladder[-1])
    for c in reversed(ladder[:-1]):
        out = (lambda nxt, c: lambda _: jax.lax.cond(
            s_total <= c, build(c), nxt, None))(out, c)
    win = out(None)
    return uncompact_tiles_pallas(win, sl, rrows=rrows,
                                  interpret=interpret)


def albedo_from_tilepack(ds, mv, comp3, interpret: bool):
    """Albedo via tile-wide compacted texel indices (comp3 = (slot,
    cvals, count), each (NB, 128) i32, from the trace kernel). Unlike
    the per-row-cap sparse path (albedo_from), this cannot overflow:
    sorted-wavefront order clusters textured lanes into dense rows that
    blow any per-row cap and forced the dense fallback every bounce."""
    from ptdn_tpu.ops.pallas.bounce import trace_rows
    sl, cv, cn = comp3
    # must match the emitting trace kernel's block height (same nb ->
    # same auto-selection)
    rows = trace_rows(sl.shape[0])
    if sl.shape[0] % rows:
        rows = 8
    packed = packed_texel_gather(ds, sl[None], cv[None], cn[None],
                                 interpret, rrows=rows)[0]
    nb = sl.shape[0]
    n = nb * 128
    packed = packed.reshape(n)
    rgb = jnp.stack([packed & 0xFF, (packed >> 8) & 0xFF,
                     (packed >> 16) & 0xFF], axis=-1)
    tex = rgb.astype(jnp.float32) * COLORDIVIDOR
    textured = sl.reshape(n) >= 0
    return jnp.where(textured[..., None], tex, mv["color"])


def deferred_radiance(ds, contrib, tex_comp, depth: int, cap: int,
                      interpret: bool):
    """Reconstruct radiance from the whole-path kernel's per-depth
    contributions (ops/pallas/path.py): ONE globally-packed texel gather
    covering every depth, then a cumulative-ratio loop.

    contrib: (6*depth, NB, 128) f32; tex_comp: None or (slot, cvals,
    count) each (depth-1, NB, 128) i32 (tile-compacted texel indices,
    see path_trace_fused_pallas). Returns radiance (N, 3).

    The gather is COUNT-bound (~140 M idx/s scalar loop on v5e), so the
    packing matters: per 1024-lane tile only ceil(k/128) gathered rows
    are paid (k = the tile's textured-lane count, ~56 avg on cornell vs
    a 128-lane-per-row dense fetch), with a static-size ladder on the
    global row total. Cornell depth-8: ~227K real texels -> ~4000 rows
    ~= 512K gathered indices, vs 4.5M dense."""
    nb = contrib.shape[1]
    n = nb * 128

    if tex_comp is not None:
        sl, cv, cn = tex_comp
        from ptdn_tpu.ops.pallas.path import block_rows
        packed = packed_texel_gather(
            ds, sl, cv, cn, interpret,
            rrows=block_rows(int(ds.tri_chunk_min.shape[0]) // 5))
        tex_on = sl >= 0
        ratio = [jnp.where(tex_on,
                           ((packed >> (8 * c)) & 0xFF).astype(jnp.float32)
                           * COLORDIVIDOR, 1.0)
                 for c in range(3)]

    cum = [jnp.ones((nb, 128), jnp.float32) for _ in range(3)]
    rad = [jnp.zeros((nb, 128), jnp.float32) for _ in range(3)]
    for d in range(1, depth + 1):
        base = 6 * (d - 1)
        for c in range(3):
            rad[c] = rad[c] + contrib[base + c] * cum[c]
        # depth-1 albedo is the exact primary albedo (in-kernel); the
        # deferred ratio stream starts at depth 2
        if d >= 2 and tex_comp is not None:
            for c in range(3):
                cum[c] = cum[c] * ratio[c][d - 2]
        for c in range(3):
            rad[c] = rad[c] + contrib[base + 3 + c] * cum[c]
    return jnp.stack([r.reshape(n) for r in rad], axis=-1)


def make_light_visibility(scene, cfg, light_geom: int = 0, interpret=None):
    """Shadow-ray visibility of geom `light_geom` — the only thing the
    NEE block consumes (pathtrace.cu:374): did the closest hit land on the
    light geom? Skips all attribute resolution (a ~2x lighter pass).

    Requires the light geom to be analytic (true in every shipped scene:
    OBJECT 0 is the ceiling cube). Falls back to the full intersector
    otherwise or on the XLA backend.
    """
    geom_types = scene.geom_types
    if cfg.backend != "pallas" or geom_types[light_geom] == MESH:
        intersect = make_intersector(scene, cfg, interpret=interpret)

        def visible(ds, o, d):
            sh = intersect(ds, o, d)
            return sh["geom_id"] == light_geom

        return visible

    from ptdn_tpu.ops.pallas.scene_intersect import light_visibility_pallas

    n_tris = scene.n_tris
    interp = _pallas_interpret() if interpret is None else interpret

    def visible(ds, o, d):
        return light_visibility_pallas(ds, geom_types, o, d, n_tris,
                                       light_geom=light_geom,
                                       interpret=interp)

    return visible


def first_chunk_plane(ds, ox_, oy_, oz_, dx_, dy_, dz_, n_chunks_static):
    """Nearest triangle-chunk AABB crossed by each lane's ray
    (unbounded window), n_chunks if none — the measured-best
    coherence key: geometric proxies (morton cell, direction
    octant) leave tiles touching most chunks, while grouping by
    the chunk a ray actually enters makes tiles chunk-pure
    (52 -> 21 ms on the synthetic bunny probe)."""
    inx = 1.0 / dx_
    iny = 1.0 / dy_
    inz = 1.0 / dz_
    best_t = jnp.full(ox_.shape, jnp.inf, jnp.float32)
    best_c = jnp.full(ox_.shape, n_chunks_static, jnp.int32)
    cmin = ds.tri_chunk_min
    cmax = ds.tri_chunk_max
    for c in range(n_chunks_static):
        t0x = (cmin[c, 0] - ox_) * inx
        t1x = (cmax[c, 0] - ox_) * inx
        t0y = (cmin[c, 1] - oy_) * iny
        t1y = (cmax[c, 1] - oy_) * iny
        t0z = (cmin[c, 2] - oz_) * inz
        t1z = (cmax[c, 2] - oz_) * inz
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.minimum(t0z, t1z))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                       jnp.maximum(t0y, t1y)),
                           jnp.maximum(t0z, t1z))
        better = (tmax >= 0.0) & (tmin <= tmax) & (tmin < best_t)
        best_t = jnp.where(better, tmin, best_t)
        best_c = jnp.where(better, c, best_c)
    return best_c


def chunk_range_planes(ds, ox_, oy_, oz_, dx_, dy_, dz_, n_chunks_static,
                       t_limit=None):
    """Per-lane [min, max] chunk ID bounding ALL chunk AABBs the ray
    crosses (unbounded t-window, so a superset of any later window) —
    (n_chunks, -1) for rays crossing none. The trace kernels scan only
    the tile's union range [min(lo), max(hi)] instead of every chunk: a
    chunk outside a lane's crossed set can never produce a hit for it,
    so a chunk outside the union produces none for the whole tile
    (exactness; the in-kernel per-lane window culls stay as-is). Chunks
    are BVH-leaf-DFS ordered, so crossed IDs of a coherent ray cluster
    into a short range; with lanes sorted by this pair the per-tile
    union stays a handful of chunks (measured: the 39-chunk bunny scan
    drops to ~2-4 trips).

    Past 64 chunks the per-chunk test runs at SUPERGROUP granularity
    instead (union AABBs of G consecutive chunks, G adaptive =
    max(2, ceil(n/64)) or env PTDN_SUPER_G, rounded to [slo*G,
    shi*G+G-1]): crossed(chunk) implies crossed(its supergroup), so the
    returned range is still an exact superset, while both the unrolled
    XLA graph (233 chunks x 2 calls x 8 bounces wedged the terrain30k
    compile) and the per-frame slab work drop ~Gx."""
    inx = 1.0 / dx_
    iny = 1.0 / dy_
    inz = 1.0 / dz_
    cmin = ds.tri_chunk_min
    cmax = ds.tri_chunk_max

    def slab_ranges(bmin, bmax, count, sentinel):
        lo = jnp.full(ox_.shape, sentinel, jnp.int32)
        hi = jnp.full(ox_.shape, -1, jnp.int32)
        for c in range(count):
            t0x = (bmin[c, 0] - ox_) * inx
            t1x = (bmax[c, 0] - ox_) * inx
            t0y = (bmin[c, 1] - oy_) * iny
            t1y = (bmax[c, 1] - oy_) * iny
            t0z = (bmin[c, 2] - oz_) * inz
            t1z = (bmax[c, 2] - oz_) * inz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                           jnp.minimum(t0y, t1y)),
                               jnp.minimum(t0z, t1z))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                           jnp.maximum(t0y, t1y)),
                               jnp.maximum(t0z, t1z))
            crossed = (tmax >= 0.0) & (tmin <= tmax)
            if t_limit is not None:
                # a box entered beyond t_limit can't matter (shadow
                # rays: occlusion needs t < distance-to-light-sample
                # <= t_limit)
                crossed = crossed & (tmin <= t_limit)
            lo = jnp.where(crossed & (lo == sentinel), c, lo)
            hi = jnp.where(crossed, c, hi)
        return lo, hi

    if n_chunks_static <= 64:
        return slab_ranges(cmin, cmax, n_chunks_static, n_chunks_static)

    # supergroup granularity: small G = tighter ranges (less
    # rounding: returned ranges widen by up to 2(G-1) chunks) at more
    # unrolled slab work; keep the unrolled count near the 64-chunk
    # budget that compiles safely (233 fully-unrolled wedged terrain)
    G = int(os.environ.get("PTDN_SUPER_G", 0) or
            max(2, -(-n_chunks_static // 64)))
    n_super = -(-n_chunks_static // G)
    cm = cmin[:n_chunks_static]
    cM = cmax[:n_chunks_static]
    pad = n_super * G - n_chunks_static
    if pad:
        # empty AABBs (min > max) cross nothing
        cm = jnp.concatenate([cm, jnp.full((pad, 3), jnp.inf)], axis=0)
        cM = jnp.concatenate([cM, jnp.full((pad, 3), -jnp.inf)], axis=0)
    smin = cm.reshape(n_super, G, 3).min(axis=1)
    smax = cM.reshape(n_super, G, 3).max(axis=1)
    slo, shi = slab_ranges(smin, smax, n_super, n_super)
    lo = jnp.minimum(slo * G, n_chunks_static)
    hi = jnp.where(shi < 0, -1,
                   jnp.minimum(shi * G + (G - 1), n_chunks_static - 1))
    return lo, hi


# sub-batch threshold for the coherence permute (bytes of gathered
# table per batch); module-level so tests can force the batched path,
# env-overridable in bytes for A/B (a huge value disables batching)
_GATHER_CLIFF = int(os.environ.get("PTDN_GATHER_CLIFF", 0) or
                    100 * 1024 * 1024)

# coherence-sort key strategy (see permute_by_key); morton measured
# best on every scene (round 4)
SORT_KEY = os.environ.get("PTDN_SORT_KEY", "morton")

# set at trace time by permute_by_key: number of contiguous row
# batches the last-built permute used (tests assert the multi-batch
# path is actually exercised)
_LAST_PERMUTE_SPANS = None


def ranges_and_key(ds, sh, pix, n, nb, n_chunks_static, do_vis,
                   light_pos=None, light_radius=None):
    """Crossed-chunk-ID range planes + coherence sort key for the
    post-shade wavefront. Returns (allp, key): `allp` = the shade
    planes with (nlo, nhi, slo, shi, pix) appended — the layout the
    trace kernel consumes — and `key` the per-lane sort key (see
    permute_by_key for the strategy). Split out so skip-sort bounces
    (cfg.sort_every > 1) can carry fresh ranges without paying the
    count-bound permute gather."""
    from ptdn_tpu.ops.pallas import shade as SH

    ncp1 = n_chunks_static + 1
    nlo, nhi = chunk_range_planes(ds, sh[SH.O_SPX], sh[SH.O_SPY],
                                  sh[SH.O_SPZ], sh[SH.O_DX], sh[SH.O_DY],
                                  sh[SH.O_DZ], n_chunks_static)
    if light_pos is not None:
        # occlusion needs a mesh hit CLOSER than the shadow ray's hit on
        # the light geom itself; that hit is within the light's world
        # AABB, so chunks entered beyond |sp - center| + AABB half-
        # diagonal can never occlude (light_radius only spreads samples
        # WITHIN the light, the AABB bound covers it)
        s_limit = jnp.sqrt((light_pos[0] - sh[SH.O_SPX]) ** 2
                           + (light_pos[1] - sh[SH.O_SPY]) ** 2
                           + (light_pos[2] - sh[SH.O_SPZ]) ** 2)
        s_limit = s_limit + light_radius
    else:
        s_limit = None
    slo, shi = chunk_range_planes(ds, sh[SH.O_SPX], sh[SH.O_SPY],
                                  sh[SH.O_SPZ], sh[SH.O_SDX],
                                  sh[SH.O_SDY], sh[SH.O_SDZ],
                                  n_chunks_static, t_limit=s_limit)
    # non-NEE lanes carry garbage shadow dirs; give them the empty
    # range so they neither split the buckets nor widen tile unions
    is_nee = sh[SH.O_NEE] > 0.5
    slo = jnp.where(is_nee, slo, n_chunks_static)
    shi = jnp.where(is_nee, shi, -1)
    # dead lanes likewise (their spawn/dir planes are garbage)
    alive = sh[SH.O_ACT] > 0.5
    nlo = jnp.where(alive, nlo, n_chunks_static)
    nhi = jnp.where(alive, nhi, -1)
    slo = jnp.where(alive, slo, n_chunks_static)
    shi = jnp.where(alive, shi, -1)
    # Sort-key strategy (PTDN_SORT_KEY): one permutation serves BOTH
    # the next rays and the shadow rays, and their crossed ranges
    # decorrelate (diag_ranges, room 1080p depth-3: next-first keying
    # gives next tile-unions mean 6.4 but shadow 17.2/22 — vis then
    # pays 2.4x the chunk visits of closest hit).
    #   "morton" — bit-interleave of (nlo, slo) then (nhi, shi):
    #              balances both unions. Round-4 A/B: bunny 125.1 /
    #              room 89.8 / diamond 66.5 / room-1080p 595.8 vs
    #              next-key 131.6 / 103.2 / 68.0 / 657.0 — DEFAULT.
    #   "next"   — (nlo, nhi, slo): the historical key
    #   "shadow" — (slo, shi, nlo): shadow-first (measured worse
    #              everywhere: 134.5 / 129.4 / 70.4 / 803.8)
    if do_vis and SORT_KEY != "next":
        if SORT_KEY == "shadow":
            key = (slo * ncp1 + jnp.maximum(shi, 0)) * ncp1 + nlo
        else:
            def to7(x):
                # monotone squeeze into 7 bits (chunk IDs can reach 233
                # on terrain30k; clamping would fold the top half of
                # the scene into one bucket)
                if n_chunks_static > 127:
                    x = x * 127 // n_chunks_static
                return jnp.clip(x, 0, 127)

            def interleave(a, b):
                a = to7(a)
                b = to7(b)
                m = jnp.int32(0)
                for bit in range(7):
                    m = m | (((a >> bit) & 1) << (2 * bit + 1))
                    m = m | (((b >> bit) & 1) << (2 * bit))
                return m
            key = (interleave(nlo, slo) * jnp.int32(16384)
                   + interleave(jnp.maximum(nhi, 0),
                                jnp.maximum(shi, 0)))
    else:
        key = nlo * ncp1 + jnp.maximum(nhi, 0)
        if do_vis:
            key = key * ncp1 + slo
    key = jnp.where(alive, key, jnp.int32(1 << 30))
    allp = jnp.concatenate(
        [sh, nlo[None].astype(jnp.float32),
         nhi[None].astype(jnp.float32),
         slo[None].astype(jnp.float32),
         shi[None].astype(jnp.float32), pix[None]], axis=0)
    return allp, key.reshape(n)


def permute_by_key(ds, sh, pix, n, nb, n_chunks_static, do_vis,
                   light_pos=None, light_radius=None, group=1):
    """Reorder lanes (all planes together, ONE packed row gather
    — scatters cost ~10x on v5e) by the crossed-chunk-ID ranges of
    the next ray and the shadow ray, so each 1024-lane tile's union
    range [min(lo), max(hi)] — the trace kernel's chunk-loop trip
    count — stays a handful of chunks. Dead lanes key past every
    live bucket so whole tiles go idle. Returns the permuted
    (shade planes + nlo + nhi + slo + shi, pix) — the range planes
    ride along so the trace kernel can bound its chunk loops.

    `group` (G): sort/gather at G-LANE granularity. The row gather is
    COUNT-bound (~100 M rows/s regardless of width up to ~500 B,
    benchmarks/micro_permute.py: 29-plane gather 7.1 ms at G=1 vs
    2.7 ms at G=4 for 640 k lanes), so moving G lanes per gathered row
    cuts the permute cost ~G-fold. Placement granularity coarsens:
    groups are lanes already adjacent after the PREVIOUS bounce's sort
    (camera-adjacent at bounce 1), and the group sort key is the min
    over the group's lane keys, so tile chunk-unions stay tight; the
    per-lane range planes ride along, so in-kernel culling stays
    per-lane exact regardless of G."""
    allp, key = ranges_and_key(ds, sh, pix, n, nb, n_chunks_static,
                               do_vis, light_pos=light_pos,
                               light_radius=light_radius)
    out = permute_planes(allp, key, n, nb, group=group)
    return out[:-1], out[-1]


def permute_planes(allp, key, n, nb, group=1, regroup=0, interpret=False):
    """The permute machinery behind permute_by_key: stable sort of
    `key`, active-prefix ladder, sub-batching past the gather cliff.
    Takes/returns the full appended-plane stack (last plane = pix).

    `regroup` (G > 1): FRESH-GROUP mode — an in-row (128-lane) argsort
    of the key brings similar-key lanes adjacent inside each row (a
    free vreg-local permute, ops/pallas/inrow.py), then the global
    sort/gather runs at G-lane group granularity: ~G-fold cheaper
    (the gather is ~1 row/clock regardless of width;
    benchmarks/micro_regroup.py: 2.87 vs 7.00 ms at bunny scale,
    G=4). Unlike `group` (which inherits adjacency from the PREVIOUS
    bounce's sort and decorrelates — the round-4 negative), groups
    here are key-coherent by construction every bounce."""
    import jax

    if regroup and int(regroup) > 1:
        G = int(regroup)
        if 128 % G:
            raise ValueError(f"regroup {G} must divide 128")
        from ptdn_tpu.ops.pallas.inrow import inrow_permute_pallas

        key2d = key.reshape(nb, 128)
        iota_l = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32),
                                  (nb, 128))
        key_s, order = jax.lax.sort_key_val(key2d, iota_l)
        allp = inrow_permute_pallas(allp, order, interpret=interpret)
        key = key_s.reshape(n)
        # dead-tail invariant holds: all-sentinel rows sort to identity
        # (stable, equal keys), sentinel groups keep their global slot
        return _permute_body(allp, key, n, nb, G)
    G = int(group) if group else 1
    if G > 1 and 128 % G:
        raise ValueError(f"sort group {G} must divide 128")
    return _permute_body(allp, key, n, nb, G)


def _permute_body(allp, key, n, nb, G):
    import jax

    k_pl = allp.shape[0]

    # Sub-batching: past ~110 MB of gathered table the XLA row gather
    # falls off a bandwidth cliff (benchmarks/micro_sort.py — the
    # 8-wide column-group fallback still cost 43.5 ms/bounce at 1080p,
    # benchmarks/micro_permute.py L1). Splitting the wavefront into
    # independently-sorted contiguous row batches keeps each batch's
    # table below the cliff, so every gather runs at the fast
    # (~100 M rows/s) rate. Each batch sorts only its own lanes: tiles
    # stay batch-local, so trace-kernel coherence is unchanged except
    # for at most n_batch-1 extra partially-mixed bucket-boundary tiles
    # per bucket; the per-batch stable sort preserves the dead-tail
    # ladder invariant within each batch.
    # G>1 grouped gathers stay fast above the cliff (micro_permute
    # L3-G4: 10.06 ms single gather on the 241 MB 1080p table) — only
    # per-lane gathers need the batch split
    n_batch = (max(1, -(-(k_pl * n * 4) // _GATHER_CLIFF)) if G == 1
               else 1)
    rb = -(-(-(-nb // n_batch)) // 32) * 32   # rows/batch, 32-row mult
    spans = []
    r0 = 0
    while r0 < nb:
        spans.append((r0, min(r0 + rb, nb)))
        r0 += rb
    global _LAST_PERMUTE_SPANS   # trace-time introspection for tests
    _LAST_PERMUTE_SPANS = len(spans)

    def one_batch(allp_b, key_b, nb_b):
        nB = nb_b * 128
        ngB = nB // G
        # group key: min over the G lanes (all-dead groups keep the
        # sentinel, preserving the stable dead-tail invariant below)
        keyg = key_b.reshape(ngB, G).min(axis=1) if G > 1 else key_b

        # Active-prefix ladder: the row gather is COUNT-bound (~1 row
        # per clock on v5e regardless of width), so both the SORT and
        # the gather run only over the non-identity prefix: dead lanes
        # share the sentinel key, the sort is STABLE, and each bounce's
        # sort leaves its dead tail in place — so once a lane reaches
        # the tail, every later sort maps it to itself and its planes
        # can be copied with a static slice instead of gathered. The
        # prefix bound is the last ACTIVE position in the current
        # order, `act_hi`, computable BEFORE sorting: every position
        # >= act_hi holds a sentinel lane whose stable output slot is
        # n_act + (#dead before it) = its own position, so sorting the
        # [0, rung) slice alone reproduces the full sort exactly.
        iota_g = jnp.arange(ngB, dtype=jnp.int32)
        act_hi = jnp.max(jnp.where(keyg != jnp.int32(1 << 30),
                                   iota_g, -1)) + 1

        rowsT = allp_b.reshape(k_pl, nB).T.reshape(ngB, G * k_pl)

        def permute_prefix(rows_pref):
            """Sort + gather positions [0, rows_pref*128); copy the tail."""
            npref = rows_pref * 128

            def go(_):
                keyp = jax.lax.slice(keyg, (0,), (npref // G,))
                opref = jax.lax.sort_key_val(
                    keyp, jnp.arange(npref // G, dtype=jnp.int32))[1]
                if G == 1 and k_pl * npref * 4 > 110 * 1024 * 1024:
                    # above the ~110 MB gather cliff (only reachable
                    # when a single batch already exceeds it): 8-wide
                    # column groups (benchmarks/micro_sort.py)
                    outs = []
                    for lo in range(0, k_pl, 8):
                        hi = min(lo + 8, k_pl)
                        rows = allp_b[lo:hi].reshape(hi - lo, nB).T[opref]
                        outs.append(rows.T.reshape(hi - lo,
                                                   npref // 128, 128))
                    pref = jnp.concatenate(outs, axis=0)
                else:
                    rows = rowsT[opref].reshape(npref, k_pl)
                    pref = rows.T.reshape(k_pl, npref // 128, 128)
                if npref == nB:
                    return pref
                tail = jax.lax.slice(allp_b, (0, npref // 128, 0),
                                     (k_pl, nb_b, 128))
                return jnp.concatenate([pref, tail], axis=1)
            return go

        rungs = [r for r in (nb_b // 8, nb_b // 4, nb_b * 3 // 8,
                             nb_b // 2, nb_b * 5 // 8, nb_b * 3 // 4,
                             nb_b * 7 // 8) if 0 < r < nb_b]
        out = permute_prefix(nb_b)
        for r in reversed(rungs):
            out = (lambda nxt, r: lambda _: jax.lax.cond(
                act_hi * G <= r * 128, permute_prefix(r), nxt,
                None))(out, r)
        return out(None)

    if len(spans) == 1:
        allp = one_batch(allp, key, nb)
    else:
        parts = []
        for (r0, r1) in spans:
            allp_b = jax.lax.slice(allp, (0, r0, 0), (k_pl, r1, 128))
            key_b = jax.lax.slice(key, (r0 * 128,), (r1 * 128,))
            parts.append(one_batch(allp_b, key_b, r1 - r0))
        allp = jnp.concatenate(parts, axis=1)
    return allp


def _static_mats(scene):
    """Per-material constants baked into the shade kernel."""
    ms = scene.materials
    return {
        "emit": tuple(float(m.emittance) for m in ms),
        "refl": tuple(float(m.has_reflective) for m in ms),
        "refr": tuple(float(m.has_refractive) for m in ms),
        "ior": tuple(float(m.index_of_refraction) for m in ms),
        "spec_r": tuple(float(m.specular_color[0]) for m in ms),
        "spec_g": tuple(float(m.specular_color[1]) for m in ms),
        "spec_b": tuple(float(m.specular_color[2]) for m in ms),
        "col_r": tuple(float(m.color[0]) for m in ms),
        "col_g": tuple(float(m.color[1]) for m in ms),
        "col_b": tuple(float(m.color[2]) for m in ms),
    }


def make_trace_fn(scene, cfg, resolution, full_height=None, interpret=None):
    """Build trace(ds, cam, params, frame_u32) -> (radiance (N,3), gbuffer).

    `radiance` is the raw 1-spp estimate (accumulation-over-frames happens
    in the frame step, pathtrace.cu:395-399). The static config baked in:
    trace_depth, shadow_ray, reduce_var, sep_color x denoise, mesh mode.

    `interpret`: Pallas interpret mode, captured ONCE at build time
    (None = auto-detect from the default device). The multi-chip builder
    passes True for virtual-CPU meshes so no process-global state is
    mutated (ADVICE r1).
    """
    from ptdn_tpu.ops.camera import generate_camera_rays

    interp = _pallas_interpret() if interpret is None else interpret
    intersect = make_intersector(scene, cfg, interpret=interp)
    read_mat = make_mat_reader(cfg)
    w, h = resolution
    n = w * h
    n_real = n
    # pallas plane kernels need 1024-aligned lane counts; pad the ray
    # batch and slice results at return (odd resolutions like 600x600
    # previously fell back to the slow XLA bounce path, and multi-chip
    # row shards are rarely aligned)
    # the whole-path kernel runs 32-row (4096-lane) blocks; every other
    # plane kernel uses 8-row blocks, for which 4096 alignment also holds
    from ptdn_tpu.ops.pallas.path import RROWS as _PATH_RROWS
    lane_pad = (-n) % (_PATH_RROWS * 128) if cfg.backend == "pallas" else 0
    n = n + lane_pad
    light_geom = 0   # reference hardcodes geoms[0] (pathtrace.cu:360-361)
    light_visible = make_light_visibility(scene, cfg, light_geom,
                                          interpret=interp)
    # the shadow-hit material is geom 0's material — static
    # (pathtrace.cu:374-383: the contribution only reads its emittance/color)
    light_mat = scene.materials[scene.geom_material_ids[light_geom]]
    light_emissive = float(light_mat.emittance) > 0.0
    light_emit_color = np.asarray(light_mat.color, np.float32) * np.float32(
        light_mat.emittance)
    light_analytic = scene.geom_types[light_geom] != MESH
    # fully-fused bounce kernel: needs the NEE visibility target to be
    # analytic (true in every shipped scene — OBJECT 0 is a cube light)
    do_vis = cfg.shadow_ray and light_analytic and light_emissive
    use_fused = cfg.fuse_bounce and ((not cfg.shadow_ray) or light_analytic)
    # per-bounce coherence sorting (mesh scenes): reorder lanes by a
    # morton key of the next interaction position between bounces so
    # each 1024-lane tile touches few triangle chunks and the kernels'
    # per-chunk tile culls fire. Per-lane math is placement-independent
    # and RNG follows a carried pixel-id plane, so results match the
    # unsorted path to ~1 ulp (XLA fuses the two programs differently).
    # Needs the fused bounce kernel.
    n_chunks_static = -(-scene.n_tris // 128) if scene.n_tris else 0
    use_sort = (cfg.sort_rays if cfg.sort_rays is not None
                else n_chunks_static > 4)
    use_sort = bool(use_sort) and use_fused and cfg.backend == "pallas"
    # whole-path megakernel with deferred texture modulation
    # (ops/pallas/path.py): every bounce in ONE launch, one texel gather
    # for the whole frame
    use_path = (getattr(cfg, "fuse_path", True) and not use_sort
                and ((not cfg.shadow_ray) or light_analytic))
    # ---- native-mode uniform light selection (PARITY.md quirk #6) ----
    # The reference NEE always samples geoms[0] ("// TODO: pick random
    # light", pathtrace.cu:359-361). compat=False with >1 emissive geom
    # draws one uniformly per diffuse lane per bounce and weights the
    # contribution by n_lights (the standard MC estimator). Runs on the
    # oracle bounce path — the fused kernels bake a single light, and
    # every shipped demo scene has exactly one, so they never pay this.
    light_ids = tuple(lg.geom_idx for lg in scene.lights)
    multi_light = ((not cfg.compat) and cfg.shadow_ray
                   and len(light_ids) > 1)
    if multi_light:
        use_fused = use_path = use_sort = False
        light_emits = np.stack([
            np.asarray(scene.materials[scene.geom_material_ids[g]].color,
                       np.float32)
            * np.float32(
                scene.materials[scene.geom_material_ids[g]].emittance)
            for g in light_ids])
    # static bypass: a scene with zero loaded textures can never sample
    # one (every mat_texid is -1), so skip the 640K-lane texture gather
    # that XLA would otherwise emit per bounce (~4 ms/site on v5e)
    show_tex = cfg.show_texture and len(scene.textures) > 0
    # sparse texel fetch via row compaction (see albedo_from): pallas
    # backend only, needs 1024-aligned lane count
    scap = 32 if (cfg.backend == "pallas" and show_tex) else 0
    intersect_tex = (make_intersector_tex(scene, cfg, scap, interpret=interp)
                     if scap else None)

    def trace(ds, cam, params, frame, primary_cache=None, cam_changed=None,
              row0=None):
        """primary_cache/cam_changed enable primary-visibility caching: the
        first hit is a deterministic function of the camera, so a static
        camera reuses last frame's intersection + albedo (one whole
        intersect pass + a texture fetch saved). Pass primary_cache=None to
        always recompute (the oracle path). `row0` (traced, optional):
        this invocation covers image rows [row0, row0+h) of a taller
        sharded image — offsets pixel coords and RNG lane seeds so a
        multi-chip shard reproduces the single-chip variate streams."""
        import jax

        origin, direction = generate_camera_rays(cam, (w, h), row0=row0,
                                                 full_height=full_height)
        lane0 = (jnp.uint32(0) if row0 is None
                 else jnp.asarray(row0, jnp.uint32) * jnp.uint32(w))
        if lane_pad:
            origin = jnp.concatenate(
                [origin, jnp.full((lane_pad, 3), 1e7, origin.dtype)])
            direction = jnp.concatenate(
                [direction,
                 jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                  (lane_pad, 3)).astype(direction.dtype)])
            if primary_cache is not None:
                primary_cache = {
                    k: jnp.concatenate(
                        [v, jnp.zeros((lane_pad,) + v.shape[1:], v.dtype)])
                    for k, v in primary_cache.items()}
        throughput = jnp.ones((n, 3))
        radiance = jnp.zeros((n, 3))
        diffuse_flag = jnp.zeros(n, bool)
        lane = jnp.arange(n, dtype=jnp.uint32) + lane0

        def compute_primary(_):
            isect = intersect(ds, origin, direction)
            # primary rays are coherent: wall-covering rows are ~100%
            # textured, which would always overflow the sparse cap —
            # keep the dense fetch here (cached for static cameras)
            alb = albedo_from(ds, read_mat(ds, isect["mat_id"]),
                              isect["uv"], show_tex)
            return dict(isect, albedo=alb)

        if primary_cache is None:
            primary = compute_primary(None)
        else:
            primary = jax.lax.cond(cam_changed, compute_primary,
                                   lambda _: primary_cache, None)
        isect = {k: v for k, v in primary.items() if k != "albedo"}
        gb_albedo = primary["albedo"]

        # ---- G-buffer from the primary hit (pathtrace.cu:314-323) ----
        gb_position = origin + isect["t"][..., None] * direction
        gb_normal = isect["normal"]
        gb_geom = isect["geom_id"]
        gb_ialbedo = jnp.ones((n, 3))

        active = isect["hit"]

        nb = n // 128

        def plane(x):
            return x.reshape(nb, 128)

        def bounce_fused(carry, depth):
            """Bounce body as ONE Pallas launch (shade + NEE visibility +
            next closest-hit, ops/pallas/bounce.py); the only XLA work
            per bounce is the texture-albedo gather."""
            from ptdn_tpu.ops.pallas import bounce as BK

            planes = carry
            alb_skip = jnp.where(
                (depth == 1) if (cfg.sep_color and cfg.denoise_enable)
                else jnp.bool_(False), 1.0, 0.0)
            do_next_f = (depth < cfg.trace_depth).astype(jnp.float32)
            pv = jnp.concatenate([
                ds.geom_translation[light_geom],
                jnp.stack([params["light_radius"],
                           params["shadow_intensity"], alb_skip,
                           do_next_f, jnp.float32(0)])])
            fd = (jnp.uint32(frame) + depth.astype(jnp.uint32)).reshape(())
            out = BK.bounce_fused_pallas(
                planes, pv, jnp.stack([fd, lane0]), ds,
                mats=_static_mats(scene),
                shadow_ray=cfg.shadow_ray, reduce_var=cfg.reduce_var,
                geom_types=scene.geom_types,
                geom_mats=scene.geom_material_ids, n_tris=scene.n_tris,
                light_geom=light_geom, do_vis=do_vis,
                light_emit=light_emit_color, compat=cfg.compat,
                interpret=interp)

            def fetch_alb(_):
                uv = jnp.stack([out[BK.B_UU].reshape(n),
                                out[BK.B_VV].reshape(n)], axis=-1)
                mat_id = out[BK.B_MAT].reshape(n).astype(jnp.int32)
                nalb = albedo_from(ds, read_mat(ds, mat_id), uv,
                                   show_tex, sparse_cap=scap,
                                   interpret=interp)
                return jnp.stack([plane(nalb[:, 0]), plane(nalb[:, 1]),
                                  plane(nalb[:, 2])])

            albp = jax.lax.cond(depth < cfg.trace_depth, fetch_alb,
                                lambda _: planes[10:13], None)
            next_in = jnp.concatenate([out[0:10], albp, out[10:19]],
                                      axis=0)
            return next_in, None

        def bounce_sorted(carry, depth):
            """Split-pipeline bounce: shade launch -> coherence sort ->
            trace launch (NEE visibility + next closest-hit). The sort
            sits BETWEEN shade and trace because the scatter directions
            only exist after shading — keying on (origin cell, direction
            octant) makes the trace kernel's tiles corridor-coherent.
            RNG follows the carried pixel-id plane, so this is a pure
            reordering of the unsorted path's math."""
            from ptdn_tpu.ops.pallas import bounce as BK
            from ptdn_tpu.ops.pallas import shade as SH

            planes, pix = carry
            alb_skip = jnp.where(
                (depth == 1) if (cfg.sep_color and cfg.denoise_enable)
                else jnp.bool_(False), 1.0, 0.0)
            do_next_f = (depth < cfg.trace_depth).astype(jnp.float32)
            pv = jnp.concatenate([
                ds.geom_translation[light_geom],
                jnp.stack([params["light_radius"],
                           params["shadow_intensity"], alb_skip,
                           do_next_f, jnp.float32(0)])])
            fd = (jnp.uint32(frame) + depth.astype(jnp.uint32)).reshape(())
            outA = SH.shade_bounce_pallas(
                jnp.concatenate([planes, pix[None]], axis=0), pv,
                jnp.stack([fd, lane0]), _static_mats(scene),
                cfg.shadow_ray, cfg.reduce_var, interpret=interp)
            lhd = 0.5 * jnp.sqrt(jnp.sum(
                (ds.geom_bb_max[light_geom] - ds.geom_bb_min[light_geom])
                ** 2))
            allp, key = ranges_and_key(
                ds, outA, pix, n, nb, n_chunks_static, do_vis,
                light_pos=ds.geom_translation[light_geom],
                light_radius=lhd)
            grp = cfg.sort_group if cfg.sort_group is not None else 1
            rg = cfg.sort_regroup
            if rg is None:
                env = os.environ.get("PTDN_REGROUP")
                # auto: fresh-group G=4 where the permute dominates the
                # trace — few-chunk scenes (diamond: 65.5 -> 54.3 ms).
                # Chunk-heavy scenes lose: straggler lanes in mixed
                # groups widen tile unions, and union-bounded chunk
                # loops pay max-sensitively (bunny 119.9 -> 167.3,
                # room 89.4 -> 131.5; docs/PERF_NOTES.md round 5)
                rg = (int(env) if env
                      else (4 if n_chunks_static <= 8 else 0))
            rg = int(rg)
            se = int(cfg.sort_every if cfg.sort_every is not None
                     else os.environ.get("PTDN_SORT_EVERY", 1) or 1)
            if se > 1:
                # skip-sort bounces: fresh ranges, stale order — saves
                # the count-bound permute gather; scatter keeps origins
                # tile-local so coherence only partially decays
                allp = jax.lax.cond(
                    (depth - 1) % se == 0,
                    lambda a: permute_planes(a, key, n, nb, group=grp,
                                             regroup=rg,
                                             interpret=interp),
                    lambda a: a, allp)
            else:
                allp = permute_planes(allp, key, n, nb, group=grp,
                                      regroup=rg, interpret=interp)
            outA, pix = allp[:-1], allp[-1]
            out, tex_comp = BK.trace_bounce_pallas(
                outA, pv, ds,
                geom_types=scene.geom_types,
                geom_mats=scene.geom_material_ids, n_tris=scene.n_tris,
                light_geom=light_geom, do_vis=do_vis,
                light_emit=light_emit_color, compat=cfg.compat,
                emit_tex=show_tex,
                mat_texids=tuple(m.texid for m in scene.materials),
                tex_whs=tuple((t.shape[1], t.shape[0])
                              for t in scene.textures),
                interpret=interp)

            def fetch_alb(_):
                from ptdn_tpu.ops.pallas import bounce as BK

                mat_id = out[BK.B_MAT].reshape(n).astype(jnp.int32)
                mv = read_mat(ds, mat_id)
                if show_tex:
                    # sorted order clusters textured lanes into dense
                    # rows that overflow albedo_from's per-row sparse
                    # cap (forcing its dense fallback every bounce);
                    # the kernel's tile-wide packing can't overflow
                    nalb = albedo_from_tilepack(ds, mv, tex_comp,
                                                interp)
                else:
                    uv = jnp.stack([out[BK.B_UU].reshape(n),
                                    out[BK.B_VV].reshape(n)], axis=-1)
                    nalb = albedo_from(ds, mv, uv, show_tex,
                                       sparse_cap=scap,
                                       interpret=interp)
                return jnp.stack([plane(nalb[:, 0]), plane(nalb[:, 1]),
                                  plane(nalb[:, 2])])

            albp = jax.lax.cond(depth < cfg.trace_depth, fetch_alb,
                                lambda _: out[0:3], None)
            next_in = jnp.concatenate([out[0:10], albp, out[10:19]],
                                      axis=0)
            return (next_in, pix), None

        def bounce_pallas(carry, depth):
            """Bounce body with the fused shade kernel (pallas backend;
            fallback when the fully-fused kernel doesn't apply)."""
            from ptdn_tpu.ops.pallas import shade as SH

            (origin, direction, throughput, radiance, diffuse_flag, active,
             isect, alb) = carry

            def plane(x):
                return x.reshape(nb, 128)

            planes = jnp.stack([
                plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
                plane(direction[:, 0]), plane(direction[:, 1]),
                plane(direction[:, 2]),
                plane(isect["t"]),
                plane(isect["normal"][:, 0]), plane(isect["normal"][:, 1]),
                plane(isect["normal"][:, 2]),
                plane(alb[:, 0]), plane(alb[:, 1]), plane(alb[:, 2]),
                plane(throughput[:, 0]), plane(throughput[:, 1]),
                plane(throughput[:, 2]),
                plane(radiance[:, 0]), plane(radiance[:, 1]),
                plane(radiance[:, 2]),
                plane(isect["mat_id"].astype(jnp.float32)),
                plane(active.astype(jnp.float32)),
                plane(diffuse_flag.astype(jnp.float32)),
            ])
            alb_skip = jnp.where(
                (depth == 1) if (cfg.sep_color and cfg.denoise_enable)
                else jnp.bool_(False), 1.0, 0.0)
            pv = jnp.concatenate([
                ds.geom_translation[light_geom],
                jnp.stack([params["light_radius"],
                           params["shadow_intensity"], alb_skip,
                           jnp.float32(0), jnp.float32(0)])])
            fd = (jnp.uint32(frame) + depth.astype(jnp.uint32)).reshape(())
            out = SH.shade_bounce_pallas(
                planes, pv, jnp.stack([fd, lane0]), _static_mats(scene),
                cfg.shadow_ray,
                cfg.reduce_var, interpret=interp)

            def up(k):
                return out[k].reshape(n)

            radiance = jnp.stack([up(SH.O_RR), up(SH.O_RG), up(SH.O_RB)],
                                 axis=-1)
            spawn = jnp.stack([up(SH.O_SPX), up(SH.O_SPY), up(SH.O_SPZ)],
                              axis=-1)
            new_dir = jnp.stack([up(SH.O_DX), up(SH.O_DY), up(SH.O_DZ)],
                                axis=-1)
            throughput = jnp.stack([up(SH.O_TR), up(SH.O_TG), up(SH.O_TB)],
                                   axis=-1)
            diffuse_flag = up(SH.O_DIF) > 0.5
            active = up(SH.O_ACT) > 0.5

            if cfg.shadow_ray:
                sdir = jnp.stack([up(SH.O_SDX), up(SH.O_SDY), up(SH.O_SDZ)],
                                 axis=-1)
                nee = up(SH.O_NEE) > 0.5
                lit = nee & light_visible(ds, spawn, sdir)
                if not light_emissive:
                    lit = jnp.zeros_like(lit)
                contrib = (jnp.stack([up(SH.O_CR), up(SH.O_CG), up(SH.O_CB)],
                                     axis=-1)
                           * jnp.asarray(light_emit_color))
                radiance = radiance + jnp.where(lit[..., None], contrib, 0.0)

            def do_next(args):
                spawn, new_dir, active, isect, alb = args
                # fetch the NEXT bounce's albedo here (skipped at max
                # depth — saves one whole gather site per frame); the
                # tex intersector emits pre-compacted texel indices so
                # the fetch gathers only ~cap indices per 128-lane row
                if scap:
                    nxt, comp4 = intersect_tex(ds, spawn, new_dir)
                    nalb = albedo_from_comp(
                        ds, read_mat(ds, nxt["mat_id"]), comp4, scap,
                        interpret=interp)
                else:
                    nxt = intersect(ds, spawn, new_dir)
                    nalb = albedo_from(ds, read_mat(ds, nxt["mat_id"]),
                                       nxt["uv"], show_tex,
                                       sparse_cap=scap, interpret=interp)
                return spawn, new_dir, active & nxt["hit"], nxt, nalb

            def no_next(args):
                _, _, active, isect, alb = args
                return origin, direction, active, isect, alb

            origin2, direction2, active, isect, alb = jax.lax.cond(
                depth < cfg.trace_depth, do_next, no_next,
                (spawn, new_dir, active, isect, alb))
            return (origin2, direction2, throughput, radiance, diffuse_flag,
                    active, isect, alb), None

        def bounce(carry, depth):
            """One reference bounce-loop iteration (pathtrace.cu:325-394).
            `depth` is traced so the whole loop compiles ONCE (scan)."""
            (origin, direction, throughput, radiance, diffuse_flag, active,
             isect, alb) = carry
            seed = init_rand(lane, jnp.uint32(frame) + depth.astype(jnp.uint32))
            mat = isect["mat_id"]
            mv = read_mat(ds, mat)
            emitt = mv["emit"]
            emissive = emitt > 0.0

            # emissive hit terminates; skipped for NEE'd diffuse paths
            # (pathtrace.cu:331-336)
            add_emit = active & emissive
            if cfg.shadow_ray and cfg.reduce_var:
                add_emit = add_emit & ~diffuse_flag
            radiance = radiance + jnp.where(
                add_emit[..., None],
                throughput * mv["color"] * emitt[..., None], 0.0)
            active = active & ~emissive

            ipos = origin + isect["t"][..., None] * direction
            inormal = isect["normal"]
            m_refl = mv["refl"]
            m_refr = mv["refr"]
            mat_is_diffuse = (m_refl < 1e-6) & (m_refr < 1e-6)

            # throughput *= albedo; sepcolor skips the first-hit albedo so
            # SVGF can remodulate it after filtering (pathtrace.cu:343-355;
            # the reference's glm::clamp there discards its result — no-op).
            # `alb` rides the carry: fetched with each intersection.
            apply_alb = active
            if cfg.sep_color and cfg.denoise_enable:
                apply_alb = apply_alb & (depth > 1)
            throughput = jnp.where(apply_alb[..., None], throughput * alb,
                                   throughput)

            # ---- NEE shadow ray to geom 0 (pathtrace.cu:357-385) ----
            if cfg.shadow_ray and multi_light:
                # native mode, >1 emissive geom: uniform light selection
                # (fixes "// TODO: pick random light", pathtrace.cu:359).
                # Draw order: selection FIRST, then the disk sample's
                # theta/radius — ours to define, the reference stream has
                # no selection draw.
                nee = active & mat_is_diffuse
                s_origin = ipos + 1e-4 * inormal
                k = len(light_ids)
                seed, r_sel = bsdf.next_rand_masked(seed, nee)
                li = jnp.minimum((r_sel * k).astype(jnp.int32), k - 1)
                l_tr = ds.geom_translation[jnp.asarray(light_ids)][li]
                seed, s_dir, s_dist = bsdf.sample_shadow_ray(
                    seed, s_origin, l_tr, params["light_radius"], nee)
                tgt = jnp.asarray(light_ids, jnp.int32)[li]
                lit = nee & (intersect(ds, s_origin, s_dir)["geom_id"]
                             == tgt)
                lambert = jnp.maximum(0.0, jnp.sum(s_dir * inormal, axis=-1))
                intensity = params["shadow_intensity"] / (s_dist * s_dist)
                # x k: inverse of the uniform selection pdf
                contrib = (throughput * jnp.asarray(light_emits)[li]
                           * (k * intensity * lambert)[..., None])
                radiance = radiance + jnp.where(lit[..., None], contrib, 0.0)
            elif cfg.shadow_ray:
                nee = active & mat_is_diffuse
                s_origin = ipos + 1e-4 * inormal
                seed, s_dir, s_dist = bsdf.sample_shadow_ray(
                    seed, s_origin, ds.geom_translation[light_geom],
                    params["light_radius"], nee)
                lit = nee & light_visible(ds, s_origin, s_dir)
                if not light_emissive:
                    lit = jnp.zeros_like(lit)
                lambert = jnp.maximum(0.0, jnp.sum(s_dir * inormal, axis=-1))
                intensity = params["shadow_intensity"] / (s_dist * s_dist)
                contrib = (throughput * jnp.asarray(light_emit_color)
                           * (intensity * lambert)[..., None])
                radiance = radiance + jnp.where(lit[..., None], contrib, 0.0)

            # ---- scatter + next intersection, skipped at max depth
            # (pathtrace.cu:388-392); lax.cond keeps one compiled copy ----
            def do_scatter(args):
                (origin, direction, throughput, diffuse_flag, active, isect,
                 alb, seed) = args
                seed, origin, direction, throughput, became_diffuse, _ = (
                    bsdf.scatter_ray(seed, direction, throughput, ipos,
                                     inormal, m_refl, m_refr,
                                     mv["ior"], mv["spec_color"],
                                     active))
                diffuse_flag = diffuse_flag | became_diffuse
                nxt = intersect(ds, origin, direction)
                active = active & nxt["hit"]
                nalb = albedo_from(ds, read_mat(ds, nxt["mat_id"]),
                                   nxt["uv"], show_tex)
                return (origin, direction, throughput, diffuse_flag, active,
                        nxt, nalb)

            def no_scatter(args):
                (origin, direction, throughput, diffuse_flag, active, isect,
                 alb, _) = args
                return (origin, direction, throughput, diffuse_flag, active,
                        isect, alb)

            (origin, direction, throughput, diffuse_flag, active, isect,
             alb) = jax.lax.cond(
                    depth < cfg.trace_depth, do_scatter, no_scatter,
                    (origin, direction, throughput, diffuse_flag, active,
                     isect, alb, seed))
            return (origin, direction, throughput, radiance, diffuse_flag,
                    active, isect, alb), None

        plane_ok = cfg.backend == "pallas" and n % (8 * 128) == 0
        if plane_ok and use_path and n % (_PATH_RROWS * 128) == 0:
            from ptdn_tpu.ops.pallas.path import path_trace_fused_pallas

            planes16 = jnp.stack([
                plane(origin[:, 0]), plane(origin[:, 1]),
                plane(origin[:, 2]),
                plane(direction[:, 0]), plane(direction[:, 1]),
                plane(direction[:, 2]),
                plane(isect["t"]),
                plane(isect["normal"][:, 0]), plane(isect["normal"][:, 1]),
                plane(isect["normal"][:, 2]),
                plane(gb_albedo[:, 0]), plane(gb_albedo[:, 1]),
                plane(gb_albedo[:, 2]),
                plane(isect["mat_id"].astype(jnp.float32)),
                plane(active.astype(jnp.float32)),
                plane(diffuse_flag.astype(jnp.float32)),
            ])
            pv = jnp.concatenate([
                ds.geom_translation[light_geom],
                jnp.stack([params["light_radius"],
                           params["shadow_intensity"], jnp.float32(0),
                           jnp.float32(0), jnp.float32(0)])])
            fl = jnp.stack([jnp.asarray(frame, jnp.uint32).reshape(()),
                            jnp.asarray(lane0, jnp.uint32).reshape(())])
            pcap = scap if scap else 32
            contrib, tex_comp = path_trace_fused_pallas(
                planes16, pv, fl, ds, mats=_static_mats(scene),
                shadow_ray=cfg.shadow_ray, reduce_var=cfg.reduce_var,
                static_mats=scene.static_matrices,
                geom_types=scene.geom_types,
                geom_mats=scene.geom_material_ids, n_tris=scene.n_tris,
                light_geom=light_geom, do_vis=do_vis,
                light_emit=light_emit_color, compat=cfg.compat,
                depth=cfg.trace_depth,
                alb_skip1=bool(cfg.sep_color and cfg.denoise_enable),
                mat_texids=tuple(m.texid for m in scene.materials),
                tex_whs=tuple((t.shape[1], t.shape[0])
                              for t in scene.textures),
                cap=pcap, emit_tex=show_tex, interpret=interp)
            radiance = deferred_radiance(ds, contrib, tex_comp,
                                         cfg.trace_depth, pcap, interp)
            gbuffer = {
                "position": gb_position,
                "normal": gb_normal,
                "albedo": gb_albedo,
                "ialbedo": gb_ialbedo,
                "geom_id": gb_geom,
            }
            if lane_pad:
                radiance = radiance[:n_real]
                gbuffer = {k: v[:n_real] for k, v in gbuffer.items()}
                primary = {k: v[:n_real] for k, v in primary.items()}
            return radiance, gbuffer, primary
        if plane_ok and use_fused:
            carry = jnp.stack([
                plane(origin[:, 0]), plane(origin[:, 1]),
                plane(origin[:, 2]),
                plane(direction[:, 0]), plane(direction[:, 1]),
                plane(direction[:, 2]),
                plane(isect["t"]),
                plane(isect["normal"][:, 0]), plane(isect["normal"][:, 1]),
                plane(isect["normal"][:, 2]),
                plane(gb_albedo[:, 0]), plane(gb_albedo[:, 1]),
                plane(gb_albedo[:, 2]),
                plane(throughput[:, 0]), plane(throughput[:, 1]),
                plane(throughput[:, 2]),
                plane(radiance[:, 0]), plane(radiance[:, 1]),
                plane(radiance[:, 2]),
                plane(isect["mat_id"].astype(jnp.float32)),
                plane(active.astype(jnp.float32)),
                plane(diffuse_flag.astype(jnp.float32)),
            ])
            if use_sort:
                carry = (carry, plane(jnp.arange(n, dtype=jnp.float32)))
                body = bounce_sorted
            else:
                body = bounce_fused
        else:
            carry = (origin, direction, throughput, radiance, diffuse_flag,
                     active, isect, gb_albedo)
            # multi-light native mode runs the oracle bounce (the pallas
            # shade kernel bakes a single NEE light)
            body = (bounce_pallas if (plane_ok and not multi_light)
                    else bounce)
        if cfg.trace_depth == 1:
            carry, _ = body(carry, jnp.int32(1))
        else:
            carry, _ = jax.lax.scan(
                body, carry, jnp.arange(1, cfg.trace_depth + 1,
                                        dtype=jnp.int32))
        if plane_ok and use_fused and use_sort:
            planes22, pixp = carry
            # restore pixel order: pixel ids are a permutation of 0..n-1,
            # so sorting them (1 ms) + one row gather beats a scatter
            # (~50 ms on v5e) by an order of magnitude
            order = jax.lax.sort_key_val(
                pixp.reshape(n).astype(jnp.int32),
                jnp.arange(n, dtype=jnp.int32))[1]
            rad_rows = jnp.stack([planes22[16].reshape(n),
                                  planes22[17].reshape(n),
                                  planes22[18].reshape(n)], axis=-1)
            radiance = rad_rows[order]
        elif plane_ok and use_fused:
            radiance = jnp.stack([carry[16].reshape(n),
                                  carry[17].reshape(n),
                                  carry[18].reshape(n)], axis=-1)
        else:
            radiance = carry[3]

        gbuffer = {
            "position": gb_position,
            "normal": gb_normal,
            "albedo": gb_albedo,
            "ialbedo": gb_ialbedo,
            "geom_id": gb_geom,
        }
        if lane_pad:
            radiance = radiance[:n_real]
            gbuffer = {k: v[:n_real] for k, v in gbuffer.items()}
            primary = {k: v[:n_real] for k, v in primary.items()}
        return radiance, gbuffer, primary

    return trace
