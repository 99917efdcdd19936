"""Pallas TPU kernel: ONE launch per bounce = shade + NEE visibility +
next closest-hit.

The reference executes a bounce as sequential device work inside the
`rt` megakernel (reference src/pathtrace.cu:325-394): shade/scatter,
a shadow-ray trace, and the next path intersection. Our wavefront
engine used three Pallas launches plus XLA plane pack/unpack glue per
bounce; this kernel fuses all of it, so per bounce the only XLA work
left is the texture-albedo gather (scalar-unit bound, can't vectorize).

Plane layout is chosen so the engine's scan carry is rebuilt from the
kernel output with ONE concatenate:

  input  planes: [o(3) d(3) t n(3) alb(3) thr(3) rad(3) mat act dif]
  output planes: [spawn(3) d'(3) t' n'(3) thr(3) rad(3) mat' act' dif'
                  uv(2)]
  next input = concat(out[0:10], alb_fetched, out[10:19])

At the final depth (do_next = 0) the intersection block is skipped via
a scalar branch; the isect output planes then hold stale values, which
is safe — the scan discards everything but radiance after the last
bounce (pathtrace.cu:388-392 likewise skips the last scatter/trace).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptdn_tpu.ops.pallas.scene_intersect import (_vmem_kw,
                                                 chunk_aabb_ops,
                                                 closest_hit_tiles,
                                                 light_visibility_tiles)
from ptdn_tpu.ops.pallas.shade import (_IN_KEYS, _fd2, lane_seed, pix_seed,
                                       shade_tiles)

RROWS = 8
# Block height of the SORTED-path trace kernel (visibility + closest
# hit). 8 was forced by the gather-mode dynamic row extract
# (vreg-local, exactly 8 sublanes); select-mode extraction
# (scene_intersect.ROW_EXTRACT) frees it. Round-4 A/B: 32-row blocks
# win at 1080p (599.8 -> 578.9 — per-block fixed costs amortize over
# 2025 blocks) but LOSE on bunny (121.6 -> 129.4 — wider tiles
# quadruple the chunk-union span on a 39-chunk scene), so the height
# auto-selects by wavefront size; PTDN_TRACE_ROWS pins it for A/B.
_TR_ENV = os.environ.get("PTDN_TRACE_ROWS")
# Joint chunk scan: ONE loop serves the next-ray closest hit AND the
# shadow-ray occlusion (scene_intersect.joint_mesh_tiles), sharing the
# per-chunk machinery across the two morton-balanced ranges. Round-5
# A/B (vs split loops): bunny 119.9 -> 111.9, room 89.4 -> 81.3,
# terrain30k ~190 -> 180.1, diamond 54.3 -> 52.5, room-1080p-anim
# 578.1 -> 547.7 — wins everywhere, DEFAULT ON (PTDN_JOINT=0 reverts
# to the split loops for A/B).
_JOINT = os.environ.get("PTDN_JOINT", "1") == "1"


def trace_rows(nb: int) -> int:
    if _TR_ENV:
        return int(_TR_ENV)
    return 32 if nb * 128 >= 1_000_000 else 8
N_BIN = 22
N_BOUT = 21
# output plane indices (engine-side consumers)
(B_SPX, B_SPY, B_SPZ, B_DX, B_DY, B_DZ, B_T, B_NX, B_NY, B_NZ,
 B_TR, B_TG, B_TB, B_RR, B_RG, B_RB, B_MAT, B_ACT, B_DIF,
 B_UU, B_VV) = range(21)


def _kernel(inp, par_ref, fd_ref,
            tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r,
            attr_r, out,
            *, mats, shadow_ray, reduce_var, geom_types, geom_mats,
            n_tris, n_chunks, cull, compat, light_geom, do_vis,
            light_emit, has_pix=False):
    shape = (RROWS, 128)
    i = pl.program_id(0)
    tiles = {k: inp[j] for j, k in enumerate(_IN_KEYS)}
    if has_pix:
        # sorted-wavefront mode: lanes are in coherence order, plane 22
        # carries each lane's pixel index for its RNG stream
        seed = pix_seed(inp[N_BIN], fd_ref[0, 0], shape, fd_ref[0, 1])
    else:
        seed = lane_seed(i, fd_ref[0, 0], shape, fd_ref[0, 1])
    par = tuple(par_ref[0, j] for j in range(6))

    res = shade_tiles(tiles, seed, par, mats=mats, shadow_ray=shadow_ray,
                      reduce_var=reduce_var)

    rr, rg, rb = res["rr"], res["rg"], res["rb"]
    if do_vis:
        vis_refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r,
                    cmin_r, cmax_r)
        lit = light_visibility_tiles(
            (res["spx"], res["spy"], res["spz"]),
            (res["sdx"], res["sdy"], res["sdz"]),
            vis_refs, shape, geom_types=geom_types, n_tris=n_tris,
            n_chunks=n_chunks, light_geom=light_geom,
            nee_mask=res["nee"])
        # select, not multiply: cr/cg/cb can be inf/NaN on non-NEE lanes
        # (1/d^2 of a garbage shadow sample) and NaN * 0 = NaN
        litb = lit > 0.5
        rr = rr + jnp.where(litb, res["cr"] * light_emit[0], 0.0)
        rg = rg + jnp.where(litb, res["cg"] * light_emit[1], 0.0)
        rb = rb + jnp.where(litb, res["cb"] * light_emit[2], 0.0)

    out[B_SPX] = res["spx"]
    out[B_SPY] = res["spy"]
    out[B_SPZ] = res["spz"]
    out[B_DX] = res["dx"]
    out[B_DY] = res["dy"]
    out[B_DZ] = res["dz"]
    out[B_TR] = res["tr"]
    out[B_TG] = res["tg"]
    out[B_TB] = res["tb"]
    out[B_RR] = rr
    out[B_RG] = rg
    out[B_RB] = rb
    out[B_DIF] = res["dif"]
    out[B_ACT] = res["act"]

    do_next = par_ref[0, 6] > 0.5

    @pl.when(do_next)
    def _():
        refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r,
                cmax_r, attr_r)
        t, geom, nx, ny, nz, uu, vv, mat = closest_hit_tiles(
            (res["spx"], res["spy"], res["spz"]),
            (res["dx"], res["dy"], res["dz"]),
            refs, shape, geom_types=geom_types, geom_mats=geom_mats,
            n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat,
            alive=res["act"])
        hit = jnp.where(geom >= 0.0, 1.0, 0.0)
        out[B_T] = t
        out[B_NX] = nx
        out[B_NY] = ny
        out[B_NZ] = nz
        out[B_MAT] = mat
        out[B_ACT] = res["act"] * hit
        out[B_UU] = uu
        out[B_VV] = vv

    @pl.when(jnp.logical_not(do_next))
    def _():
        # last depth: keep the current intersection (values are dead —
        # only radiance survives the scan — but must stay finite)
        out[B_T] = tiles["t"]
        out[B_NX] = tiles["nx"]
        out[B_NY] = tiles["ny"]
        out[B_NZ] = tiles["nz"]
        out[B_MAT] = tiles["mat"]
        out[B_UU] = jnp.zeros(shape, jnp.float32)
        out[B_VV] = jnp.zeros(shape, jnp.float32)


def bounce_fused_pallas(planes_in, params_vec, frame_plus_depth, ds,
                        *, mats, shadow_ray, reduce_var, geom_types,
                        geom_mats, n_tris, light_geom, do_vis, light_emit,
                        compat, cull=True, interpret=False):
    """planes_in: (N_BIN, NB, 128) f32 — or (N_BIN+1, NB, 128) with a
    trailing pixel-index plane (sorted-wavefront mode; RNG follows the
    pixel). params_vec: (8,) f32 = (light_pos(3), lrad, sint, alb_skip,
    do_next, pad). Returns (N_BOUT, NB, 128) f32."""
    nb = planes_in.shape[1]
    has_pix = planes_in.shape[0] == N_BIN + 1
    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    kern = functools.partial(
        _kernel, mats=mats, shadow_ray=shadow_ray, reduce_var=reduce_var,
        geom_types=tuple(geom_types), geom_mats=tuple(geom_mats),
        n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat,
        light_geom=light_geom, do_vis=do_vis,
        light_emit=tuple(float(x) for x in light_emit), has_pix=has_pix)
    n_in = N_BIN + (1 if has_pix else 0)
    plane_in_spec = pl.BlockSpec((n_in, RROWS, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        **_vmem_kw(n_tris),
        grid=(nb // RROWS,),
        in_specs=[plane_in_spec,
                  pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  smem, smem, smem, smem, smem, full, smem, smem, full],
        out_specs=pl.BlockSpec((N_BOUT, RROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_BOUT, nb, 128), jnp.float32),
        interpret=interpret,
    )(planes_in, params_vec.reshape(1, 8), _fd2(frame_plus_depth),
      ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max, ds.tri_moller,
      cmin_op, cmax_op, ds.tri_attr_t)
    return out


# ---- split-pipeline trace kernel (sorted wavefront) -------------------
# The sorted engine runs shade and trace as separate launches with a
# coherence sort in between, so the closest-hit sees lanes grouped by
# (origin cell, direction octant) — the scatter directions only exist
# after the shade kernel ran. Input = the shade kernel's output planes
# (shade.O_* layout); output = the same N_BOUT layout as the fused
# bounce kernel, so the engine glue is shared.

def _trace_kernel(inp, par_ref,
                  tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r,
                  cmax_r, attr_r, out, *tex_outs,
                  geom_types, geom_mats, n_tris, n_chunks, cull,
                  compat, light_geom, do_vis, light_emit, has_fc,
                  emit_tex=False, mat_texids=(), tex_whs=(),
                  atlas_hw=(1, 1), rrows=8):
    from ptdn_tpu.ops.pallas.shade import (O_ACT, O_CB, O_CG, O_CR, O_DIF,
                                           O_DX, O_DY, O_DZ, O_NEE, O_RB,
                                           O_RG, O_RR, O_SDX, O_SDY, O_SDZ,
                                           O_SPX, O_SPY, O_SPZ, O_TB, O_TG,
                                           O_TR)

    shape = (rrows, 128)
    spx, spy, spz = inp[O_SPX], inp[O_SPY], inp[O_SPZ]
    dx, dy, dz = inp[O_DX], inp[O_DY], inp[O_DZ]
    act = inp[O_ACT]
    rr, rg, rb = inp[O_RR], inp[O_RG], inp[O_RB]
    from ptdn_tpu.ops.pallas.shade import N_OUT as _NO
    # crossed-chunk-ID range planes (engine.wavefront.chunk_range_planes)
    next_range = (inp[_NO], inp[_NO + 1]) if has_fc else None
    shadow_range = (inp[_NO + 2], inp[_NO + 3]) if has_fc else None

    vis_refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r,
                cmax_r)
    # joint next+shadow mesh loop (PTDN_JOINT): one chunk scan serves
    # both queries, sharing the per-chunk machinery; lit is then only
    # known inside the do_next branch, so the radiance add moves there
    joint = (_JOINT and do_vis and has_fc and n_tris > 0
             and n_chunks > 4)

    def add_rad(lit):
        # select, not multiply: cr/cg/cb can be inf/NaN on non-NEE lanes
        litb = lit > 0.5
        out[B_RR] = rr + jnp.where(litb, inp[O_CR] * light_emit[0], 0.0)
        out[B_RG] = rg + jnp.where(litb, inp[O_CG] * light_emit[1], 0.0)
        out[B_RB] = rb + jnp.where(litb, inp[O_CB] * light_emit[2], 0.0)

    if do_vis and not joint:
        lit = light_visibility_tiles(
            (spx, spy, spz), (inp[O_SDX], inp[O_SDY], inp[O_SDZ]),
            vis_refs, shape, geom_types=geom_types, n_tris=n_tris,
            n_chunks=n_chunks, light_geom=light_geom,
            nee_mask=inp[O_NEE], chunk_range=shadow_range)
        litb = lit > 0.5
        rr = rr + jnp.where(litb, inp[O_CR] * light_emit[0], 0.0)
        rg = rg + jnp.where(litb, inp[O_CG] * light_emit[1], 0.0)
        rb = rb + jnp.where(litb, inp[O_CB] * light_emit[2], 0.0)

    out[B_SPX] = spx
    out[B_SPY] = spy
    out[B_SPZ] = spz
    out[B_DX] = dx
    out[B_DY] = dy
    out[B_DZ] = dz
    out[B_TR] = inp[O_TR]
    out[B_TG] = inp[O_TG]
    out[B_TB] = inp[O_TB]
    out[B_RR] = rr
    out[B_RG] = rg
    out[B_RB] = rb
    out[B_DIF] = inp[O_DIF]
    out[B_ACT] = act

    do_next = par_ref[0, 6] > 0.5

    if joint:
        from ptdn_tpu.ops.pallas.scene_intersect import (_analytic_part,
                                                         joint_mesh_tiles)

        o_sp = (spx, spy, spz)
        d_sh = (inp[O_SDX], inp[O_SDY], inp[O_SDZ])
        ta_s, ga_s, _, _, _ = _analytic_part(
            geom_types, tf_r, inv_r, invt_r, (gbbmin_r, gbbmax_r),
            o_sp, d_sh, shape, want_normals=False)
        lit0 = (jnp.where(ga_s == float(light_geom), 1.0, 0.0)
                * inp[O_NEE])

        @pl.when(jnp.logical_not(do_next))
        def _():
            # last bounce: shadow query only (the plain vis loop with
            # its all-occluded early exit)
            lit = light_visibility_tiles(
                o_sp, d_sh, vis_refs, shape, geom_types=geom_types,
                n_tris=n_tris, n_chunks=n_chunks,
                light_geom=light_geom, nee_mask=inp[O_NEE],
                chunk_range=shadow_range)
            add_rad(lit)
    else:
        joint_mesh_tiles = None
        o_sp = d_sh = ta_s = lit0 = None

    @pl.when(do_next)
    def _():
        refs = vis_refs + (attr_r,)
        if joint:
            litc = []

            def mb(ta, ga):
                bt, bi, lit = joint_mesh_tiles(
                    tri_r, cmin_r, cmax_r, o_sp, (dx, dy, dz), ta, ga,
                    d_sh, ta_s, lit0, shape, n_tris=n_tris,
                    n_chunks=n_chunks, next_range=next_range,
                    shadow_range=shadow_range, alive=act)
                litc.append(lit)
                return bt, bi
        else:
            mb = None
        t, geom, nx, ny, nz, uu, vv, mat = closest_hit_tiles(
            (spx, spy, spz), (dx, dy, dz),
            refs, shape, geom_types=geom_types, geom_mats=geom_mats,
            n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat,
            alive=act, chunk_range=next_range, mesh_best_fn=mb)
        if joint:
            add_rad(litc[0])
        out[B_T] = t
        out[B_NX] = nx
        out[B_NY] = ny
        out[B_NZ] = nz
        out[B_MAT] = mat
        act2 = act * jnp.where(geom >= 0.0, 1.0, 0.0)
        out[B_ACT] = act2
        out[B_UU] = uu
        out[B_VV] = vv
        if emit_tex:
            # tile-WIDE compaction of the next hit's texel indices
            # (sorted order clusters textured lanes, so per-row caps
            # overflow; the global packing can't — see
            # engine.wavefront.albedo_from_tilepack)
            from ptdn_tpu.ops.pallas.compact import (tile_gather_compact,
                                                     tile_route)
            from ptdn_tpu.ops.pallas.scene_intersect import tex_index_tiles

            sl_o, cv_o, cn_o = tex_outs
            tidx = tex_index_tiles(uu, vv, mat, shape,
                                   mat_texids=mat_texids, tex_whs=tex_whs,
                                   atlas_hw=atlas_hw)
            tidx = jnp.where(act2 > 0.5, tidx, -1)
            slot, k_tile, route = tile_route(
                jnp.where(tidx >= 0, 1, 0), shape)
            sl_o[:] = slot
            cv_o[:] = tile_gather_compact(tidx, route, shape)
            cn_o[:] = jnp.full(shape, k_tile, jnp.int32)

    @pl.when(jnp.logical_not(do_next))
    def _():
        # last depth: only radiance survives; values must stay finite
        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        out[B_T] = one
        out[B_NX] = zero
        out[B_NY] = zero
        out[B_NZ] = one
        out[B_MAT] = zero
        out[B_UU] = zero
        out[B_VV] = zero
        if emit_tex:
            sl_o, cv_o, cn_o = tex_outs
            izero = jnp.full(shape, -1, jnp.int32)
            sl_o[:] = izero
            cv_o[:] = jnp.zeros(shape, jnp.int32)
            cn_o[:] = jnp.zeros(shape, jnp.int32)


def trace_bounce_pallas(planes_in, params_vec, ds,
                        *, geom_types, geom_mats, n_tris, light_geom,
                        do_vis, light_emit, compat, cull=True,
                        emit_tex=False, mat_texids=(), tex_whs=(),
                        interpret=False):
    """planes_in: (shade.N_OUT, NB, 128) f32 (the shade kernel's output,
    coherence-sorted) — or (shade.N_OUT+4, ...) with trailing
    (next_lo, next_hi, shadow_lo, shadow_hi) crossed-chunk-ID range
    planes that bound the kernel's chunk loops to each tile's union
    range. params_vec: (8,) f32 with do_next at [6]. Returns
    (N_BOUT, NB, 128) f32 in the fused bounce kernel's layout."""
    from ptdn_tpu.ops.pallas.shade import N_OUT as SH_N_OUT

    nb = planes_in.shape[1]
    has_fc = planes_in.shape[0] == SH_N_OUT + 4
    n_in = planes_in.shape[0]
    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    atlas_hw = (int(ds.tex_atlas.shape[1]), int(ds.tex_atlas.shape[2]))
    rows = trace_rows(nb)
    if nb % rows:
        rows = 8
    if nb % rows:
        raise ValueError(f"trace block height {rows} must divide "
                         f"nb={nb} (lanes are padded to 4096 multiples "
                         f"in make_trace_fn)")
    kern = functools.partial(
        _trace_kernel, geom_types=tuple(geom_types),
        geom_mats=tuple(geom_mats), n_tris=n_tris, n_chunks=n_chunks,
        cull=cull, compat=compat, light_geom=light_geom, do_vis=do_vis,
        light_emit=tuple(float(x) for x in light_emit), has_fc=has_fc,
        emit_tex=emit_tex, mat_texids=tuple(mat_texids),
        tex_whs=tuple(tex_whs), atlas_hw=atlas_hw, rrows=rows)
    plane_in_spec = pl.BlockSpec((n_in, rows, 128),
                                 lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = [pl.BlockSpec((N_BOUT, rows, 128),
                              lambda i: (0, i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((N_BOUT, nb, 128), jnp.float32)]
    if emit_tex:
        out_specs += [ray_spec] * 3
        out_shape += [jax.ShapeDtypeStruct((nb, 128), jnp.int32)] * 3
    outs = pl.pallas_call(
        kern,
        # large-mesh scenes blow the 16 MB default scoped-vmem limit
        # (terrain30k: 1.4 MB tri table + 3.8 MB attr table + block
        # operands = 18.6 MB); v5e takes much higher limits fine
        # (the a-trous kernel runs with 100 MB)
        **_vmem_kw(n_tris),
        grid=(nb // rows,),
        in_specs=[plane_in_spec,
                  pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  smem, smem, smem, smem, smem, full, smem, smem, full],
        out_specs=out_specs if emit_tex else out_specs[0],
        out_shape=out_shape if emit_tex else out_shape[0],
        interpret=interpret,
    )(planes_in, params_vec.reshape(1, 8),
      ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max, ds.tri_moller,
      cmin_op, cmax_op, ds.tri_attr_t)
    if emit_tex:
        return outs[0], tuple(outs[1:])
    return outs, None
