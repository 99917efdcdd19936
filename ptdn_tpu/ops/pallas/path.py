"""Pallas TPU kernel: the WHOLE bounce loop in one launch, with texture
modulation deferred to a single post-pass.

The reference `rt` megakernel walks each pixel's full path in one CUDA
thread (reference src/pathtrace.cu:300-401). The round-1 TPU engine ran
one fused Pallas launch per bounce with an XLA texture-albedo gather
between launches — those 6-7 gather sites cost ~16.5 ms of the 37.9 ms
cornell frame (docs/PERF_NOTES.md).

Key observation: the PATH GEOMETRY is independent of albedo values.
Scatter directions depend on RNG and material refl/refr/ior — never on
the albedo — so the entire depth loop can run in ONE kernel using
  albedo' = material color   (untextured lanes, static table)
  albedo' = 1.0              (textured lanes)
and emit, per depth d:
  * cE_d: the emissive-hit contribution (pathtrace.cu:331-336), computed
    with throughput' (deferred ratios missing);
  * cN_d: the lit NEE contribution (pathtrace.cu:357-385), ditto;
  * the flat texel index the albedo multiply at depth d would have
    sampled (-1 untextured), pre-compacted per 128-lane row
    (ops/pallas/compact.py) for the count-bound XLA gather.

The post-pass (engine.wavefront.deferred_radiance) gathers ALL depths'
texels in one sparse fetch and reconstructs the exact radiance with a
running product of per-depth ratios:

    cum = 1; rad = 0
    for d in 1..D:
        rad += cE_d * cum          # emissive uses pre-albedo throughput
        if d >= 2: cum *= ratio_d  # depth-1 albedo is exact in-kernel
        rad += cN_d * cum          # NEE uses post-albedo throughput

ratio_d = gathered texel rgb at textured lanes, 1.0 elsewhere. Depth 1's
albedo is the primary G-buffer albedo (real texture values, already
fetched densely + cached for static cameras), passed in as planes — so
no ratio is needed for it.

Numerically this reassociates the product of albedo factors (float
mulitplication is not associative), so results match the per-bounce
path to ~1e-6 relative, not bit-exactly; parity with the XLA oracle is
tested at that tolerance (tests/test_engine.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptdn_tpu.ops.pallas.compact import (tile_gather_compact, tile_route,
                                         tile_uncompact)
from ptdn_tpu.ops.pallas.scene_intersect import (_vmem_kw,
                                                 chunk_aabb_ops,
                                                 closest_hit_tiles,
                                                 light_visibility_tiles,
                                                 tex_index_tiles)
from ptdn_tpu.ops.pallas.shade import _select_mat, lane_seed, shade_tiles

# 32 ray rows (4096 lanes) per block: the whole-path kernel runs 25%
# faster than at 8 rows (fewer grid steps amortize per-block SMEM scalar
# loads and DMA bookkeeping: cornell depth-8 16.1 -> 12.0 ms) and the
# tile-wide texel compaction packs 4x denser (~87% vs 44% row fill), so
# the deferred gather pays ~half the indices. Callers must pad ray
# batches to RROWS*128 lanes (engine.wavefront lane_pad).
RROWS = 32


def block_rows(n_chunks: int) -> int:
    """Block rows the path kernel will use for a scene with `n_chunks`
    triangle chunks. Many-chunk scenes run the compacted chunk loops,
    whose dynamic row reads are vreg-local (tpu.dynamic_gather axis=0
    requires exactly 8 sublanes) — those must stay at 8-row blocks."""
    return RROWS if n_chunks <= 4 else 8
N_PIN = 16
# input plane indices (primary state; throughput/radiance start at 1/0)
(P_OX, P_OY, P_OZ, P_DX, P_DY, P_DZ, P_T, P_NX, P_NY, P_NZ,
 P_AR, P_AG, P_AB, P_MAT, P_ACT, P_DIF) = range(16)


def _kernel(inp, par_ref, fd_ref,
            tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r, cmax_r,
            attr_r, contrib_o, *tex_outs,
            mats, shadow_ray, reduce_var, geom_types, geom_mats,
            n_tris, n_chunks, cull, compat, light_geom, do_vis,
            light_emit, depth, alb_skip1, mat_texids, tex_whs, atlas_hw,
            cap, emit_tex, rrows, static_mats=None):
    shape = (rrows, 128)
    i = pl.program_id(0)
    frame = fd_ref[0, 0]
    lane0 = fd_ref[0, 1]
    ltx, lty, ltz, lrad, sint = (par_ref[0, j] for j in range(5))

    tiles = {
        "ox": inp[P_OX], "oy": inp[P_OY], "oz": inp[P_OZ],
        "dx": inp[P_DX], "dy": inp[P_DY], "dz": inp[P_DZ],
        "t": inp[P_T],
        "nx": inp[P_NX], "ny": inp[P_NY], "nz": inp[P_NZ],
        "ar": inp[P_AR], "ag": inp[P_AG], "ab": inp[P_AB],
        "mat": inp[P_MAT], "act": inp[P_ACT], "dif": inp[P_DIF],
        "tr": jnp.ones(shape, jnp.float32),
        "tg": jnp.ones(shape, jnp.float32),
        "tb": jnp.ones(shape, jnp.float32),
        "rr": jnp.zeros(shape, jnp.float32),
        "rg": jnp.zeros(shape, jnp.float32),
        "rb": jnp.zeros(shape, jnp.float32),
    }

    vis_refs = (tf_r, inv_r, invt_r, gbbmin_r, gbbmax_r, tri_r, cmin_r,
                cmax_r)
    hit_refs = vis_refs + (attr_r,)

    for d in range(1, depth + 1):
        seed = lane_seed(i, frame + jnp.uint32(d), shape, lane0)
        par = (ltx, lty, ltz, lrad, sint,
               jnp.float32(1.0 if (d == 1 and alb_skip1) else 0.0))
        res = shade_tiles(tiles, seed, par, mats=mats,
                          shadow_ray=shadow_ray, reduce_var=reduce_var)

        base = 6 * (d - 1)
        contrib_o[base + 0] = res["er"]
        contrib_o[base + 1] = res["eg"]
        contrib_o[base + 2] = res["eb"]
        if do_vis:
            lit = light_visibility_tiles(
                (res["spx"], res["spy"], res["spz"]),
                (res["sdx"], res["sdy"], res["sdz"]),
                vis_refs, shape, geom_types=geom_types, n_tris=n_tris,
                n_chunks=n_chunks, light_geom=light_geom,
                nee_mask=res["nee"], static_mats=static_mats)
            # select, not multiply: cr can be inf/NaN on non-NEE lanes
            litb = lit > 0.5
            contrib_o[base + 3] = jnp.where(litb, res["cr"] * light_emit[0],
                                            0.0)
            contrib_o[base + 4] = jnp.where(litb, res["cg"] * light_emit[1],
                                            0.0)
            contrib_o[base + 5] = jnp.where(litb, res["cb"] * light_emit[2],
                                            0.0)
        else:
            zero = jnp.zeros(shape, jnp.float32)
            contrib_o[base + 3] = zero
            contrib_o[base + 4] = zero
            contrib_o[base + 5] = zero

        if d == depth:
            break

        t, geom, nx, ny, nz, uu, vv, mat = closest_hit_tiles(
            (res["spx"], res["spy"], res["spz"]),
            (res["dx"], res["dy"], res["dz"]),
            hit_refs, shape, geom_types=geom_types, geom_mats=geom_mats,
            n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat,
            alive=res["act"], static_mats=static_mats)
        act = res["act"] * jnp.where(geom >= 0.0, 1.0, 0.0)

        # next albedo: static material color; textured lanes use 1.0 and
        # defer the texel ratio to the post-pass
        ar = _select_mat(mat, mats["col_r"])
        ag = _select_mat(mat, mats["col_g"])
        ab = _select_mat(mat, mats["col_b"])
        if emit_tex:
            tidx = tex_index_tiles(uu, vv, mat, shape,
                                   mat_texids=mat_texids, tex_whs=tex_whs,
                                   atlas_hw=atlas_hw)
            tidx = jnp.where(act > 0.5, tidx, -1)
            textured = tidx >= 0
            ar = jnp.where(textured, 1.0, ar)
            ag = jnp.where(textured, 1.0, ag)
            ab = jnp.where(textured, 1.0, ab)
            # tile-WIDE compaction (not per-row): this tile's valid
            # texel indices packed row-major into the first k lanes of
            # cv, so the XLA gather can pack rows globally and pay only
            # ~ceil(k/128) rows per tile instead of a per-row cap
            # (bounce-2 rays are coherent: per-row counts are bimodal
            # and blow any row cap; see deferred_radiance)
            sl_o, cv_o, cn_o = tex_outs
            # phase-2 routing runs on capped (8, 128) output vregs: at
            # the expected texel density (~5% of 4096 lanes) the packed
            # values fit 2-3 rows; a denser tile (> 1024 texels) skips
            # compaction entirely — identity packing is value-correct
            # and just pays full rows in the deferred ladder
            cap_rows = min(8, rrows)

            def route_emit(_):
                slot, k_tile, route = tile_route(
                    jnp.where(textured, 1, 0), shape, out_rows=cap_rows)

                def compacted(_):
                    cv = tile_gather_compact(tidx, route, shape)
                    if cap_rows < rrows:
                        cv = jnp.concatenate(
                            [cv, jnp.zeros((rrows - cap_rows, 128),
                                           jnp.int32)], axis=0)
                    return slot, cv, k_tile

                def identity(_):
                    rowi = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
                    lanei = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
                    sl_id = jnp.where(textured, rowi * 128 + lanei, -1)
                    return (sl_id, jnp.maximum(tidx, 0),
                            jnp.int32(rrows * 128))

                if cap_rows < rrows:
                    return jax.lax.cond(
                        k_tile <= cap_rows * 128, compacted, identity, None)
                return compacted(None)

            def no_texels(_):
                # texel-free (tile, depth): skip the whole prefix-sum +
                # binary-search routing; slot=-1 means "untextured" to
                # tile_uncompact and count 0 contributes no ladder rows
                return (jnp.full(shape, -1, jnp.int32),
                        jnp.zeros(shape, jnp.int32), jnp.int32(0))

            slot_f, cv_f, k_f = jax.lax.cond(
                jnp.any(textured), route_emit, no_texels, None)
            sl_o[d - 1] = slot_f
            cv_o[d - 1] = cv_f
            cn_o[d - 1] = jnp.full(shape, k_f, jnp.int32)

        tiles = {
            "ox": res["spx"], "oy": res["spy"], "oz": res["spz"],
            "dx": res["dx"], "dy": res["dy"], "dz": res["dz"],
            "t": t, "nx": nx, "ny": ny, "nz": nz,
            "ar": ar, "ag": ag, "ab": ab,
            "mat": mat, "act": act, "dif": res["dif"],
            "tr": res["tr"], "tg": res["tg"], "tb": res["tb"],
            "rr": tiles["rr"], "rg": tiles["rg"], "rb": tiles["rb"],
        }


def _uncompact_kernel(win_ref, sl_ref, out_ref, *, dm1, rrows):
    for d in range(dm1):
        out_ref[d] = tile_uncompact(win_ref[d], sl_ref[d], (rrows, 128), 0)


def uncompact_tiles_pallas(win, sl, *, rrows=RROWS, interpret=False):
    """Route globally-gathered texels back to their lanes. win/sl:
    (dm1, NB, 128) i32 — rows [rrows*b, rrows*(b+1)) of `win` are tile
    b's gathered window in packed row-major order; `sl` is each lane's
    slot in that packing (-1 = untextured, gets 0). `rrows` must match
    the emitting kernel's block rows (path: RROWS; bounce: 8)."""
    dm1, nb = win.shape[0], win.shape[1]
    spec = pl.BlockSpec((dm1, rrows, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_uncompact_kernel, dm1=dm1, rrows=rrows),
        grid=(nb // rrows,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((dm1, nb, 128), jnp.int32),
        interpret=interpret,
    )(win, sl)


def path_trace_fused_pallas(planes_in, params_vec, frame_lane0, ds,
                            *, mats, shadow_ray, reduce_var, geom_types,
                            geom_mats, n_tris, light_geom, do_vis,
                            light_emit, compat, depth, alb_skip1,
                            mat_texids, tex_whs, cap, emit_tex,
                            cull=True, interpret=False, static_mats=None):
    """planes_in: (N_PIN, NB, 128) f32 primary state. params_vec: (8,)
    f32 = (light_pos(3), lrad, sint, pad(3)). frame_lane0: (2,) u32.
    Returns (contrib (6*depth, NB, 128) f32,
             tex (slot, cvals, count) each (depth-1, NB, 128) i32 or
             None) — per 1024-lane tile, `cvals` holds the tile's valid
             texel indices packed row-major in its first `count` lanes
             and `slot` each lane's position in that packing (-1 if
             untextured)."""
    nb = planes_in.shape[1]
    cmin_op, cmax_op, n_chunks = chunk_aabb_ops(ds, n_tris)
    atlas_hw = (int(ds.tex_atlas.shape[1]), int(ds.tex_atlas.shape[2]))
    emit_tex = emit_tex and depth > 1
    rows = block_rows(n_chunks)
    kern = functools.partial(
        _kernel, mats=mats, shadow_ray=shadow_ray, reduce_var=reduce_var,
        geom_types=tuple(geom_types), geom_mats=tuple(geom_mats),
        n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat,
        light_geom=light_geom, do_vis=do_vis,
        light_emit=tuple(float(x) for x in light_emit), depth=depth,
        alb_skip1=alb_skip1, mat_texids=tuple(mat_texids),
        tex_whs=tuple(tex_whs), atlas_hw=atlas_hw, cap=cap,
        emit_tex=emit_tex, rrows=rows, static_mats=static_mats)
    pin = pl.BlockSpec((N_PIN, rows, 128), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    contrib_spec = pl.BlockSpec((6 * depth, rows, 128),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
    out_specs = [contrib_spec]
    out_shape = [jax.ShapeDtypeStruct((6 * depth, nb, 128), jnp.float32)]
    if emit_tex:
        tex_spec = pl.BlockSpec((depth - 1, rows, 128),
                                lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)
        out_specs += [tex_spec] * 3
        out_shape += [jax.ShapeDtypeStruct((depth - 1, nb, 128),
                                           jnp.int32)] * 3
    outs = pl.pallas_call(
        kern,
        **_vmem_kw(n_tris),
        grid=(nb // rows,),
        in_specs=[pin,
                  pl.BlockSpec((1, 8), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  smem, smem, smem, smem, smem, full, smem, smem, full],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(planes_in, params_vec.reshape(1, 8),
      frame_lane0.reshape(1, 2),
      ds.geom_transform, ds.geom_inverse, ds.geom_inv_transpose,
      ds.geom_bb_min, ds.geom_bb_max, ds.tri_moller,
      cmin_op, cmax_op, ds.tri_attr_t)
    if emit_tex:
        return outs[0], tuple(outs[1:])
    return (outs if not isinstance(outs, (list, tuple)) else outs[0]), None
