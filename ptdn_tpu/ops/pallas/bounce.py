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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ptdn_tpu.ops.pallas.scene_intersect import (closest_hit_tiles,
                                                 light_visibility_tiles)
from ptdn_tpu.ops.pallas.shade import (_IN_KEYS, _fd2, lane_seed,
                                       shade_tiles)

RROWS = 8
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
            light_emit):
    shape = (RROWS, 128)
    i = pl.program_id(0)
    tiles = {k: inp[j] for j, k in enumerate(_IN_KEYS)}
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
            n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat)
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
    """planes_in: (N_BIN, NB, 128) f32. params_vec: (8,) f32 =
    (light_pos(3), lrad, sint, alb_skip, do_next, pad). Returns
    (N_BOUT, NB, 128) f32."""
    nb = planes_in.shape[1]
    n_chunks = int(ds.tri_mm.shape[0]) if n_tris else 0
    kern = functools.partial(
        _kernel, mats=mats, shadow_ray=shadow_ray, reduce_var=reduce_var,
        geom_types=tuple(geom_types), geom_mats=tuple(geom_mats),
        n_tris=n_tris, n_chunks=n_chunks, cull=cull, compat=compat,
        light_geom=light_geom, do_vis=do_vis,
        light_emit=tuple(float(x) for x in light_emit))
    plane_in_spec = pl.BlockSpec((N_BIN, RROWS, 128), lambda i: (0, i, 0),
                                 memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
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
      ds.tri_chunk_min, ds.tri_chunk_max, ds.tri_attr_t)
    return out
