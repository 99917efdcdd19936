"""[SUPERSEDED] First-generation mesh kernel — kept as a documented
negative result (see docs/PERF_NOTES.md): the MXU plane-form needs K=4
dots, which pad to K=128 and lose 32x; the [R,4] sublane ray layout
relayouts everything. scene_intersect.py (rays in lanes, triangles in
sublane groups, pure VPU broadcasts) is 5x faster and is the production
path.

Pallas TPU kernel: fused closest-hit over all mesh triangles.

This replaces the XLA brute-force streaming path for the hot passes. The
XLA version materializes (N, 128) HBM temporaries per triangle chunk
(~60 GB/frame at 800x800); this kernel keeps everything in VMEM:

* rays are blocked (RBLK per grid step) as [RBLK, 4] homogeneous matrices
  [o,1] / [d,0];
* each 128-triangle chunk is three (4, 128) plane matrices (built at scene
  upload, see scene.py tri_mm): two tiny MXU matmuls per chunk yield all
  six ray/plane dot products, and a ~15-op VPU epilogue turns them into
  (t, u, v, accept) for all RBLK x 128 pairs at once;
* per-chunk AABB culling: the chunk is skipped unless some ray in the
  block hits its bounding box (triangles are in BVH leaf order, so chunks
  are spatially tight);
* the kernel returns only (best_t, best_tri) per ray; the caller re-runs
  the exact glm-parity Moller-Trumbore test on the single winning
  triangle (ops/intersect.ray_triangle) to produce the final t/u/v, so
  numerical parity with the reference comes from ONE well-tested formula.

Equivalent to IntersectBVH + Triangle::Intersect closest-hit semantics
(reference src/intersections.h:265-329) with earlier-triangle-wins ties.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = 3.402823466e38      # python floats: kernels must not capture
FLT_EPSILON = 1.1920929e-07   # traced constants
RBLK = 512          # rays per grid step
TCHUNK = 128        # triangles per chunk (== tri_mm lane width)


def _mesh_kernel(o4_ref, d4_ref, mm_ref, cmin_ref, cmax_ref,
                 tout_ref, iout_ref, *, n_chunks: int, n_tris: int,
                 cull: bool):
    o4 = o4_ref[:]                      # [RBLK, 4]
    d4 = d4_ref[:]

    best_t = jnp.full((RBLK, 1), FLT_MAX, jnp.float32)
    best_i = jnp.full((RBLK, 1), jnp.float32(-1.0))   # tri idx as f32 lanes

    if cull:
        # slab test per ray against chunk AABB (scalar corners)
        invd = 1.0 / d4[:, 0:3]
        o3 = o4[:, 0:3]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, TCHUNK), 1).astype(
        jnp.float32)

    for c in range(n_chunks):
        def chunk_body(best):
            best_t, best_i = best
            mn = mm_ref[c, 0]           # [4, 128]
            mu = mm_ref[c, 1]
            mv = mm_ref[c, 2]
            a_n = jnp.dot(o4, mn, preferred_element_type=jnp.float32)
            b_n = jnp.dot(d4, mn, preferred_element_type=jnp.float32)
            a_u = jnp.dot(o4, mu, preferred_element_type=jnp.float32)
            b_u = jnp.dot(d4, mu, preferred_element_type=jnp.float32)
            a_v = jnp.dot(o4, mv, preferred_element_type=jnp.float32)
            b_v = jnp.dot(d4, mv, preferred_element_type=jnp.float32)

            # plane hit: t = (d0 - n.o)/(n.d) = -a_n / b_n; glm backface
            # cull is a = -(n.d) >= eps (glm/gtx/intersect.inl:53-54)
            t = -a_n / b_n
            u = a_u + t * b_u
            v = a_v + t * b_v
            ok = ((-b_n >= FLT_EPSILON) & (u >= 0.0) & (u <= 1.0)
                  & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0))
            if (c + 1) * TCHUNK > n_tris:     # padding rows in last chunk
                ok = ok & (lane < (n_tris - c * TCHUNK))
            tm = jnp.where(ok, t, FLT_MAX)
            ct = jnp.min(tm, axis=1, keepdims=True)            # [RBLK,1]
            ci = jnp.min(jnp.where(tm == ct, lane, jnp.float32(TCHUNK)),
                         axis=1, keepdims=True) + jnp.float32(c * TCHUNK)
            upd = ct < best_t
            return (jnp.where(upd, ct, best_t), jnp.where(upd, ci, best_i))

        if cull:
            t0 = (cmin_ref[c] - o3) * invd       # broadcasts [RBLK,3]
            t1 = (cmax_ref[c] - o3) * invd
            tmin = jnp.max(jnp.minimum(t0, t1), axis=1, keepdims=True)
            tmax = jnp.min(jnp.maximum(t0, t1), axis=1, keepdims=True)
            hit_any = jnp.any((tmax >= 0.0) & (tmin <= tmax)
                              & (tmin[:, 0:1] < best_t))
            best_t, best_i = jax.lax.cond(
                hit_any, chunk_body, lambda b: b, (best_t, best_i))
        else:
            best_t, best_i = chunk_body((best_t, best_i))

    tout_ref[:] = jnp.where(best_i >= 0.0, best_t, -1.0)
    iout_ref[:] = best_i


def mesh_intersect_pallas(ds, o, d, n_tris: int, cull: bool = True,
                          interpret: bool = False):
    """Closest mesh hit for all rays. Returns (t, u, v, tri_idx, hit) with
    the same contract as ops.bvh_traverse.mesh_brute_force."""
    from ptdn_tpu.ops.intersect import ray_triangle

    n = o.shape[0]
    n_chunks = ds.tri_mm.shape[0]
    pad = (-n) % RBLK
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    npad = n + pad
    o4 = jnp.concatenate([o, jnp.ones((npad, 1), jnp.float32)], axis=1)
    d4 = jnp.concatenate([d, jnp.zeros((npad, 1), jnp.float32)], axis=1)

    grid = npad // RBLK
    kernel = functools.partial(_mesh_kernel, n_chunks=n_chunks,
                               n_tris=n_tris, cull=cull)
    t_out, i_out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((RBLK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBLK, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tri_mm, whole
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk mins
            pl.BlockSpec(memory_space=pltpu.VMEM),   # chunk maxs
        ],
        out_specs=[
            pl.BlockSpec((RBLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
            jax.ShapeDtypeStruct((npad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(o4, d4, ds.tri_mm, ds.tri_chunk_min, ds.tri_chunk_max)

    tri_idx = i_out[:n, 0].astype(jnp.int32)
    rough_hit = tri_idx >= 0
    safe = jnp.maximum(tri_idx, 0)
    tv = ds.tri_v[safe]
    # exact glm-parity refinement on the single winning triangle
    t, u, v, hit = ray_triangle(o[:n], d[:n], tv[:, 0], tv[:, 1], tv[:, 2])
    hit = hit & rough_hit & (t > 0)
    return (jnp.where(hit, t, -1.0), u, v,
            jnp.where(hit, tri_idx, -1), hit)
