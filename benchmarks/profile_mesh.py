"""Stage-level profile of the sorted mesh bounce pipeline on TPU.

Times each component of bounce_sorted (engine/wavefront.py) separately
at a representative mid-path state (after 2 real bounces): the shade
kernel, the coherence-key computation (first_chunk_plane x2), the sort,
the permute gather, and the trace kernel split into visibility-only /
closest-hit-only / full.

Usage: python benchmarks/profile_mesh.py [scene] [WxH]
"""
import sys

import jax
import jax.numpy as jnp

from ptdn_tpu.engine import wavefront as WF
from ptdn_tpu.ops.camera import generate_camera_rays
from ptdn_tpu.ops.pallas import bounce as BK
from ptdn_tpu.ops.pallas import shade as SH
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.utils.timing import bench_slope

name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
res = sys.argv[2] if len(sys.argv) > 2 else "800x800"
W, H = (int(x) for x in res.split("x"))

scene = Scene(__import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path(name))
cfg = RenderConfig(backend="pallas", trace_depth=8, denoise_enable=True,
                   temporal_enable=True, spatial_enable=True,
                   atrous_nlevel=5)
ds = scene.device()
n = W * H
assert n % (8 * 128) == 0
nb = n // 128
n_chunks = -(-scene.n_tris // 128)
print(f"{name}: {scene.n_tris} tris, {n_chunks} chunks, {n} lanes")

geom_types = scene.geom_types
geom_mats = scene.geom_material_ids
mats = WF._static_mats(scene)
light_geom = 0
light_mat = scene.materials[geom_mats[light_geom]]
import numpy as np
light_emit = np.asarray(light_mat.color, np.float32) * np.float32(
    light_mat.emittance)
do_vis = True
show_tex = len(scene.textures) > 0
mat_texids = tuple(m.texid for m in scene.materials)
tex_whs = tuple((t.shape[1], t.shape[0]) for t in scene.textures)

cam = scene.camera
from ptdn_tpu.ops.camera import OrbitCamera
camera = OrbitCamera(cam, resolution=(W, H)).frame().as_pytree()


def plane(x):
    return x.reshape(nb, 128)


@jax.jit
def build_state(frame):
    from ptdn_tpu.ops.pallas.scene_intersect import (
        scene_intersect_full_pallas)
    origin, direction = generate_camera_rays(camera, (W, H))
    isect = scene_intersect_full_pallas(ds, geom_types, geom_mats, origin,
                                        direction, scene.n_tris)
    alb = WF.albedo_from(ds, WF.make_mat_reader(cfg)(ds, isect["mat_id"]),
                         isect["uv"], show_tex)
    planes = jnp.stack([
        plane(origin[:, 0]), plane(origin[:, 1]), plane(origin[:, 2]),
        plane(direction[:, 0]), plane(direction[:, 1]),
        plane(direction[:, 2]),
        plane(isect["t"]),
        plane(isect["normal"][:, 0]), plane(isect["normal"][:, 1]),
        plane(isect["normal"][:, 2]),
        plane(alb[:, 0]), plane(alb[:, 1]), plane(alb[:, 2]),
        plane(jnp.ones(n)), plane(jnp.ones(n)), plane(jnp.ones(n)),
        plane(jnp.zeros(n)), plane(jnp.zeros(n)), plane(jnp.zeros(n)),
        plane(isect["mat_id"].astype(jnp.float32)),
        plane(isect["hit"].astype(jnp.float32)),
        plane(jnp.zeros(n)),
    ])
    return planes, plane(jnp.arange(n, dtype=jnp.float32))


pv = jnp.concatenate([
    ds.geom_translation[light_geom],
    jnp.stack([jnp.float32(1.4), jnp.float32(2.7), jnp.float32(0),
               jnp.float32(1.0), jnp.float32(0)])])


def shade_fn(planes, pix, depth):
    fd = jnp.stack([jnp.uint32(7 + depth), jnp.uint32(0)])
    return SH.shade_bounce_pallas(
        jnp.concatenate([planes, pix[None]], axis=0), pv, fd, mats,
        True, True, interpret=False)


def keys_fn(outA):
    nlo, nhi = WF.chunk_range_planes(ds, outA[SH.O_SPX], outA[SH.O_SPY],
                                     outA[SH.O_SPZ], outA[SH.O_DX],
                                     outA[SH.O_DY], outA[SH.O_DZ], n_chunks)
    slo, shi = WF.chunk_range_planes(ds, outA[SH.O_SPX], outA[SH.O_SPY],
                                     outA[SH.O_SPZ], outA[SH.O_SDX],
                                     outA[SH.O_SDY], outA[SH.O_SDZ],
                                     n_chunks)
    return nlo, nhi, slo, shi


def sort_fn(key):
    return jax.lax.sort_key_val(key.reshape(n),
                                jnp.arange(n, dtype=jnp.int32))[1]


def permute_fn(outA, pix):
    return WF.permute_by_key(ds, outA, pix, n, nb, n_chunks, do_vis)


def trace_fn(outAp, do_next=1.0, dv=True):
    pvn = pv.at[6].set(jnp.float32(do_next))
    return BK.trace_bounce_pallas(
        outAp, pvn, ds, geom_types=geom_types, geom_mats=geom_mats,
        n_tris=scene.n_tris, light_geom=light_geom, do_vis=dv,
        light_emit=light_emit, compat=True, emit_tex=show_tex,
        mat_texids=mat_texids, tex_whs=tex_whs, interpret=False)


def albedo_fn(out, tex_comp):
    mat_id = out[BK.B_MAT].reshape(n).astype(jnp.int32)
    mv = WF.make_mat_reader(cfg)(ds, mat_id)
    if show_tex:
        return WF.albedo_from_tilepack(ds, mv, tex_comp, False)
    uv = jnp.stack([out[BK.B_UU].reshape(n),
                    out[BK.B_VV].reshape(n)], axis=-1)
    return WF.albedo_from(ds, mv, uv, show_tex, sparse_cap=32,
                          interpret=False)


@jax.jit
def advance(planes, pix, depth):
    """One full sorted bounce, to set up a representative state."""
    outA = shade_fn(planes, pix, depth)
    outAp, pix = permute_fn(outA, pix)
    out, tex_comp = trace_fn(outAp, 1.0, dv=do_vis)
    alb = albedo_fn(out, tex_comp)
    albp = jnp.stack([plane(alb[:, 0]), plane(alb[:, 1]),
                      plane(alb[:, 2])])
    next_in = jnp.concatenate([out[0:10], albp, out[10:19]], axis=0)
    return next_in, pix


def t(tag, fn, *args):
    ms = bench_slope(jax.jit(fn), *args, n1=5, n2=25)
    print(f"{tag:46s} {ms:8.2f} ms")
    return ms


if __name__ == "__main__":
    planes, pix = build_state(jnp.uint32(0))
    for d in (1, 2):
        planes, pix = advance(planes, pix, d)
    planes = jax.block_until_ready(planes)
    act = float(jnp.mean(planes[20]))
    print(f"depth-3 state: {act * 100:.1f}% lanes active")

    # pre-compute the stage inputs once
    outA = jax.jit(shade_fn)(planes, pix, 3)
    outAp, pixp = jax.jit(permute_fn)(outA, pix)

    t("shade kernel", shade_fn, planes, pix, 3)
    t("coherence keys (chunk_range x2, XLA)", keys_fn, outA)
    key = jax.jit(lambda o: (keys_fn(o)[0] * (n_chunks + 1)))(outA)
    t("sort_key_val", sort_fn, key)
    t("permute_by_key total (keys+sort+gather)", permute_fn, outA, pix)
    import functools
    t("trace kernel FULL (vis + closest-hit)",
      functools.partial(trace_fn, do_next=1.0, dv=True), outAp)
    t("trace kernel closest-hit only",
      functools.partial(trace_fn, do_next=1.0, dv=False), outAp)
    t("trace kernel visibility only",
      functools.partial(trace_fn, do_next=0.0, dv=True), outAp)
    t("trace kernel neither (shell)",
      functools.partial(trace_fn, do_next=0.0, dv=False), outAp)
    out, tex_comp = jax.jit(
    functools.partial(trace_fn, do_next=1.0, dv=True))(outAp)
    if show_tex:
        t("albedo gather (tilepack)", albedo_fn, out, tex_comp)
    t("full bounce (advance)", advance, planes, pix, 3)
