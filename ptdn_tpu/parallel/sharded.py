"""Multi-chip frame step: jit the full step over a device mesh with
row-sharded image state and replicated scene.

With in/out shardings pinned on the carried state and frame outputs, XLA
SPMD propagates the row partition through the whole program: ray
generation, tracing and shading stay fully local per chip (rays never
leave their shard), and the only ICI traffic is the halo exchange the
à-trous stencils / reprojection gathers need — exactly the communication
pattern hand-written in a CUDA multi-GPU port, derived automatically from
sharding annotations (SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ptdn_tpu.engine.step import init_frame_state, make_frame_step
from ptdn_tpu.parallel.mesh import (make_mesh, replicated, row_sharding,
                                    shard_state)

# frame-state keys that are image-shaped (H, W, ...) or flat-ray-shaped
# (N = H*W, the same contiguous partition) and shard by rows
_IMAGE_KEYS = ("accum_image", "color_history", "moment_history",
               "history_length", "prev_position", "prev_normal",
               "prev_geom_id", "pcache_t", "pcache_normal", "pcache_uv",
               "pcache_mat_id", "pcache_geom_id", "pcache_hit",
               "pcache_albedo")


def state_shardings(mesh, state):
    out = {}
    for k, v in state.items():
        if k in _IMAGE_KEYS:
            out[k] = row_sharding(mesh, v.ndim)
        else:
            out[k] = replicated(mesh)
    return out


def _make_sharded_trace(scene, cfg, res, mesh, interpret=None):
    """The pallas trace under shard_map: each chip traces its own row
    shard (rays never leave their chip — the tracer is embarrassingly
    row-parallel), with the shard's row offset threaded into pixel
    coords and RNG lane seeds so per-pixel results are bit-identical to
    the single-chip program. Pallas kernels have no GSPMD partitioning
    rule, so shard_map (explicit SPMD) is the idiomatic wrapper."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ptdn_tpu.engine.wavefront import make_trace_fn
    from ptdn_tpu.parallel.mesh import ROW_AXIS

    if hasattr(jax, "shard_map"):       # jax >= 0.6: check_vma kwarg
        def shard_map(f, mesh, in_specs, out_specs, check_rep):
            return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=check_rep)
    else:                               # older jax (deprecated path)
        from jax.experimental.shard_map import shard_map

    w, h = res
    h_local = h // mesh.size
    trace_local = make_trace_fn(scene, cfg, (w, h_local),
                                full_height=h, interpret=interpret)

    row = P(ROW_AXIS)
    rep = P()
    pc_specs = {k: row for k in ("t", "normal", "uv", "mat_id", "geom_id",
                                 "hit", "albedo")}
    gb_specs = {k: row for k in ("position", "normal", "albedo",
                                 "ialbedo", "geom_id")}

    def body(ds, cam, params, frame, pcache, camch):
        r0 = jax.lax.axis_index(ROW_AXIS) * h_local
        return trace_local(ds, cam, params, frame, primary_cache=pcache,
                           cam_changed=camch, row0=r0)

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(rep, rep, rep, rep, pc_specs, rep),
        out_specs=(row, gb_specs, pc_specs),
        check_rep=False)

    def trace(ds, cam, params, frame, primary_cache=None,
              cam_changed=None):
        return sharded(ds, cam, params, frame, primary_cache, cam_changed)

    return trace


def _shard_map(f, mesh, in_specs, out_specs):
    import jax
    if hasattr(jax, "shard_map"):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map
    return shard_map(f, mesh=mesh, in_specs=in_specs,
                     out_specs=out_specs, check_rep=False)


def _make_sharded_pyramid(cfg, res, mesh, interpret):
    """The à-trous level loop (svgf.make_denoise_fn's spatial branch)
    as the PRODUCTION pallas kernels under shard_map: each chip filters
    its own row slab; before each level one ppermute halo exchange
    (parallel/halo.py) fetches the 2*2^level neighbor rows its dilated
    5x5 stencil reads (reference denoise.cu:130-148), multi-hop when the
    halo exceeds the shard height. The kernels mask taps by GLOBAL image
    coordinates (row0 = shard offset, rides the sigma SMEM operand), so
    per-pixel results are bit-identical to the single-chip pallas
    pyramid."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ptdn_tpu.ops.pallas.atrous import (atrous_halo,
                                            atrous_level_pallas,
                                            pack_static_planes)
    from ptdn_tpu.parallel.halo import halo_rows
    from ptdn_tpu.parallel.mesh import ROW_AXIS

    w, h = res
    h_local = h // mesh.size
    nlevel = cfg.atrous_nlevel
    static_halo = atrous_halo(max(nlevel, 1))
    with_albedo = bool(cfg.sep_color and cfg.add_color)
    add_color = with_albedo

    row = P(ROW_AXIS)
    rep = P()

    def body(src, var, pos, nrm, alb_mod, sl, sn, sx):
        r0 = (jax.lax.axis_index(ROW_AXIS) * h_local).astype(jnp.float32)
        # ONE exchange extends the static G-buffer planes for all levels
        gb_stack = jnp.concatenate(
            [pos, nrm] + ([alb_mod] if with_albedo else []), axis=-1)
        top, bot = halo_rows(gb_stack, static_halo, ROW_AXIS)
        ext = jnp.concatenate([top, gb_stack, bot], axis=0)
        gb_ext = {"position": ext[..., 0:3], "normal": ext[..., 3:6]}
        if with_albedo:
            gb_ext["albedo"] = ext[..., 6:9]
            gb_ext["ialbedo"] = jnp.ones_like(ext[..., 6:9])
        static_planes, shalo = pack_static_planes(
            gb_ext, max_level=nlevel, with_albedo=with_albedo,
            pre_extended=True)

        color_history = src
        for level in range(1, nlevel + 1):
            halo = atrous_halo(level)
            dyn4 = jnp.concatenate([src, var[..., None]], axis=-1)
            t4, b4 = halo_rows(dyn4, halo, ROW_AXIS)
            src, var = atrous_level_pallas(
                src, var, static_planes, shalo, (h_local, w), level,
                is_last=(level == nlevel), add_color=add_color,
                sigma_l=sl, sigma_n=sn, sigma_x=sx,
                blur_variance=cfg.blur_variance,
                interpret=interpret if interpret is not None else False,
                row0=r0, full_h=h,
                halo_top=(t4[..., 0:3], t4[..., 3]),
                halo_bottom=(b4[..., 0:3], b4[..., 3]))
            if level == cfg.history_level:
                color_history = src
        return src, color_history

    def pyramid(src, variance, gbuffer, params):
        alb_mod = gbuffer["albedo"] * gbuffer["ialbedo"]
        f = _shard_map(
            body, mesh,
            in_specs=(row, row, row, row, row, rep, rep, rep),
            out_specs=(row, row))
        return f(src, variance, gbuffer["position"], gbuffer["normal"],
                 alb_mod, params["sigma_l"], params["sigma_n"],
                 params["sigma_x"])

    return pyramid


def make_sharded_step(scene, cfg, resolution=None, mesh=None, n_devices=None):
    """Build (jitted_step, initial_sharded_state, mesh)."""
    mesh = mesh or make_mesh(n_devices)
    res = tuple(resolution or scene.resolution)
    if res[1] % mesh.size != 0:
        raise ValueError(
            f"image height {res[1]} must divide across {mesh.size} devices")
    # virtual-CPU meshes (the fake-backend test/dryrun path) run Pallas
    # interpreted; captured at build time and threaded explicitly so no
    # process-global state is mutated (a later TPU build in the same
    # process is unaffected — ADVICE r1)
    interp = (True if all(d.platform == "cpu" for d in mesh.devices.flat)
              else None)
    if cfg.backend == "pallas":
        import dataclasses

        trace_sh = _make_sharded_trace(scene, cfg, res, mesh,
                                       interpret=interp)
        # temporal reprojection's gathers need cross-shard halos with
        # data-dependent reach (motion): run the XLA implementation
        # under GSPMD (the partitioner inserts the collectives; same
        # math as the pallas stencil kernels to float level). The
        # à-trous pyramid — the bulk of the denoise cost — runs the
        # PRODUCTION pallas kernels under shard_map with explicit
        # ppermute halo exchange (_make_sharded_pyramid).
        dn_cfg = dataclasses.replace(cfg, backend="xla")
        pyramid = None
        if (cfg.denoise_enable and cfg.spatial_enable
                and cfg.atrous_nlevel > 0 and cfg.right_view_option == 0):
            pyramid = _make_sharded_pyramid(cfg, res, mesh, interp)
        step = make_frame_step(scene, cfg, res, trace_override=trace_sh,
                               denoise_cfg=dn_cfg, interpret=interp,
                               pyramid_override=pyramid)
    else:
        step = make_frame_step(scene, cfg, res, interpret=interp)
    state0 = init_frame_state(res)
    st_shard = state_shardings(mesh, state0)
    rep = replicated(mesh)
    img_shard = row_sharding(mesh, 3)

    jitted = jax.jit(
        step,
        in_shardings=(st_shard, rep, rep, rep, rep, rep, rep),
        out_shardings=(st_shard, img_shard, img_shard),
        donate_argnums=(0,),
    )
    state0 = jax.device_put(state0, st_shard)
    return jitted, state0, mesh
