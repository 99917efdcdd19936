"""SVGF orchestration: the reference's denoise() host routine as one
functional jit-traceable step over a carried state pytree.

Mirrors src/denoise.cu:349-402:
* temporal on  -> BackProjection, then color history <- accumulated color;
* temporal off -> EstimateVariance STUB writing 10.0 (denoise.cu:320-329,
  replicated) and color history <- raw input;
* debug views (history/100, variance/0.1) bypass filtering;
* else à-trous levels 1..nlevel ping-pong, feeding level
  `history_level`'s output back into the color history (SVGF's
  first-iteration-feeds-history trick, denoise.cu:386-392);
* end of frame: previous G-buffer / moments / history length / view
  matrix saved — here that's just returning the new state pytree
  (the reference's cudaMemcpy D2D copies become functional threading).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from ptdn_tpu.denoise.atrous import atrous_level
from ptdn_tpu.denoise.reproject import back_projection, luminance


def init_denoise_state(resolution) -> Dict[str, jnp.ndarray]:
    """denoiseInit equivalents (denoise.cu:31-61), zero-initialized."""
    w, h = resolution
    f = jnp.float32
    return {
        "color_history": jnp.zeros((h, w, 3), f),
        "moment_history": jnp.zeros((h, w, 2), f),
        "history_length": jnp.zeros((h, w), jnp.int32),
        "prev_position": jnp.zeros((h, w, 3), f),
        "prev_normal": jnp.zeros((h, w, 3), f),
        "prev_geom_id": jnp.full((h, w), -1, jnp.int32),
        "prev_view": jnp.eye(4, dtype=f),
    }


def make_denoise_fn(cfg, resolution, interpret=None, pyramid_override=None):
    """Build denoise(state, raw_color, gbuffer, view_mat, params)
    -> (output, new_state). Static structure from cfg; sigmas/alphas traced.
    `interpret`: Pallas interpret mode (None = auto-detect at build).
    `pyramid_override(src, variance, gbuffer, params) -> (output,
    color_history)`: replaces the à-trous level loop — the multi-chip
    path (parallel/sharded.py) supplies the pallas pyramid under
    shard_map with explicit halo exchange here."""
    w, h = resolution
    interp_override = interpret

    # fused reprojection + à-trous level 1 (ops/pallas/reproject_atrous):
    # the accumulated color never round-trips HBM. Gated to the shape the
    # fusion is valid for: level 1 is not the last level (no albedo
    # remodulation inside), its output IS the new color history
    # (history_level == 1, the reference default), and no debug view
    # bypasses filtering.
    # Off by default: measured neutral-to-slightly-negative on cornell
    # (round 2's fused stencil already removed the reprojection gather
    # cost; see utils/config.py:fuse_reproject_l1).
    fuse_l1 = (cfg.fuse_reproject_l1
               and cfg.backend == "pallas" and cfg.temporal_enable
               and cfg.spatial_enable and cfg.atrous_nlevel >= 2
               and cfg.history_level == 1 and cfg.right_view_option == 0
               # 1080p-wide compiles of the fused kernel took down the
               # remote TPU worker (round 5, w=1920); the knob is
               # measured-neutral anyway — hard-gate it to the widths
               # it was validated at
               and w <= 1024)

    def denoise(state, raw_color, gbuffer, view_mat, params
                ) -> Tuple[jnp.ndarray, Dict]:
        prev_gb = {
            "position": state["prev_position"],
            "normal": state["prev_normal"],
            "geom_id": state["prev_geom_id"],
        }
        if fuse_l1:
            import jax

            from ptdn_tpu.denoise.reproject import (BAND_MARGIN,
                                                    back_projection_banded,
                                                    motion_bounds)
            from ptdn_tpu.engine.wavefront import _pallas_interpret
            from ptdn_tpu.ops.pallas.atrous import (atrous_level_pallas,
                                                    pack_static_planes)
            from ptdn_tpu.ops.pallas.reproject_atrous import \
                back_projection_atrous1_pallas

            interp = (_pallas_interpret() if interp_override is None
                      else interp_override)
            static_planes, static_halo = pack_static_planes(
                gbuffer, max_level=cfg.atrous_nlevel)
            near, _ = motion_bounds((w, h), gbuffer, state["prev_view"])
            args = (raw_color, gbuffer, prev_gb, state["prev_view"],
                    state["color_history"], state["moment_history"],
                    state["history_length"],
                    params["color_alpha"], params["moment_alpha"])
            l1_kw = dict(sigma_l=params["sigma_l"],
                         sigma_n=params["sigma_n"],
                         sigma_x=params["sigma_x"],
                         blur_variance=cfg.blur_variance)

            def _near(a):
                return back_projection_atrous1_pallas(
                    (w, h), *a, interpret=interp, **l1_kw)

            def _far(a):
                var0, acc, mom, hist = back_projection_banded(
                    (w, h), *a, margin=BAND_MARGIN)
                dst1, var1 = atrous_level_pallas(
                    acc, var0, static_planes, static_halo, (h, w), 1,
                    is_last=False, add_color=False, interpret=interp,
                    **l1_kw)
                return dst1, var1, mom, hist

            src, var, moment_acc, hist_up = jax.lax.cond(
                near, _near, _far, args)
            color_history = src
            for level in range(2, cfg.atrous_nlevel + 1):
                src, var = atrous_level_pallas(
                    src, var, static_planes, static_halo, (h, w), level,
                    is_last=(level == cfg.atrous_nlevel),
                    add_color=(cfg.sep_color and cfg.add_color),
                    interpret=interp, **l1_kw)
            return src, {
                "color_history": color_history,
                "moment_history": moment_acc,
                "history_length": hist_up,
                "prev_position": gbuffer["position"],
                "prev_normal": gbuffer["normal"],
                "prev_geom_id": gbuffer["geom_id"],
                "prev_view": view_mat,
            }
        # temporal off forces alpha = 1.0 (denoise.cu:360-361)
        if cfg.temporal_enable:
            from ptdn_tpu.denoise.reproject import back_projection_auto

            if cfg.backend == "pallas":
                from ptdn_tpu.engine.wavefront import _pallas_interpret

                interp = (_pallas_interpret() if interp_override is None
                          else interp_override)
                bp_kw = {"pallas_interpret": interp}
                bp = back_projection_auto
            else:
                bp_kw = {}
                bp = back_projection
            variance, color_acc, moment_acc, hist_up = bp(
                (w, h), raw_color, gbuffer, prev_gb, state["prev_view"],
                state["color_history"], state["moment_history"],
                state["history_length"],
                params["color_alpha"], params["moment_alpha"], **bp_kw)
            color_history = color_acc
            if not cfg.compat:
                # native mode: short-history pixels (< 4 frames — fresh
                # starts, disocclusions) take the SVGF-paper spatial
                # moment estimate instead of 1-3-sample temporal moments
                from ptdn_tpu.denoise.variance import \
                    variance_with_spatial_fallback

                variance = variance_with_spatial_fallback(
                    variance, hist_up, color_acc, gbuffer,
                    params["sigma_n"], params["sigma_x"])
        else:
            color_history = raw_color
            moment_acc = state["moment_history"]
            hist_up = state["history_length"]
            if cfg.compat:
                # EstimateVariance stub = 10.0 (denoise.cu:320-329)
                variance = jnp.full((h, w), 10.0, jnp.float32)
            else:
                # native mode: the stub replaced by the SVGF-paper 7x7
                # bilateral spatial estimate (denoise/variance.py)
                from ptdn_tpu.denoise.variance import spatial_variance

                variance = spatial_variance(
                    raw_color, gbuffer, params["sigma_n"],
                    params["sigma_x"])

        if cfg.right_view_option == 1:
            output = jnp.broadcast_to(
                (hist_up.astype(jnp.float32) / 100.0)[..., None], (h, w, 3))
        elif cfg.right_view_option == 2:
            output = jnp.broadcast_to((variance / 0.1)[..., None], (h, w, 3))
        elif cfg.atrous_nlevel == 0 or not cfg.spatial_enable:
            output = color_history
        elif pyramid_override is not None:
            output, color_history = pyramid_override(
                color_history, variance, gbuffer, params)
        else:
            use_pallas = cfg.backend == "pallas"
            if use_pallas:
                from ptdn_tpu.engine.wavefront import _pallas_interpret
                from ptdn_tpu.ops.pallas.atrous import (atrous_level_pallas,
                                                        pack_static_planes)

                interp = (_pallas_interpret() if interp_override is None
                          else interp_override)
                static_planes, static_halo = pack_static_planes(
                    gbuffer, max_level=cfg.atrous_nlevel,
                    with_albedo=bool(cfg.sep_color and cfg.add_color))
            src = color_history
            var = variance
            output = src
            for level in range(1, cfg.atrous_nlevel + 1):
                kw = dict(is_last=(level == cfg.atrous_nlevel),
                          sigma_l=params["sigma_l"],
                          sigma_n=params["sigma_n"],
                          sigma_x=params["sigma_x"],
                          blur_variance=cfg.blur_variance,
                          add_color=(cfg.sep_color and cfg.add_color))
                if use_pallas:
                    dst, var = atrous_level_pallas(
                        src, var, static_planes, static_halo, (h, w),
                        level, interpret=interp, **kw)
                else:
                    dst, var = atrous_level(src, var, gbuffer, level, **kw)
                if level == cfg.history_level:
                    color_history = dst
                src = dst
            output = src

        new_state = {
            "color_history": color_history,
            "moment_history": moment_acc,
            "history_length": hist_up,
            "prev_position": gbuffer["position"],
            "prev_normal": gbuffer["normal"],
            "prev_geom_id": gbuffer["geom_id"],
            "prev_view": view_mat,
        }
        return output, new_state

    return denoise
