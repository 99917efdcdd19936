"""Runtime configuration.

The reference exposes ~30 mutable ``ui_*`` globals bound to ImGui widgets
(reference src/main.cpp:37-75, src/preview.cpp:211-375). Here that becomes
one frozen dataclass split two ways for the jitted frame step:

* structural fields (depths, level counts, on/off toggles) are **static**:
  changing them triggers a re-jit, like recompiling a kernel;
* continuous fields (sigmas, alphas, intensities, radii) are threaded in as
  a **traced float pytree** (``RenderConfig.traced_params()``), so an
  interactive app can slide them every frame with zero recompiles.

Defaults match the reference exactly (src/main.cpp:42-62).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    # -------- path tracer (main.cpp:39-47) --------
    trace_depth: int = 4            # ui_tracedepth (1..10)
    shadow_ray: bool = True         # ui_shadowray: NEE shadow ray to light 0
    reduce_var: bool = True         # ui_reducevar: skip emissive hit after diffuse
    shadow_intensity: float = 2.7   # ui_sintensity (traced)
    light_radius: float = 1.4       # ui_lightradius (traced)
    use_bvh: bool = True            # ui_usekdtree / USE_KDTREE
    show_texture: bool = True       # SHOW_TEXTURE compile flag (sceneStructs.h:16)

    # -------- denoiser (main.cpp:50-62) --------
    denoise_enable: bool = False    # ui_denoise_enable
    temporal_enable: bool = False   # ui_temporal_enable
    spatial_enable: bool = False    # ui_spatial_enable
    color_alpha: float = 0.2        # ui_color_alpha (traced)
    moment_alpha: float = 0.2       # ui_moment_alpha (traced)
    blur_variance: bool = True      # ui_blurvariance
    sigma_l: float = 0.45           # ui_sigmal (traced)
    sigma_x: float = 0.35           # ui_sigmax (traced)
    sigma_n: float = 0.2            # ui_sigman (traced)
    atrous_nlevel: int = 5          # ui_atrous_nlevel (0..7)
    history_level: int = 1          # ui_history_level
    sep_color: bool = False         # ui_sepcolor: demodulate first-hit albedo
    add_color: bool = False         # ui_addcolor: remodulate after last level

    # -------- camera automation (main.cpp:65-70) --------
    automate_camera: bool = False
    camera_speed_x: float = 0.0
    camera_speed_y: float = 0.0
    camera_speed_z: float = 0.0
    camera_speed_theta: float = 0.0
    camera_speed_phi: float = 0.0

    # -------- debug views (main.cpp:73-74) --------
    # 0 = filtered color, 1 = history length (/100), 2 = variance (/0.1)
    right_view_option: int = 0

    # -------- engine knobs (no reference equivalent; TPU-native) --------
    # "pallas" uses fused kernels for the hot passes; "xla" is the pure-JAX
    # oracle path. They must agree to ~float tolerance (tested).
    backend: str = "xla"
    # mesh intersection strategy: "auto" (brute force for small scenes,
    # BVH otherwise), "bvh", "brute".
    mesh_mode: str = "auto"
    # replicate reference quirks bit-for-bit (stale-albedo on miss, no
    # tan(fov/2) in reprojection, inverted moment alpha, ...). Fixing them
    # is allowed per-quirk later; parity tests run with compat=True.
    compat: bool = True
    # fully-fused bounce megakernel (ops/pallas/bounce.py): shade + NEE
    # visibility + next closest-hit in ONE Pallas launch. Wins on every
    # scene (it also enables per-bounce coherence sorting on mesh
    # scenes: room 259 -> 160 ms, bunny 704 -> 221 ms): default on.
    # Requires backend="pallas" and an analytic NEE light.
    fuse_bounce: bool = True
    # whole-path megakernel (ops/pallas/path.py): the ENTIRE bounce loop
    # in one Pallas launch with texture modulation deferred to a single
    # post-pass gather (the per-bounce texture fetches cost ~16.5 ms of
    # the 37.9 ms round-1 cornell frame). Takes precedence over
    # fuse_bounce when applicable; same requirements.
    fuse_path: bool = True
    # per-bounce coherence sorting (mesh scenes): between bounces, reorder
    # the ray batch by a morton key of the next interaction position so
    # 1024-lane tiles become chunk-coherent and the per-chunk tile culls
    # in the intersect/visibility kernels actually fire. Runs the fused
    # bounce kernel per depth (not the whole-path megakernel) with an
    # explicit pixel-id plane for RNG parity. The measured-best key is
    # the PAIR (next-ray first crossed chunk, shadow-ray first crossed
    # chunk) — geometric keys (morton cell/direction octant) leave tiles
    # touching most chunks. None = auto: on for scenes with > 4 triangle
    # chunks on the pallas backend. Per-lane math is placement-independent,
    # so results match the unsorted path up to XLA fusion differences
    # (~1 ulp on <1% of lanes; tests/test_engine.py).
    sort_rays: Any = None
    # coherence-sort placement granularity in LANES (engine.wavefront
    # .permute_by_key): the per-bounce permute gather is count-bound,
    # so moving G lanes per gathered row cuts the PERMUTE ~G-fold (7.1
    # -> 2.7 ms/bounce at bunny scale, benchmarks/micro_permute.py) —
    # but grouped lanes stay chained across ALL bounces, and their
    # post-scatter chunk ranges decorrelate, exploding tile chunk
    # unions in the trace kernel: measured full-frame A/B (round 4)
    # bunny 132.7 (G=1) vs 468.1 (G=4) / 557.0 (G=8); room 103.7 vs
    # 323.4 / 361.3. None = auto (1, exact per-lane placement).
    sort_group: Any = None
    # FRESH-GROUP permute granularity (engine.wavefront.permute_planes
    # regroup mode): each bounce, a free vreg-local in-row (128-lane)
    # key sort makes G adjacent lanes key-coherent, then the global
    # sort/gather runs at G-lane granularity — ~G-fold cheaper gather
    # (benchmarks/micro_regroup.py: full permute 2.87 vs 7.00 ms at
    # bunny scale, G=4) WITHOUT the cross-bounce group chaining that
    # sank sort_group. None = auto (PTDN_REGROUP env; default 0 = off
    # pending full-frame A/B). Must divide 128.
    sort_regroup: Any = None
    # coherence-sort CADENCE: permute every k-th bounce (sort at depths
    # 1, 1+k, ... ; in between, fresh crossed-chunk ranges still ride
    # along but lanes stay in the previous bounce's order). The permute
    # gather is count-bound (~1 row/clock on v5e), so k=2 halves the
    # permute cost — but MEASURED NEGATIVE (round 5, bunny 800x800):
    # 121.5 (k=1) -> 295.9 (k=2) -> 419.1 (k=3) ms. One diffuse scatter
    # decorrelates a tile's crossed ranges enough that the trace
    # kernel's union-bounded chunk loops explode, same lesson as
    # sort_group: placement granularity/cadence is the one thing the
    # sorted pipeline cannot coarsen. None = auto (PTDN_SORT_EVERY env,
    # default 1); knob kept as the measured control.
    sort_every: Any = None
    # fused temporal-reprojection + à-trous-level-1 kernel
    # (ops/pallas/reproject_atrous.py): the accumulated color never
    # round-trips HBM between the two stages. Measured NEUTRAL on
    # cornell 800x800 (A/B reps 16.75 vs 16.09 and 19.35 vs 18.30 ms —
    # within tunnel noise, slightly negative), because round 2's fused
    # stencil kernel already removed the gather cost; kept off by
    # default, parity-tested (tests/test_denoise.py).
    fuse_reproject_l1: bool = False

    def traced_params(self) -> Dict[str, Any]:
        """Continuous parameters as a traced float32 pytree."""
        f = np.float32
        return {
            "shadow_intensity": f(self.shadow_intensity),
            "light_radius": f(self.light_radius),
            "color_alpha": f(self.color_alpha),
            "moment_alpha": f(self.moment_alpha),
            "sigma_l": f(self.sigma_l),
            "sigma_x": f(self.sigma_x),
            "sigma_n": f(self.sigma_n),
        }

    def static_key(self):
        """Hashable key of the structural (re-jit) fields."""
        return (
            self.trace_depth, self.shadow_ray, self.reduce_var, self.use_bvh,
            self.show_texture,
            self.denoise_enable, self.temporal_enable, self.spatial_enable,
            self.blur_variance, self.atrous_nlevel, self.history_level,
            self.sep_color, self.add_color, self.right_view_option,
            self.backend, self.mesh_mode, self.compat,
            self.fuse_bounce, self.fuse_path, self.sort_rays,
            self.sort_group, self.sort_regroup, self.sort_every,
            self.fuse_reproject_l1,
        )

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)
