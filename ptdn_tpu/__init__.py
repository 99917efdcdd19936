"""ptdn_tpu — a TPU-native real-time path tracer + SVGF denoiser.

A brand-new JAX/XLA/Pallas framework with the capabilities of the CUDA
reference (ZheyuanXie/CUDA-Path-Tracer-Denoising): a 1-spp Monte Carlo
wavefront path tracer (analytic cubes/spheres, OBJ meshes via a SAH BVH,
texture mapping, next-event-estimation shadow rays) feeding a
Spatiotemporal Variance-Guided Filtering (SVGF) denoiser (temporal
reprojection + accumulation, variance estimation, edge-stopping à-trous
wavelet filtering), with an interactive-style orbit camera and headless
rendering CLI.

Architecture (TPU-first, not a port):
  scene/     host-side scene layer: scenes/*.txt parser, OBJ loader with
             world-space pre-transform, texture atlas, SAH BVH build+flatten
  ops/       device math: counter-based RNG, ray/primitive intersection,
             BVH traversal, BSDF sampling, camera rays (+ Pallas kernels)
  engine/    the jitted frame step: wavefront masked ray-batch tracer over
             a lax bounce loop, G-buffer, accumulation, frame-state pytree
  denoise/   SVGF: back-projection/temporal EWMA, variance, à-trous filter
  parallel/  multi-chip: jax.sharding meshes, pixel-sharded frame step
  utils/     config system, image IO (PNG/HDR), glm-compatible host math
  app/       headless CLI, camera automation, debug views, stats

Reference parity: device math replicates /root/reference's behavior
(file:line cites in docstrings) including its quirks, behind cfg flags.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry correctness requires full-f32 matmuls: XLA TPU's DEFAULT matmul
# precision runs f32 dots through bf16 passes, which skews ray/transform
# math by ~1e-2 relative and corrupts one-hot integer table lookups.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: frame-step programs take minutes to
# compile through the remote-device tunnel; warm starts skip that.
try:
    _jax.config.update("jax_compilation_cache_dir",
                       "/tmp/ptdn_jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:        # older jax without these flags: cold compiles only
    pass

from ptdn_tpu.utils.config import RenderConfig  # noqa: F401
