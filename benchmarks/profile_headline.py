"""Headline (cornell) ablation: isolate NEE-visibility, texture-emit,
and denoiser-stage cost in the current build.

Usage: python benchmarks/profile_headline.py [n_frames] [reps]
Run ALONE (one TPU process at a time). Configs are compiled once, then
measured in `reps` INTERLEAVED rounds (tunnel drift is slow, ~minutes:
back-to-back same-config runs see the same bias, so round-robin order
plus a median cancels it; a single pass does not — differences came out
inverted).
"""
import sys
import time

from ptdn_tpu.engine import Renderer
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.utils.timing import fetch_scalar

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SCENE = __import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path("cornell")

CONFIGS = [
    ("baseline (full)", {}),
    ("shadow_ray=False (vis passes gone)", dict(shadow_ray=False)),
    ("show_texture=False (tex emit+deferred gone)",
     dict(show_texture=False)),
    ("vis+tex off", dict(shadow_ray=False, show_texture=False)),
    ("spatial off (a-trous gone)", dict(spatial_enable=False)),
    ("atrous_nlevel=1", dict(atrous_nlevel=1)),
]


def build(kw):
    base = dict(denoise_enable=True, temporal_enable=True,
                spatial_enable=True, atrous_nlevel=5, backend="pallas",
                trace_depth=8)
    base.update(kw)
    cfg = RenderConfig(**base)
    return Renderer(Scene(SCENE), cfg, resolution=(800, 800))


def run(r, k):
    right = None
    t0 = time.time()
    for _ in range(k):
        left, right = r.render_frame()
    fetch_scalar(right)
    return time.time() - t0


renderers = []
for tag, kw in CONFIGS:
    r = build(kw)
    run(r, 4)  # compile + settle
    renderers.append((tag, r))
    print(f"compiled: {tag}", flush=True)

results = {tag: [] for tag, _ in CONFIGS}
for rep in range(REPS):
    for tag, r in renderers:
        t1 = run(r, 8)
        t2 = run(r, N)
        results[tag].append((t2 - t1) / (N - 8) * 1000.0)
    print(f"rep {rep} done", flush=True)

for tag, _ in CONFIGS:
    ms = sorted(results[tag])[len(results[tag]) // 2]
    alls = " ".join(f"{m:6.2f}" for m in results[tag])
    print(f"{tag:44s} med {ms:7.2f} ms   [{alls}]", flush=True)
