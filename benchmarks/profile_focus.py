"""Focused per-stage profile: a handful of ablation configs on one scene.

Usage: python benchmarks/profile_focus.py [scene] [WxH] [n_frames]
Prints one line per config; differences vs baseline isolate stage cost.
"""
import sys
import time

from ptdn_tpu.engine import Renderer
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.utils.timing import fetch_scalar

name = sys.argv[1] if len(sys.argv) > 1 else "bunny"
res = sys.argv[2] if len(sys.argv) > 2 else "800x800"
N = int(sys.argv[3]) if len(sys.argv) > 3 else 20
W, H = (int(x) for x in res.split("x"))
SCENE = __import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path(name)


def measure(tag, **kw):
    base = dict(denoise_enable=True, temporal_enable=True,
                spatial_enable=True, atrous_nlevel=5, backend="pallas",
                trace_depth=8)
    base.update(kw)
    cfg = RenderConfig(**base)
    scene = Scene(SCENE)
    r = Renderer(scene, cfg, resolution=(W, H))

    def run(k):
        right = None
        t0 = time.time()
        for _ in range(k):
            left, right = r.render_frame()
        fetch_scalar(right)
        return time.time() - t0

    run(3)
    t1 = run(5)
    t2 = run(N)
    ms = (t2 - t1) / (N - 5) * 1000.0
    print(f"{tag:40s} {ms:8.1f} ms", flush=True)
    return ms


measure("baseline (full)")
measure("shadow_ray=False", shadow_ray=False)
measure("denoise off", denoise_enable=False)
measure("depth=4", trace_depth=4)
measure("depth=2", trace_depth=2)
