"""Per-stage breakdown of a frame on TPU.

Usage: python benchmarks/profile_stages.py [scene_name] [WxH]
e.g.   python benchmarks/profile_stages.py bunny 800x800
"""
import sys
import time

from ptdn_tpu.engine import Renderer
from ptdn_tpu.scene import Scene
from ptdn_tpu.utils.config import RenderConfig
from ptdn_tpu.utils.timing import fetch_scalar

name = sys.argv[1] if len(sys.argv) > 1 else "cornell"
res = sys.argv[2] if len(sys.argv) > 2 else "800x800"
W, H = (int(x) for x in res.split("x"))
SCENE = __import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path(name)


def measure(tag, n=25, **kw):
    svgf = dict(denoise_enable=True, temporal_enable=True,
                spatial_enable=True, atrous_nlevel=5, backend="pallas",
                trace_depth=8)
    svgf.update(kw)
    cfg = RenderConfig(**svgf)
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
    t2 = run(n)
    ms = (t2 - t1) / (n - 5) * 1000.0
    print(f"{tag:42s} {ms:8.1f} ms", flush=True)
    return ms


base = measure("baseline (full)")
measure("show_texture=False", show_texture=False)
measure("shadow_ray=False", shadow_ray=False)
measure("denoise off", denoise_enable=False)
measure("depth=1", trace_depth=1)
measure("depth=2", trace_depth=2)
measure("depth=4", trace_depth=4)
measure("no tex, no shadow", show_texture=False, shadow_ray=False)

print("--- denoise split ---")
measure("temporal off (spatial only)", temporal_enable=False)
measure("atrous 0 levels", atrous_nlevel=0)
measure("atrous 1 level", atrous_nlevel=1)
measure("spatial off (temporal only)", spatial_enable=False)
