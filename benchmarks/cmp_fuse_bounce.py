"""Compare fuse_bounce on/off per scene config (headline-style timing)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import run_config
from ptdn_tpu.utils.config import RenderConfig

scene = sys.argv[1] if len(sys.argv) > 1 else "diamond"
frames = int(sys.argv[2]) if len(sys.argv) > 2 else 12
svgf = dict(denoise_enable=True, temporal_enable=True,
            spatial_enable=True, atrous_nlevel=5, backend="pallas")
for fused in (False, True):
    cfg = RenderConfig(trace_depth=8, fuse_bounce=fused, **svgf)
    ms, _ = run_config(__import__("ptdn_tpu.utils.assets", fromlist=["scene_path"]).scene_path(scene), (800, 800),
                       frames, 3, cfg)
    print(f"{scene} fuse_bounce={fused}: {ms:8.2f} ms/frame", flush=True)
