"""One-scene wall-clock bench: `python benchmarks/bench_scene.py bunny [WxH] [--frames N]`.

Same measurement shape as bench.py run_config (warmup, two timed runs,
difference) so numbers are directly comparable to bench_results.json.
Scene name resolves via ptdn_tpu.utils.assets (vendored scenes/).
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("res", nargs="?", default=None)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--animate", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from ptdn_tpu.utils.config import RenderConfig
    from bench import run_config

    path = args.scene
    if not os.path.exists(path):
        from ptdn_tpu.utils.assets import scene_path
        cand = scene_path(args.scene)
        if os.path.exists(cand):
            path = cand
    res = None
    if args.res:
        w, h = args.res.split("x")
        res = (int(w), int(h))

    kw = dict(denoise_enable=True, temporal_enable=True,
              spatial_enable=True, atrous_nlevel=5, backend="pallas")
    if args.animate:
        kw.update(automate_camera=True, camera_speed_x=0.02,
                  camera_speed_theta=0.01, camera_speed_phi=0.015)
    cfg = RenderConfig(trace_depth=args.depth, **kw)
    t0 = time.time()
    ms, _ = run_config(path, res, args.frames, args.warmup, cfg)
    print(json.dumps({"scene": os.path.basename(path), "ms": round(ms, 3),
                      "subchunk": os.environ.get("PTDN_SUBCHUNK", "off"),
                      "wall_s": round(time.time() - t0, 1)}))


if __name__ == "__main__":
    main()
