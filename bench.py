"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): cornell.txt 800x800, 1 spp, 8 bounces, static
camera, 5-iteration à-trous SVGF, on one TPU chip. vs_baseline is
ms_per_frame / 16.0 (the driver-set north-star budget): < 1.0 beats it.

Extra configs (diamond/bunny/room/room-1080p-animated) run with
--all and are written to bench_results.json; the single stdout JSON line
stays the headline metric.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

TARGET_MS = 16.0


def run_config(scene_path, resolution, frames, warmup, cfg, automate=False):
    from ptdn_tpu.app.automate import CameraAutomation
    from ptdn_tpu.engine import Renderer
    from ptdn_tpu.scene import Scene
    from ptdn_tpu.utils.timing import fetch_scalar

    scene = Scene(scene_path)
    r = Renderer(scene, cfg, resolution=resolution)
    auto = CameraAutomation(cfg)

    def run(n):
        right = None
        t0 = time.time()
        for _ in range(n):
            if auto.step(r.camera):
                r.cam_changed = True
            left, right = r.render_frame()
        # fetch one element: a reliable completion barrier even through
        # remote device tunnels (see utils/timing.py)
        fetch_scalar(right)
        return time.time() - t0, right

    run(max(warmup, 2))
    t1, _ = run(max(frames // 4, 1))
    t2, right = run(frames)
    dt = (t2 - t1) / (frames - max(frames // 4, 1))
    return dt * 1000.0, np.asarray(right)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--all", action="store_true",
                    help="also run the non-headline BASELINE.json configs")
    ap.add_argument("--scenes-dir", default="/root/reference/scenes")
    args = ap.parse_args()

    from ptdn_tpu.utils.config import RenderConfig

    svgf = dict(denoise_enable=True, temporal_enable=True,
                spatial_enable=True, atrous_nlevel=5, backend="pallas")

    # headline: cornell 800x800 1spp 8 bounces + 5-iter SVGF
    cfg = RenderConfig(trace_depth=8, **svgf)
    ms, _ = run_config(f"{args.scenes_dir}/cornell.txt", (800, 800),
                       args.frames, args.warmup, cfg)

    result = {
        "metric": "ms/frame (cornell 800x800, 1spp, depth 8, SVGF 5-level)",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(ms / TARGET_MS, 4),
    }

    if args.all:
        extras = {}
        # engine flags (fuse_bounce/fuse_path/sort_rays) auto-select from
        # scene statics inside make_trace_fn — no per-scene tuning here
        import os
        repo_scenes = os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scenes")
        for path, res in [
            (f"{args.scenes_dir}/diamond.txt", None),
            (f"{args.scenes_dir}/bunny.txt", None),
            (f"{args.scenes_dir}/room.txt", None),
            # ~30k-tri scale benchmark (the reference demonstrated a
            # 30k-tri room as real-time, slides/MS3.pdf p.6)
            (os.path.join(repo_scenes, "terrain30k.txt"), None),
        ]:
            name = os.path.splitext(os.path.basename(path))[0]
            c = RenderConfig(trace_depth=8, **svgf)
            m, _ = run_config(path, res, args.frames, args.warmup, c)
            extras[name] = round(m, 3)
        # room.txt, animated camera, 1080p: full temporal reprojection loop
        c = RenderConfig(trace_depth=8, automate_camera=True,
                         camera_speed_x=0.02, camera_speed_theta=0.01,
                         camera_speed_phi=0.015, **svgf)
        m, _ = run_config(f"{args.scenes_dir}/room.txt", (1920, 1080),
                          args.frames, args.warmup, c, automate=True)
        extras["room_1080p_animated"] = round(m, 3)
        with open("bench_results.json", "w") as f:
            json.dump({"headline": result, "extra_ms": extras}, f, indent=2)
        print(json.dumps({"headline": result, "extra_ms": extras}),
              file=sys.stderr)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
