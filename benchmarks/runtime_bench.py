"""End-to-end runtime benchmark on the exported synthetic KITTI sequence.

Unlike bench.py (component timings + amortization model), this drives the
REAL runtime frame loop — host decisions, transfers, keyframe events,
marginalization — over the same on-disk sequence the reference binary runs,
so fps and ATE are directly comparable to the measured reference numbers in
BASELINE.md. Steady-state fps excludes the first `--warmup` frames (jit
compiles through the TPU tunnel).

Usage:
    python benchmarks/runtime_bench.py [--mode direct|hybrid]
        [--pipelined] [--frames 200] [--warmup 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent compile cache: repeated benchmark invocations skip the
# multi-minute XLA compiles through the TPU tunnel
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "kitti_synth", "sequences", "04"))
    ap.add_argument("--mode", default="direct",
                    choices=("direct", "hybrid"))
    ap.add_argument("--pipelined", action="store_true")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--no-mixed", action="store_true",
                    help="hybrid: disable mixed BA (ablation)")
    ap.add_argument("--force-mode", default=None,
                    choices=(None, "DIRECT", "INDIRECT"),
                    help="hybrid: force the pose decision (ablation)")
    ap.add_argument("--no-force-kf", action="store_true",
                    help="hybrid: disable the match-collapse forced KF")
    args = ap.parse_args()

    from PIL import Image

    from libcml_tpu.core.camera import PinholeCamera
    from libcml_tpu.data.kitti import KittiCapture
    from libcml_tpu.eval.trajectory import ate_rmse
    from libcml_tpu.models.direct.config import DirectConfig

    cap = KittiCapture(args.seq)
    calib = cap.calibration
    cam = calib.pinhole
    n = min(args.frames, len(cap))

    cfg = DirectConfig(num_levels=4, max_points=2048, points_per_kf=512,
                       init_points=512, max_frames=7, tracker_iters=10,
                       ba_iters=4, mixed_ba=not args.no_mixed)
    if args.mode == "hybrid":
        from libcml_tpu.models.hybrid.decision import DecisionConfig
        from libcml_tpu.runtime.hybrid import HybridOdometry

        kw = {}
        if args.force_mode:
            kw["force"] = args.force_mode
        if args.no_force_kf:
            kw["force_kf_match_ratio"] = 0.0
        dcfg = DecisionConfig(**kw) if kw else None
        odo = HybridOdometry(cam, cfg, dcfg=dcfg,
                             pipelined=args.pipelined)
    else:
        from libcml_tpu.runtime.odometry import DirectOdometry

        odo = DirectOdometry(cam, cfg, pipelined=args.pipelined)

    # preload + decode all frames up front so disk/PIL time is excluded
    imgs = []
    img_dir = os.path.join(args.seq, "image_0")
    files = sorted(os.listdir(img_dir))[:n]
    for f in files:
        imgs.append(np.asarray(Image.open(os.path.join(img_dir, f)),
                               np.float32))

    gt = cap.gt[:n] if cap.gt is not None else None

    t_warm = time.perf_counter()
    t_steady = None
    for i, img in enumerate(imgs):
        if i == args.warmup:
            t_steady = time.perf_counter()
        odo.process(img, i * 0.1)
    ts, est = odo.trajectory_c2w()
    t_end = time.perf_counter()

    steady_fps = (n - args.warmup) / (t_end - t_steady)
    total_fps = n / (t_end - t_warm)

    ate = rpe = None
    if gt is not None:
        from libcml_tpu.eval.trajectory import rpe_rmse

        # align by timestamp (a LOST episode can drop frames)
        idx = np.clip(np.round(np.asarray(ts) / 0.1).astype(int), 0, n - 1)
        ate = float(ate_rmse(est[:, :3, 3], gt[idx, :3, 3],
                             with_scale=True))
        rpe = float(rpe_rmse(est, gt[idx]))

    # per-phase sheet means over steady-state frames (the same breakdown
    # profile_hybrid.py reports; committed into results_rNN.json)
    phases = {}
    for name, stat in sorted(odo.sheet._stats.items()):
        fr, vals = stat.series()
        fr = np.asarray(fr)
        vals = np.asarray(vals)
        keep = fr >= args.warmup
        if not name.startswith("time_") or not keep.any():
            continue
        phases[name] = {"mean_ms": round(float(vals[keep].mean()), 2),
                        "calls": int(keep.sum())}

    out = {
        "mode": args.mode + ("+pipelined" if args.pipelined else "")
                + ("+nomixed" if args.no_mixed else "")
                + (f"+force{args.force_mode}" if args.force_mode else "")
                + ("+nofkf" if args.no_force_kf else ""),
        "frames": n,
        "steady_fps": round(steady_fps, 2),
        "total_fps": round(total_fps, 2),
        "ate": round(ate, 4) if ate is not None else None,
        "rpe": round(rpe, 4) if rpe is not None else None,
        "segments": odo.segments,
        "phases": phases,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
