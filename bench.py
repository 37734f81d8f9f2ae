"""Headline benchmark: MEASURED end-to-end runtime fps + accuracy on the
same on-disk sequence the reference binary runs.

Round-4 rework: earlier rounds amortized component timings with assumed
constants (KF every 5th frame, battery on 10%); this drives the REAL
runtime loop — host decisions, transfers, keyframe events, asynchronous
marginalization — over the synthetic KITTI sequence
(benchmarks/export_kitti.py renders it deterministically if absent), so
every constant is measured.

The baseline is no longer a stand-in: the reference MOD-SLAM binary was
built (cmake -DENABLE_GUI=OFF + a 45-line QFile shim) and run on the
IDENTICAL sequence in this environment (BASELINE.md "Measured status"):
    reference: 3.74 fps end-to-end, ATE 0.051 m (500 frames, host CPU)
`vs_baseline` = our steady-state fps / the reference's measured fps.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# persistent compile cache: the driver's bench invocation skips the
# multi-minute XLA compiles through the TPU tunnel on repeat runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

ROOT = os.path.dirname(os.path.abspath(__file__))
SEQ = os.path.join(ROOT, "benchmarks", "kitti_synth", "sequences", "04")

REF_FPS = 3.74      # measured: reference modslam, same sequence, this host
REF_ATE = 0.051     # measured: scale-aligned ATE over the 500-frame run

# equal 500-frame basis for every engine (round-4 verdict: hybrid@120f vs
# direct@200f vs reference@500f compared unlike lengths; short runs drift
# less, flattering ATE)
DIRECT_FRAMES = 500
HYBRID_FRAMES = 500
WARMUP = 30


def ensure_sequence(frames: int) -> None:
    img_dir = os.path.join(SEQ, "image_0")
    have = len(os.listdir(img_dir)) if os.path.isdir(img_dir) else 0
    if have >= frames:
        return
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks", "export_kitti.py"),
         "--frames", str(max(frames, 200))],
        check=True,
    )


def run_mode(mode: str, frames: int, pipelined: bool) -> dict:
    from PIL import Image

    from libcml_tpu.data.kitti import KittiCapture
    from libcml_tpu.eval.trajectory import ate_rmse
    from libcml_tpu.models.direct.config import DirectConfig

    cap = KittiCapture(SEQ)
    cam = cap.calibration.pinhole
    n = min(frames, len(cap))
    cfg = DirectConfig(num_levels=4, max_points=2048, points_per_kf=512,
                       init_points=512, max_frames=7, tracker_iters=10,
                       ba_iters=4)
    if mode == "hybrid":
        from libcml_tpu.runtime.hybrid import HybridOdometry

        odo = HybridOdometry(cam, cfg, pipelined=pipelined)
    else:
        from libcml_tpu.runtime.odometry import DirectOdometry

        odo = DirectOdometry(cam, cfg, pipelined=pipelined)

    img_dir = os.path.join(SEQ, "image_0")
    files = sorted(os.listdir(img_dir))[:n]
    imgs = [np.asarray(Image.open(os.path.join(img_dir, f)), np.float32)
            for f in files]
    gt = cap.gt[:n] if cap.gt is not None else None

    t_steady = None
    t0 = time.perf_counter()
    for i, img in enumerate(imgs):
        if i == WARMUP:
            t_steady = time.perf_counter()
        odo.process(img, i * 0.1)
    ts, est = odo.trajectory_c2w()
    t_end = time.perf_counter()

    out = {
        "steady_fps": round((n - WARMUP) / (t_end - t_steady), 2),
        "total_s": round(t_end - t0, 1),
        "frames": n,
        "segments": odo.segments,
    }
    if gt is not None:
        idx = np.clip(np.round(np.asarray(ts) / 0.1).astype(int), 0, n - 1)
        out["ate"] = round(float(
            ate_rmse(est[:, :3, 3], gt[idx, :3, 3], with_scale=True)), 4)
    return out


def main() -> None:
    skip_hybrid = "--skip-hybrid" in sys.argv
    ensure_sequence(DIRECT_FRAMES)

    # shipped operating point: SEQUENTIAL direct. Round 5 measured the
    # packed single-RPC transfer work making sequential ~as fast as lag-1
    # pipelining (12.3 vs 12.9 fps @500f) while pipelining costs accuracy
    # (one lost segment at the yaw reversal); see benchmarks/results_r05.json.
    direct = run_mode("direct", DIRECT_FRAMES, pipelined=False)
    result = {
        "metric": "direct_measured_fps_640x480_2048pts_500f",
        "value": direct["steady_fps"],
        "unit": "frames/s",
        "vs_baseline": round(direct["steady_fps"] / REF_FPS, 3),
        "baseline": {"reference_fps_measured": REF_FPS,
                     "reference_ate_measured": REF_ATE},
        "direct_ate": direct.get("ate"),
        "direct_segments": direct["segments"],
        "frames": direct["frames"],
    }
    if not skip_hybrid:
        hybrid = run_mode("hybrid", HYBRID_FRAMES, pipelined=False)
        result["hybrid_fps"] = hybrid["steady_fps"]
        result["hybrid_ate"] = hybrid.get("ate")
        result["hybrid_segments"] = hybrid["segments"]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
