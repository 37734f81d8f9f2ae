"""Command-line entry point: the reference `modslam` binary's TPU equivalent.

Reference: src/cml/slam/modslam.cpp:249-286 (argparse surface: -d dataset,
-c config, -r result dir, -f format tum|kitti|all, -z stats), :53-127
dataset auto-detection, :393-410 result export.

Usage:
    python -m libcml_tpu.cli -d /path/to/KITTI/sequences/04 -r out -f all
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Top-level config tree addressed by dotted YAML keys."""

    from libcml_tpu.models.direct.config import DirectConfig as _DC

    direct: "SlamConfig._DC" = dataclasses.field(default_factory=_DC)
    max_frames_to_process: int = 0   # 0 = all
    print_stats: bool = False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("libcml-tpu")
    ap.add_argument("-d", "--dataset", required=True, help="dataset path (auto-detected)")
    ap.add_argument("-c", "--config", default=None, help="YAML preset")
    ap.add_argument("-r", "--result", default=None, help="result output directory")
    ap.add_argument("-f", "--format", default="all", choices=["tum", "kitti", "all"])
    ap.add_argument("-z", "--stats", action="store_true", help="print STAT lines")
    ap.add_argument("-n", "--num-frames", type=int, default=0)
    args = ap.parse_args(argv)

    from libcml_tpu.data.capture import load_dataset
    from libcml_tpu.eval.trajectory import ate_rmse, poses_to_kitti, poses_to_tum
    from libcml_tpu.runtime.config import load_yaml_config
    from libcml_tpu.runtime.odometry import DirectOdometry

    cfg = SlamConfig()
    if args.config:
        cfg = load_yaml_config(cfg, args.config)

    capture = load_dataset(args.dataset)
    cam = capture.calibration.pinhole
    odo = DirectOdometry(cam, cfg.direct)

    gt_poses, got_gt = [], True
    t0 = time.perf_counter()
    n_done = 0
    limit = args.num_frames or cfg.max_frames_to_process or len(capture)
    for frame in capture.frames():
        if frame.index >= limit:
            break
        stats = odo.process(frame.image, frame.timestamp)
        n_done += 1
        if frame.gt_pose_c2w is None:
            got_gt = False
        else:
            gt_poses.append(frame.gt_pose_c2w)
        if args.stats and "flow" in stats:
            # reference STAT-line format for the eval harness
            # (modslam.cpp:174-190)
            print(f"STAT flow {frame.index} {stats['flow']:.4f}")
            print(f"STAT energy {frame.index} {stats['energy']:.4f}")
    wall = time.perf_counter() - t0

    ts, poses = odo.trajectory_c2w()
    print(f"Time : {wall:.2f}s  ({n_done / max(wall, 1e-9):.2f} fps)")

    if got_gt and len(gt_poses) == len(poses):
        gt = np.asarray(gt_poses)
        err = ate_rmse(poses[:, :3, 3], gt[:, :3, 3])
        print(f"ATE RMSE (scale-corrected): {err:.4f} m")

    if args.result:
        os.makedirs(args.result, exist_ok=True)
        if args.format in ("tum", "all"):
            with open(os.path.join(args.result, "trajectory_tum.txt"), "w") as f:
                f.write(poses_to_tum(ts, poses))
        if args.format in ("kitti", "all"):
            with open(os.path.join(args.result, "trajectory_kitti.txt"), "w") as f:
                f.write(poses_to_kitti(poses))
        with open(os.path.join(args.result, "run.json"), "w") as f:
            json.dump({"frames": n_done, "wall_s": wall,
                       "fps": n_done / max(wall, 1e-9)}, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
