"""Run the evaluation harness IN ANGER: a statson ATE battery over three
synthetic sequence profiles + a small genetic parameter sweep, with the
JSON result cache demonstrably skipping repeats.

VERDICT r4 missing #6: statson/genetic/bruteforce had unit tests only.
This drives them end to end the way the reference's evaluation harness is
driven (reference: evaluation/statson.py ATE battery; evaluation/genetic.py
evolutionary sweep; evaluation/database.py result cache), and commits the
outcome to benchmarks/sweep_r05.json + a regenerated plot.

Usage: python benchmarks/run_sweep.py [--frames 80] [--generations 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

SEQ_ROOT = os.path.join(ROOT, "benchmarks", "sweep_seqs")

# three trajectory profiles over the same textured scene: the ATE battery
# axis the reference's statson sweeps with its KITTI/TUM sequence list
PROFILES = {
    "straight": dict(step=0.10, yaw_rate=0.000),
    "gentle_curve": dict(step=0.08, yaw_rate=0.004),
    "aggressive_yaw": dict(step=0.06, yaw_rate=0.012),
}


def render_profiles(frames: int) -> list[str]:
    from PIL import Image

    from libcml_tpu.core.camera import PinholeCamera
    from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory

    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    paths = []
    for name, prof in PROFILES.items():
        seq = os.path.join(SEQ_ROOT, name)
        img_dir = os.path.join(seq, "image_0")
        paths.append(seq)
        if os.path.isdir(img_dir) and len(os.listdir(img_dir)) >= frames:
            continue
        os.makedirs(img_dir, exist_ok=True)
        sc = SyntheticScene.default(cam, seed=11)
        poses = forward_trajectory(frames, **prof)
        gt_rows = []
        for i, (R, t) in enumerate(poses):
            img, _ = sc.render(R, t)
            Image.fromarray(np.clip(np.asarray(img), 0, 255).astype(
                np.uint8), mode="L").save(
                    os.path.join(img_dir, f"{i:06d}.png"))
            M = np.eye(4)
            M[:3, :3] = R
            M[:3, 3] = t
            c2w = np.linalg.inv(M)
            gt_rows.append(" ".join(f"{v:.9f}" for v in c2w[:3].reshape(-1)))
        with open(os.path.join(seq, "calib.txt"), "w") as f:
            f.write("P0: 110.0 0.0 79.5 0.0 0.0 110.0 59.5 0.0 "
                    "0.0 0.0 1.0 0.0\n")
        with open(os.path.join(seq, "times.txt"), "w") as f:
            f.write("\n".join(f"{0.1 * i:.6f}" for i in range(frames)) + "\n")
        with open(os.path.join(seq, "poses.txt"), "w") as f:
            f.write("\n".join(gt_rows) + "\n")
        print(f"rendered {name} ({frames} frames)", flush=True)
    return paths


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--generations", type=int, default=3)
    ap.add_argument("--population", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "benchmarks", "sweep_r05.json"))
    args = ap.parse_args()

    from libcml_tpu.eval.harness import (
        ResultDatabase,
        genetic_search,
        plot_results,
        statson,
    )
    from libcml_tpu.models.direct.config import DirectConfig
    from libcml_tpu.runtime.odometry import DirectOdometry

    seqs = render_profiles(args.frames)
    db = ResultDatabase(os.path.join(SEQ_ROOT, "experiments.json"))
    cfg = DirectConfig(num_levels=3, max_points=1024, points_per_kf=256,
                       init_points=256, max_frames=5, tracker_iters=8,
                       init_iters=12, ba_iters=6, kf_flow_threshold=0.55,
                       activate_min_traces=2, activate_max_relwidth=0.35,
                       outlier_energy=300.0)

    # 1) statson battery (cold)
    t0 = time.time()
    battery = statson(seqs, cfg, db=db, odometry_factory=DirectOdometry,
                      max_frames=args.frames)
    t_cold = time.time() - t0

    # 2) statson again (every run must come from the cache)
    t0 = time.time()
    battery2 = statson(seqs, cfg, db=db, odometry_factory=DirectOdometry,
                       max_frames=args.frames)
    t_warm = time.time() - t0
    assert all(m["cached"] for m in battery2), "cache failed to hit"

    # 3) small genetic sweep: 2 parameters, tiny budget (the reference runs
    #    200 generations on a cluster; the mechanics are identical)
    history = genetic_search(
        [seqs[1]], cfg,
        space={"kf_flow_threshold": (0.3, 1.2),
               "tracker_iters": (6, 12)},
        generations=args.generations, population=args.population,
        elite=2, mutation=0.4, seed=0, db=db,
        odometry_factory=DirectOdometry, max_frames=args.frames,
    )

    plot_path = os.path.join(ROOT, "benchmarks", "sweep_r05.png")
    try:
        plot_results(battery, plot_path)
    except Exception as e:
        plot_path = f"plot failed: {e}"

    out = {
        "battery": battery,
        "battery_cache_check": {
            "cold_s": round(t_cold, 1),
            "warm_s": round(t_warm, 2),
            "all_cached_on_rerun": all(m["cached"] for m in battery2),
        },
        "genetic": history,
        "config_space": {"kf_flow_threshold": [0.3, 1.2],
                         "tracker_iters": [6, 12]},
        "frames": args.frames,
        "plot": plot_path,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
