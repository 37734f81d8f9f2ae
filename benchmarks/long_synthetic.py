"""Long-sequence synthetic benchmark: the drift battery.

Datasets are not available in this environment, so this is the stand-in for
the reference's KITTI/TUM evaluation protocol (reference:
evaluation/statson.py ATE battery; BASELINE.md protocol): a 200+ frame
textured synthetic trajectory with forward motion and turns, run through the
odometry/hybrid runtimes, scored as ATE per 100 frames so drift is
quantified and tracked across rounds.

Usage:
    python benchmarks/long_synthetic.py [--frames 200] [--hybrid] [--mixed]
    python -m pytest benchmarks/long_synthetic.py -q   (slow test battery)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene
from libcml_tpu.eval.trajectory import ate_rmse
from libcml_tpu.models.direct.config import DirectConfig

W, H = 160, 120
CFG = DirectConfig(
    num_levels=3,
    max_points=1024,
    points_per_kf=256,
    init_points=256,
    max_frames=5,
    tracker_iters=8,
    init_iters=12,
    ba_iters=6,
    kf_flow_threshold=0.55,
    activate_min_traces=2,
    activate_max_relwidth=0.35,
    outlier_energy=300.0,
)


def camera() -> PinholeCamera:
    return PinholeCamera.make(110.0, 110.0, W / 2 - 0.5, H / 2 - 0.5, W, H)


def corridor_trajectory(n_frames: int, step: float = 0.08,
                        turn_every: int = 60, turn_frames: int = 25):
    """Forward runs punctuated by yaw turns (the drift-prone profile:
    turns rotate the photometrically weak lateral direction into the
    direction of travel, so small per-segment biases accumulate instead of
    cancelling). Returns [(R, t)] w2c poses; camera stays within the scene's
    textured working volume by turning ~20 deg and continuing."""
    poses = []
    pos = np.zeros(3)
    yaw = 0.0
    for i in range(n_frames):
        seg = i % turn_every
        if seg >= turn_every - turn_frames:
            yaw += np.radians(20.0) / turn_frames
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])   # c2w
        fwd = Rc @ np.array([0.0, 0.0, 1.0])
        pos = pos + step * fwd * (0.0 if i == 0 else 1.0)
        pos_i = pos + np.array(
            [0.02 * np.sin(0.11 * i), 0.01 * np.sin(0.07 * i), 0.0]
        )
        R = Rc.T
        t = -Rc.T @ pos_i
        poses.append((R, t))
    return poses


def scene_for(cam: PinholeCamera, extent: float = 40.0) -> SyntheticScene:
    """A long textured corridor: side walls, floor, ceiling, and a far end
    wall — enough parallax diversity everywhere along the run."""
    from libcml_tpu.data.synthetic import Plane, VolumetricTexture, make_texture

    rng = np.random.default_rng(11)
    planes = [
        Plane([0, 0, -1.0], -extent, make_texture(rng), tex_scale=40.0),  # end
        Plane([-1.0, 0, -0.02], -3.0, make_texture(rng), tex_scale=45.0),  # right
        Plane([1.0, 0, -0.02], -3.0, make_texture(rng), tex_scale=45.0),   # left
        Plane([0, -1.0, 0.0], -2.0, make_texture(rng), tex_scale=35.0),    # floor
        Plane([0, 1.0, 0.0], -2.0, make_texture(rng), tex_scale=35.0),     # ceiling
    ]
    return SyntheticScene(planes, cam, tex3d=VolumetricTexture(rng))


def run(n_frames: int = 200, mode: str = "direct", mixed: bool = True,
        cfg: DirectConfig = CFG, verbose: bool = True) -> dict:
    """Run one odometry variant over the corridor; returns metrics incl.
    ate_per_100 (the headline drift number)."""
    cam = camera()
    sc = scene_for(cam)
    poses = corridor_trajectory(n_frames)

    if mode == "hybrid":
        import dataclasses

        from libcml_tpu.runtime.hybrid import HybridOdometry

        cfg = dataclasses.replace(
            cfg, mixed_ba=mixed, mixed_always=mixed
        )
        odo = HybridOdometry(cam, cfg, orb_budget=192, orb_levels=2)
    else:
        from libcml_tpu.runtime.odometry import DirectOdometry

        odo = DirectOdometry(cam, cfg)

    gt_c2w = []
    t0 = time.perf_counter()
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        odo.process(img, float(i))
        M = np.eye(4)
        M[:3, :3], M[:3, 3] = R, t
        gt_c2w.append(np.linalg.inv(M))
        if verbose and i % 25 == 0:
            print(f"  frame {i}/{n_frames}")
    wall = time.perf_counter() - t0

    ts, est = odo.trajectory_c2w()
    gt = np.asarray(gt_c2w)
    ate = float(ate_rmse(est[:, :3, 3], gt[:, :3, 3], with_scale=True))
    # per-100-frame drift: ATE over sliding 100-frame windows, averaged —
    # insensitive to sequence length, comparable across rounds
    win_ates = []
    for s in range(0, max(n_frames - 100, 1), 50):
        e = est[s:s + 100, :3, 3]
        g = gt[s:s + 100, :3, 3]
        if len(e) >= 10:
            win_ates.append(float(ate_rmse(e, g, with_scale=True)))
    return {
        "mode": mode + ("+mixed" if (mode == "hybrid" and mixed) else ""),
        "frames": n_frames,
        "ate": round(ate, 4),
        "ate_per_100": round(float(np.mean(win_ates)), 4) if win_ates else ate,
        "wall_s": round(wall, 1),
        "fps": round(n_frames / wall, 2),
        "state": odo.state,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--hybrid", action="store_true")
    ap.add_argument("--mixed", action="store_true", default=True)
    ap.add_argument("--no-mixed", dest="mixed", action="store_false")
    ap.add_argument("--both", action="store_true",
                    help="run direct AND hybrid, print the comparison")
    args = ap.parse_args()

    if args.both:
        for mode, mixed in (("direct", False), ("hybrid", False),
                            ("hybrid", True)):
            m = run(args.frames, mode, mixed)
            print(json.dumps(m))
    else:
        m = run(args.frames, "hybrid" if args.hybrid else "direct", args.mixed)
        print(json.dumps(m))


if __name__ == "__main__":
    main()
