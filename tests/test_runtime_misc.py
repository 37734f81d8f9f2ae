"""Runtime odds and ends pinned by round-5 (VERDICT r4 missing #7 / weak #9):
the host-memory kill switch, the CLI periodic viewer snapshot, and the
indirect-only keyframe policy (round 4's measured 4.7x ATE win over forcing
spine keyframes must not silently regress)."""

import json
import os

import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.eval.trajectory import ate_rmse
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.hybrid.decision import DecisionConfig
from libcml_tpu.runtime.hybrid import HybridOdometry
from libcml_tpu.runtime.odometry import DirectOdometry, _rss_mb

PIL = pytest.importorskip("PIL")
from PIL import Image

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


# -- memory kill switch (reference: AbstractSlam.cpp:150-154) ----------------


def test_rss_probe_reports_something():
    rss = _rss_mb()
    assert rss > 10.0, "a live Python+JAX process uses more than 10 MB"


def test_memory_limit_stops_the_run():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    cfg = DirectConfig(num_levels=3, max_points=512, points_per_kf=128,
                       init_points=128, max_frames=4, memory_limit_mb=1)
    odo = DirectOdometry(cam, cfg)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    outs = [odo.process(img, float(i) * 0.1) for i in range(12)]
    # the limit is checked every 10th frame; frame 10 trips it
    assert odo.stopped
    assert outs[-1]["state"] == "STOPPED"
    assert any("memory_mb" in o for o in outs)


def test_memory_limit_off_by_default():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    odo = DirectOdometry(cam, DirectConfig(num_levels=3, max_points=512,
                                           points_per_kf=128,
                                           init_points=128, max_frames=4))
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    for i in range(11):
        odo.process(img, float(i) * 0.1)
    assert not odo.stopped


# -- CLI: periodic snapshot + memory limit flag ------------------------------


def _make_kitti_seq(tmp_path, cam, frames):
    seq = tmp_path / "04"
    (seq / "image_0").mkdir(parents=True)
    for i, img in enumerate(frames):
        Image.fromarray(np.clip(img, 0, 255).astype(np.uint8),
                        mode="L").save(seq / "image_0" / f"{i:06d}.png")
    (seq / "calib.txt").write_text(
        f"P0: {cam.fx} 0.0 {cam.cx} 0.0 0.0 {cam.fy} {cam.cy} 0.0 "
        "0.0 0.0 1.0 0.0\n"
    )
    (seq / "times.txt").write_text(
        "\n".join(f"{0.1 * i:.6f}" for i in range(len(frames))) + "\n")
    return seq


def test_cli_snapshot_every(tmp_path):
    from libcml_tpu.cli import main

    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(10, step=0.08, yaw_rate=0.003)
    frames = [np.asarray(sc.render(R, t)[0]) for R, t in poses]
    seq = _make_kitti_seq(tmp_path, cam, frames)
    result = tmp_path / "out"
    rc = main(["-d", str(seq), "-r", str(result), "-m", "direct",
               "--snapshot-every", "4", "--memory-limit", "100000"])
    assert rc == 0
    snaps = sorted(os.listdir(result / "snapshots"))
    # frames 4 and 8 each wrote a trajectory PLY + HTML orbiter
    assert any(s.startswith("map_000004") for s in snaps), snaps
    assert any(s.startswith("map_000008") for s in snaps), snaps
    assert any(s.endswith(".html") for s in snaps)
    assert (result / "run.json").exists()
    run = json.loads((result / "run.json").read_text())
    assert run["frames"] == 10


# -- indirect-only keyframe policy (round 4: hybrid.py KF decision) ----------


def test_indirect_only_keyframes_spare_the_window():
    """Pin the round-4 policy (hybrid.py keyframe decision): an indirect
    keyframe trigger BETWEEN spine keyframes inserts map points at the
    tracked pose WITHOUT forcing a direct-window keyframe event — round 4
    measured the old forced-spine policy at 4.7x worse ATE over 500 frames
    (0.057 -> 0.268, window-churn marginalization). A refactor that
    silently promotes indirect-only keyframes back onto the spine fails
    the membership assertions below."""
    import dataclasses

    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(18, step=0.08, yaw_rate=0.003)
    frames, gt_c2w = [], []
    for R, t in poses:
        img, _ = sc.render(R, t)
        frames.append(np.asarray(img))
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        gt_c2w.append(np.linalg.inv(M))
    gt = np.asarray(gt_c2w)

    # spaced spine keyframes + an always-on match-ratio trigger so the
    # between-spine window opens on an 18-frame scene
    cfg = dataclasses.replace(CFG, kf_flow_threshold=1.2)
    dcfg = DecisionConfig(force_kf_match_ratio=2.0)
    odo = HybridOdometry(cam, cfg, dcfg=dcfg, orb_budget=192, orb_levels=2)
    for i, img in enumerate(frames):
        odo.process(img, float(i))
    assert odo.state == "TRACKING" and odo.segments == 0
    ts, est = odo.trajectory_c2w()

    # at least one indirect-ONLY keyframe fired (ring entry with no
    # direct-window slot)...
    ind_only = [k for k in odo._ind_kfs if k["kf_id"] == -1]
    assert ind_only, "no indirect-only keyframe fired; trigger ineffective"
    # ...and none of those frames was promoted to the direct spine
    kf_bit = np.uint32(odo.map.groups.frame_group("DIRECTKEYFRAME"))
    for k in ind_only:
        mi = odo._fid2map.get(k["frame"])
        assert mi is not None
        assert (odo.map.f_group[mi] & kf_bit) == 0, (
            f"indirect-only keyframe {k['frame']} landed on the spine")
    # the policy stays accurate on this scene
    ate = ate_rmse(est[:, :3, 3], gt[:, :3, 3], with_scale=True)
    assert ate < 0.08, f"policy ATE {ate:.4f}"
