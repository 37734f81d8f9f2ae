"""MOD-SLAM hybrid pipeline tests: decision logic units + end-to-end hybrid
odometry on a synthetic scene (indirect map population, mode switching,
trajectory sanity)."""

import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.eval.trajectory import ate_rmse
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.hybrid.decision import (
    BundleAdjustmentDecision,
    DecisionConfig,
    Mode,
    PoseEstimationDecision,
)
from libcml_tpu.runtime.hybrid import HybridOdometry

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


def test_pose_decision_prefers_lower_uncertainty():
    d = PoseEstimationDecision(DecisionConfig(min_orb_matches=10))
    for _ in range(5):
        d.push(np.full(3, 1e-6), np.full(3, 1e-4))
    assert d.decide(num_orb_matches=100) == Mode.INDIRECT
    d2 = PoseEstimationDecision(DecisionConfig(min_orb_matches=10))
    for _ in range(5):
        d2.push(np.full(3, 1e-4), np.full(3, 1e-6))
    assert d2.decide(num_orb_matches=100) == Mode.DIRECT


def test_pose_decision_overrides():
    d = PoseEstimationDecision(DecisionConfig(min_orb_matches=30))
    for _ in range(5):
        d.push(np.full(3, 1e-8), np.full(3, 1e-2))
    assert d.decide(num_orb_matches=5) == Mode.DIRECT      # too few matches
    df = PoseEstimationDecision(DecisionConfig(force=Mode.DIRECT))
    assert df.decide(num_orb_matches=500) == Mode.DIRECT   # force flag


def test_ba_decision_rules():
    b = BundleAdjustmentDecision(DecisionConfig())
    # too few indirect points -> direct
    assert b.decide(10, 100, 90, 0.0) == Mode.DIRECT
    # saturated photometric residuals -> indirect
    assert b.decide(500, 100, 90, 0.5) == Mode.INDIRECT
    bf = BundleAdjustmentDecision(DecisionConfig(ba_force=Mode.INDIRECT))
    assert bf.decide(0, 0, 0, 0.0) == Mode.INDIRECT


def test_hybrid_odometry_end_to_end():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    n = 16
    poses = forward_trajectory(n, step=0.08, yaw_rate=0.003)
    odo = HybridOdometry(cam, CFG, orb_budget=192, orb_levels=2)
    gt_c2w = []
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        odo.process(img, float(i))
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        gt_c2w.append(np.linalg.inv(M))
    assert odo.state == "TRACKING", "initialization never succeeded"
    # the indirect map populated and keyframes recorded observations
    assert odo._pt_valid.sum() > 20, "no indirect map points triangulated"
    assert len(odo._ind_kfs) >= 2
    assert len(odo.mode_history) > 0

    ts, est = odo.trajectory_c2w()
    gt = np.asarray(gt_c2w)
    ate = ate_rmse(est[:, :3, 3], gt[:, :3, 3], with_scale=True)
    # same tolerance regime as the direct-only test (test_odometry: < 0.10);
    # on this run the hybrid must not degrade the direct spine
    assert np.isfinite(ate)
    assert ate < 0.10, f"hybrid ATE too large: {ate}"
