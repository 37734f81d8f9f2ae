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


def test_second_local_map_pass_rescues_matches():
    """The second tracking pass re-projects the map at the REFINED pose and
    recovers matches the predicted-pose pass pushed outside its search
    radius (reference: indirect/Tracking.cpp:413-632
    indirectTrackLocalMap). Also: a hybrid run must record the pass-2
    inlier statistic in the sheet."""
    import jax.numpy as jnp

    from libcml_tpu.core.lie import se3_exp
    from libcml_tpu.models.indirect.orb import extract_orb
    from libcml_tpu.ops.image import build_pyramid
    from libcml_tpu.runtime.hybrid import (
        _local_map_pass2,
        _project_match_pnp,
    )

    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    R0, t0 = np.eye(3), np.zeros(3)
    img, idepth = sc.render(R0, t0)
    pyr = build_pyramid(jnp.asarray(img, jnp.float32), 2)
    feats = extract_orb(pyr, budget_per_level=192)

    # build a map from the frame's own corners (true depths, identity pose)
    uv = np.asarray(feats.uv)
    valid = np.asarray(feats.valid)
    d = np.asarray(idepth)
    iy = np.clip(uv[:, 1].astype(int), 0, cam.height - 1)
    ix = np.clip(uv[:, 0].astype(int), 0, cam.width - 1)
    z = 1.0 / np.maximum(d[iy, ix], 1e-3)
    Xw = np.asarray(cam.unproject(jnp.asarray(uv), jnp.asarray(1.0 / z)))
    desc = np.asarray(feats.desc)
    level = np.asarray(feats.level)

    # a badly wrong PREDICTION (the motion model after a sharp turn):
    # 0.5 rad of yaw error ≈ 55 px of image-space error, far outside the
    # projection search radius
    T_bad = se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.0, 0.5, 0.0],
                                jnp.float32))
    T_refined = se3_exp(jnp.zeros(6, jnp.float32))

    _, _, bundle1, _ = _project_match_pnp(
        jnp.asarray(Xw), jnp.asarray(desc), jnp.asarray(valid),
        jnp.asarray(level), T_bad, T_bad, cam,
        feats.desc, feats.uv, feats.level, feats.angle, feats.valid,
    )
    mv2, bundle2 = _local_map_pass2(
        jnp.asarray(Xw), jnp.asarray(desc), jnp.asarray(valid),
        jnp.asarray(level), T_refined, cam,
        feats.desc, feats.uv, feats.level, feats.valid,
    )
    n1, n2 = float(bundle1[0]), float(bundle2[0])
    assert n2 > 2 * max(n1, 1), (n1, n2)
    assert float(bundle2[1]) >= 30    # PnP inliers at the refined pose


def test_hybrid_records_pass2_statistic():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(16, step=0.08, yaw_rate=0.003)
    odo = HybridOdometry(cam, CFG, orb_budget=192, orb_levels=2,
                         pipelined=True)
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        odo.process(img, float(i))
    assert odo.state == "TRACKING"
    assert "pass2_inliers" in odo.sheet._stats, (
        "second local-map pass never recorded its inlier statistic")
