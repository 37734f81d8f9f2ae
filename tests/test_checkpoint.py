"""Checkpoint/resume: a run saved mid-sequence and resumed in a fresh
instance must continue like the uninterrupted run (SURVEY.md §5)."""

import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.runtime.odometry import DirectOdometry

CFG = DirectConfig(
    num_levels=3, max_points=512, points_per_kf=128, init_points=128,
    max_frames=5, tracker_iters=8, init_iters=12, ba_iters=4,
    kf_flow_threshold=0.55, activate_min_traces=2,
    activate_max_relwidth=0.35, outlier_energy=300.0,
)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(14, step=0.08, yaw_rate=0.003)
    imgs = [sc.render(R, t)[0] for R, t in poses]

    # uninterrupted reference run
    ref = DirectOdometry(cam, CFG)
    for i, img in enumerate(imgs):
        ref.process(img, float(i))
    _, est_ref = ref.trajectory_c2w()

    # checkpointed run: save at frame 9, resume in a new instance
    a = DirectOdometry(cam, CFG)
    for i in range(10):
        a.process(imgs[i], float(i))
    ckpt = str(tmp_path / "state.pkl")
    a.save_state(ckpt)

    b = DirectOdometry(cam, CFG)
    b.load_state(ckpt)
    assert b.frame_idx == a.frame_idx
    assert b.state == a.state
    for i in range(10, 14):
        b.process(imgs[i], float(i))
    _, est_b = b.trajectory_c2w()

    assert est_b.shape == est_ref.shape
    # the resumed trajectory must match the uninterrupted one closely
    # (same device ops on identical state; tiny differences only from
    # nondeterministic reduction orders)
    err = np.linalg.norm(est_b[:, :3, 3] - est_ref[:, :3, 3], axis=1)
    assert err.max() < 5e-3, f"resume diverged: {err}"


def test_checkpoint_resume_hybrid(tmp_path):
    from libcml_tpu.runtime.hybrid import HybridOdometry

    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(12, step=0.08, yaw_rate=0.003)
    imgs = [sc.render(R, t)[0] for R, t in poses]

    a = HybridOdometry(cam, CFG, orb_budget=128, orb_levels=2)
    for i in range(9):
        a.process(imgs[i], float(i))
    ckpt = str(tmp_path / "hyb.pkl")
    a.save_state(ckpt)

    b = HybridOdometry(cam, CFG, orb_budget=128, orb_levels=2)
    b.load_state(ckpt)
    assert int(b._pt_valid.sum()) == int(a._pt_valid.sum())
    assert len(b._ind_kfs) == len(a._ind_kfs)
    for i in range(9, 12):
        b.process(imgs[i], float(i))
    assert b.state == "TRACKING"
    _, est = b.trajectory_c2w()
    assert est.shape[0] == 12
    assert np.isfinite(est[:, :3, 3]).all()
