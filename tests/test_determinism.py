"""Dual-run determinism: two identical odometry instances fed identical
frames must produce identical trajectories — the reference's
TEST_DETERMINISITY dual-SLAM cross-check (reference: config.h.in:19,
modslam.cpp:234-252, assertDeterministic types.h:103-112)."""

import numpy as np

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


def test_dual_run_determinism():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(12, step=0.08, yaw_rate=0.003)
    imgs = [sc.render(R, t)[0] for R, t in poses]

    a = DirectOdometry(cam, CFG)
    b = DirectOdometry(cam, CFG)
    for i, img in enumerate(imgs):
        out_a = a.process(img, float(i))
        out_b = b.process(img, float(i))
        # per-frame cross-check (assertDeterministic semantics)
        assert out_a["state"] == out_b["state"], f"diverged at frame {i}"
        ta = np.asarray(a._T_curr.t)
        tb = np.asarray(b._T_curr.t)
        np.testing.assert_array_equal(ta, tb, err_msg=f"frame {i}")

    _, est_a = a.trajectory_c2w()
    _, est_b = b.trajectory_c2w()
    np.testing.assert_array_equal(est_a, est_b)
