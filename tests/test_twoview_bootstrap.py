"""ORB two-view bootstrap fallback wired into the hybrid runtime
(reference: RobustRaulmurInitializer::track as the indirect-side
initializer beside initializeWithDSO)."""

import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.runtime.hybrid import HybridOdometry

CFG = DirectConfig(
    num_levels=3, max_points=512, points_per_kf=128, init_points=128,
    max_frames=5, tracker_iters=8, init_iters=12, ba_iters=4,
    kf_flow_threshold=0.55, activate_min_traces=2,
    activate_max_relwidth=0.35, outlier_energy=300.0,
)


def test_twoview_bootstrap_promotes_and_tracks():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(12, step=0.1, yaw_rate=0.003)
    imgs = [sc.render(R, t)[0] for R, t in poses]

    odo = HybridOdometry(cam, CFG, orb_budget=256, orb_levels=2)
    odo.process(imgs[0], 0.0)                    # INIT_FIRST
    ok = odo._twoview_bootstrap(jnp.asarray(imgs[6], jnp.float32), 6.0)
    assert ok, "two-view bootstrap failed on a clean baseline pair"
    assert odo.state == "TRACKING"

    # recovered translation DIRECTION must match ground truth (monocular
    # scale is gauge); w2c t of the relative pose
    M0 = np.eye(4)
    M0[:3, :3], M0[:3, 3] = poses[0]
    M6 = np.eye(4)
    M6[:3, :3], M6[:3, 3] = poses[6]
    T_gt = M6 @ np.linalg.inv(M0)
    t_est = np.asarray(odo._kf_T.t)
    t_gt = T_gt[:3, 3]
    cos = np.dot(t_est, t_gt) / (
        np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12
    )
    assert cos > 0.95, f"translation direction off (cos {cos:.3f})"

    # and tracking continues from the bootstrap
    for i in range(7, 12):
        out = odo.process(imgs[i], float(i))
    assert out.get("ok")
    ts, est = odo.trajectory_c2w()
    assert np.isfinite(est[:, :3, 3]).all()
