"""End-to-end direct odometry on a synthetic scene: the Milestone-A closed
loop (SURVEY.md §7 minimum slice) — init → track → keyframes → windowed BA →
marginalization → trajectory export → ATE check against ground truth."""

import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.eval.trajectory import ate_rmse
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
)


@pytest.fixture(scope="module")
def scene():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    return cam, SyntheticScene.default(cam, seed=3)


def test_direct_odometry_ate(scene):
    # 16 frames: exercises init, multi-hypothesis tracking, the immature
    # lifecycle, several keyframes AND marginalization cycles. Direct-only
    # monocular odometry on this narrow-FOV corridor drifts beyond ~18
    # frames along the photometrically-flat lateral-translation/rotation
    # mode (confirmed ~7x flatter than its orthogonal directions) — the
    # reference's answer to that drift is the HYBRID's indirect
    # re-observation constraints, not more direct tracking.
    cam, sc = scene
    n = 16
    poses = forward_trajectory(n, step=0.08, yaw_rate=0.003)
    odo = DirectOdometry(cam, CFG)
    gt_c2w = []
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        odo.process(img, float(i))
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        gt_c2w.append(np.linalg.inv(M))
    assert odo.state == "TRACKING", "initialization never succeeded"

    ts, est = odo.trajectory_c2w()
    gt = np.asarray(gt_c2w)
    assert est.shape == gt.shape

    # monocular scale-corrected ATE; trajectory covers ~2.3 world units
    err = ate_rmse(est[:, :3, 3], gt[:, :3, 3], with_scale=True)
    assert np.isfinite(err)
    assert err < 0.10, f"ATE {err:.4f} too large"


def test_rectified_odometry_matches_ideal(scene):
    """Feed RAW distorted + response-curved + vignetted frames with the
    matching Calibration: the device-side preprocess (gamma LUT -> vignette
    divide -> remap gather) must recover near-ideal-geometry odometry
    (reference: TUMCapture.cpp:19-131 photometric prep +
    InternalCalibration.h:342 undistort maps; VERDICT r2 missing #3)."""
    from libcml_tpu.core.camera import (
        Calibration,
        build_remap,
        fov_distort,
        invert_distortion,
    )
    from libcml_tpu.data.synthetic import SyntheticScene

    cam, sc = scene
    omega = 0.7

    def distort(xn):
        return fov_distort(xn, omega)

    sc_d = SyntheticScene(sc.planes, cam, tex3d=sc.tex3d,
                          undistort_xn=lambda xn: invert_distortion(distort, xn))
    in_K = np.asarray(cam.K())
    remap = build_remap(cam, in_K, distort)

    # photometric model: recorded = G(irradiance * V), G(x) = 255 (x/255)^0.8
    H, W = cam.height, cam.width
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    r2 = (((xx - W / 2) / (W / 2)) ** 2 + ((yy - H / 2) / (H / 2)) ** 2)
    vignette = (1.0 - 0.3 * r2).astype(np.float32)
    gamma_lut = (255.0 * (np.arange(256) / 255.0) ** (1.0 / 0.8)).astype(
        np.float32
    )
    calib = Calibration(
        pinhole=cam,
        remap=jnp.asarray(remap),
        gamma=jnp.asarray(gamma_lut),
        vignette=jnp.asarray(vignette),
    )

    n = 12
    poses = forward_trajectory(n, step=0.08, yaw_rate=0.003)
    odo = DirectOdometry(calib, CFG)
    gt_c2w = []
    for i, (R, t) in enumerate(poses):
        img, _ = sc_d.render(R, t)
        raw = 255.0 * np.clip(img * vignette / 255.0, 0.0, 1.0) ** 0.8
        odo.process(raw.astype(np.float32), float(i))
        M = np.eye(4)
        M[:3, :3] = R
        M[:3, 3] = t
        gt_c2w.append(np.linalg.inv(M))
    assert odo.state == "TRACKING", "initialization never succeeded on raw frames"
    ts, est = odo.trajectory_c2w()
    err = ate_rmse(est[:, :3, 3], np.asarray(gt_c2w)[:, :3, 3], with_scale=True)
    assert np.isfinite(err)
    assert err < 0.10, f"rectified-run ATE {err:.4f} too large"
