"""Calib SLAM variant: runs end-to-end on raw distorted footage and
recovers a usable distortion map (reference: src/cml/slam/calib/Calib.h:5
— the self-calibration SLAM built on Hybrid)."""

import numpy as np

from libcml_tpu.core.camera import (
    PinholeCamera,
    build_remap,
    invert_distortion,
    radtan_distort,
)
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.runtime.calib import CalibSlam

CFG = DirectConfig(
    num_levels=3, max_points=512, points_per_kf=128, init_points=128,
    max_frames=5, tracker_iters=8, init_iters=12, ba_iters=4,
    kf_flow_threshold=0.55, activate_min_traces=2,
    activate_max_relwidth=0.35, outlier_energy=300.0,
)

K1, K2 = -0.12, 0.02   # mild barrel distortion


def test_calib_slam_recovers_distortion():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)

    def distort(xn):
        return radtan_distort(xn, K1, K2, 0.0, 0.0)

    sc = SyntheticScene.default(cam, seed=3)
    sc_d = SyntheticScene(sc.planes, cam, tex3d=sc.tex3d,
                          undistort_xn=lambda xn: invert_distortion(distort, xn))

    # strong yaw: radial distortion is only observable through viewpoint
    # diversity (with pure forward motion each point's free depth absorbs
    # most of the radial error — the fit degenerates toward zero)
    poses = forward_trajectory(18, step=0.08, yaw_rate=0.02)
    odo = CalibSlam(cam, CFG, orb_budget=192, orb_levels=2)
    for i, (R, t) in enumerate(poses):
        img, _ = sc_d.render(R, t)
        odo.process(img.astype(np.float32), float(i))
    assert odo.state == "TRACKING"

    params = odo.fit_distortion()
    assert params is not None, "no correspondences harvested"
    # self-calibration from SLAM geometry is weakly observable (the map
    # itself was built from the distorted observations); require the
    # correct barrel SIGN and a remap that improves on assuming no
    # distortion at all
    assert params[0] < -1e-3, f"fitted k1 {params[0]} has the wrong sign"

    cal = odo.finalize()
    assert cal.remap is not None
    true_remap = build_remap(cam, np.asarray(cam.K()), distort)
    H, W = cam.height, cam.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                      np.arange(H, dtype=np.float32))
    identity = np.stack([u, v], -1)
    # compare away from the border (the fit is constrained where points are)
    sl = np.s_[H // 6 : -H // 6, W // 6 : -W // 6]
    err_fit = np.linalg.norm(np.asarray(cal.remap)[sl] - true_remap[sl],
                             axis=-1).mean()
    err_id = np.linalg.norm(identity[sl] - true_remap[sl], axis=-1).mean()
    assert err_fit < err_id, f"fit {err_fit:.2f}px vs identity {err_id:.2f}px"


def test_calib_slam_response_from_exposure_pairs():
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(12, step=0.08, yaw_rate=0.003)
    odo = CalibSlam(cam, CFG, orb_budget=128, orb_levels=2)
    # alternate exposure 1.0 / 1.3 with a nonlinear response baked in
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        e = 1.0 if i % 2 == 0 else 1.3
        raw = 255.0 * np.clip(e * img / 255.0, 0, 1) ** 0.85
        odo.process(raw.astype(np.float32), float(i), exposure=e)
    lut = odo.fit_response()
    assert lut is not None
    # LUT must be monotone and bend the right way (concave-up inverse of a
    # concave response): mid-gray maps below the linear ramp
    assert np.all(np.diff(lut) > -1.0)
    assert lut[128] < 128.0
