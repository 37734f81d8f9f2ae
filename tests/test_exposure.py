"""Exposure-aware affine brightness initialization (reference:
Exposure::to(), src/cml/map/Exposure.h:118-125, feeding the tracker's
affine state, DSOTracker.cpp:272): on a sequence with a strong exposure
ramp, initializing a = log(t_j / t_kf) must keep tracking locked where the
always-(0,0) initialization degrades."""

import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.eval.trajectory import ate_rmse
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.runtime.odometry import DirectOdometry

CFG = DirectConfig(
    num_levels=3, max_points=512, points_per_kf=128, init_points=128,
    max_frames=5, tracker_iters=8, init_iters=12, ba_iters=4,
    kf_flow_threshold=0.55, activate_min_traces=2,
    activate_max_relwidth=0.35, outlier_energy=300.0,
)


def _run(use_exposure: bool) -> tuple[float, int]:
    cam = PinholeCamera.make(110.0, 110.0, 79.5, 59.5, 160, 120)
    sc = SyntheticScene.default(cam, seed=5)
    n = 16
    poses = forward_trajectory(n, step=0.1, yaw_rate=0.003)
    # abrupt auto-exposure STEPS (the hard case: a gradual ramp is a tiny
    # per-frame delta the affine estimator absorbs on its own, but a step
    # demands log(2.5) of affine correction in a single frame — exactly the
    # situation the reference's Exposure::to() initialization exists for);
    # images scale linearly with exposure time (radiometric model)
    exposures = np.ones(n)
    exposures[6:] = 2.5
    exposures[11:] = 0.7
    odo = DirectOdometry(cam, CFG)
    gt, fails = [], 0
    for i, (R, t) in enumerate(poses):
        img, _ = sc.render(R, t)
        img = np.clip(img * exposures[i], 0, 255)
        out = odo.process(
            img, float(i),
            exposure=float(exposures[i]) if use_exposure else None,
        )
        if out.get("ok") is False:
            fails += 1
        M = np.eye(4)
        M[:3, :3], M[:3, 3] = R, t
        gt.append(np.linalg.inv(M))
    _, est = odo.trajectory_c2w()
    gt = np.asarray(gt)
    ate = float(ate_rmse(est[:, :3, 3], gt[:, :3, 3], with_scale=True))
    return ate, fails


def test_exposure_aware_tracking_beats_zero_init():
    ate_with, fails_with = _run(True)
    ate_without, fails_without = _run(False)
    # exposure-aware must track through the steps essentially cleanly (the
    # 0.7/2.5 downward step may cost a single marginal frame on some
    # backends); the zero-init run degrades measurably (measured: ATE
    # 0.046/0 fails vs 0.387/3 fails + LOST on the same sequence)
    assert fails_with <= 1
    assert fails_with <= fails_without
    assert ate_with < 0.1, ate_with
    assert ate_with <= ate_without * 1.5 + 1e-3, (ate_with, ate_without)
