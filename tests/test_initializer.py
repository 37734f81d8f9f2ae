"""Two-frame direct bootstrap on the synthetic scene: the recovered relative
pose must match ground truth up to monocular scale, and point inverse depths
must correlate with the rendered depth map."""

import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.initializer import (
    normalize_scale,
    set_first,
    try_initialize,
)
from libcml_tpu.ops.image import build_gradient_pyramid


def test_initializer_recovers_pose_and_depth():
    cam = PinholeCamera.make(220.0, 220.0, 127.5, 95.5, 256, 192)
    scene = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(7, step=0.12)
    cfg = DirectConfig(init_points=512, init_iters=12, num_levels=4)

    img0, id0 = scene.render(*poses[0])
    pyr0 = build_gradient_pyramid(jnp.asarray(img0), cfg.num_levels)
    state = set_first(pyr0, cam, cfg)

    result = None
    for i in range(1, 7):
        img, _ = scene.render(*poses[i])
        pyr = build_gradient_pyramid(jnp.asarray(img), cfg.num_levels)
        result = try_initialize(state, pyr, cam, cfg)
        state = result.state
        if bool(result.success):
            break

    assert result is not None and bool(result.success), "initializer never snapped"

    state, _ = normalize_scale(state)

    # ground-truth relative pose cur <- first (world-to-camera convention)
    R0, t0 = poses[0]
    Ri, ti = poses[i]
    T0 = SE3(R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32))
    Ti = SE3(R=jnp.asarray(Ri, jnp.float32), t=jnp.asarray(ti, jnp.float32))
    T_gt = Ti.compose(T0.inverse())

    # rotation error (degrees)
    R_err = np.asarray(state.T.R) @ np.asarray(T_gt.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    assert ang < 0.5, f"rotation error {ang:.3f} deg"

    # translation direction error (scale is free)
    t_est = np.asarray(state.T.t)
    t_gt = np.asarray(T_gt.t)
    cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt) + 1e-12)
    assert cos > 0.995, f"translation direction cos {cos:.4f}"

    # inverse-depth structure: correlation with GT idepth at the points
    uv = np.asarray(state.uv).astype(int)
    valid = np.asarray(state.valid[0])
    gt_rho = id0[uv[:, 1], uv[:, 0]]
    ok = valid & (gt_rho > 1e-3)
    est = np.asarray(state.idepth)[ok]
    gt = gt_rho[ok]
    corr = np.corrcoef(est, gt)[0, 1]
    assert corr > 0.6, f"idepth correlation {corr:.3f}"
