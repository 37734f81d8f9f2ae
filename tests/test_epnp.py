"""EPnP absolute pose: closed-form accuracy, RANSAC outlier rejection
(reference parity: src/cml/optimization/EPnP.{h,cpp})."""

import jax
import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.indirect.epnp import epnp_ransac, epnp_solve

CAM = PinholeCamera.make(200.0, 200.0, 159.5, 119.5, 320, 240)


def _scene(seed=0, N=64):
    rng = np.random.default_rng(seed)
    Xw = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
         rng.uniform(3.0, 9.0, N)], axis=1
    ).astype(np.float32)
    xi = np.array([0.3, -0.2, 0.4, 0.05, -0.08, 0.03], np.float32)
    T_gt = se3_exp(jnp.asarray(xi))
    Xc = np.asarray(T_gt.apply(jnp.asarray(Xw)))
    uv, ok = CAM.project(jnp.asarray(Xc))
    return Xw, np.asarray(uv), np.asarray(ok), T_gt


def _pose_err(T, T_gt):
    dR = np.asarray(T.R) @ np.asarray(T_gt.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    dt = np.linalg.norm(np.asarray(T.t) - np.asarray(T_gt.t))
    return ang, dt


def test_epnp_exact_correspondences():
    Xw, uv, ok, T_gt = _scene(0)
    w = ok.astype(np.float32)
    T = epnp_solve(jnp.asarray(Xw), jnp.asarray(uv), jnp.asarray(w), CAM)
    ang, dt = _pose_err(T, T_gt)
    assert ang < 0.1 and dt < 0.01, f"ang {ang}, dt {dt}"


def test_epnp_noisy_correspondences():
    rng = np.random.default_rng(1)
    Xw, uv, ok, T_gt = _scene(1)
    uv = uv + rng.normal(0, 0.5, uv.shape)
    w = ok.astype(np.float32)
    T = epnp_solve(jnp.asarray(Xw, jnp.float32),
                   jnp.asarray(uv, jnp.float32), jnp.asarray(w), CAM)
    ang, dt = _pose_err(T, T_gt)
    assert ang < 1.0 and dt < 0.08, f"ang {ang}, dt {dt}"


def test_epnp_ransac_rejects_outliers():
    rng = np.random.default_rng(2)
    Xw, uv, ok, T_gt = _scene(2)
    uv = uv + rng.normal(0, 0.3, uv.shape)
    # corrupt 35% of matches with gross errors
    n_bad = int(0.35 * len(uv))
    bad = rng.choice(len(uv), n_bad, replace=False)
    uv[bad] += rng.uniform(30, 120, (n_bad, 2)) * rng.choice([-1, 1], (n_bad, 2))

    res = jax.jit(
        lambda X, u, v, k: epnp_ransac(X, u, v, CAM, k, n_hyp=64)
    )(
        jnp.asarray(Xw, jnp.float32), jnp.asarray(uv, jnp.float32),
        jnp.asarray(ok), jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    ang, dt = _pose_err(res.T, T_gt)
    assert ang < 1.0 and dt < 0.08, f"ang {ang}, dt {dt}"
    # inliers should be mostly the uncorrupted set
    inl = np.asarray(res.inliers)
    assert inl[~np.isin(np.arange(len(uv)), bad)].mean() > 0.8
    assert inl[bad].mean() < 0.2
