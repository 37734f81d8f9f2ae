"""Two-view robust initializer + indirect local BA: synthetic-geometry
closed-loop checks (the reference's RobustRaulmurInitializer +
g2o localOptimize behaviours, SURVEY.md §2.6-2.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.indirect.indirect_ba import (
    IndirectBAProblem,
    ba_energy,
    run_local_ba,
)
from libcml_tpu.models.indirect.twoview import two_view_init

CAM = PinholeCamera.make(300.0, 300.0, 159.5, 119.5, 320, 240)


def _project(T, Xw):
    Xc = np.asarray(T.R) @ Xw.T + np.asarray(T.t)[:, None]
    return np.stack(
        [300.0 * Xc[0] / Xc[2] + 159.5, 300.0 * Xc[1] / Xc[2] + 119.5], -1
    ), Xc[2]


def test_two_view_init_recovers_motion():
    rng = np.random.default_rng(0)
    N = 300
    Xw = rng.uniform([-3, -2, 4], [3, 2, 12], (N, 3)).astype(np.float32)
    T1 = se3_exp(jnp.asarray([0.4, 0.05, 0.1, 0.01, -0.03, 0.005], jnp.float32))

    uv0, z0 = _project(SE3.identity(), Xw)
    uv1, z1 = _project(T1, Xw)
    uv0 += rng.normal(0, 0.4, uv0.shape)
    uv1 += rng.normal(0, 0.4, uv1.shape)
    valid = (z0 > 0) & (z1 > 0)
    # 15% outlier matches
    out = rng.choice(N, N // 7, replace=False)
    uv1[out] += rng.uniform(20, 80, (len(out), 2))

    res = two_view_init(
        jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32),
        jnp.asarray(valid), CAM, jax.random.PRNGKey(0),
    )
    assert bool(res.ok), f"init failed: inliers={int(res.num_inliers)}"
    # direction of translation (scale is unobservable)
    t_est = np.asarray(res.T_10.t)
    t_gt = np.asarray(T1.t)
    cos = np.dot(t_est, t_gt) / (np.linalg.norm(t_est) * np.linalg.norm(t_gt))
    assert cos > 0.995, f"translation direction off: cos={cos:.4f}"
    R_err = np.linalg.norm(np.asarray(res.T_10.R) - np.asarray(T1.R))
    assert R_err < 0.02
    # triangulated structure matches GT up to the global scale
    inl = np.asarray(res.inlier) & ~np.isin(np.arange(N), out)
    s = np.median(np.asarray(res.X0)[inl, 2] / Xw[inl, 2])
    rel = np.abs(np.asarray(res.X0)[inl] / s - Xw[inl]) / np.abs(Xw[inl]).max()
    assert np.median(rel) < 0.02


def test_two_view_init_rejects_pure_rotation():
    rng = np.random.default_rng(1)
    N = 200
    Xw = rng.uniform([-3, -2, 4], [3, 2, 12], (N, 3)).astype(np.float32)
    T1 = se3_exp(jnp.asarray([0, 0, 0, 0.02, -0.04, 0.01], jnp.float32))
    uv0, z0 = _project(SE3.identity(), Xw)
    uv1, z1 = _project(T1, Xw)
    uv0 += rng.normal(0, 0.3, uv0.shape)
    uv1 += rng.normal(0, 0.3, uv1.shape)
    res = two_view_init(
        jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32),
        jnp.asarray((z0 > 0) & (z1 > 0)), CAM, jax.random.PRNGKey(1),
    )
    assert not bool(res.ok), "pure rotation must not initialize"


def _make_ba_problem(rng, M=4, N=150, pose_noise=0.01, point_noise=0.05):
    Xw_gt = rng.uniform([-3, -2, 4], [3, 2, 10], (N, 3)).astype(np.float32)
    Ts_gt, Ts0 = [], []
    for m in range(M):
        xi = np.zeros(6, np.float32)
        xi[0] = 0.3 * m
        xi[2] = 0.1 * m
        T = se3_exp(jnp.asarray(xi))
        Ts_gt.append(T)
        if m <= 1 or pose_noise == 0:  # fixed frames enter exact
            Ts0.append(T)
        else:
            d = rng.normal(0, pose_noise, 6).astype(np.float32)
            Ts0.append(se3_exp(jnp.asarray(d)).compose(T))
    T_gt = jax.tree.map(lambda *x: jnp.stack(x), *Ts_gt)
    T_0 = jax.tree.map(lambda *x: jnp.stack(x), *Ts0)

    obs_f, obs_p, obs_uv = [], [], []
    for m in range(M):
        uv, z = _project(Ts_gt[m], Xw_gt)
        uv = uv + rng.normal(0, 0.3, uv.shape)
        ok = (z > 0.1) & (uv[:, 0] > 2) & (uv[:, 0] < 318) & (uv[:, 1] > 2) & (uv[:, 1] < 238)
        for n in np.flatnonzero(ok):
            obs_f.append(m)
            obs_p.append(n)
            obs_uv.append(uv[n])
    K = len(obs_f)
    Xw0 = Xw_gt * (1.0 + rng.normal(0, point_noise, (N, 1))).astype(np.float32)

    prob = IndirectBAProblem(
        T=T_0,
        frame_valid=jnp.ones(M, bool),
        # two fixed frames: pins the full 7-dof gauge incl. SCALE (the
        # reference's local BA always includes >= 1 fixed covisible frame
        # besides the anchor; with a single fixed pose monocular scale is
        # free and absolute-pose comparisons drift with frame index)
        frame_fixed=jnp.zeros(M, bool).at[0].set(True).at[1].set(True),
        Xw=jnp.asarray(Xw0),
        point_valid=jnp.ones(N, bool),
        obs_frame=jnp.asarray(obs_f, jnp.int32),
        obs_point=jnp.asarray(obs_p, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_valid=jnp.ones(K, bool),
        obs_sigma2=jnp.full((K,), 0.3**2, jnp.float32),
    )
    return prob, T_gt, Xw_gt


def test_local_ba_converges():
    rng = np.random.default_rng(2)
    prob, T_gt, Xw_gt = _make_ba_problem(rng)
    E0 = float(ba_energy(prob, CAM))
    out = run_local_ba(prob, CAM)
    E1 = float(ba_energy(out, CAM))
    assert E1 < 0.05 * E0, f"energy {E0:.1f} -> {E1:.1f}"
    # pose error vs GT (frame 0 fixed => gauge pinned)
    for m in range(1, 4):
        t_err = float(jnp.linalg.norm(out.T.t[m] - T_gt.t[m]))
        assert t_err < 8e-3, f"frame {m} t_err {t_err}"
    # structure error
    ok = np.asarray(out.point_valid)
    err = np.linalg.norm(np.asarray(out.Xw)[ok] - Xw_gt[ok], axis=1)
    assert np.median(err) < 0.08  # CRLB ~0.05 at median depth for this geometry


def test_local_ba_prunes_outliers():
    rng = np.random.default_rng(3)
    prob, T_gt, Xw_gt = _make_ba_problem(rng, pose_noise=0.005)
    K = prob.obs_uv.shape[0]
    bad = rng.choice(K, K // 10, replace=False)
    uv = np.asarray(prob.obs_uv).copy()
    uv[bad] += rng.uniform(15, 60, (len(bad), 2))
    prob = prob.replace(obs_uv=jnp.asarray(uv))
    out = run_local_ba(prob, CAM)
    kept = np.asarray(out.obs_valid)
    assert kept[bad].mean() < 0.05, "outlier observations not pruned"
    assert kept.mean() > 0.75, "too many inliers pruned"
    for m in range(1, 4):
        t_err = float(jnp.linalg.norm(out.T.t[m] - T_gt.t[m]))
        assert t_err < 1.2e-2
