"""Optimal (Hartley-Sturm) triangulation + CameraChecker tests
(reference parity: src/cml/optimization/Triangulation.h:141,
src/cml/robust/CameraChecker.h:10)."""

import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.indirect.pnp import triangulate_linear
from libcml_tpu.models.indirect.triangulation import (
    optimal_correct,
    triangulate_optimal,
)
from libcml_tpu.runtime.checker import CameraChecker

CAM = PinholeCamera.make(200.0, 200.0, 159.5, 119.5, 320, 240)


def _pair(seed=0, N=48, noise=0.5):
    rng = np.random.default_rng(seed)
    X0 = np.stack(
        [rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
         rng.uniform(3.0, 9.0, N)], axis=1
    ).astype(np.float32)
    T_10 = se3_exp(jnp.asarray([0.4, 0.05, 0.1, 0.02, -0.05, 0.01],
                               jnp.float32))
    uv0, _ = CAM.project(jnp.asarray(X0))
    uv1, _ = CAM.project(T_10.apply(jnp.asarray(X0)))
    uv0 = np.asarray(uv0) + rng.normal(0, noise, (N, 2))
    uv1 = np.asarray(uv1) + rng.normal(0, noise, (N, 2))
    return X0, jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32), T_10


def _fundamental(T_10):
    K = np.asarray(CAM.K())
    t = np.asarray(T_10.t)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return np.linalg.inv(K).T @ tx @ np.asarray(T_10.R) @ np.linalg.inv(K)


def test_optimal_correction_satisfies_epipolar():
    X0, uv0, uv1, T_10 = _pair(0, noise=1.0)
    F = jnp.asarray(_fundamental(T_10), jnp.float32)
    c0, c1 = optimal_correct(uv0, uv1, F)
    h0 = jnp.concatenate([c0, jnp.ones((len(c0), 1))], -1)
    h1 = jnp.concatenate([c1, jnp.ones((len(c1), 1))], -1)
    resid = np.abs(np.asarray(jnp.einsum("ni,ij,nj->n", h1, F, h0)))
    # normalize by line gradient magnitude (Sampson-style scale)
    l = np.asarray(jnp.einsum("ij,nj->ni", F, h0))
    scale = np.sqrt(l[:, 0] ** 2 + l[:, 1] ** 2) + 1e-12
    assert np.median(resid / scale) < 0.05, np.median(resid / scale)
    # correction should move the points by roughly the noise scale, not more
    assert float(jnp.abs(c0 - uv0).max()) < 6.0


def test_optimal_beats_linear_under_noise():
    errs_lin, errs_opt = [], []
    for seed in range(4):
        X0, uv0, uv1, T_10 = _pair(seed, noise=1.2)
        Xl, okl = triangulate_linear(uv0, uv1, T_10, CAM)
        Xo, oko = triangulate_optimal(uv0, uv1, T_10, CAM)
        ok = np.asarray(okl & oko)
        errs_lin.append(np.linalg.norm(np.asarray(Xl)[ok] - X0[ok], axis=1))
        errs_opt.append(np.linalg.norm(np.asarray(Xo)[ok] - X0[ok], axis=1))
    e_lin = np.median(np.concatenate(errs_lin))
    e_opt = np.median(np.concatenate(errs_opt))
    assert e_opt <= e_lin * 1.02, f"optimal {e_opt:.4f} vs linear {e_lin:.4f}"


def test_camera_checker_gates_teleports():
    ck = CameraChecker()
    T = SE3.identity()
    step = se3_exp(jnp.asarray([0.0, 0.0, 0.1, 0.0, 0.01, 0.0], jnp.float32))
    poses = [T]
    for _ in range(8):
        poses.append(step.compose(poses[-1]))
        ck.push(poses[-2], poses[-1])
    # consistent next step: plausible
    nxt = step.compose(poses[-1])
    assert ck.plausible(poses[-1], nxt)
    # teleport: 50x the typical translation
    tele = se3_exp(jnp.asarray([0.0, 0.0, 5.0, 0.0, 0.0, 0.0], jnp.float32))
    assert not ck.plausible(poses[-1], tele.compose(poses[-1]))
    # wild rotation
    spin = se3_exp(jnp.asarray([0.0, 0.0, 0.1, 0.0, 1.5, 0.0], jnp.float32))
    assert not ck.plausible(poses[-1], spin.compose(poses[-1]))
