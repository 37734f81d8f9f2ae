"""Jacobian correctness (finite differences) and residual sanity for the
photometric core, on the synthetic planar scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.data.synthetic import SyntheticScene, forward_trajectory
from libcml_tpu.models.direct.residuals import (
    evaluate_residuals,
    idepth_jacobian,
    pattern_uv,
    rel_pose_jacobian,
)
from libcml_tpu.ops.image import bilinear, build_gradient_pyramid


@pytest.fixture(scope="module")
def scene_pair():
    cam = PinholeCamera.make(300.0, 300.0, 159.5, 119.5, 320, 240)
    scene = SyntheticScene.default(cam, seed=3)
    poses = forward_trajectory(6, step=0.15)
    (R0, t0), (R1, t1) = poses[0], poses[3]
    img0, id0 = scene.render(R0, t0)
    img1, id1 = scene.render(R1, t1)
    # relative pose T_10 = T_1 ∘ T_0^-1
    T0 = SE3(R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32))
    T1 = SE3(R=jnp.asarray(R1, jnp.float32), t=jnp.asarray(t1, jnp.float32))
    T_10 = T1.compose(T0.inverse())
    return cam, img0, id0, img1, T_10


def _sample_points(cam, img0, id0, n=64, seed=0):
    rng = np.random.default_rng(seed)
    uv = rng.uniform([8, 8], [cam.width - 8, cam.height - 8], size=(n, 2)).astype(np.float32)
    uv = jnp.asarray(uv)
    idepth = bilinear(jnp.asarray(id0), uv)
    G0 = build_gradient_pyramid(jnp.asarray(img0), 1)[0]
    color = bilinear(G0, pattern_uv(uv))[..., 0]
    weight = jnp.ones((n, 8), jnp.float32)
    return uv, idepth, color, weight


def test_zero_residual_at_ground_truth(scene_pair):
    cam, img0, id0, img1, T_10 = scene_pair
    uv, idepth, color, weight = _sample_points(cam, img0, id0)
    G1 = build_gradient_pyramid(jnp.asarray(img1), 1)[0]
    ev = evaluate_residuals(
        G1, cam, uv, idepth, color, weight, T_10,
        jnp.float32(0.0), jnp.float32(0.0),
    )
    ok = np.asarray(ev.valid)
    assert ok.sum() > 40
    # median |r| small (bilinear rendering noise); occlusions can spike a few
    med = np.median(np.abs(np.asarray(ev.r)[ok]))
    assert med < 2.0, med


def test_pose_jacobian_finite_difference(scene_pair):
    cam, img0, id0, img1, T_10 = scene_pair
    uv, idepth, color, weight = _sample_points(cam, img0, id0, n=32)
    G1 = build_gradient_pyramid(jnp.asarray(img1), 1)[0]

    def residuals_at(x):
        T = se3_exp(x[:6]).compose(T_10)
        ev = evaluate_residuals(G1, cam, uv, idepth, color, weight, T, x[6], x[7])
        return ev.r, ev.valid

    x0 = jnp.zeros(8)
    ev = evaluate_residuals(G1, cam, uv, idepth, color, weight, T_10, x0[6], x0[7])
    J = rel_pose_jacobian(ev, color)  # (P, 8, 8)

    eps = 1e-3
    r0, valid0 = residuals_at(x0)
    for d in range(8):
        dx = x0.at[d].set(eps)
        rp, vp = residuals_at(dx)
        dm = x0.at[d].set(-eps)
        rm, vm = residuals_at(dm)
        J_num = (np.asarray(rp) - np.asarray(rm)) / (2 * eps)
        ok = np.asarray(valid0 & vp & vm)
        Ja = np.asarray(J[..., d])[ok]
        Jn = J_num[ok]
        # image interpolation is only piecewise smooth: compare robustly
        denom = np.maximum(np.abs(Jn), 20.0)
        relerr = np.median(np.abs(Ja - Jn) / denom)
        assert relerr < 0.15, (d, relerr)


def test_idepth_jacobian_finite_difference(scene_pair):
    cam, img0, id0, img1, T_10 = scene_pair
    uv, idepth, color, weight = _sample_points(cam, img0, id0, n=32)
    G1 = build_gradient_pyramid(jnp.asarray(img1), 1)[0]

    ev = evaluate_residuals(G1, cam, uv, idepth, color, weight, T_10, 0.0, 0.0)
    J = idepth_jacobian(ev, T_10, idepth)  # (P, 8)

    eps = 1e-4
    evp = evaluate_residuals(G1, cam, uv, idepth + eps, color, weight, T_10, 0.0, 0.0)
    evm = evaluate_residuals(G1, cam, uv, idepth - eps, color, weight, T_10, 0.0, 0.0)
    J_num = (np.asarray(evp.r) - np.asarray(evm.r)) / (2 * eps)
    ok = np.asarray(ev.valid & evp.valid & evm.valid)
    Ja, Jn = np.asarray(J)[ok], J_num[ok]
    denom = np.maximum(np.abs(Jn), 20.0)
    relerr = np.median(np.abs(Ja - Jn) / denom)
    assert relerr < 0.15, relerr


def test_affine_brightness_model(scene_pair):
    cam, img0, id0, img1, T_10 = scene_pair
    uv, idepth, color, weight = _sample_points(cam, img0, id0)
    # target = brightness-modified img1: I' = e^a * I + b with (a, b) known
    a_true, b_true = 0.2, 10.0
    img1_mod = np.exp(a_true) * np.asarray(img1) + b_true
    G1 = build_gradient_pyramid(jnp.asarray(img1_mod, dtype=jnp.float32), 1)[0]
    ev = evaluate_residuals(
        G1, cam, uv, idepth, color, weight, T_10,
        jnp.float32(a_true), jnp.float32(b_true),
    )
    ok = np.asarray(ev.valid)
    med = np.median(np.abs(np.asarray(ev.r)[ok]))
    assert med < 3.0, med
