"""Indirect front-end unit tests: FAST, ORB, Hamming matching, PnP,
triangulation — numeric checks against closed forms / synthetic geometry
(the test pyramid the reference lacks, SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.indirect.fast import fast_detect
from libcml_tpu.models.indirect.orb import (
    brief_descriptor,
    extract_orb,
    hamming_matrix,
    ic_angle,
    match_ratio,
    popcount32,
)
from libcml_tpu.models.indirect.pnp import solve_pnp, triangulate_linear
from libcml_tpu.ops.image import build_pyramid


def polka(H=96, W=128, sq=10, pitch=24):
    """Isolated bright squares on dark ground. Square corners are L-junctions
    (~270 deg dark arc around a bright corner pixel), which FAST-9's
    9-contiguous-lanes test detects; checkerboard X-junctions split the
    Bresenham circle into four ~4-lane arcs and are INVISIBLE to FAST-9 by
    design (reference FAST.h:17 is FAST-9..12 too)."""
    img = np.full((H, W), 20.0, np.float32)
    for y0 in range(8, H - sq - 8, pitch):
        for x0 in range(8, W - sq - 8, pitch):
            img[y0 : y0 + sq, x0 : x0 + sq] = 220.0
    return img


def test_fast_finds_square_corners():
    img = jnp.asarray(polka())
    uv, score, valid = fast_detect(img, threshold=20.0, max_corners=256)
    uv = np.asarray(uv)[np.asarray(valid)]
    assert len(uv) >= 20
    # every detection must lie within 2px of a square corner
    corners = []
    for y0 in range(8, 96 - 10 - 8, 24):
        for x0 in range(8, 128 - 10 - 8, 24):
            corners += [(x0, y0), (x0 + 9, y0), (x0, y0 + 9), (x0 + 9, y0 + 9)]
    corners = np.array(corners, np.float32)
    d = np.linalg.norm(uv[:, None, :] - corners[None, :, :], axis=-1).min(axis=1)
    assert np.all(d <= 2.5), f"stray detections, max dist {d.max():.1f}"


def test_popcount():
    x = jnp.asarray(np.array([0, 1, 0xFFFFFFFF, 0x0F0F0F0F], dtype=np.uint32))
    np.testing.assert_array_equal(np.asarray(popcount32(x)), [0, 1, 32, 16])


def test_hamming_matrix_small():
    a = jnp.asarray(np.array([[0] * 8, [0xFFFFFFFF] * 8], dtype=np.uint32))
    d = np.asarray(hamming_matrix(a, a))
    assert d[0, 0] == 0 and d[1, 1] == 0
    assert d[0, 1] == 256 and d[1, 0] == 256


def test_orb_descriptor_rotation_invariance():
    """A descriptor computed on a rotated image patch should be close to the
    original when orientation steering works."""
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = rng.uniform(0, 255, (32, 32)).astype(np.float32)
    img_j = jnp.asarray(img)
    uv = jnp.asarray([[31.5, 31.5]], jnp.float32)

    a0 = ic_angle(img_j, uv)
    d0 = brief_descriptor(img_j, uv, a0)

    # rotate image 90 deg (k=1): new = rot90(img)
    img_r = jnp.asarray(np.rot90(img, k=1).copy())
    a1 = ic_angle(img_r, uv)
    d1 = brief_descriptor(img_r, uv, a1)

    dist = int(np.asarray(hamming_matrix(d0, d1))[0, 0])
    assert dist < 80, f"rotation-steered descriptors too far apart: {dist}"


def test_orb_matching_across_shift():
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    # smooth it so gradients are sane
    k = np.ones((3, 3)) / 9.0
    from scipy.ndimage import convolve

    base = convolve(base, k)
    img0 = jnp.asarray(base)
    img1 = jnp.asarray(np.roll(base, (0, 5), axis=(0, 1)))

    f0 = extract_orb(build_pyramid(img0, 2), budget_per_level=128, threshold=8.0)
    f1 = extract_orb(build_pyramid(img1, 2), budget_per_level=128, threshold=8.0)
    idx, good = match_ratio(f0.desc, f1.desc, f0.valid, f1.valid)
    idx, good = np.asarray(idx), np.asarray(good)
    assert good.sum() >= 10
    du = np.asarray(f1.uv)[idx[good], 0] - np.asarray(f0.uv)[good, 0]
    # majority of matches should agree with the 5px shift
    frac = np.mean(np.abs(du - 5.0) < 1.5)
    assert frac > 0.7, f"only {frac:.0%} of matches consistent with shift"


def test_pnp_recovers_pose():
    rng = np.random.default_rng(2)
    cam = PinholeCamera.make(300.0, 300.0, 159.5, 119.5, 320, 240)
    N = 200
    Xw = rng.uniform([-2, -2, 3], [2, 2, 8], (N, 3)).astype(np.float32)
    T_true = se3_exp(jnp.asarray([0.1, -0.05, 0.2, 0.02, -0.03, 0.01], jnp.float32))
    Xc = np.asarray(T_true.R) @ Xw.T + np.asarray(T_true.t)[:, None]
    uv = np.stack(
        [300.0 * Xc[0] / Xc[2] + 159.5, 300.0 * Xc[1] / Xc[2] + 119.5], -1
    ).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape)
    # 20% outliers
    out_idx = rng.choice(N, N // 5, replace=False)
    uv[out_idx] += rng.uniform(15, 60, (len(out_idx), 2))

    res = solve_pnp(
        jnp.asarray(Xw), jnp.asarray(uv), jnp.ones(N, bool),
        SE3.identity(), cam,
    )
    t_err = np.linalg.norm(np.asarray(res.T.t) - np.asarray(T_true.t))
    R_err = np.linalg.norm(np.asarray(res.T.R) - np.asarray(T_true.R))
    assert t_err < 0.01, f"translation error {t_err}"
    assert R_err < 0.005
    assert int(res.num_inliers) > 0.7 * (N - len(out_idx))


def test_triangulation_exact():
    rng = np.random.default_rng(3)
    cam = PinholeCamera.make(300.0, 300.0, 159.5, 119.5, 320, 240)
    N = 64
    X0 = rng.uniform([-2, -2, 3], [2, 2, 9], (N, 3)).astype(np.float32)
    T_10 = se3_exp(jnp.asarray([0.3, 0.0, 0.05, 0.0, 0.04, 0.0], jnp.float32))
    X1 = np.asarray(T_10.R) @ X0.T + np.asarray(T_10.t)[:, None]
    uv0 = np.stack([300 * X0[:, 0] / X0[:, 2] + 159.5,
                    300 * X0[:, 1] / X0[:, 2] + 119.5], -1)
    uv1 = np.stack([300 * X1[0] / X1[2] + 159.5,
                    300 * X1[1] / X1[2] + 119.5], -1)
    Xt, ok = triangulate_linear(
        jnp.asarray(uv0, jnp.float32), jnp.asarray(uv1, jnp.float32), T_10, cam
    )
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(Xt), X0, atol=5e-3)
