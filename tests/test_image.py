"""Tests for image ops and camera models."""

import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera, build_remap, radtan_distort
from libcml_tpu.ops import (
    bilinear,
    build_gradient_pyramid,
    build_pyramid,
    gradient_image,
    reduce_by_two,
    remap_image,
    apply_photometric,
)


def test_bilinear_exact_on_linear_ramp():
    H, W = 16, 24
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = jnp.asarray(2.0 * xx + 3.0 * yy, dtype=jnp.float32)
    uv = jnp.asarray([[3.25, 4.5], [10.75, 7.1], [0.0, 0.0]], dtype=jnp.float32)
    vals = bilinear(img, uv)
    expected = 2.0 * uv[:, 0] + 3.0 * uv[:, 1]
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expected), atol=1e-4)


def test_bilinear_multichannel():
    img = jnp.stack([jnp.ones((8, 8)), 2 * jnp.ones((8, 8))], axis=-1)
    v = bilinear(img, jnp.asarray([[3.5, 3.5]]))
    np.testing.assert_allclose(np.asarray(v), [[1.0, 2.0]], atol=1e-6)


def test_gradient_on_ramp():
    H, W = 12, 12
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = jnp.asarray(5.0 * xx - 2.0 * yy, dtype=jnp.float32)
    g = gradient_image(img)
    np.testing.assert_allclose(np.asarray(g[..., 1]), 5.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g[..., 2]), -2.0, atol=1e-5)


def test_reduce_by_two():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    small = reduce_by_two(img)
    assert small.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(small[0, 0]), (0 + 1 + 4 + 5) / 4.0)


def test_pyramid_shapes():
    img = jnp.zeros((64, 96), dtype=jnp.float32)
    pyr = build_pyramid(img, 4)
    assert [p.shape for p in pyr] == [(64, 96), (32, 48), (16, 24), (8, 12)]
    gpyr = build_gradient_pyramid(img, 3)
    assert gpyr[2].shape == (16, 24, 3)


def test_pinhole_project_unproject_roundtrip(rng):
    cam = PinholeCamera.make(400.0, 410.0, 320.0, 240.0, 640, 480)
    uv = jnp.asarray(rng.uniform(low=10, high=400, size=(32, 2)), dtype=jnp.float32)
    idepth = jnp.asarray(rng.uniform(0.1, 2.0, size=(32,)), dtype=jnp.float32)
    xyz = cam.unproject(uv, idepth)
    uv2, valid = cam.project(xyz)
    assert bool(jnp.all(valid))
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_pinhole_level_scaling():
    cam = PinholeCamera.make(400.0, 400.0, 319.5, 239.5, 640, 480)
    c1 = cam.level(1)
    assert (c1.width, c1.height) == (320, 240)
    np.testing.assert_allclose(float(c1.fx), 200.0)
    np.testing.assert_allclose(float(c1.cx), (319.5 + 0.5) / 2 - 0.5)


def test_remap_identity():
    H, W = 20, 30
    img = jnp.asarray(np.random.default_rng(1).uniform(size=(H, W)), dtype=jnp.float32)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    remap = jnp.asarray(np.stack([u, v], axis=-1))
    out = remap_image(img, remap)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_build_remap_no_distortion_is_identity():
    cam = PinholeCamera.make(100.0, 100.0, 15.0, 10.0, 32, 20)
    K = np.array([[100.0, 0, 15.0], [0, 100.0, 10.0], [0, 0, 1]])
    remap = build_remap(cam, K, lambda xn: radtan_distort(xn, 0, 0, 0, 0))
    u, v = np.meshgrid(np.arange(32, dtype=np.float32), np.arange(20, dtype=np.float32))
    np.testing.assert_allclose(remap[..., 0], u, atol=1e-4)
    np.testing.assert_allclose(remap[..., 1], v, atol=1e-4)


def test_photometric_gamma_identity():
    img = jnp.asarray([[0.0, 100.0], [254.0, 200.5]], dtype=jnp.float32)
    gamma = jnp.arange(256, dtype=jnp.float32)  # identity response
    out = apply_photometric(img, gamma=gamma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)
