"""Self-calibration + viewer-export + depth-prior tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.models.calib import (
    apply_response,
    calibrate_distortion,
    calibrate_response,
    distortion_map,
    response_lut,
)
from libcml_tpu.viewer import export_ply, export_trajectory_ply, export_html_viewer


def test_response_recovery(rng):
    # ground-truth response: gamma-ish curve; samples = same irradiance seen
    # under exposure ratio e
    def g_true(x):
        return x**1.25

    N = 4000
    irr = rng.uniform(0.02, 0.6, N)
    e = 1.8
    # observed intensities: i = g_true^{-1}(irradiance)
    i1 = (irr ** (1 / 1.25)) * 255.0
    i2 = ((irr * e) ** (1 / 1.25)).clip(0, 1) * 255.0
    ok = (i2 < 250) & (i2 > 3)
    c = calibrate_response(
        jnp.asarray(i1), jnp.asarray(i2), jnp.full((N,), e), jnp.asarray(ok)
    )
    # fitted g must satisfy g(i2) ≈ e*g(i1) much better than identity
    x1, x2 = jnp.asarray(i1 / 255.0), jnp.asarray(i2 / 255.0)
    r_fit = np.asarray(apply_response(c, x2) - e * apply_response(c, x1))[ok]
    r_id = np.asarray(x2 - e * x1)[ok]
    assert np.abs(r_fit).mean() < 0.25 * np.abs(r_id).mean()
    lut = response_lut(c)
    assert lut.shape == (256,) and np.all(np.diff(lut) > -1.0)


def test_distortion_recovery(rng):
    cam = PinholeCamera.make(300.0, 300.0, 160.0, 120.0, 320, 240)
    k1, k2 = -0.28, 0.07
    N = 800
    Xc = np.stack([
        rng.uniform(-1.5, 1.5, N), rng.uniform(-1.1, 1.1, N),
        rng.uniform(2.0, 6.0, N),
    ], -1).astype(np.float32)
    xn = Xc[:, :2] / Xc[:, 2:3]
    r2 = (xn**2).sum(-1)
    rad = 1 + k1 * r2 + k2 * r2**2
    uv = np.stack([
        300.0 * xn[:, 0] * rad + 160.0, 300.0 * xn[:, 1] * rad + 120.0
    ], -1).astype(np.float32)
    p = calibrate_distortion(
        jnp.asarray(Xc), jnp.asarray(uv), jnp.ones(N, bool), cam
    )
    p = np.asarray(p)
    assert abs(p[0] - k1) < 0.01 and abs(p[1] - k2) < 0.02
    remap = distortion_map(jnp.asarray(p), cam)
    assert remap.shape == (240, 320, 2)
    # center pixel maps ~to itself
    assert np.allclose(remap[120, 160], [160, 120], atol=1.0)


def test_viewer_exports(tmp_path, rng):
    xyz = rng.normal(size=(500, 3)).astype(np.float32)
    unc = rng.uniform(0, 1, 500).astype(np.float32)
    n = export_ply(str(tmp_path / "m.ply"), xyz, uncertainty=unc,
                   max_uncertainty=0.5)
    assert 0 < n < 500                        # variance filter dropped some
    data = (tmp_path / "m.ply").read_bytes()
    assert data.startswith(b"ply") and f"vertex {n}".encode() in data

    poses = np.tile(np.eye(4), (20, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 5, 20)
    export_trajectory_ply(str(tmp_path / "t.ply"), poses)
    p = export_html_viewer(str(tmp_path / "v.html"), xyz, poses)
    assert os.path.getsize(p) > 1000


def test_precomputed_prior(tmp_path):
    from libcml_tpu.models.direct.prior import PrecomputedDepthPrior

    img_path = str(tmp_path / "000000.png")
    idepth = np.random.default_rng(0).uniform(0.1, 2.0, (24, 32)).astype(
        np.float32
    )
    np.save(str(tmp_path / "000000.idepth.npy"), idepth)
    prior = PrecomputedDepthPrior()
    out = prior(None, 0, img_path)
    np.testing.assert_allclose(out, idepth)
    assert prior(None, 0, str(tmp_path / "missing.png")) is None
