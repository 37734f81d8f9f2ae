"""Dataset loader tests against tiny generated fixture trees (no real
datasets in CI; the formats are exercised structurally: detection, calib
parsing, frame decode, groundtruth wiring, prefetch iteration)."""

import os
import zipfile

import numpy as np
import pytest

from libcml_tpu.data.capture import load_dataset

PIL = pytest.importorskip("PIL")
from PIL import Image


def _write_png(path, arr):
    Image.fromarray(arr.astype(np.uint8), mode="L").save(path)


def _img(i, H=32, W=40):
    rng = np.random.default_rng(i)
    return rng.integers(0, 255, (H, W)).astype(np.uint8)


def test_kitti_layout(tmp_path):
    seq = tmp_path / "04"
    (seq / "image_0").mkdir(parents=True)
    for i in range(3):
        _write_png(seq / "image_0" / f"{i:06d}.png", _img(i))
    (seq / "calib.txt").write_text(
        "P0: 100.0 0.0 20.0 0.0 0.0 100.0 16.0 0.0 0.0 0.0 1.0 0.0\n"
    )
    (seq / "times.txt").write_text("0.0\n0.1\n0.2\n")
    (seq / "poses.txt").write_text(
        "\n".join("1 0 0 %f 0 1 0 0 0 0 1 0" % (0.1 * i) for i in range(3))
    )
    cap = load_dataset(str(seq))
    assert len(cap) == 3
    assert float(cap.calibration.pinhole.fx) == 100.0
    frames = list(cap.frames())
    assert len(frames) == 3
    assert frames[2].gt_pose_c2w[0, 3] == pytest.approx(0.2)
    assert frames[1].image.shape == (32, 40)


def test_euroc_layout(tmp_path):
    cam = tmp_path / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    rows = []
    for i in range(3):
        name = f"{1000000000 + i * 50000000}.png"
        _write_png(cam / "data" / name, _img(i))
        rows.append(f"{1000000000 + i * 50000000},{name}")
    (cam / "data.csv").write_text("#ts,filename\n" + "\n".join(rows) + "\n")
    (cam / "sensor.yaml").write_text(
        "intrinsics: [95.0, 96.0, 20.0, 16.0]\n"
        "resolution: [40, 32]\n"
        "distortion_model: radial-tangential\n"
        "distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]\n"
    )
    gt = tmp_path / "mav0" / "state_groundtruth_estimate0"
    gt.mkdir(parents=True)
    gt_rows = ["#header"]
    for i in range(3):
        ts = 1000000000 + i * 50000000
        gt_rows.append(f"{ts},{0.1*i},0.0,0.0,1.0,0.0,0.0,0.0")
    (gt / "data.csv").write_text("\n".join(gt_rows) + "\n")

    cap = load_dataset(str(tmp_path))
    assert len(cap) == 3
    assert cap.calibration.remap is not None
    assert cap.calibration.remap.shape == (32, 40, 2)
    frames = list(cap.frames())
    assert frames[1].gt_pose_c2w is not None
    assert frames[1].gt_pose_c2w[0, 3] == pytest.approx(0.1)


def test_tartanair_layout(tmp_path):
    (tmp_path / "image_left").mkdir()
    for i in range(3):
        _write_png(tmp_path / "image_left" / f"{i:06d}_left.png", _img(i))
    poses = "\n".join("%f 0 0 0 0 0 1" % (0.5 * i) for i in range(3))
    (tmp_path / "pose_left.txt").write_text(poses + "\n")
    cap = load_dataset(str(tmp_path))
    assert len(cap) == 3
    f = list(cap.frames())
    # NED x (forward) maps to camera z
    assert f[2].gt_pose_c2w[2, 3] == pytest.approx(1.0)


def test_eth3d_layout(tmp_path):
    (tmp_path / "rgb").mkdir()
    rows = []
    for i in range(3):
        rel = f"rgb/{i}.png"
        _write_png(tmp_path / rel, _img(i))
        rows.append(f"{i * 0.1:.1f} {rel}")
    (tmp_path / "rgb.txt").write_text("\n".join(rows) + "\n")
    (tmp_path / "calibration.txt").write_text("90.0 91.0 20.0 16.0\n")
    (tmp_path / "groundtruth.txt").write_text(
        "\n".join(f"{i*0.1:.1f} {0.2*i} 0 0 0 0 0 1" for i in range(3)) + "\n"
    )
    cap = load_dataset(str(tmp_path))
    assert len(cap) == 3
    f = list(cap.frames())
    assert f[1].gt_pose_c2w[0, 3] == pytest.approx(0.2)
    assert float(cap.calibration.pinhole.fy) == 91.0


def test_stereopolis_zip(tmp_path):
    zpath = tmp_path / "cam.zip"
    import io

    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(2):
            buf = io.BytesIO()
            Image.fromarray(_img(i), mode="L").save(buf, format="PNG")
            zf.writestr(f"frame_{i:03d}.png", buf.getvalue())
        zf.writestr(
            "calib.xml",
            "<calib><focal>77.0</focal><ppx>20.5</ppx><ppy>15.5</ppy></calib>",
        )
        mask = np.full((32, 40), 255, np.uint8)
        mask[:, :5] = 0
        buf = io.BytesIO()
        Image.fromarray(mask, mode="L").save(buf, format="PNG")
        zf.writestr("mask.png", buf.getvalue())
    cap = load_dataset(str(zpath))
    assert len(cap) == 2
    assert float(cap.calibration.pinhole.fx) == 77.0
    f = list(cap.frames())
    assert np.all(f[0].image[:, :5] == 0.0)   # mask applied


def test_tum_zip_layout(tmp_path):
    """Zipped TUM-mono sequence read directly from images.zip (reference:
    TUMCapture zip archive path)."""
    import io

    (tmp_path / "times.txt").write_text(
        "\n".join(f"{i:05d} {i * 0.05:.3f} 10.0" for i in range(3)) + "\n"
    )
    (tmp_path / "camera.txt").write_text(
        "0.5 0.6 0.5 0.5 0.9\n40 32\ncrop\n40 32\n"
    )
    with zipfile.ZipFile(tmp_path / "images.zip", "w") as zf:
        for i in range(3):
            buf = io.BytesIO()
            Image.fromarray(_img(i), mode="L").save(buf, format="PNG")
            zf.writestr(f"{i:05d}.png", buf.getvalue())
    cap = load_dataset(str(tmp_path))
    assert len(cap) == 3
    assert cap.calibration.remap is not None  # FOV omega=0.9
    f = list(cap.frames())
    assert f[1].image.shape == (32, 40)
    assert f[1].exposure == pytest.approx(10.0)


def test_unknown_layout_raises(tmp_path):
    (tmp_path / "whatever.txt").write_text("x")
    with pytest.raises(ValueError):
        load_dataset(str(tmp_path))
