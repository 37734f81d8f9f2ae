"""Native C++ data-pipeline tests: decode parity vs PIL, ordered prefetch,
photometric correction in the worker pool."""

import numpy as np
import pytest

from libcml_tpu.native import NativePrefetcher, decode_gray, native_available

PIL = pytest.importorskip("PIL")
from PIL import Image


def _png_bytes(arr, mode="L"):
    import io

    buf = io.BytesIO()
    Image.fromarray(arr, mode=mode).save(buf, format="PNG")
    return buf.getvalue()


def test_native_builds():
    assert native_available(), "native libcml_io.so failed to build"


def test_decode_gray_png_matches_pil(rng):
    arr = rng.integers(0, 255, (37, 53)).astype(np.uint8)
    out = decode_gray(_png_bytes(arr))
    assert out.shape == (37, 53)
    np.testing.assert_allclose(out, arr.astype(np.float32), atol=0)


def test_decode_rgb_png_luma(rng):
    arr = rng.integers(0, 255, (21, 33, 3)).astype(np.uint8)
    out = decode_gray(_png_bytes(arr, mode="RGB"))
    ref = (0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2])
    np.testing.assert_allclose(out, ref, atol=0.51)


def test_decode_pgm(tmp_path, rng):
    arr = rng.integers(0, 255, (17, 23)).astype(np.uint8)
    data = b"P5\n# comment\n23 17\n255\n" + arr.tobytes()
    out = decode_gray(data)
    np.testing.assert_allclose(out, arr.astype(np.float32))


def test_prefetcher_ordered_and_corrected(tmp_path, rng):
    paths = []
    arrs = []
    for i in range(9):
        arr = rng.integers(1, 255, (24, 32)).astype(np.uint8)
        p = tmp_path / f"f{i}.png"
        Image.fromarray(arr, mode="L").save(p)
        paths.append(str(p))
        arrs.append(arr)
    gamma = (np.arange(256, dtype=np.float32) * 2.0)       # LUT: doubles
    vignette = np.full((24, 32), 0.5, np.float32)          # divide by 0.5
    pf = NativePrefetcher(paths, n_workers=3, queue_cap=4,
                          gamma=gamma, vignette=vignette)
    got = list(pf)
    pf.close()
    assert [i for i, _ in got] == list(range(9)), "frames out of order"
    for (i, img), arr in zip(got, arrs):
        # gamma doubles, vignette divides by 0.5 -> 4x
        np.testing.assert_allclose(img, arr.astype(np.float32) * 4.0,
                                   rtol=1e-5)
