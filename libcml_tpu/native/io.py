"""ctypes binding for the native data pipeline (cml_io.cpp).

Builds libcml_io.so on first use (g++ -O3 -shared -fPIC, cached next to the
source / in ~/.cache) and exposes:
  - decode_gray(bytes) -> (H, W) float32 — PNG/PGM/PPM decode in C++
  - NativePrefetcher(paths, ...) — threaded ordered prefetch with gamma LUT
    and vignette correction applied in the worker pool

Reference: the C++ capture runtime this replaces is
src/cml/capture/AbstractCapture.h:83-140 (prefetch thread + bounded queue)
and CaptureImage.cpp (decode + photometric prep)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cml_io.cpp")
_LIB: ctypes.CDLL | None = None
_LIB_ERR: str | None = None
_LOCK = threading.Lock()
_MAXPIX = 4096 * 3072


def _build_and_load() -> ctypes.CDLL | None:
    global _LIB, _LIB_ERR
    with _LOCK:
        if _LIB is not None or _LIB_ERR is not None:
            return _LIB
        cache_dir = os.environ.get(
            "LIBCML_TPU_NATIVE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "libcml_tpu"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        so = os.path.join(cache_dir, "libcml_io.so")
        try:
            if (not os.path.isfile(so)
                    or os.path.getmtime(so) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", so,
                     "-lz", "-lpthread"],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.SubprocessError) as e:
            _LIB_ERR = str(e)
            return None
        lib.cmlio_open.restype = ctypes.c_void_p
        lib.cmlio_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_long,
        ]
        lib.cmlio_next.restype = ctypes.c_long
        lib.cmlio_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.cmlio_close.argtypes = [ctypes.c_void_p]
        lib.cmlio_decode.restype = ctypes.c_int
        lib.cmlio_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long,
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def decode_gray(data: bytes) -> np.ndarray:
    """Decode PNG (8/16-bit gray, 8-bit RGB(A)) or PGM/PPM bytes to a
    (H, W) float32 grayscale array via the native decoder; falls back to
    PIL when the native library or format is unavailable."""
    lib = _build_and_load()
    if lib is not None:
        out = np.empty(_MAXPIX, np.float32)
        H = ctypes.c_int()
        W = ctypes.c_int()
        rc = lib.cmlio_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.byref(H), ctypes.byref(W), _MAXPIX,
        )
        if rc == 0:
            return out[: H.value * W.value].reshape(H.value, W.value).copy()
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("L")
    return np.asarray(img, np.float32)


class NativePrefetcher:
    """Ordered multi-threaded frame prefetcher over a list of image files.

    for idx, img in NativePrefetcher(paths, gamma=lut, vignette=v):
        ...  # img is (H, W) float32, photometrically corrected
    """

    def __init__(
        self,
        paths: list[str],
        n_workers: int = 2,
        queue_cap: int = 6,
        gamma: np.ndarray | None = None,
        vignette: np.ndarray | None = None,
    ):
        self.paths = list(paths)
        self._lib = _build_and_load()
        self._handle = None
        self._gamma = gamma
        self._vignette = vignette
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            g = None
            if gamma is not None:
                self._g_buf = np.ascontiguousarray(gamma, np.float32)
                assert self._g_buf.size == 256
                g = self._g_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            v, vh, vw = None, 0, 0
            if vignette is not None:
                self._v_buf = np.ascontiguousarray(vignette, np.float32)
                vh, vw = self._v_buf.shape
                v = self._v_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            self._handle = self._lib.cmlio_open(
                arr, len(self.paths), n_workers, queue_cap, g, v, vh, vw,
                _MAXPIX,
            )

    def _python_load(self, path: str) -> np.ndarray:
        """Pure-Python decode + photometric correction for one frame."""
        with open(path, "rb") as f:
            img = decode_gray(f.read())
        if self._gamma is not None:
            lut = np.asarray(self._gamma, np.float32)
            img = np.interp(img, np.arange(256), lut).astype(np.float32)
        if (self._vignette is not None
                and self._vignette.shape == img.shape):
            img = img / np.maximum(self._vignette, 1e-4)
        return img

    def __iter__(self):
        if self._handle is not None:
            out = np.empty(_MAXPIX, np.float32)
            H = ctypes.c_int()
            W = ctypes.c_int()
            optr = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            # frames are emitted strictly in order (cmlio_next walks
            # next_to_emit), so a counter recovers the index of a frame
            # whose native decode failed — the error rc only carries the
            # error code, not the index
            pos = 0
            while True:
                rc = self._lib.cmlio_next(
                    self._handle, optr, ctypes.byref(H), ctypes.byref(W)
                )
                if rc == -1:
                    break
                if rc <= -1000:
                    # native decode error: fall back to the Python decode
                    # so consumers never see a gap in the frame sequence
                    yield pos, self._python_load(self.paths[pos])
                else:
                    yield int(rc), (
                        out[: H.value * W.value]
                        .reshape(H.value, W.value)
                        .copy()
                    )
                pos += 1
            return
        # pure-Python fallback path
        for i, p in enumerate(self.paths):
            yield i, self._python_load(p)

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.cmlio_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
