"""Tests for the utils layer (logging + timers) and stats wiring."""

import logging as pylogging

from libcml_tpu.utils import Timer, get_logger, important, set_frame
from libcml_tpu.utils.logging import IMPORTANT


def test_timer_accumulates():
    t = Timer()
    with t:
        x = sum(range(1000))
    with t:
        x += sum(range(1000))
    assert t.count == 2
    assert t.elapsed_ms > 0
    assert t.mean_ms * 2 == t.elapsed_ms
    assert x > 0


def test_logger_frame_context():
    import io

    from libcml_tpu.utils.logging import _FrameFilter

    log = get_logger()
    buf = io.StringIO()
    h = pylogging.StreamHandler(buf)
    h.setFormatter(pylogging.Formatter("[%(levelname)s][f%(frame)s] %(message)s"))
    h.addFilter(_FrameFilter())
    log.addHandler(h)
    try:
        set_frame(42)
        log.error("boom %d", 7)
    finally:
        log.removeHandler(h)
        set_frame(None)
    assert "[f42]" in buf.getvalue() and "boom 7" in buf.getvalue()


def test_important_level():
    assert IMPORTANT > pylogging.WARNING
    assert IMPORTANT < pylogging.ERROR
    important("headline")  # must not raise


def test_stats_sheet_wired_in_odometry():
    import numpy as np

    from libcml_tpu.core.camera import PinholeCamera
    from libcml_tpu.models.direct.config import DirectConfig
    from libcml_tpu.runtime.odometry import DirectOdometry

    cam = PinholeCamera.make(60.0, 60.0, 31.5, 23.5, 64, 48)
    odo = DirectOdometry(cam, DirectConfig(num_levels=2, max_points=64,
                                           init_points=64, points_per_kf=32))
    rng = np.random.default_rng(0)
    img = np.cumsum(rng.standard_normal((48, 64)), axis=1).astype(np.float32)
    odo.process(img, 0.0)
    xs, ys = odo.sheet.stat("time_preprocess").series()
    assert len(xs) == 1 and ys[0] >= 0.0
