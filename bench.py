"""Headline benchmark: the REAL per-frame cost of the direct pipeline on one
chip, at the dso2000 operating point (640x480, 2048 active points, 4 levels).

What is measured (each steady-state on device, after compilation):
  - preprocess: gradient-pyramid build of the incoming frame
  - track: the single motion-model-seeded track (the runtime's per-frame
    fast path)
  - track_multi: the multi-hypothesis recovery battery, fired only when the
    single track looks bad (runtime/odometry.py: `suspect`); charged at
    BATTERY_RATE of frames
  - kf_event: keyframe insertion + windowed photometric BA + outlier pass
    (the jitted _kf_insert_and_ba program) plus f64 marginalization — paid
    every KF_INTERVAL-th frame

Headline value = amortized frames/s:
  1 / (t_pre + t_track + BATTERY_RATE * t_battery + t_kf / KF_INTERVAL)

`vs_baseline` compares against the reference MOD-SLAM CPU loop at 30 fps —
a PROVISIONAL stand-in (BASELINE.md: the reference publishes no numbers and
its binary has not been built/run in this environment); the honest statement
is "x times a typical desktop real-time rate", not parity with a measured
reference run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...parts}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(fn, *args, iters=20):
    import jax

    # two warmup calls: the first pays compilation, the second verifies the
    # steady state (compilation through the TPU tunnel can take minutes and
    # background-compile effects can leak into the first post-compile call)
    for _ in range(2):
        out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libcml_tpu.core.camera import PinholeCamera
    from libcml_tpu.core.lie import SE3, se3_exp
    from libcml_tpu.models.direct import ba as ba_mod
    from libcml_tpu.models.direct import window as win_mod
    from libcml_tpu.models.direct.config import DirectConfig
    from libcml_tpu.models.direct.tracker import make_tracker_ref
    from libcml_tpu.ops.image import build_gradient_pyramid
    from libcml_tpu.runtime.odometry import (
        _kf_insert_and_ba,
        _preprocess,
        _track,
        _track_multi,
    )

    H, W, P = 480, 640, 2048
    KF_INTERVAL = 5    # typical keyframe spacing in the runtime loops
    BATTERY_RATE = 0.1  # fraction of frames where the single track looks
                        # suspect and the recovery battery fires
    cfg = DirectConfig(num_levels=4, max_points=P, max_frames=7,
                       tracker_iters=10, ba_iters=4)
    cam = PinholeCamera.make(520.0, 520.0, W / 2 - 0.5, H / 2 - 0.5, W, H)

    rng = np.random.default_rng(0)
    base = np.cumsum(rng.standard_normal((H, W)), axis=1)
    base = base + np.cumsum(rng.standard_normal((H, W)), axis=0)
    img_ref = jnp.asarray((base - base.min()) / np.ptp(base) * 220.0 + 20.0,
                          jnp.float32)
    pyr_ref = build_gradient_pyramid(img_ref, cfg.num_levels)
    uv = jnp.asarray(rng.uniform([8, 8], [W - 8, H - 8], (P, 2)), jnp.float32)
    idepth = jnp.asarray(rng.uniform(0.3, 2.0, (P,)), jnp.float32)
    ref = make_tracker_ref(pyr_ref, cam, uv, idepth, jnp.ones((P,), bool), cfg)

    T_pred = se3_exp(jnp.asarray([0.01, 0.0, 0.03, 0.0, 0.002, 0.0],
                                 jnp.float32))
    ab0 = jnp.zeros(2, jnp.float32)

    # 1. per-frame preprocess
    t_pre = _timeit(lambda: _preprocess(img_ref, cfg.num_levels))

    # 2. per-frame single track (fast path) + the recovery battery
    t_track = _timeit(
        lambda: _track(pyr_ref, cam, ref, T_pred, ab0, cfg)
    )
    t_battery = _timeit(
        lambda: _track_multi(pyr_ref, cam, ref, T_pred, SE3.identity(),
                             ab0, cfg)
    )

    # 3. keyframe event: build a realistic window, then time insert+BA and
    # the f64 marginalization
    window = win_mod.empty_window(cfg, H, W)
    window, s0 = win_mod.add_keyframe(
        window, pyr_ref[0], SE3.identity(), jnp.zeros(2),
        jnp.asarray(0, jnp.int32),
    )
    window = window.replace(ba=ba_mod.anchor_first_frame(window.ba, 0, cfg))
    for k in range(1, 5):
        Tk = se3_exp(jnp.asarray([0.0, 0.0, 0.05 * k, 0.0, 0.002 * k, 0.0],
                                 jnp.float32))
        window, _ = win_mod.add_keyframe(
            window, pyr_ref[0], Tk, jnp.zeros(2), jnp.asarray(k, jnp.int32)
        )
    window = win_mod.add_points(window, s0, uv, idepth,
                                jnp.ones((P,), bool), cfg)

    t_kf = _timeit(
        lambda: _kf_insert_and_ba(
            window, pyr_ref[0], se3_exp(jnp.asarray([0, 0, 0.25, 0, 0.01, 0],
                                                    jnp.float32)),
            jnp.zeros(2), jnp.asarray(9, jnp.int32), cam, cfg,
        ),
        iters=5,
    )
    t_marg = _timeit(
        lambda: ba_mod.marginalize_frame_f64(window.ba, window.images, cam,
                                             cfg, 1),
        iters=5,
    )  # device contraction + host f64 Schur, once per KF event

    t_frame = (t_pre + t_track + BATTERY_RATE * t_battery
               + (t_kf + t_marg) / KF_INTERVAL)
    fps = 1.0 / t_frame
    baseline_fps = 30.0  # provisional stand-in (see module docstring)
    print(json.dumps({
        "metric": "direct_pipeline_amortized_fps_640x480_2048pts",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "t_preprocess_ms": round(t_pre * 1e3, 2),
        "t_track_ms": round(t_track * 1e3, 2),
        "t_battery_ms": round(t_battery * 1e3, 2),
        "t_kf_event_ms": round((t_kf + t_marg) * 1e3, 2),
        "kf_interval": KF_INTERVAL,
        "battery_rate": BATTERY_RATE,
    }))


if __name__ == "__main__":
    main()
