"""Headline benchmark: direct-pipeline frame throughput on one chip.

Measures the flagship per-frame hot path — pyramid build + coarse-to-fine
photometric tracking of 2048 points (the dso2000 preset budget,
reference: evaluation/dso2000.yaml:8-10) at VGA-scale resolution — and
reports frames/second. `vs_baseline` compares against the reference MOD-SLAM
CPU tracker at 30 fps (typical desktop real-time rate the reference targets;
BASELINE.md: reference numbers are unpublished and must be measured locally —
30 fps is the provisional stand-in until the reference binary is benched).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from libcml_tpu.core.camera import PinholeCamera
    from libcml_tpu.core.lie import SE3, se3_exp
    from libcml_tpu.models.direct.config import DirectConfig
    from libcml_tpu.models.direct.tracker import make_tracker_ref, track
    from libcml_tpu.ops.image import build_gradient_pyramid

    H, W, P = 480, 640, 2048
    cfg = DirectConfig(num_levels=4, max_points=P, tracker_iters=10)
    cam = PinholeCamera.make(520.0, 520.0, W / 2 - 0.5, H / 2 - 0.5, W, H)

    rng = np.random.default_rng(0)
    base = np.cumsum(rng.standard_normal((H, W)), axis=1)
    base = base + np.cumsum(rng.standard_normal((H, W)), axis=0)
    img_ref = jnp.asarray((base - base.min()) / np.ptp(base) * 220.0 + 20.0,
                          jnp.float32)

    pyr_ref = build_gradient_pyramid(img_ref, cfg.num_levels)
    uv = jnp.asarray(
        rng.uniform([8, 8], [W - 8, H - 8], (P, 2)), jnp.float32
    )
    idepth = jnp.asarray(rng.uniform(0.3, 2.0, (P,)), jnp.float32)
    ref = make_tracker_ref(pyr_ref, cam, uv, idepth, jnp.ones((P,), bool), cfg)

    @jax.jit
    def frame_step(img, T_init, ab_init):
        pyr = build_gradient_pyramid(img, cfg.num_levels)
        return track(pyr, cam, ref, T_init, ab_init, cfg)

    T0 = se3_exp(jnp.asarray([0.01, 0.0, 0.03, 0.0, 0.002, 0.0], jnp.float32))
    ab0 = jnp.zeros(2, jnp.float32)

    # warmup / compile
    out = frame_step(img_ref, T0, ab0)
    jax.block_until_ready(out)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = frame_step(img_ref, T0, ab0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = iters / dt
    baseline_fps = 30.0  # provisional reference CPU tracking rate (BASELINE.md)
    print(json.dumps({
        "metric": "direct_tracker_fps_640x480_2048pts",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
