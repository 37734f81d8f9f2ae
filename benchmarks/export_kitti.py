"""Render the synthetic corridor into a KITTI-layout sequence on disk.

Purpose (round 4): the measured head-to-head baseline. No real datasets
exist in this environment, but both engines speak KITTI — the reference
binary via its KittyCapture loader (reference:
src/cml/capture/KittyCapture.cpp:28-118: image_0/ PNGs, times.txt,
calib.txt with four P-matrix lines, poses/<seq>.txt two levels up) and
libcml_tpu via data/kitti.py. Rendering the same deterministic corridor
into that layout gives one input both can consume, so ATE and fps become
measured comparisons instead of claims.

Layout written under --out (default benchmarks/kitti_synth):
    sequences/<seq>/image_0/000000.png ...
    sequences/<seq>/times.txt
    sequences/<seq>/calib.txt          (P0..P3, KITTI corner-origin cx/cy)
    poses/<seq>.txt                    (ground truth, c2w 3x4 row-major)

Usage:
    python benchmarks/export_kitti.py [--frames 500] [--width 640]
        [--height 480] [--seq 04] [--out DIR] [--workers 2]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from libcml_tpu.core.camera import PinholeCamera  # noqa: E402


def snake_trajectory(n_frames: int, step: float = 0.08,
                     amp_deg: float = 15.0, period: int = 150):
    """Forward motion with sinusoidal yaw (snaking down the corridor).

    Unlike long_synthetic.corridor_trajectory (one-signed turns — fine for
    200 frames, but the accumulated heading walks the camera through the
    corridor walls past ~250), the zero-mean yaw keeps lateral excursion
    bounded (~1 m against walls at +-3 m) for arbitrarily long sequences
    while still exercising continuous turning, the drift-prone profile.
    Returns [(R, t)] world-to-camera poses."""
    poses = []
    pos = np.zeros(3)
    for i in range(n_frames):
        yaw = np.radians(amp_deg) * np.sin(2 * np.pi * i / period)
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])   # c2w
        fwd = Rc @ np.array([0.0, 0.0, 1.0])
        if i > 0:
            pos = pos + step * fwd
        pos_i = pos + np.array(
            [0.02 * np.sin(0.11 * i), 0.01 * np.sin(0.07 * i), 0.0])
        poses.append((Rc.T, -Rc.T @ pos_i))
    return poses


def build_scene_and_traj(cam: PinholeCamera, n_frames: int):
    from benchmarks.long_synthetic import scene_for

    # extent 48: 500 frames x 0.08 m ends ~8 m short of the end wall
    sc = scene_for(cam, extent=48.0)
    poses = snake_trajectory(n_frames)
    return sc, poses


_WORKER = {}


def _worker_init(W, H, fx, fy, cx, cy):
    cam = PinholeCamera.make(fx, fy, cx, cy, W, H)
    sc, _ = build_scene_and_traj(cam, 1)
    _WORKER["scene"] = sc


def render_one(args):
    i, R, t, out_dir = args
    from PIL import Image

    img, _ = _WORKER["scene"].render(R, t)
    arr = np.clip(np.round(img), 0, 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(
        os.path.join(out_dir, f"{i:06d}.png"))
    return i


def make_device_renderer(scene, cam: PinholeCamera, supersample: int = 2):
    """JIT-compiled device port of SyntheticScene.render for bulk export.

    The numpy renderer costs ~15 s per VGA frame on this host (1.2M
    supersampled rays x 6 planes x 48 cosine waves); the same math is a few
    ms of pure elementwise work on the chip. Only the final (H, W) uint8
    frame crosses back to the host. Semantics match SyntheticScene.render
    with a volumetric texture: per-pixel ray/plane z-buffer, tex3d shading,
    s x s box filter; uint8 quantization happens on device (matches the
    numpy render to within ~1 gray level of rounding)."""
    import jax
    import jax.numpy as jnp

    s = supersample
    H, W = cam.height * s, cam.width * s
    u = (np.arange(W, dtype=np.float64) + 0.5) / s - 0.5
    v = (np.arange(H, dtype=np.float64) + 0.5) / s - 0.5
    u, v = np.meshgrid(u, v)
    x = (u - float(cam.cx)) / float(cam.fx)
    y = (v - float(cam.cy)) / float(cam.fy)
    rays = jnp.asarray(np.stack([x, y, np.ones_like(x)], -1), jnp.float32)

    n = jnp.asarray(np.stack([pl.n for pl in scene.planes]), jnp.float32)
    d = jnp.asarray(np.array([pl.d for pl in scene.planes]), jnp.float32)
    tex = scene.tex3d
    omega = jnp.asarray(tex.omega, jnp.float32)      # (K, 3)
    phase = jnp.asarray(tex.phase, jnp.float32)
    amp = jnp.asarray(tex.amp, jnp.float32)
    contrast = float(tex.contrast)

    @jax.jit
    def render(R, t):
        dirs_w = jnp.einsum("hwj,ji->hwi", rays, R)          # rays @ R
        C_w = -R.T @ t
        denom = jnp.einsum("hwi,ki->hwk", dirs_w, n)          # (H, W, K)
        num = d[None, None, :] - (C_w @ n.T)[None, None, :]
        lam = num / jnp.where(jnp.abs(denom) < 1e-12, jnp.inf, denom)
        lam = jnp.where(lam > 0.05, lam, jnp.inf)
        best = jnp.min(lam, axis=-1)                          # (H, W)
        hit = jnp.isfinite(best)
        Xw = C_w[None, None, :] + dirs_w * jnp.where(hit, best, 0.0)[..., None]
        ph = jnp.einsum("hwi,ki->hwk", Xw, omega) + phase
        val = jnp.cos(ph) @ amp
        img_hi = 127.5 + 110.0 * jnp.tanh(contrast * val)
        img_hi = jnp.where(hit, img_hi, 127.0)
        img = img_hi.reshape(cam.height, s, cam.width, s).mean(axis=(1, 3))
        return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)

    return render


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=500)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--fx", type=float, default=520.0)
    ap.add_argument("--seq", default="04")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "kitti_synth"))
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--device", action="store_true", default=True,
                    help="render on the accelerator (default)")
    ap.add_argument("--no-device", dest="device", action="store_false")
    args = ap.parse_args()

    W, H = args.width, args.height
    fx = fy = args.fx
    cx, cy = W / 2 - 0.5, H / 2 - 0.5   # internal index convention
    cam = PinholeCamera.make(fx, fy, cx, cy, W, H)

    seq_dir = os.path.join(args.out, "sequences", args.seq)
    img_dir = os.path.join(seq_dir, "image_0")
    poses_dir = os.path.join(args.out, "poses")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(poses_dir, exist_ok=True)

    sc, poses = build_scene_and_traj(cam, args.frames)

    # times.txt: 10 Hz like real KITTI
    with open(os.path.join(seq_dir, "times.txt"), "w") as f:
        for i in range(args.frames):
            f.write(f"{i * 0.1:.6e}\n")

    # calib.txt: KITTI corner-origin convention — the reference subtracts
    # 0.5 on load (KittyCapture.cpp:98-101), our loader does the same, so
    # both engines recover exactly (fx, fy, cx, cy)
    P = (f"{fx:.12e} 0.000000000000e+00 {cx + 0.5:.12e} 0.000000000000e+00 "
         f"0.000000000000e+00 {fy:.12e} {cy + 0.5:.12e} 0.000000000000e+00 "
         f"0.000000000000e+00 0.000000000000e+00 1.000000000000e+00 "
         f"0.000000000000e+00")
    with open(os.path.join(seq_dir, "calib.txt"), "w") as f:
        for name in ("P0", "P1", "P2", "P3"):
            f.write(f"{name}: {P}\n")

    # poses/<seq>.txt: ground truth c2w 3x4 row-major per line
    with open(os.path.join(poses_dir, f"{args.seq}.txt"), "w") as f:
        for R, t in poses:
            M = np.eye(4)
            M[:3, :3], M[:3, 3] = R, t
            c2w = np.linalg.inv(M)[:3, :4]
            f.write(" ".join(f"{v:.9e}" for v in c2w.reshape(-1)) + "\n")

    # frames — render in parallel worker processes (each rebuilds the
    # deterministic scene; seeds are fixed so every worker renders the
    # identical world)
    todo = [
        (i, R, t, img_dir)
        for i, (R, t) in enumerate(poses)
        if not os.path.exists(os.path.join(img_dir, f"{i:06d}.png"))
    ]
    print(f"rendering {len(todo)}/{args.frames} frames "
          f"({W}x{H}) with {args.workers} workers ...")
    cam_args = (W, H, fx, fy, cx, cy)
    if args.device and todo:
        # accelerator path: render on device, overlap PIL encode of frame
        # k with the device render of frame k+1
        import jax.numpy as jnp
        from PIL import Image

        render = make_device_renderer(sc, cam, supersample=2)
        pending = None  # (frame index, in-flight device render)
        for n in range(len(todo) + 1):
            nxt = None
            if n < len(todo):
                i, R, t, _ = todo[n]
                nxt = (i, render(jnp.asarray(R, jnp.float32),
                                 jnp.asarray(t, jnp.float32)))
            if pending is not None:
                j, fut = pending
                Image.fromarray(np.asarray(fut), mode="L").save(
                    os.path.join(img_dir, f"{j:06d}.png"))
                if j % 50 == 0:
                    print(f"  {j}")
            pending = nxt
    elif args.workers > 1 and len(todo) > 1:
        import multiprocessing as mp

        with mp.Pool(args.workers, initializer=_worker_init,
                     initargs=cam_args) as pool:
            for n, _ in enumerate(pool.imap_unordered(render_one, todo,
                                                      chunksize=4)):
                if n % 25 == 0:
                    print(f"  {n}/{len(todo)}")
    else:
        _worker_init(*cam_args)
        for n, job in enumerate(todo):
            render_one(job)
            if n % 25 == 0:
                print(f"  {n}/{len(todo)}")
    print(f"done: {seq_dir}")


if __name__ == "__main__":
    main()
