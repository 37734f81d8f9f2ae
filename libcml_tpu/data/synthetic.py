"""Synthetic piecewise-planar scene renderer for pipeline tests and benches.

The reference has no test fixtures at all (SURVEY.md §4); this module is the
"tiny synthetic scene" golden-data generator the rebuilt test pyramid is based
on. A scene is a set of textured infinite planes in world space; rendering a
view is an exact per-pixel ray/plane intersection with a z-buffer over planes,
which yields photometrically consistent images from any pose PLUS ground-truth
inverse-depth maps — everything the direct pipeline (initializer, tracker,
tracer, photometric BA) needs for closed-loop accuracy tests.

Conventions: poses are world-to-camera SE3 (X_cam = R X_w + t), matching the
SLAM state. Textures are band-limited random fields so image gradients are
informative and bilinear interpolation is well-behaved.
"""

from __future__ import annotations

import numpy as np

from libcml_tpu.core.camera import PinholeCamera


def make_texture(rng: np.random.Generator, size: int = 256, octaves: int = 5) -> np.ndarray:
    """Band-limited random texture in [20, 235], (size, size) float32."""
    tex = np.zeros((size, size), dtype=np.float64)
    for o in range(octaves):
        n = max(2, size >> (octaves - 1 - o))
        coarse = rng.standard_normal((n, n))
        # bilinear upsample to full size
        yi = np.linspace(0, n - 1, size)
        xi = np.linspace(0, n - 1, size)
        y0 = np.clip(yi.astype(int), 0, n - 2)
        x0 = np.clip(xi.astype(int), 0, n - 2)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        up = (
            coarse[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + coarse[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
            + coarse[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
            + coarse[np.ix_(y0 + 1, x0 + 1)] * fy * fx
        )
        tex += up * (0.6**o)
    tex = (tex - tex.min()) / (tex.max() - tex.min() + 1e-12)
    return (20.0 + 215.0 * tex).astype(np.float32)


class Plane:
    """Textured infinite plane n·X = d (world frame), with an in-plane texture
    chart given by origin p0 and orthonormal basis (e1, e2)."""

    def __init__(self, n, d, texture, tex_scale=50.0):
        self.n = np.asarray(n, dtype=np.float64)
        self.n /= np.linalg.norm(self.n)
        self.d = float(d)
        self.texture = texture
        self.tex_scale = tex_scale  # texture pixels per world unit
        # build chart basis
        a = np.array([1.0, 0, 0]) if abs(self.n[0]) < 0.9 else np.array([0, 1.0, 0])
        self.e1 = np.cross(self.n, a)
        self.e1 /= np.linalg.norm(self.e1)
        self.e2 = np.cross(self.n, self.e1)
        self.p0 = self.n * self.d  # closest point to origin

    def sample(self, Xw: np.ndarray) -> np.ndarray:
        """Texture value at world points (..., 3), wrap-around addressing."""
        rel = Xw - self.p0
        u = (rel @ self.e1) * self.tex_scale
        v = (rel @ self.e2) * self.tex_scale
        T = self.texture
        H, W = T.shape
        # mod can land exactly on the modulus through float rounding
        u = np.clip(np.mod(u, W - 1), 0.0, W - 1 - 1e-4)
        v = np.clip(np.mod(v, H - 1), 0.0, H - 1 - 1e-4)
        x0 = np.floor(u).astype(int)
        y0 = np.floor(v).astype(int)
        fx = u - x0
        fy = v - y0
        return (
            T[y0, x0] * (1 - fy) * (1 - fx)
            + T[y0, x0 + 1] * (1 - fy) * fx
            + T[y0 + 1, x0] * fy * (1 - fx)
            + T[y0 + 1, x0 + 1] * fy * fx
        ).astype(np.float32)


class SyntheticScene:
    """A set of planes + a camera; renders (image, idepth) from w2c poses."""

    def __init__(self, planes: list[Plane], cam: PinholeCamera):
        self.planes = planes
        self.cam = cam

    @classmethod
    def default(cls, cam: PinholeCamera, seed: int = 0) -> "SyntheticScene":
        """A frontal wall at z=6 plus two slanted side walls and a floor —
        enough depth diversity for initializer/BA observability."""
        rng = np.random.default_rng(seed)
        planes = [
            Plane([0, 0, -1.0], -6.0, make_texture(rng), tex_scale=40.0),
            Plane([-0.45, 0, -1.0], -4.0, make_texture(rng), tex_scale=45.0),
            Plane([0.45, 0, -1.0], -4.0, make_texture(rng), tex_scale=45.0),
            Plane([0, -1.0, -0.15], -2.5, make_texture(rng), tex_scale=35.0),
        ]
        return cls(planes, cam)

    def render(self, R_w2c: np.ndarray, t_w2c: np.ndarray):
        """Render the scene from a world-to-camera pose.

        Returns (image (H, W) float32 in ~[0,255], idepth (H, W) float32).
        Pixels hitting no plane get idepth 0 and a mid-gray value."""
        cam = self.cam
        H, W = cam.height, cam.width
        u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        # unit-z ray directions in camera frame
        x = (u - float(cam.cx)) / float(cam.fx)
        y = (v - float(cam.cy)) / float(cam.fy)
        rays = np.stack([x, y, np.ones_like(x)], axis=-1)  # (H, W, 3)
        R = np.asarray(R_w2c, dtype=np.float64)
        t = np.asarray(t_w2c, dtype=np.float64)
        # world-frame ray dirs and camera center
        dirs_w = rays @ R  # R^T applied to each ray
        C_w = -R.T @ t
        best_z = np.full((H, W), np.inf)
        img = np.full((H, W), 127.0, dtype=np.float32)
        for pl in self.planes:
            denom = dirs_w @ pl.n
            num = pl.d - C_w @ pl.n
            with np.errstate(divide="ignore", invalid="ignore"):
                lam = num / denom  # camera z-depth (rays have unit z in cam frame)
            valid = (denom != 0) & (lam > 0.05) & (lam < best_z)
            if not np.any(valid):
                continue
            Xw = C_w + dirs_w * lam[..., None]
            vals = pl.sample(Xw[valid])
            img[valid] = vals
            best_z[valid] = lam[valid]
        idepth = np.where(np.isfinite(best_z), 1.0 / np.maximum(best_z, 1e-6), 0.0)
        return img, idepth.astype(np.float32)


def forward_trajectory(n_frames: int, step: float = 0.12, yaw_rate: float = 0.004):
    """KITTI-like forward motion with a slow yaw. Returns list of (R, t) w2c.

    Camera moves along +z in world; w2c pose for camera at world position p
    with rotation Rc (c2w) is R = Rc^T, t = -Rc^T p."""
    poses = []
    for i in range(n_frames):
        yaw = yaw_rate * i
        cy, sy = np.cos(yaw), np.sin(yaw)
        Rc = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])  # c2w
        p = np.array([0.25 * np.sin(0.05 * i), 0.02 * np.sin(0.08 * i), step * i])
        R = Rc.T
        t = -Rc.T @ p
        poses.append((R, t))
    return poses
