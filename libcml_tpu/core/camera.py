"""Camera intrinsics, distortion models, and undistortion maps.

TPU-native replacement for the reference's calibration stack
(reference: src/cml/map/InternalCalibration.h:19-342 — PinholeUndistorter,
RadtanUndistorter:145, FOVUndistorter:206, FishEye10_5_5:250, and the
precomputed undistort maps at InternalCalibration.h:342).

Design: all SLAM math runs in an ideal pinhole space. Distorted inputs are
rectified ONCE per frame by resampling through a precomputed remap grid (a
(H, W, 2) array of source pixel coordinates) — a single gather-heavy op that
XLA vectorizes well — instead of the reference's per-access undistortion.
Pinhole intrinsics follow the DSO per-level convention:
    fx_l = fx * 2^-l,   cx_l = (cx + 0.5) * 2^-l - 0.5
so that pixel centers stay aligned across pyramid levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class PinholeCamera:
    """Ideal pinhole intrinsics. fx/fy/cx/cy are 0-d arrays so a jitted
    function can be reused across sequences without recompiling."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @classmethod
    def make(cls, fx, fy, cx, cy, width, height, dtype=jnp.float32) -> "PinholeCamera":
        return cls(
            fx=jnp.asarray(fx, dtype),
            fy=jnp.asarray(fy, dtype),
            cx=jnp.asarray(cx, dtype),
            cy=jnp.asarray(cy, dtype),
            width=int(width),
            height=int(height),
        )

    def level(self, l: int) -> "PinholeCamera":
        """Intrinsics for pyramid level l (DSO half-pixel convention)."""
        s = 0.5**l
        return PinholeCamera(
            fx=self.fx * s,
            fy=self.fy * s,
            cx=(self.cx + 0.5) * s - 0.5,
            cy=(self.cy + 0.5) * s - 0.5,
            width=self.width >> l,
            height=self.height >> l,
        )

    def K(self) -> jax.Array:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            axis=-2,
        )

    def project(self, xyz: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Camera-frame points (..., 3) -> pixel (..., 2), valid mask.
        Points behind the camera are flagged invalid."""
        z = xyz[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        u = self.fx * xyz[..., 0] * inv_z + self.cx
        v = self.fy * xyz[..., 1] * inv_z + self.cy
        valid = z > 1e-6
        return jnp.stack([u, v], axis=-1), valid

    def unproject(self, uv: jax.Array, idepth: jax.Array) -> jax.Array:
        """Pixel (..., 2) + inverse depth (...,) -> camera-frame point (..., 3)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        depth = 1.0 / jnp.maximum(idepth, 1e-12)
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1) * depth[..., None]

    def normalized(self, uv: jax.Array) -> jax.Array:
        """Pixel (..., 2) -> normalized image coords (..., 2)."""
        return jnp.stack(
            [(uv[..., 0] - self.cx) / self.fx, (uv[..., 1] - self.cy) / self.fy],
            axis=-1,
        )

    def in_bounds(self, uv: jax.Array, border: float = 0.0) -> jax.Array:
        u, v = uv[..., 0], uv[..., 1]
        return (
            (u >= border)
            & (u <= self.width - 1 - border)
            & (v >= border)
            & (v <= self.height - 1 - border)
        )


# ---------------------------------------------------------------------------
# Distortion models (forward = ideal -> distorted). Used only to build remap
# grids on the host at sequence-load time; NumPy is fine and keeps the device
# path free of per-pixel distortion math.
# ---------------------------------------------------------------------------


def radtan_distort(xn: np.ndarray, k1, k2, p1, p2) -> np.ndarray:
    """Radial-tangential (OpenCV) model on normalized coords (..., 2).
    Reference: RadtanUndistorter, InternalCalibration.h:145."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return np.stack([xd, yd], axis=-1)


def fov_distort(xn: np.ndarray, omega: float) -> np.ndarray:
    """FOV (Devernay-Faugeras) model, used by TUM-mono.
    Reference: FOVUndistorter, InternalCalibration.h:206."""
    x, y = xn[..., 0], xn[..., 1]
    r = np.sqrt(x * x + y * y)
    if abs(omega) < 1e-9:
        return xn.copy()
    factor = np.where(
        r < 1e-9,
        omega / (2.0 * np.tan(omega / 2.0)),
        np.arctan(2.0 * r * np.tan(omega / 2.0)) / (omega * np.maximum(r, 1e-12)),
    )
    return xn * factor[..., None]


def equidistant_distort(xn: np.ndarray, k1, k2, k3, k4) -> np.ndarray:
    """Kannala-Brandt equidistant fisheye (EuRoC-style).
    Reference: FishEye10_5_5 family, InternalCalibration.h:250."""
    x, y = xn[..., 0], xn[..., 1]
    r = np.sqrt(x * x + y * y)
    theta = np.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1 + k1 * t2 + k2 * t2**2 + k3 * t2**3 + k4 * t2**4)
    scale = np.where(r < 1e-9, 1.0, theta_d / np.maximum(r, 1e-12))
    return xn * scale[..., None]


def invert_distortion(distort_fn, xn_d: np.ndarray, iters: int = 25) -> np.ndarray:
    """Numerically invert a forward distortion model on normalized coords:
    find xn with distort_fn(xn) = xn_d by fixed-point iteration
    (xn_{k+1} = xn_k + (xn_d - distort(xn_k)) — a contraction for the mild
    distortions real lenses have). Host-side; used to synthesize raw
    (distorted) test imagery and to rectify sparse points."""
    x = np.array(xn_d, np.float64, copy=True)
    for _ in range(iters):
        x += xn_d - distort_fn(x)
    return x


@struct.dataclass
class Calibration:
    """Full per-sequence calibration: output pinhole model + optional remap
    grid from output (rectified) pixels to input (distorted) pixels, plus the
    photometric response inverse-LUT and vignette (TUM-mono).

    remap:   (H, W, 2) float32 source coords in the raw image, or None.
    gamma:   (256,) float32 inverse response LUT (irradiance per gray level),
             or None. Reference: GrayLookupTable, src/cml/image/LookupTable.h:8.
    vignette:(H_in, W_in) float32 attenuation map, or None.
    """

    pinhole: PinholeCamera
    remap: jax.Array | None = None
    gamma: jax.Array | None = None
    vignette: jax.Array | None = None

    @classmethod
    def ideal(cls, fx, fy, cx, cy, width, height) -> "Calibration":
        return cls(pinhole=PinholeCamera.make(fx, fy, cx, cy, width, height))


def build_remap(
    out_cam: PinholeCamera,
    in_K: np.ndarray,
    distort_fn,
) -> np.ndarray:
    """Precompute the (H, W, 2) rectification grid: for every output pixel,
    the distorted source pixel to sample. distort_fn maps normalized ideal
    coords -> normalized distorted coords (one of the models above).
    Reference: computeUndistortMap, InternalCalibration.h:342."""
    H, W = out_cam.height, out_cam.width
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    xn = np.stack(
        [
            (u - float(out_cam.cx)) / float(out_cam.fx),
            (v - float(out_cam.cy)) / float(out_cam.fy),
        ],
        axis=-1,
    )
    xd = distort_fn(xn)
    src_u = in_K[0, 0] * xd[..., 0] + in_K[0, 2]
    src_v = in_K[1, 1] * xd[..., 1] + in_K[1, 2]
    return np.stack([src_u, src_v], axis=-1).astype(np.float32)
