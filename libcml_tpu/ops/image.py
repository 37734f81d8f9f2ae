"""Image operations: bilinear sampling, pyramids, gradients, rectification.

TPU-native replacement for the reference's Array2D image layer
(reference: src/cml/image/Array2D.h:22-444 — interpolate:300, gradientImage:369,
reduceByTwo/resize:444) and the photometric correction path
(src/cml/image/LookupTable.h:8, TUM vignette handling in TUMCapture.cpp).

Everything is pure jnp on (H, W) float32 arrays (or (H, W, C)); samplers are
gather-based and batched over arbitrary point dims, so a whole point arena is
interpolated in one op. Pyramids are tuples of per-level arrays (a pytree —
shapes differ per level, so no single stacked array).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear sample img at uv.

    img: (H, W) or (H, W, C); uv: (..., 2) in pixel coords (x, y).
    Out-of-bounds coordinates are clamped (callers mask with `in_bounds`).
    Returns (...,) or (..., C).
    """
    H, W = img.shape[0], img.shape[1]
    x = uv[..., 0]
    y = uv[..., 1]
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    dx = jnp.clip(x - x0, 0.0, 1.0)
    dy = jnp.clip(y - y0, 0.0, 1.0)
    if img.ndim == 3:
        dx = dx[..., None]
        dy = dy[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    top = v00 * (1.0 - dx) + v01 * dx
    bot = v10 * (1.0 - dx) + v11 * dx
    return top * (1.0 - dy) + bot * dy


def gradient_image(img: jax.Array) -> jax.Array:
    """(H, W) -> (H, W, 3) of [value, dI/dx, dI/dy] with central differences,
    one-sided at borders (reference: Array2D::gradientImage, Array2D.h:369)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    # one-sided at borders
    gx = gx.at[:, 0].set(img[:, 1] - img[:, 0])
    gx = gx.at[:, -1].set(img[:, -1] - img[:, -2])
    gy = gy.at[0, :].set(img[1, :] - img[0, :])
    gy = gy.at[-1, :].set(img[-1, :] - img[-2, :])
    return jnp.stack([img, gx, gy], axis=-1)


def reduce_by_two(img: jax.Array) -> jax.Array:
    """2x2-mean downsample, cropping odd trailing row/col
    (reference: Array2D::reduceByTwo)."""
    H, W = img.shape[0] & ~1, img.shape[1] & ~1
    x = img[:H, :W]
    return x.reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))


def build_pyramid(img: jax.Array, num_levels: int) -> tuple[jax.Array, ...]:
    """Gray image -> tuple of num_levels images, level 0 = full resolution."""
    levels = [img]
    for _ in range(num_levels - 1):
        levels.append(reduce_by_two(levels[-1]))
    return tuple(levels)


def build_gradient_pyramid(img: jax.Array, num_levels: int) -> tuple[jax.Array, ...]:
    """Gray image -> tuple of (H_l, W_l, 3) [value, gx, gy] arrays."""
    return tuple(gradient_image(l) for l in build_pyramid(img, num_levels))


def remap_image(raw: jax.Array, remap: jax.Array) -> jax.Array:
    """Rectify: sample `raw` at the precomputed source grid `remap` (H, W, 2).
    Device-side replacement for the reference's undistort-map application
    (InternalCalibration.h:342)."""
    return bilinear(raw, remap)


def apply_photometric(
    raw: jax.Array,
    gamma: jax.Array | None = None,
    vignette: jax.Array | None = None,
) -> jax.Array:
    """Invert camera response and vignette to get irradiance-linear intensity
    (TUM-mono photometric calibration; reference: GrayLookupTable +
    TUMCapture.cpp:19-131 vignette divide)."""
    out = raw
    if gamma is not None:
        idx = jnp.clip(out, 0.0, 255.0)
        i0 = jnp.floor(idx).astype(jnp.int32)
        frac = idx - i0
        i0 = jnp.clip(i0, 0, 254)
        out = gamma[i0] * (1.0 - frac) + gamma[i0 + 1] * frac
    if vignette is not None:
        out = out / jnp.maximum(vignette, 1e-3)
    return out


def gradient_squared_norm(grad: jax.Array) -> jax.Array:
    """(H, W, 3) gradient image -> (H, W) squared gradient magnitude."""
    return grad[..., 1] ** 2 + grad[..., 2] ** 2
