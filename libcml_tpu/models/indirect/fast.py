"""FAST corner detection as a dense vectorized stencil.

TPU-native replacement for the reference's FAST detector
(reference: src/cml/features/corner/FAST.h:17, FAST.cpp — a 6k-LoC
machine-generated unrolled SIMD decision tree). The decision tree exists only
to early-out on scalar CPUs; on TPU the whole image is tested at once: the 16
Bresenham-circle samples become 16 shifted copies of the image (jnp.roll),
the "9 contiguous brighter/darker" predicate becomes a circular sliding-window
sum over the 16-lane axis, and non-max suppression is a 3x3 max-pool compare.
One fused XLA program, no control flow, no decision tree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3, clockwise from 12 o'clock (dy, dx)
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


def _circle_stack(img: jax.Array) -> jax.Array:
    """(H, W) -> (H, W, 16) circle samples via rolls (borders masked later)."""
    return jnp.stack(
        [jnp.roll(img, (-dy, -dx), axis=(0, 1)) for dy, dx in _CIRCLE], axis=-1
    )


def _arc_reaches(flags: jax.Array, arc: int) -> jax.Array:
    """flags (H, W, 16) bool -> (H, W) bool: any `arc` contiguous true lanes
    on the circular 16-lane axis."""
    f = jnp.concatenate([flags, flags[..., : arc - 1]], axis=-1).astype(jnp.int32)
    c = jnp.cumsum(f, axis=-1)
    zero = jnp.zeros(c.shape[:-1] + (1,), c.dtype)
    c = jnp.concatenate([zero, c], axis=-1)
    win = c[..., arc:] - c[..., :-arc]        # (H, W, 16) window sums
    return jnp.any(win == arc, axis=-1)


@functools.partial(jax.jit, static_argnames=("arc",))
def fast_score_map(img: jax.Array, threshold: float, arc: int = 9) -> jax.Array:
    """Dense FAST-N response map (H, W) float32; 0 where not a corner.

    Score = max over (brighter, darker) of the sum of |I_circle - I_center|
    minus threshold over the qualifying lanes (the standard FAST score used
    for NMS)."""
    circ = _circle_stack(img)
    center = img[..., None]
    t = jnp.asarray(threshold, img.dtype)

    brighter = circ > center + t
    darker = circ < center - t
    is_b = _arc_reaches(brighter, arc)
    is_d = _arc_reaches(darker, arc)

    sb = jnp.sum(jnp.where(brighter, circ - center - t, 0.0), axis=-1)
    sd = jnp.sum(jnp.where(darker, center - circ - t, 0.0), axis=-1)
    score = jnp.maximum(jnp.where(is_b, sb, 0.0), jnp.where(is_d, sd, 0.0))

    # kill the 3-pixel border (rolled samples wrap around)
    H, W = img.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inside = (yy >= 3) & (yy < H - 3) & (xx >= 3) & (xx < W - 3)
    return jnp.where(inside, score, 0.0)


def _maxpool3(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )


@functools.partial(jax.jit, static_argnames=("max_corners", "arc"))
def fast_detect(
    img: jax.Array,
    threshold: float,
    max_corners: int,
    arc: int = 9,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Detect up to max_corners FAST corners with 3x3 NMS + global top-k.

    Returns (uv (K, 2) float32, score (K,), valid (K,) bool) — static shapes
    (the fixed-budget contract every downstream consumer uses)."""
    score = fast_score_map(img, threshold, arc)
    is_max = (score >= _maxpool3(score)) & (score > 0.0)
    flat = jnp.where(is_max, score, 0.0).reshape(-1)
    top, idx = jax.lax.top_k(flat, max_corners)
    W = img.shape[1]
    uv = jnp.stack(
        [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], axis=-1
    )
    return uv, top, top > 0.0
