"""Gradient-based pixel selection for direct points.

TPU-native replacement for the reference's PixelSelector
(reference: src/cml/features/corner/PixelSelector.h:26, makeMaps
PixelSelector.cpp:120 — gradient-histogram regional thresholds, 3-scale
potential blocks, recursive density adaptation).

Design: instead of the reference's recursive density adaptation and random
dithering, selection is one fixed-shape pass: (1) a regional threshold from
per-32x32-block gradient quantiles (smoothed over the block grid), (2) a
per-cell argmax over small `pot x pot` cells, (3) a global top-k to fill the
fixed point budget. Output shapes are static (budget + validity mask), which
is what every downstream consumer needs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from libcml_tpu.ops.image import gradient_squared_norm

_REGION = 32  # histogram-threshold block size (matches reference regions)


def _regional_threshold(g2: jax.Array, quantile: float, add: float) -> jax.Array:
    """Per-region gradient-magnitude threshold, smoothed 3x3 over regions.
    Returns a per-pixel threshold map (H, W) (on squared magnitudes)."""
    H, W = g2.shape
    Hr, Wr = H // _REGION, W // _REGION
    g = jnp.sqrt(g2[: Hr * _REGION, : Wr * _REGION])
    blocks = g.reshape(Hr, _REGION, Wr, _REGION).transpose(0, 2, 1, 3).reshape(Hr, Wr, -1)
    q = jnp.quantile(blocks, quantile, axis=-1)  # (Hr, Wr) median-ish gradient
    th = q + add
    # 3x3 box smoothing over the region grid (reference smooths thresholds)
    thp = jnp.pad(th, 1, mode="edge")
    sm = sum(
        thp[di : di + Hr, dj : dj + Wr] for di in range(3) for dj in range(3)
    ) / 9.0
    th2 = sm**2
    # broadcast back to pixels (pad edges with the nearest region)
    per_pix = jnp.repeat(jnp.repeat(th2, _REGION, axis=0), _REGION, axis=1)
    out = jnp.full((H, W), jnp.inf, dtype=g2.dtype)
    out = out.at[: Hr * _REGION, : Wr * _REGION].set(per_pix)
    # pixels outside full regions: reuse row/col edge thresholds
    out = jnp.where(jnp.isinf(out), jnp.max(th2), out)
    return out


def select_points(
    grad0: jax.Array,
    n_points: int,
    quantile: float = 0.5,
    add_threshold: float = 7.0,
    border: int = 4,
):
    """Select up to n_points high-gradient, spatially spread pixels.

    grad0: (H, W, 3) gradient image at level 0.
    Returns (uv (n, 2) float32, valid (n,) bool, score (n,) float32)."""
    H, W = grad0.shape[0], grad0.shape[1]
    g2 = gradient_squared_norm(grad0)
    th = _regional_threshold(g2, quantile, add_threshold)

    # mask borders and sub-threshold pixels
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = (
        (g2 > th)
        & (xx >= border) & (xx < W - border)
        & (yy >= border) & (yy < H - border)
    )
    score = jnp.where(ok, g2, 0.0)

    # cell size: ~2x budget worth of cells so top-k has slack
    pot = max(2, int(math.sqrt(H * W / (2.0 * n_points))))
    Hc, Wc = H // pot, W // pot
    cells = (
        score[: Hc * pot, : Wc * pot]
        .reshape(Hc, pot, Wc, pot)
        .transpose(0, 2, 1, 3)
        .reshape(Hc * Wc, pot * pot)
    )
    cell_best = jnp.max(cells, axis=-1)          # (C,)
    cell_arg = jnp.argmax(cells, axis=-1)        # (C,) offset within cell

    k = min(n_points, Hc * Wc)
    top_score, top_cell = jax.lax.top_k(cell_best, k)
    cy = top_cell // Wc
    cx = top_cell % Wc
    off = cell_arg[top_cell]
    oy = off // pot
    ox = off % pot
    u = (cx * pot + ox).astype(jnp.float32)
    v = (cy * pot + oy).astype(jnp.float32)
    uv = jnp.stack([u, v], axis=-1)
    valid = top_score > 0.0
    if k < n_points:  # pad to the static budget
        pad = n_points - k
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), jnp.float32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        top_score = jnp.concatenate([top_score, jnp.zeros((pad,), top_score.dtype)])
    return uv, valid, top_score
