"""ORB features: oriented multi-scale FAST + steered binary descriptors.

TPU-native replacement for the reference's ORB extractor
(reference: src/cml/features/corner/ORB.h:21, ORB.cpp:97 compute — per-level
FAST with adaptive threshold, octree spatial distribution ORB.cpp:212,
IC-angle orientation, steered-BRIEF ORB.cpp:572 with the pattern table in
ORBPattern.cpp).

TPU-first differences:
  - Spatial distribution: the reference's recursive octree becomes per-cell
    top-k on a fixed grid (same goal — spread corners — zero recursion).
  - Orientation (intensity-centroid angle) is computed for ALL corners at
    once: the circular-patch moment sums are batched bilinear gathers.
  - The descriptor pattern is OUR OWN deterministic 256-pair layout (seeded
    Gaussian pairs, sigma = patch/5, the BRIEF recipe from Calonder et al.) —
    generated, not copied from the reference's table. Pairs are rotated by
    the keypoint angle and sampled in one (K, 256, 2) gather; bits pack into
    (K, 8) uint32 words for popcount matching.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from libcml_tpu.models.indirect.fast import fast_detect, fast_score_map, _maxpool3
from libcml_tpu.ops.image import bilinear

_PATCH = 31
_HALF = _PATCH // 2


@functools.lru_cache(maxsize=1)
def brief_pattern() -> np.ndarray:
    """(256, 2, 2) float32: 256 (p, q) test-point pairs, Gaussian-distributed
    within the 31x31 patch (generated once, deterministic seed)."""
    rng = np.random.default_rng(0x0B5EC0DE)
    sigma = _PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(256, 2, 2))
    return np.clip(pts, -_HALF + 1, _HALF - 1).astype(np.float32)


@struct.dataclass
class OrbFeatures:
    """Fixed-budget ORB feature set for one image."""

    uv: jax.Array       # (K, 2) level-0 pixel coords
    level: jax.Array    # (K,) int32 pyramid level
    angle: jax.Array    # (K,) radians
    score: jax.Array    # (K,) FAST response
    desc: jax.Array     # (K, 8) uint32 packed 256-bit descriptor
    valid: jax.Array    # (K,) bool


def ic_angle(img: jax.Array, uv: jax.Array) -> jax.Array:
    """Intensity-centroid orientation for corners uv (K, 2) on one level.
    Batched circular-patch moments m01/m10 (reference: IC_Angle in ORB.cpp)."""
    r = _HALF
    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    mask = (dx**2 + dy**2 <= r**2).astype(np.float32)
    offs = jnp.asarray(
        np.stack([dx.ravel(), dy.ravel()], -1), jnp.float32
    )                                                   # (M, 2)
    w = jnp.asarray(mask.ravel())                       # (M,)
    pts = uv[:, None, :] + offs[None, :, :]             # (K, M, 2)
    vals = bilinear(img, pts) * w                       # (K, M)
    m10 = jnp.sum(vals * offs[None, :, 0], axis=1)
    m01 = jnp.sum(vals * offs[None, :, 1], axis=1)
    return jnp.arctan2(m01, m10)


def brief_descriptor(img: jax.Array, uv: jax.Array, angle: jax.Array) -> jax.Array:
    """Steered BRIEF: rotate the pattern by angle, sample, compare, pack.
    Returns (K, 8) uint32."""
    pat = jnp.asarray(brief_pattern())                  # (256, 2, 2)
    ca, sa = jnp.cos(angle), jnp.sin(angle)             # (K,)
    R = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )                                                   # (K, 2, 2)
    rot = jnp.einsum("kij,ntj->knti", R, pat)           # (K, 256, 2, 2)
    pts = uv[:, None, None, :] + rot                    # (K, 256, 2, 2)
    vals = bilinear(img, pts)                           # (K, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)   # (K, 256)
    words = bits.reshape(-1, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1)   # (K, 8)


def _grid_topk(score_map: jax.Array, cell: int, per_cell: int):
    """Per-cell top-k corner spread (replaces the reference's octree
    distribution, ORB.cpp:212) — fixed shapes, no recursion."""
    H, W = score_map.shape
    Hc, Wc = H // cell, W // cell
    cells = (
        score_map[: Hc * cell, : Wc * cell]
        .reshape(Hc, cell, Wc, cell)
        .transpose(0, 2, 1, 3)
        .reshape(Hc * Wc, cell * cell)
    )
    top, arg = jax.lax.top_k(cells, per_cell)           # (C, per_cell)
    cy = jnp.arange(Hc * Wc) // Wc
    cx = jnp.arange(Hc * Wc) % Wc
    oy = arg // cell
    ox = arg % cell
    u = (cx[:, None] * cell + ox).astype(jnp.float32)
    v = (cy[:, None] * cell + oy).astype(jnp.float32)
    uv = jnp.stack([u, v], -1).reshape(-1, 2)
    return uv, top.reshape(-1)


@functools.partial(jax.jit, static_argnames=("budget", "cell", "per_cell"))
def _extract_level(
    img: jax.Array, threshold: float, budget: int, cell: int, per_cell: int
):
    score = fast_score_map(img, threshold)
    nms = jnp.where((score >= _maxpool3(score)) & (score > 0), score, 0.0)
    uv, sc = _grid_topk(nms, cell, per_cell)
    # small pyramid levels can yield fewer candidates than the budget: take
    # what exists, pad the rest as invalid slots
    k = min(budget, sc.shape[0])
    top, idx = jax.lax.top_k(sc, k)
    uv = uv[idx]
    if k < budget:
        pad = budget - k
        uv = jnp.concatenate([uv, jnp.zeros((pad, 2), uv.dtype)])
        top = jnp.concatenate([top, jnp.zeros((pad,), top.dtype)])
    ok = top > 0.0
    ang = ic_angle(img, uv)
    desc = brief_descriptor(img, uv, ang)
    return uv, top, ok, ang, desc


def extract_orb(
    pyramid: tuple[jax.Array, ...],
    budget_per_level: int = 512,
    threshold: float = 12.0,
    cell: int = 16,
    per_cell: int = 4,
) -> OrbFeatures:
    """Extract ORB features on every pyramid level; coords are reported at
    level 0 (scaled), levels recorded for scale-aware matching."""
    uvs, levels, angles, scores, descs, valids = [], [], [], [], [], []
    for l, img in enumerate(pyramid):
        uv, sc, ok, ang, desc = _extract_level(
            img, threshold, budget_per_level, cell, per_cell
        )
        scale = float(2**l)
        uvs.append((uv + 0.5) * scale - 0.5)
        levels.append(jnp.full((budget_per_level,), l, jnp.int32))
        angles.append(ang)
        scores.append(sc)
        descs.append(desc)
        valids.append(ok)
    return OrbFeatures(
        uv=jnp.concatenate(uvs),
        level=jnp.concatenate(levels),
        angle=jnp.concatenate(angles),
        score=jnp.concatenate(scores),
        desc=jnp.concatenate(descs),
        valid=jnp.concatenate(valids),
    )


# ---------------------------------------------------------------------------
# Hamming matching
# ---------------------------------------------------------------------------


def popcount32(x: jax.Array) -> jax.Array:
    """Vectorized popcount on uint32 (SWAR bit trick — no scalar loops)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_matrix(da: jax.Array, db: jax.Array) -> jax.Array:
    """(N, 8) x (M, 8) uint32 -> (N, M) int32 Hamming distances.
    Replaces the reference's per-pair popcnt loops (Features.h:208) with one
    batched XOR + SWAR reduction."""
    x = jnp.bitwise_xor(da[:, None, :], db[None, :, :])     # (N, M, 8)
    return jnp.sum(popcount32(x), axis=-1)


def match_ratio(
    da: jax.Array, db: jax.Array,
    valid_a: jax.Array, valid_b: jax.Array,
    max_dist: int = 50, ratio: float = 0.75, mutual: bool = True,
):
    """Ratio-tested (optionally mutual) nearest-neighbour Hamming matching
    (replaces BoWTracker ratio+orientation pruning for the core match path,
    reference: BoWTracker.cpp:112).

    Returns (idx_b (N,) int32 match for each a, good (N,) bool)."""
    BIG = 10_000
    d = hamming_matrix(da, db)
    d = jnp.where(valid_b[None, :], d, BIG)
    d = jnp.where(valid_a[:, None], d, BIG)

    neg = -d
    top2, idx2 = jax.lax.top_k(neg, 2)                      # best/second best
    best = -top2[:, 0]
    second = -top2[:, 1]
    idx_b = idx2[:, 0]
    good = (best <= max_dist) & (best <= ratio * second) & valid_a
    if mutual:
        back = jnp.argmin(d, axis=0)                        # (M,)
        good = good & (back[idx_b] == jnp.arange(d.shape[0]))
    return idx_b, good
