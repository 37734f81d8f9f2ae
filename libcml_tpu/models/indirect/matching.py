"""Feature matcher suite: batched Hamming matching with ratio / orientation /
window / projection / epipolar constraints, plus a vector-field-consensus
outlier filter.

TPU-native replacement for the reference's matcher stack
(reference: src/cml/features/cornerTracker/BoWTracker.cpp:112 trackByBoW,
:291 trackForInitialization, :442 trackForTriangulation, :624
trackByProjection; CornerMatcher.h:237,295 CornerMatchingGraph score matrix +
resolveByRatio; RadiusTracker.h:11; ReprojectionTracker.h:10;
BruteforceTracker.h; LSHTracker.h:17; VFC.h:55,124).

TPU-first design: the reference prunes candidate pairs with BoW feature-vector
nodes, LSH buckets or per-frame spatial grids because an O(N*M) CPU sweep is
too slow; on TPU the FULL (N, M) Hamming matrix is a single fused
popcount+reduce over (N, M, 8) uint32 words — cheap, dense, and feeds every
constrained variant below by masking the same matrix (constraint mask ==
"bucket"). So BoW-node pruning, LSH, radius grids and the bipartite score
graph all collapse into one primitive: masked_match().
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.indirect.orb import hamming_matrix

_HAMMING_MAX = 256
# reference thresholds (BoWTracker.h: TH_LOW=50, TH_HIGH=100, ratio 0.6-0.9)
TH_LOW = 50
TH_HIGH = 100


@struct.dataclass
class MatchResult:
    """Fixed-shape matching: one candidate per query row (masked)."""

    idx: jax.Array        # (N,) int32 index into the train set (argmin row)
    dist: jax.Array       # (N,) int32 best Hamming distance
    valid: jax.Array      # (N,) bool passed all checks
    num: jax.Array        # () int32 number of valid matches


def _use_pallas_match() -> bool:
    """Route the matcher through the fused Pallas kernel on TPU backends.

    Decided at TRACE time (the backend cannot change mid-process); the
    interpreted fallback keeps the CPU test platform on the identical code
    path only in the dedicated parity tests — the plain XLA formulation is
    faster under interpretation."""
    import os

    if os.environ.get("LIBCML_PALLAS_MATCH", "1") != "1":
        return False
    return jax.default_backend() not in ("cpu",)


def _resolve_from_desc(
    desc_q: jax.Array,
    desc_t: jax.Array,
    row_mask: jax.Array,
    col_mask: jax.Array,
    pair_mask: jax.Array | None,
    max_dist: int,
    ratio: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Masked-Hamming match resolution from raw descriptors: per-row best +
    second best with Lowe ratio, then mutual-best cross-check (the
    reference's CornerMatchingGraph::resolveByRatio semantics,
    CornerMatcher.h:295). On TPU the whole resolution runs as ONE fused
    Pallas sweep (ops/pallas_match.py) — the distance matrix never
    materializes in HBM; elsewhere the XLA formulation below."""
    if _use_pallas_match():
        from libcml_tpu.ops.pallas_match import hamming_resolve_pallas

        d1, d2, best, col_best_row = hamming_resolve_pallas(
            desc_q, row_mask, desc_t, col_mask, pair_mask)
        ok = (d1 <= max_dist) & (
            d1.astype(jnp.float32) < ratio * d2.astype(jnp.float32)
        )
        ok = ok & (col_best_row[best] == jnp.arange(desc_q.shape[0]))
        return best, d1, ok

    D = hamming_matrix(desc_q, desc_t)
    return _resolve(D, row_mask, col_mask, pair_mask, max_dist, ratio)


def _resolve(
    D: jax.Array,
    row_mask: jax.Array,
    col_mask: jax.Array,
    pair_mask: jax.Array | None,
    max_dist: int,
    ratio: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """XLA-path resolution over a materialized distance matrix (see
    _resolve_from_desc)."""
    big = jnp.asarray(_HAMMING_MAX + 1, D.dtype)
    mask = row_mask[:, None] & col_mask[None, :]
    if pair_mask is not None:
        mask = mask & pair_mask
    Dm = jnp.where(mask, D, big)

    best = jnp.argmin(Dm, axis=1)                       # (N,)
    d1 = jnp.take_along_axis(Dm, best[:, None], axis=1)[:, 0]
    D2 = jnp.where(
        jnp.arange(Dm.shape[1])[None, :] == best[:, None], big, Dm
    )
    d2 = jnp.min(D2, axis=1)

    ok = (d1 <= max_dist) & (
        d1.astype(jnp.float32) < ratio * d2.astype(jnp.float32)
    )
    # mutual cross-check: the chosen column's best row must be this row
    col_best_row = jnp.argmin(Dm, axis=0)               # (M,)
    ok = ok & (col_best_row[best] == jnp.arange(Dm.shape[0]))
    return best, d1, ok


def orientation_check(
    angle_q: jax.Array,
    angle_t: jax.Array,
    idx: jax.Array,
    valid: jax.Array,
    n_bins: int = 30,
    keep_bins: int = 3,
) -> jax.Array:
    """Rotation-consistency histogram check (reference: BoWTracker's
    CheckOrientation — keep only matches whose angle delta falls in the 3
    most-populated of 30 bins). Returns the updated validity mask."""
    dtheta = angle_q - angle_t[idx]
    dtheta = jnp.mod(dtheta, 2.0 * jnp.pi)
    bins = jnp.clip(
        (dtheta * (n_bins / (2.0 * jnp.pi))).astype(jnp.int32), 0, n_bins - 1
    )
    hist = jnp.zeros((n_bins,), jnp.int32).at[bins].add(valid.astype(jnp.int32))
    order = jnp.argsort(-hist)
    top = order[:keep_bins]
    # drop top bins whose count is < 0.1x the best (the reference's rule)
    strong = hist[top] >= jnp.maximum(1, hist[top[0]] // 10)
    in_top = jnp.any(
        (bins[:, None] == top[None, :]) & strong[None, :], axis=1
    )
    return valid & in_top


def match_descriptors(
    desc_q: jax.Array,
    valid_q: jax.Array,
    desc_t: jax.Array,
    valid_t: jax.Array,
    max_dist: int = TH_LOW,
    ratio: float = 0.75,
) -> MatchResult:
    """Unconstrained descriptor matching — the brute-force / LSH / BoW-node
    paths of the reference all reduce to this on TPU (full matrix, no
    pruning needed)."""
    idx, dist, ok = _resolve_from_desc(desc_q, desc_t, valid_q, valid_t,
                                       None, max_dist, ratio)
    return MatchResult(idx=idx, dist=dist, valid=ok, num=jnp.sum(ok))


def match_window(
    desc_q, uv_q, valid_q,
    desc_t, uv_t, valid_t,
    radius: float = 100.0,
    max_dist: int = TH_LOW,
    ratio: float = 0.9,
) -> MatchResult:
    """Spatial-window matching for initialization (reference:
    trackForInitialization, BoWTracker.cpp:291 — candidates within a pixel
    window of the query corner)."""
    d2 = jnp.sum(
        (uv_q[:, None, :] - uv_t[None, :, :]) ** 2, axis=-1
    )
    pair = d2 <= radius * radius
    idx, dist, ok = _resolve_from_desc(desc_q, desc_t, valid_q, valid_t,
                                       pair, max_dist, ratio)
    return MatchResult(idx=idx, dist=dist, valid=ok, num=jnp.sum(ok))


def match_projection(
    Xw: jax.Array,
    desc_p: jax.Array,
    valid_p: jax.Array,
    level_p: jax.Array,
    T: SE3,
    cam: PinholeCamera,
    desc_f: jax.Array,
    uv_f: jax.Array,
    level_f: jax.Array,
    valid_f: jax.Array,
    radius: float = 15.0,
    max_dist: int = TH_HIGH,
    ratio: float = 0.9,
    max_depth_ratio: float = 0.0,
) -> tuple[MatchResult, jax.Array]:
    """Project map points into the frame at pose T and match to corners in a
    radius, preferring compatible pyramid levels (reference: trackByProjection
    BoWTracker.cpp:624 / ReprojectionTracker.h:10 — project + radius search
    scaled by the predicted octave). Queries are POINTS, train is the frame's
    corner set. Also returns the projected pixel (P, 2) for reuse."""
    Xc = jnp.einsum("ij,nj->ni", T.R, Xw) + T.t
    uv_p, z_ok = cam.project(Xc)
    vis = valid_p & z_ok & cam.in_bounds(uv_p, border=2.0)

    # radius grows with the point's detection level (coarser -> wider)
    r = radius * (1.5 ** level_p.astype(jnp.float32))
    d2 = jnp.sum((uv_p[:, None, :] - uv_f[None, :, :]) ** 2, axis=-1)
    pair = d2 <= (r * r)[:, None]
    # level compatibility: corner level within +-1 of the point's level
    pair = pair & (
        jnp.abs(level_p[:, None] - level_f[None, :]) <= 1
    )
    idx, dist, ok = _resolve_from_desc(desc_p, desc_f, vis, valid_f, pair,
                                       max_dist, ratio)
    return MatchResult(idx=idx, dist=dist, valid=ok, num=jnp.sum(ok)), uv_p


def match_epipolar(
    desc_q, uv_q, valid_q,
    desc_t, uv_t, valid_t,
    F01: jax.Array,
    epi_tol: float = 3.84,
    max_dist: int = TH_LOW,
    ratio: float = 0.8,
) -> MatchResult:
    """Epipolar-constrained matching for triangulation (reference:
    trackForTriangulation, BoWTracker.cpp:442 — candidate must lie near the
    epipolar line of the query in the other view). F01 maps query-view points
    to lines in the train view: l = F01 @ [uv_q, 1]."""
    xq = jnp.concatenate([uv_q, jnp.ones_like(uv_q[:, :1])], axis=-1)
    lines = xq @ F01.T                                   # (N, 3)
    xt = jnp.concatenate([uv_t, jnp.ones_like(uv_t[:, :1])], axis=-1)
    num = lines @ xt.T                                   # (N, M)
    den = lines[:, 0] ** 2 + lines[:, 1] ** 2
    d2 = num**2 / jnp.maximum(den, 1e-9)[:, None]
    pair = d2 <= epi_tol
    idx, dist, ok = _resolve_from_desc(desc_q, desc_t, valid_q, valid_t,
                                       pair, max_dist, ratio)
    return MatchResult(idx=idx, dist=dist, valid=ok, num=jnp.sum(ok))


# ---------------------------------------------------------------------------
# Vector Field Consensus outlier filter
# ---------------------------------------------------------------------------


def vfc_filter(
    uv_q: jax.Array,
    uv_t: jax.Array,
    valid: jax.Array,
    iters: int = 30,
    gamma_init: float = 0.9,
    beta: float = 1.0,
    lam: float = 3.0,
    tau: float = 0.75,
    n_ctrl: int = 16,
) -> jax.Array:
    """Vector Field Consensus (reference: VFC.h:55, process VFC.h:124): EM
    over a Gaussian-RBF vector field fit to the match displacement field;
    matches whose displacement disagrees with the smooth field are outliers.

    TPU-first: the reference solves the full N x N kernel system; here the
    field uses a fixed grid of n_ctrl^... control points chosen from the
    matches (subset-of-regressors), so the linear solve is a static
    (C, C) system inside a lax.scan — same model, compile-friendly shapes.
    Returns the refined validity mask."""
    N = uv_q.shape[0]
    w0 = valid.astype(jnp.float32)
    nv = jnp.maximum(jnp.sum(w0), 1.0)

    # normalize x and y to zero-mean unit-std over the valid set (the
    # reference's VFC does exactly this before the kernel, VFC.h:124)
    def norm(a):
        mu = jnp.sum(a * w0[:, None], axis=0) / nv
        sd = jnp.sqrt(
            jnp.sum(jnp.sum((a - mu) ** 2, -1) * w0) / nv
        )
        return (a - mu) / jnp.maximum(sd, 1e-6)

    x = norm(uv_q.astype(jnp.float32))
    yn = norm(uv_t.astype(jnp.float32)) - x              # displacement field

    # control points: strided subset of the valid matches (deterministic)
    C = min(n_ctrl, N)
    order = jnp.argsort(~valid)                          # valid first, stable
    ctrl = x[order[:: max(1, N // C)][:C]]

    def kmat(a, b):
        d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
        return jnp.exp(-beta * d2)

    K_xc = kmat(x, ctrl)                                 # (N, C)
    K_cc = kmat(ctrl, ctrl)                              # (C, C)

    def em_step(carry, _):
        p, gamma, sigma2 = carry
        # M-step: weighted ridge fit of coefficients A (C, 2)
        W = p * w0
        # regularization floors: sigma2-proportional smoothing collapses to
        # zero on an interpolating fit, and the wide-RBF Gram matrices are
        # near-singular in f32 — both floors are required for stable EM
        lhs = K_xc.T @ (W[:, None] * K_xc) \
            + lam * jnp.maximum(sigma2, 1e-2) * K_cc + 1e-4 * jnp.eye(C)
        rhs = K_xc.T @ (W[:, None] * yn)
        A = jnp.linalg.solve(lhs, rhs)
        pred = K_xc @ A                                  # (N, 2)
        r2 = jnp.sum((yn - pred) ** 2, axis=-1)
        sw = jnp.maximum(jnp.sum(W), 1.0)
        sigma2 = jnp.maximum(jnp.sum(W * r2) / (2.0 * sw), 1e-3)
        # E-step: posterior of being an inlier (uniform outlier component
        # over the ~unit-variance normalized displacement domain)
        a_out = 10.0
        num = gamma * jnp.exp(-r2 / (2.0 * sigma2)) / (2.0 * jnp.pi * sigma2)
        p_new = num / (num + (1.0 - gamma) / a_out + 1e-30)
        gamma = jnp.clip(jnp.sum(p_new * w0) / sw, 0.05, 0.95)
        return (p_new, gamma, sigma2), None

    init = (w0, jnp.asarray(gamma_init), jnp.asarray(0.05))
    (p, _, _), _ = jax.lax.scan(em_step, init, None, length=iters)
    return valid & (p > tau)
