"""Batched epipolar inverse-depth search (immature-point tracing).

TPU-native replacement for the reference's DSOTracer
(reference: src/cml/optimization/dso/DSOTracer.cpp:13 traceNewCoarse —
per-point discrete epipolar-line search + GN refine, :59 activatePoints,
:496 makeNewTraces; status machine DSOTracer.h:38).

Design: the reference walks a variable-length pixel segment per point; here
every point searches a FIXED grid of `trace_steps` inverse-depth hypotheses
spanning [rho_min, rho_max] (geometric spacing). For hypothesis s the point
is warped into the observer frame and its 8-pixel pattern SSD is computed —
so the whole trace is one (P, S, 8) gather + reduction, MXU/VPU friendly with
zero data-dependent control flow. A parabolic refine over the winning
hypothesis's neighbors replaces the reference's GN polish; quality is the
best/second-best ratio outside an exclusion window (the reference's
quality check), and ambiguous/out-of-bounds points are masked, mirroring the
OOB/OUTLIER/SKIPPED statuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.residuals import pattern_uv
from libcml_tpu.ops.image import bilinear


@struct.dataclass
class TraceResult:
    idepth: jax.Array      # (P,) refined inverse depth in the HOST frame
    good: jax.Array        # (P,) bool: unambiguous, in-bounds match
    quality: jax.Array     # (P,) second-best/best SSD ratio (higher better)
    pixel_span: jax.Array  # (P,) epipolar search length in pixels


def trace_points(
    host_color: jax.Array,    # (P, 8) pattern intensities in the host frame
    uv_host: jax.Array,       # (P, 2) level-0 pixels in the host frame
    valid: jax.Array,         # (P,) candidate mask
    obs_grad: jax.Array,      # (H, W, 3) observer gradient image (level 0)
    T_oh: SE3,                # observer <- host relative pose
    ab_oh: jax.Array,         # (2,) relative affine [a, b]: I_o ~ e^a I_h + b
    cam: PinholeCamera,
    cfg: DirectConfig,
    rho_min: float | None = None,
    rho_max: float | None = None,
) -> TraceResult:
    """One batched epipolar sweep for all P candidates. Jittable."""
    S = cfg.trace_steps
    rho_lo = cfg.idepth_min if rho_min is None else rho_min
    rho_hi = cfg.idepth_max if rho_max is None else rho_max

    # geometric idepth grid (S,) shared by all points
    log_grid = jnp.linspace(jnp.log(rho_lo + 1e-6), jnp.log(rho_hi), S)
    rho_s = jnp.exp(log_grid)                                     # (S,)

    p_uv = pattern_uv(uv_host)                                    # (P, 8, 2)
    # unproject each pattern pixel at every hypothesis: (P, S, 8, 3)
    Xh = cam.unproject(p_uv[:, None, :, :], rho_s[None, :, None])
    Xo = jnp.einsum("ij,pskj->pski", T_oh.R, Xh) + T_oh.t
    uv_o, z_ok = cam.project(Xo)                                  # (P, S, 8, 2)
    in_b = cam.in_bounds(uv_o, border=2.0)
    hyp_ok = jnp.all(z_ok & in_b, axis=-1)                        # (P, S)

    I_o = bilinear(obs_grad[..., 0], uv_o)                        # (P, S, 8)
    pred = jnp.exp(ab_oh[0]) * host_color[:, None, :] + ab_oh[1]
    ssd = jnp.sum((I_o - pred) ** 2, axis=-1)                     # (P, S)
    BIG = jnp.asarray(1e12, ssd.dtype)
    ssd = jnp.where(hyp_ok, ssd, BIG)

    best = jnp.argmin(ssd, axis=1)                                # (P,)
    best_ssd = jnp.take_along_axis(ssd, best[:, None], axis=1)[:, 0]

    # second best outside a +-2-step exclusion window (quality ratio;
    # reference: quality = secondBest / best energy along the line)
    steps = jnp.arange(S)[None, :]
    excl = jnp.abs(steps - best[:, None]) <= 2
    ssd2 = jnp.where(excl, BIG, ssd)
    second_ssd = jnp.min(ssd2, axis=1)
    quality = second_ssd / jnp.maximum(best_ssd, 1e-6)

    # parabolic sub-step refinement in log-idepth
    bm = jnp.clip(best, 1, S - 2)
    f0 = jnp.take_along_axis(ssd, (bm - 1)[:, None], 1)[:, 0]
    f1 = jnp.take_along_axis(ssd, bm[:, None], 1)[:, 0]
    f2 = jnp.take_along_axis(ssd, (bm + 1)[:, None], 1)[:, 0]
    denom = f0 - 2.0 * f1 + f2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (f0 - f2) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    dlog = log_grid[1] - log_grid[0]
    log_best = log_grid[bm] + delta * dlog
    idepth = jnp.exp(log_best)

    # epipolar pixel span (observability): distance between the projections of
    # the nearest and farthest hypotheses of the CENTER pixel
    c_uv_near = uv_o[:, 0, 0, :]
    c_uv_far = uv_o[:, -1, 0, :]
    span = jnp.linalg.norm(c_uv_far - c_uv_near, axis=-1)

    n_ok = jnp.sum(hyp_ok, axis=1)
    good = (
        valid
        & (best_ssd < BIG)
        & (quality > cfg.trace_min_quality)
        & (n_ok >= 3)
        & (span > 1.5)   # enough parallax to constrain depth at all
    )
    return TraceResult(idepth=idepth, good=good, quality=quality, pixel_span=span)


# ---------------------------------------------------------------------------
# Immature-point lifecycle (the reference's DSOTracer immature machinery)
# ---------------------------------------------------------------------------


@struct.dataclass
class ImmatureArena:
    """Per-window-slot immature candidates: (F, K) layout.

    Candidates are created on a new keyframe, then re-traced against EVERY
    subsequent frame, each trace narrowing their log-inverse-depth interval
    [rho_lo, rho_hi]; only candidates whose interval has converged (and that
    matched consistently) are activated into the BA. This multi-frame
    accumulation is what breaks the one-frame feedback loop: a depth from a
    single adjacent-frame trace inherits that frame pair's full tracking
    error (gain ~1 -> compounding drift), while a depth constrained by
    5-10 frames of baseline averages it away (reference: DSOTracer.cpp:13
    traceNewCoarse interval narrowing, ImmaturePointStatus machine
    DSOTracer.h:38)."""

    uv: jax.Array       # (F, K, 2) pixel in host keyframe
    color: jax.Array    # (F, K, 8) host pattern intensities
    rho_lo: jax.Array   # (F, K) interval lower bound (inverse depth)
    rho_hi: jax.Array   # (F, K) upper bound
    n_ok: jax.Array     # (F, K) int32 successful traces
    n_fail: jax.Array   # (F, K) int32 failed traces
    valid: jax.Array    # (F, K) bool


def empty_immatures(F: int, K: int) -> ImmatureArena:
    return ImmatureArena(
        uv=jnp.zeros((F, K, 2), jnp.float32),
        color=jnp.zeros((F, K, 8), jnp.float32),
        rho_lo=jnp.full((F, K), 1e-4, jnp.float32),
        rho_hi=jnp.full((F, K), 50.0, jnp.float32),
        n_ok=jnp.zeros((F, K), jnp.int32),
        n_fail=jnp.zeros((F, K), jnp.int32),
        valid=jnp.zeros((F, K), bool),
    )


def seed_immatures(
    arena: ImmatureArena,
    slot: jax.Array,
    grad0: jax.Array,       # (H, W, 3) the new keyframe's gradient image
    uv: jax.Array,          # (K, 2) selected candidate pixels
    valid: jax.Array,       # (K,)
    rho_lo: jax.Array,      # scalar working-range bounds
    rho_hi: jax.Array,
) -> ImmatureArena:
    """Reset `slot`'s row with fresh candidates (makeNewTraces)."""
    color = bilinear(grad0[..., 0], pattern_uv(uv))          # (K, 8)
    F = arena.valid.shape[0]
    onehot = (jnp.arange(F) == slot)
    set_row = lambda old, new: jnp.where(
        onehot.reshape((-1,) + (1,) * (old.ndim - 1)), new[None], old
    )
    K = uv.shape[0]
    return ImmatureArena(
        uv=set_row(arena.uv, uv),
        color=set_row(arena.color, color),
        rho_lo=set_row(arena.rho_lo, jnp.broadcast_to(rho_lo, (K,))),
        rho_hi=set_row(arena.rho_hi, jnp.broadcast_to(rho_hi, (K,))),
        n_ok=set_row(arena.n_ok, jnp.zeros((K,), jnp.int32)),
        n_fail=set_row(arena.n_fail, jnp.zeros((K,), jnp.int32)),
        valid=set_row(arena.valid, valid),
    )


def trace_immatures_rows(
    arena: ImmatureArena,
    rows: jax.Array,        # (R,) int32 host-slot indices to trace (-1 pad)
    T_hosts: SE3,
    host_valid: jax.Array,
    obs_grad: jax.Array,
    T_obs: SE3,
    cam: PinholeCamera,
    cfg: DirectConfig,
) -> ImmatureArena:
    """Trace only the R most-recently-seeded arena rows (gather → trace →
    scatter back). Candidates are seeded at keyframes and mature (or die)
    within the next handful of frames, so rows older than the last R
    seedings carry no live work — but with static shapes their masked
    compute would still be paid. Restricting the sweep to R rows cuts the
    tracer's cost F/R-fold (round 4: the full-arena sweep was 31 ms of the
    36 ms fused frame step at VGA/dso2000 scale). Rows already dead
    (marginalized slot, -1 pad) are masked by host_valid and written back
    unchanged."""
    rows_c = jnp.maximum(rows, 0)
    row_ok = rows >= 0
    sub = jax.tree.map(lambda x: x[rows_c], arena)
    sub = sub.replace(valid=sub.valid & row_ok[:, None])
    sub_T = jax.tree.map(lambda x: x[rows_c], T_hosts)
    sub_hv = host_valid[rows_c] & row_ok
    traced = trace_immatures(sub, sub_T, sub_hv, obs_grad, T_obs, cam, cfg)
    # rows listed twice cannot happen (distinct window slots). -1 pad rows
    # scatter to an out-of-range index and are DROPPED — clamping them to
    # row 0 would collide with a genuine row 0 entry, and XLA's resolution
    # of duplicate scatter indices with conflicting payloads is
    # unspecified (ADVICE r4)
    F = jax.tree.leaves(arena)[0].shape[0]
    rows_s = jnp.where(row_ok, rows_c, F)

    def scatter(a, s):
        return a.at[rows_s].set(s, mode="drop")
    return jax.tree.map(scatter, arena, traced)


def trace_immatures(
    arena: ImmatureArena,
    T_hosts: SE3,           # (F,) batched host keyframe poses (w2c)
    host_valid: jax.Array,  # (F,) which slots hold live keyframes
    obs_grad: jax.Array,    # (H, W, 3) NEW frame gradient image
    T_obs: SE3,             # new frame pose (w2c)
    cam: PinholeCamera,
    cfg: DirectConfig,
) -> ImmatureArena:
    """One epipolar sweep of every immature candidate against a new frame,
    narrowing each candidate's inverse-depth interval (traceNewCoarse).

    Per candidate: S hypotheses geometrically spaced inside [rho_lo, rho_hi],
    pattern SSD against the new image, parabolic refine, then the interval
    shrinks to best +- 1.2 grid steps. Sub-quality or out-of-bounds traces
    count as failures; candidates failing repeatedly are dropped."""
    F, K = arena.valid.shape
    S = cfg.trace_steps

    # relative poses obs <- host_f : (F,)
    T_oh = T_obs.compose(T_hosts.inverse())

    lo = jnp.log(jnp.maximum(arena.rho_lo, 1e-6))            # (F, K)
    hi = jnp.log(jnp.maximum(arena.rho_hi, 2e-6))
    frac = jnp.linspace(0.0, 1.0, S)                         # (S,)
    log_grid = lo[..., None] + (hi - lo)[..., None] * frac   # (F, K, S)
    rho_s = jnp.exp(log_grid)

    p_uv = pattern_uv(arena.uv.reshape(F * K, 2)).reshape(F, K, 8, 2)
    # (F, K, S, 8, 3)
    Xh = cam.unproject(p_uv[:, :, None, :, :], rho_s[..., None])
    Xo = jnp.einsum("fij,fkspj->fkspi", T_oh.R, Xh) + T_oh.t[:, None, None, None, :]
    uv_o, z_ok = cam.project(Xo)
    in_b = cam.in_bounds(uv_o, border=2.0)
    hyp_ok = jnp.all(z_ok & in_b, axis=-1)                   # (F, K, S)

    I_o = bilinear(obs_grad[..., 0], uv_o)                   # (F, K, S, 8)
    ssd = jnp.sum((I_o - arena.color[:, :, None, :]) ** 2, axis=-1)
    BIG = jnp.asarray(1e12, ssd.dtype)
    ssd = jnp.where(hyp_ok, ssd, BIG)

    best = jnp.argmin(ssd, axis=-1)                          # (F, K)
    best_ssd = jnp.take_along_axis(ssd, best[..., None], -1)[..., 0]

    steps = jnp.arange(S)
    excl = jnp.abs(steps[None, None, :] - best[..., None]) <= 2
    second = jnp.min(jnp.where(excl, BIG, ssd), axis=-1)
    quality = second / jnp.maximum(best_ssd, 1e-6)

    bm = jnp.clip(best, 1, S - 2)
    f0 = jnp.take_along_axis(ssd, (bm - 1)[..., None], -1)[..., 0]
    f1 = jnp.take_along_axis(ssd, bm[..., None], -1)[..., 0]
    f2 = jnp.take_along_axis(ssd, (bm + 1)[..., None], -1)[..., 0]
    denom = f0 - 2.0 * f1 + f2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (f0 - f2) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    dlog = (hi - lo) / (S - 1)                               # (F, K)
    log_best = jnp.take_along_axis(log_grid, bm[..., None], -1)[..., 0] + delta * dlog

    # epipolar span of the interval (center pixel): observability this trace
    span = jnp.linalg.norm(uv_o[:, :, -1, 0, :] - uv_o[:, :, 0, 0, :], axis=-1)

    mean_color = jnp.mean(jnp.abs(arena.color), axis=-1)     # (F, K)
    ok = (
        arena.valid
        & host_valid[:, None]
        & (best_ssd < BIG)
        & (best_ssd < (8.0 * 12.0**2))          # absolute match sanity
        & (quality > cfg.trace_min_quality)
    )
    informative = ok & (span > 1.0)

    # narrow to best +- 1.2 steps when informative; on failure keep interval
    new_lo = jnp.exp(log_best - 1.2 * dlog)
    new_hi = jnp.exp(log_best + 1.2 * dlog)
    rho_lo = jnp.where(informative, jnp.maximum(new_lo, 1e-5), arena.rho_lo)
    rho_hi = jnp.where(informative, new_hi, arena.rho_hi)

    n_ok = arena.n_ok + informative.astype(jnp.int32)
    n_fail = jnp.where(ok, arena.n_fail, arena.n_fail + arena.valid)
    valid = arena.valid & (n_fail < 4)

    del mean_color
    return arena.replace(
        rho_lo=rho_lo, rho_hi=rho_hi, n_ok=n_ok, n_fail=n_fail, valid=valid
    )


def mature_mask(arena: ImmatureArena, cfg: DirectConfig):
    """(F, K) bool: candidates ready for activation + their idepth estimate.

    Mature = traced successfully >= activate_min_traces times and the
    interval has converged to a relative width below activate_max_relwidth
    (reference: activatePoints' canActivate conditions)."""
    mid = jnp.sqrt(arena.rho_lo * arena.rho_hi)              # geometric mean
    relwidth = (arena.rho_hi - arena.rho_lo) / jnp.maximum(mid, 1e-6)
    ready = (
        arena.valid
        & (arena.n_ok >= cfg.activate_min_traces)
        & (relwidth < cfg.activate_max_relwidth)
    )
    return ready, mid
