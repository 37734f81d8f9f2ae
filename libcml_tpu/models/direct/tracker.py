"""Direct frame-to-keyframe tracker: coarse-to-fine LM over SE3 + affine.

TPU-native replacement for the reference's DSOTracker
(reference: src/cml/optimization/dso/DSOTracker.cpp:15 optimize,
:421-470 SSE 8x8 Hessian accumulation, :93-100 LM damping + ldlt solve,
DSOTracker.h:200-230 Residual output with covariance/flow/saturation stats).

Design: the reference loops points with 4-wide SIMD; here each LM iteration
is ONE batched residual sweep over the whole point arena (gathers + einsum
reduction to the 8x8 normal equations) per pyramid level, inside lax.scan —
a single fused XLA program per level with zero host round-trips. The
reference's semi-dense "coarse depth map" (makeCoarseDepthL0,
DSOTracker.cpp:494) is replaced by tracking directly against the reference
keyframe's point set at every level, which keeps shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.residuals import (
    PATTERN_CENTER,
    evaluate_residuals,
    gauss_newton_system,
    rel_pose_jacobian,
)
from libcml_tpu.ops.image import bilinear


@struct.dataclass
class TrackerRef:
    """Per-level views of the reference keyframe's point set (static shapes).

    All leaves are stacked over levels: uv (L, P, 2), color (L, P, 8),
    weight (L, P, 8), valid (L, P). idepth is level-independent (P,)."""

    uv: jax.Array
    color: jax.Array
    weight: jax.Array
    valid: jax.Array
    idepth: jax.Array


@struct.dataclass
class TrackResult:
    T_ji: SE3            # relative pose: new frame <- reference keyframe
    ab: jax.Array        # (2,) relative affine [a_ji, b_ji]
    energy: jax.Array    # final mean Huber energy per valid point
    num_valid: jax.Array # valid points at the finest level
    cov_pose: jax.Array  # (6, 6) pose covariance (affine marginalized)
    flow: jax.Array      # RMS pixel flow at the finest level (KF decision)
    flow_no_trans: jax.Array  # RMS flow from rotation only
    saturated: jax.Array # fraction of points with energy above outlier cut


def _level_uv(uv0: jax.Array, level: int) -> jax.Array:
    """Level-0 pixel coords -> level-l (DSO half-pixel convention)."""
    s = 0.5**level
    return (uv0 + 0.5) * s - 0.5


def make_tracker_ref(
    kf_grad_pyr: tuple[jax.Array, ...],
    cam0: PinholeCamera,
    uv0: jax.Array,
    idepth: jax.Array,
    valid: jax.Array,
    cfg: DirectConfig,
) -> TrackerRef:
    """Sample the host keyframe's pattern intensities and gradient weights at
    every pyramid level (the per-point data the tracker needs)."""
    from libcml_tpu.models.direct.residuals import pattern_uv

    uvs, colors, weights, valids = [], [], [], []
    for l, G in enumerate(kf_grad_pyr):
        cam_l = cam0.level(l)
        uv_l = _level_uv(uv0, l)
        # single-pixel support (reference: CoarseTracker::calcRes samples ONE
        # pixel per point at every level; the 8-pattern lives in the BA only)
        p_uv = pattern_uv(uv_l, pattern=PATTERN_CENTER)
        sample = bilinear(G, p_uv)  # (P, 1, 3)
        color = sample[..., 0]
        gsq = sample[..., 1] ** 2 + sample[..., 2] ** 2
        w = jnp.sqrt(cfg.gradient_weight_c2 / (cfg.gradient_weight_c2 + gsq))
        ok = valid & cam_l.in_bounds(uv_l, border=3.0)
        uvs.append(uv_l)
        colors.append(color)
        weights.append(w)
        valids.append(ok)
    return TrackerRef(
        uv=jnp.stack(uvs),
        color=jnp.stack(colors),
        weight=jnp.stack(weights),
        valid=jnp.stack(valids),
        idepth=idepth,
    )


def _solve_scaled(H: jax.Array, b: jax.Array, lam: jax.Array, cfg: DirectConfig):
    """LM-damped solve of the 8x8 system with DSO-style state scaling for
    conditioning (reference scales xi/a/b before the ldlt solve)."""
    s = jnp.array(
        [cfg.scale_trans] * 3 + [cfg.scale_rot] * 3 + [cfg.scale_a, cfg.scale_b],
        dtype=H.dtype,
    )
    Hs = H * s[:, None] * s[None, :]
    bs = b * s
    Hs = Hs + lam * jnp.diag(jnp.diag(Hs)) + 1e-8 * jnp.eye(8, dtype=H.dtype)
    dx = jnp.linalg.solve(Hs, bs)
    return dx * s


def _track_level(
    grad_j: jax.Array,
    cam_l: PinholeCamera,
    uv: jax.Array,
    idepth: jax.Array,
    color: jax.Array,
    weight: jax.Array,
    valid: jax.Array,
    T0: SE3,
    ab0: jax.Array,
    cfg: DirectConfig,
    ab_center: jax.Array | None = None,
):
    """Run cfg.tracker_iters LM iterations at one pyramid level."""

    weight = jnp.where(valid[:, None], weight, 0.0)

    def total_energy(T, ab):
        ev = evaluate_residuals(
            grad_j, cam_l, uv, idepth, color, weight, T, ab[0], ab[1],
            huber_k=cfg.huber_intensity, cutoff=cfg.tracker_cutoff,
            pattern=PATTERN_CENTER,
        )
        ok = ev.valid & valid
        n = jnp.maximum(jnp.sum(ok), 1)
        return jnp.sum(jnp.where(ok, ev.energy, 0.0)) / n, ok

    if ab_center is None:
        ab_center = jnp.zeros_like(ab0)
    E0, _ = total_energy(T0, ab0)

    def body(carry):
        T, ab, E, lam, it, done = carry
        ev = evaluate_residuals(
            grad_j, cam_l, uv, idepth, color, weight, T, ab[0], ab[1],
            huber_k=cfg.huber_intensity, cutoff=cfg.tracker_cutoff,
            pattern=PATTERN_CENTER,
        )
        J = rel_pose_jacobian(ev, color)
        H, b, _ = gauss_newton_system(J, ev.r, ev.w)
        # small prior keeping affine params near their PREDICTION — zero
        # without exposure data, log(t_j/t_i) when the capture provides
        # exposure times (reference: Exposure::to(), Exposure.h:118-125,
        # feeding DSOTracker.cpp:272's initialization)
        prior = jnp.array([0.0] * 6 + [1e-1, 1e-3], dtype=H.dtype)
        H = H + jnp.diag(prior)
        b = b + prior * jnp.concatenate([jnp.zeros(6, H.dtype),
                                         ab - ab_center])
        dx = _solve_scaled(H, b, lam, cfg)
        T_new = se3_exp(-dx[:6]).compose(T)
        ab_new = ab - dx[6:]
        E_new, _ = total_energy(T_new, ab_new)
        accept = E_new < E
        T = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), T, T_new)
        ab = jnp.where(accept, ab_new, ab)
        E = jnp.where(accept, E_new, E)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7),
                        jnp.minimum(lam * 4.0, 1e2))
        # convergence early-exit (the reference breaks per level on a small
        # increment, DSOTracker.cpp:101-110): an accepted step below eps, or
        # LM damping saturating with no accepted step, ends the level —
        # typically after 3-5 of the budgeted iterations
        done = (accept & (jnp.linalg.norm(dx) < cfg.tracker_converge_eps)) | (
            ~accept & (lam >= 1e2 - 1e-6)
        )
        return (T, ab, E, lam, it + 1, done)

    def cond(carry):
        _, _, _, _, it, done = carry
        return (it < cfg.tracker_iters) & ~done

    T, ab, E, _, _, _ = jax.lax.while_loop(
        cond, body,
        (T0, ab0, E0, jnp.asarray(1e-4, dtype=uv.dtype),
         jnp.asarray(0, jnp.int32), jnp.asarray(False)),
    )
    return T, ab, E


def motion_hypotheses(T_pred: SE3, T_zero: SE3, n_rot: int = 8,
                      rot_eps: float = 0.02, T_extra: SE3 | None = None) -> SE3:
    """Batched tracker initializations (reference: trackWithMotionModel's
    27-candidate battery, DSOTracker.h:238): the constant-velocity
    prediction, damped/amplified translation variants (0.5x/0.7x/1.3x/2x —
    these straddle the photometric false minima that appear at fractions of
    the true translation), the zero-motion pose, and small rotation
    perturbations of the prediction. Returns a batched SE3 with leading dim
    N = 6 + n_rot."""
    def scale_t(T, s):
        return SE3(R=T.R, t=T.t * s)

    cands = [
        T_pred,
        scale_t(T_pred, 0.5),
        scale_t(T_pred, 0.7),
        scale_t(T_pred, 1.3),
        scale_t(T_pred, 2.0),
        T_zero,
    ]
    if T_extra is not None:
        # an externally supplied candidate (e.g. the hybrid's PnP pose) —
        # it COMPETES in the battery rather than replacing the prediction
        # (round 4: replacing the motion model with the PnP pose on every
        # INDIRECT-mode frame measurably degraded healthy tracking)
        cands.append(T_extra)
    axes = jnp.eye(3, dtype=jnp.float32)
    for k in range(n_rot):
        ax = axes[k % 3] * (1.0 if k < 3 else -1.0) * rot_eps * (1 + k // 6)
        dT = se3_exp(jnp.concatenate([jnp.zeros(3, jnp.float32), ax]))
        cands.append(dT.compose(T_pred))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cands)


def track_multi(
    new_grad_pyr: tuple[jax.Array, ...],
    cam0: PinholeCamera,
    ref: TrackerRef,
    T_inits: SE3,            # batched (N,) hypotheses
    ab_init: jax.Array,
    cfg: DirectConfig,
) -> TrackResult:
    """Multi-hypothesis tracking, the TPU-native form of the reference's
    sequential 27-try recovery loop (trackWithMotionModel): run the LM
    refinement for EVERY hypothesis in parallel at the TWO coarsest pyramid
    levels only (one small vmapped program), pick the winner by achieved
    energy, then finish the standard coarse-to-fine track from it.

    Why hypotheses at all: photometric tracking has false local minima at
    translation fractions (periodic texture, patch aliasing); a single-init
    tracker that lands in one feeds a poisoned prediction to the next frame
    and the error compounds. Why coarse-only: the basin choice happens at
    the coarse levels (they run first), so that is where candidates must
    compete — and vmapping only the coarse stage keeps the compiled program
    ~N_levels times smaller than batching the full pyramid schedule."""
    L = len(new_grad_pyr)
    levels = [min(L - 1, 1), 0] if L == 1 else [L - 1, L - 2]

    def coarse_refine(T0):
        T, ab = T0, ab_init
        E = jnp.asarray(0.0, jnp.float32)
        for l in levels:
            cam_l = cam0.level(l)
            T, ab, E = _track_level(
                new_grad_pyr[l], cam_l, ref.uv[l], ref.idepth, ref.color[l],
                ref.weight[l], ref.valid[l], T, ab, cfg, ab_center=ab_init,
            )
        return T, ab, E

    Ts, abs_, Es = jax.vmap(coarse_refine)(T_inits)
    best = jnp.argmin(Es)
    T_best = jax.tree.map(lambda x: x[best], Ts)
    return track(new_grad_pyr, cam0, ref, T_best, abs_[best], cfg)


def track(
    new_grad_pyr: tuple[jax.Array, ...],
    cam0: PinholeCamera,
    ref: TrackerRef,
    T_init: SE3,
    ab_init: jax.Array,
    cfg: DirectConfig,
) -> TrackResult:
    """Track a new frame against the reference keyframe point set,
    coarse-to-fine. Fully jittable; call under jax.jit."""
    num_levels = len(new_grad_pyr)
    T, ab = T_init, ab_init
    E = jnp.asarray(0.0, dtype=jnp.float32)
    for l in range(num_levels - 1, -1, -1):
        cam_l = cam0.level(l)
        T, ab, E = _track_level(
            new_grad_pyr[l], cam_l,
            ref.uv[l], ref.idepth, ref.color[l], ref.weight[l], ref.valid[l],
            T, ab, cfg, ab_center=ab_init,
        )

    # Final sweep at level 0 for statistics + covariance.
    cam_l0 = cam0.level(0)
    w0 = jnp.where(ref.valid[0][:, None], ref.weight[0], 0.0)
    ev = evaluate_residuals(
        new_grad_pyr[0], cam_l0, ref.uv[0], ref.idepth, ref.color[0], w0,
        T, ab[0], ab[1], huber_k=cfg.huber_intensity, cutoff=cfg.tracker_cutoff,
            pattern=PATTERN_CENTER,
    )
    ok = ev.valid & ref.valid[0]
    n = jnp.maximum(jnp.sum(ok), 1)

    J = rel_pose_jacobian(ev, ref.color[0])
    H, _, _ = gauss_newton_system(J, ev.r, ev.w)
    H = H + 1e-6 * jnp.eye(8, dtype=H.dtype)
    cov_full = jnp.linalg.inv(H)
    cov_pose = cov_full[:6, :6]

    flow_sq = jnp.sum((ev.uv_j - ref.uv[0]) ** 2, axis=-1)
    flow = jnp.sqrt(jnp.sum(jnp.where(ok, flow_sq, 0.0)) / n)
    # rotation-only flow: warp with translation zeroed
    T_rot = SE3(R=T.R, t=jnp.zeros_like(T.t))
    ev_rot = evaluate_residuals(
        new_grad_pyr[0], cam_l0, ref.uv[0], ref.idepth, ref.color[0], w0,
        T_rot, ab[0], ab[1], huber_k=cfg.huber_intensity, cutoff=cfg.tracker_cutoff,
            pattern=PATTERN_CENTER,
    )
    flow_rot_sq = jnp.sum((ev_rot.uv_j - ref.uv[0]) ** 2, axis=-1)
    flow_no_trans = jnp.sqrt(jnp.sum(jnp.where(ok, flow_rot_sq, 0.0)) / n)

    # saturation = residuals pinned at the hard cutoff (their energy is
    # CAPPED at huber(cutoff) which sits below outlier_energy, so an
    # energy-threshold count would read zero even on a total blackout;
    # reference: the saturated-ratio statistic of DSOTracker's Residual)
    sat_r = jnp.abs(ev.r[:, 0]) >= 0.98 * cfg.tracker_cutoff
    saturated = jnp.sum(jnp.where(ok, sat_r, False)) / n

    return TrackResult(
        T_ji=T,
        ab=ab,
        energy=jnp.sum(jnp.where(ok, ev.energy, 0.0)) / n,
        num_valid=jnp.sum(ok),
        cov_pose=cov_pose,
        flow=flow,
        flow_no_trans=flow_no_trans,
        saturated=saturated,
    )
