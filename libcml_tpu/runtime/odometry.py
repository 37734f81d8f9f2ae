"""Direct (DSO-style) visual odometry runtime: the per-frame driver loop.

TPU-native replacement for the reference's Hybrid direct path + AbstractSlam
run loop (reference: src/cml/slam/modslam/Hybrid.cpp:90 run, :167
processFrame, src/cml/slam/modslam/direct/Mapping.cpp:47 directMap,
direct/Tracking.cpp:4 directNeedNewKeyFrame, src/cml/base/AbstractSlam.cpp:131
getNextFrame).

Host/device split (SURVEY.md §7): ALL dense math — pyramid build, point
selection, tracking, tracing, windowed photometric BA, marginalization — runs
as jitted device programs over fixed-capacity arenas; the host owns only the
tiny scalar state machine (init/track/keyframe decisions) and trajectory
bookkeeping. Every device function is compiled once per (shape, config).

Non-keyframe poses are stored RELATIVE to their reference keyframe and
composed with the keyframe's final optimized pose at export — the one-anchor
equivalent of the reference's deform graph (Frame.cpp:51-92
setCameraAndDeform), which keeps the full trajectory consistent as BA and
marginalization move keyframes after the fact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.direct import ba as ba_mod
from libcml_tpu.models.direct import window as win_mod
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.initializer import (
    normalize_scale,
    set_first,
    try_initialize,
)
from libcml_tpu.models.direct.selector import select_points
from libcml_tpu.models.direct.tracer import (
    ImmatureArena,
    empty_immatures,
    mature_mask,
    seed_immatures,
    trace_immatures,
    trace_immatures_rows,
    trace_points,
)
from libcml_tpu.models.direct.tracker import (
    TrackResult,
    make_tracker_ref,
    motion_hypotheses,
    track,
    track_multi,
)
from libcml_tpu.core.camera import Calibration
from libcml_tpu.ops.image import (
    apply_photometric,
    bilinear,
    build_gradient_pyramid,
    remap_image,
)
from libcml_tpu.map.map import SlamMap
from libcml_tpu.runtime.stats import StatsSheet
from libcml_tpu.utils import logging as log


def _rss_mb() -> float:
    """Current process resident-set size in MB (Linux /proc; the portable
    fallback reports 0 so the kill switch degrades to a no-op)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        import resource

        return pages * resource.getpagesize() / 1e6
    except (OSError, ValueError, IndexError):
        return 0.0


# ---------------------------------------------------------------------------
# Jitted device programs (config is static → one compile per config)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_levels",))
def _preprocess(image: jax.Array, num_levels: int):
    return build_gradient_pyramid(image, num_levels)


@functools.partial(jax.jit, static_argnames=("num_levels",))
def _preprocess_rect(image: jax.Array, remap, gamma, vignette, num_levels: int):
    """Photometric correction (gamma response inversion + vignette divide,
    both in RAW pixel space) then geometric rectification (one gather through
    the precomputed remap grid), then the gradient pyramid — one fused device
    program per frame (reference: TUMCapture.cpp:19-131 photometric prep +
    InternalCalibration.h:342 undistort-map application)."""
    img = apply_photometric(image, gamma, vignette)
    if remap is not None:
        img = remap_image(img, remap)
    return img, build_gradient_pyramid(img, num_levels)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _track(grad_pyr, cam, ref, T_init, ab_init, cfg: DirectConfig) -> TrackResult:
    return track(grad_pyr, cam, ref, T_init, ab_init, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _track_multi(grad_pyr, cam, ref, T_pred, T_zero, ab_init,
                 cfg: DirectConfig) -> TrackResult:
    """Multi-hypothesis tracking (reference: trackWithMotionModel's
    candidate battery) as ONE vmapped device program."""
    T_inits = motion_hypotheses(T_pred, T_zero)
    return track_multi(grad_pyr, cam, ref, T_inits, ab_init, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _try_init(state, grad_pyr, cam, cfg: DirectConfig):
    return try_initialize(state, grad_pyr, cam, cfg)


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _frame_step(
    grad_pyr,
    cam,
    ref,
    immature: ImmatureArena,
    ba_T: SE3,
    ba_frame_valid,
    kf_T: SE3,
    T_curr: SE3,
    T_prev: SE3,
    T_seed: SE3,
    use_seed,
    recent_rows,
    ab_init,
    cfg: DirectConfig,
):
    """The WHOLE per-frame fast path as one device program: motion-model
    prediction, single track, on-device suspect test, conditional
    multi-hypothesis battery (lax.cond — only the taken branch executes),
    pose-ok gating, world-pose composition, and immature tracing.

    Why one program: through the remote-TPU tunnel each dispatch-and-wait
    round trip carries a ~25 ms fixed overhead on top of device time
    (measured round 4: single-shot _track 37 ms vs 9.6 ms pipelined). Fusing
    track + battery + trace means the host blocks ONCE per frame on a small
    scalar bundle, and in pipelined mode not even that (the bundle is
    fetched one frame later while the next frame's program executes). The
    reference's equivalent control flow is host-side C++ (Hybrid.cpp:167
    processFrame; DSOTracker.h:238 trackWithMotionModel recovery); here the
    scalar decisions ride with the math.

    Returns (immature', T_world, T_rel, scalars (10,)):
        scalars = [num_valid, saturated, flow, energy, ok, suspect,
                   cov_rot_diag x3, ab_a]  (+ ab separately)
    """
    T_delta = T_curr.compose(T_prev.inverse())
    T_pred_world = T_delta.compose(T_curr)
    T_init = T_pred_world.compose(kf_T.inverse())
    T_zero = T_curr.compose(kf_T.inverse())
    # an external seed (the hybrid's PnP pose) joins the recovery battery
    # as one more hypothesis; the fast path keeps the motion model (the
    # smoother predictor when tracking is healthy)
    T_seed_rel = T_seed.compose(kf_T.inverse())
    T_seed_rel = _tree_select(use_seed, T_seed_rel, T_init)
    # exposure-aware affine initialization: a = log(t_j / t_kf) when the
    # capture provides exposure times, zero otherwise (reference:
    # Exposure::to(), Exposure.h:118-125)
    ab0 = ab_init

    res0 = track(grad_pyr, cam, ref, T_init, ab0, cfg)
    finite0 = jnp.all(jnp.isfinite(res0.T_ji.t))
    suspect = (
        (res0.num_valid < 24)
        | (res0.saturated >= 0.5 * cfg.fail_saturated)
        | ~finite0
    )
    res = jax.lax.cond(
        suspect,
        lambda: track_multi(
            grad_pyr, cam, ref,
            motion_hypotheses(T_init, T_zero, T_extra=T_seed_rel), ab0, cfg),
        lambda: res0,
    )

    finite = jnp.all(jnp.isfinite(res.T_ji.t)) & jnp.all(
        jnp.isfinite(res.T_ji.R))
    pose_ok = (res.num_valid >= 24) & finite & (
        res.saturated < cfg.fail_saturated)
    T_world = _tree_select(
        pose_ok,
        res.T_ji.compose(kf_T).normalized(),
        T_pred_world.normalized(),
    )
    T_rel = T_world.compose(kf_T.inverse())

    immature = jax.lax.cond(
        pose_ok,
        lambda a: trace_immatures_rows(a, recent_rows, ba_T, ba_frame_valid,
                                       grad_pyr[0], T_world, cam, cfg),
        lambda a: a,
        immature,
    )

    cov_rot = jnp.diagonal(res.cov_pose)[3:6]
    # resolution-normalized keyframe score (reference:
    # direct/Tracking.cpp:28-41; a is log-scale so |a| == |log ratio|)
    flow_t = jnp.sqrt(jnp.maximum(res.flow ** 2 - res.flow_no_trans ** 2,
                                  0.0))
    wh = float(cam.width + cam.height)
    kf_score = (
        (cfg.kf_shift_weight_t * flow_t
         + cfg.kf_shift_weight_rt * res.flow) / wh
        + cfg.kf_affine_weight * jnp.abs(res.ab[0])
    )
    n_ref = jnp.sum(ref.valid[0]).astype(jnp.float32)
    # frame-to-frame motion magnitudes (for the host CameraChecker —
    # computing them here saves the checker's own device fetches)
    mo_R = T_world.R @ T_curr.R.T
    mo_ang = jnp.arccos(jnp.clip((jnp.trace(mo_R) - 1.0) / 2.0, -1.0, 1.0))
    mo_dt = jnp.linalg.norm(T_world.t - mo_R @ T_curr.t)
    # ONE flat bundle = ONE device->host RPC at finalize (each separate
    # fetch costs ~30 ms fixed latency through the tunnel): 11 scalars,
    # then T_rel as rows [R(9), t(3)], ab(2), motion(2)
    scalars = jnp.concatenate([
        jnp.asarray([res.num_valid, res.saturated, res.flow, res.energy],
                    jnp.float32).reshape(-1),
        jnp.asarray([pose_ok, suspect], jnp.float32),
        cov_rot.astype(jnp.float32),
        jnp.asarray([kf_score, n_ref], jnp.float32),
        T_rel.R.reshape(-1).astype(jnp.float32),
        T_rel.t.reshape(-1).astype(jnp.float32),
        res.ab.reshape(-1).astype(jnp.float32),
        jnp.asarray([mo_dt, mo_ang], jnp.float32).reshape(-1),
    ])
    return immature, T_world, T_rel, res.ab, scalars


@functools.partial(jax.jit, static_argnames=("cfg",))
def _retrack_step(
    grad_pyr,
    cam,
    ref,
    kf_T: SE3,
    T_world_prev: SE3,
    ab_init,
    ab_shift,
    cfg: DirectConfig,
):
    """Re-track ONE in-flight pipelined frame against a JUST-created
    keyframe's fresh reference (new points, BA-refined depths and pose).

    Why: at lag-1 a frame dispatched before the keyframe event tracks
    against the OLD reference; its pose is geometrically consistent but
    measurably noisier (the old reference is one window-generation stale),
    and its flow score can't drive the next keyframe decision (round 4
    suppressed it as stale_ref — which in turn spaced keyframes
    differently from the sequential mode and tripled ATE, 0.031 → 0.092).
    Re-dispatching just the track (~8 ms device, no host block) against
    the new reference makes the pipelined mode tracking-equivalent to the
    sequential mode; the immature trace from the first dispatch is already
    applied and is NOT repeated.

    `T_world_prev` is the frame's own first-dispatch world pose — the
    initialization (already within a frame's motion of the optimum).
    Returns (T_world, T_rel, ab, scalars) with the exact _frame_step
    bundle layout so _finalize_frame consumes it unchanged.
    """
    T_init = T_world_prev.compose(kf_T.inverse())
    ab_init = ab_init - ab_shift  # rebase ab onto the NEW reference frame
    res0 = track(grad_pyr, cam, ref, T_init, ab_init, cfg)
    finite0 = jnp.all(jnp.isfinite(res0.T_ji.t))
    suspect = (
        (res0.num_valid < 24)
        | (res0.saturated >= 0.5 * cfg.fail_saturated)
        | ~finite0
    )
    # same conditional recovery battery as _frame_step: near sharp turns
    # the single retrack sits on a knife edge (measured round 5: a
    # deterministic saturated-residual collapse at the benchmark's yaw
    # reversal that the battery-less retrack could not recover)
    res = jax.lax.cond(
        suspect,
        lambda: track_multi(
            grad_pyr, cam, ref,
            motion_hypotheses(T_init, T_init), ab_init, cfg),
        lambda: res0,
    )
    finite = jnp.all(jnp.isfinite(res.T_ji.t)) & jnp.all(
        jnp.isfinite(res.T_ji.R))
    pose_ok = (res.num_valid >= 24) & finite & (
        res.saturated < cfg.fail_saturated)
    T_world = _tree_select(
        pose_ok,
        res.T_ji.compose(kf_T).normalized(),
        T_world_prev.normalized(),
    )
    T_rel = T_world.compose(kf_T.inverse())
    cov_rot = jnp.diagonal(res.cov_pose)[3:6]
    flow_t = jnp.sqrt(jnp.maximum(res.flow ** 2 - res.flow_no_trans ** 2,
                                  0.0))
    wh = float(cam.width + cam.height)
    kf_score = (
        (cfg.kf_shift_weight_t * flow_t
         + cfg.kf_shift_weight_rt * res.flow) / wh
        + cfg.kf_affine_weight * jnp.abs(res.ab[0])
    )
    n_ref = jnp.sum(ref.valid[0]).astype(jnp.float32)
    mo_R = T_world.R @ kf_T.R.T
    mo_ang = jnp.arccos(jnp.clip((jnp.trace(mo_R) - 1.0) / 2.0, -1.0, 1.0))
    mo_dt = jnp.linalg.norm(T_world.t - mo_R @ kf_T.t)
    scalars = jnp.concatenate([
        jnp.asarray([res.num_valid, res.saturated, res.flow, res.energy],
                    jnp.float32).reshape(-1),
        jnp.asarray([pose_ok, suspect], jnp.float32),
        cov_rot.astype(jnp.float32),
        jnp.asarray([kf_score, n_ref], jnp.float32),
        T_rel.R.reshape(-1).astype(jnp.float32),
        T_rel.t.reshape(-1).astype(jnp.float32),
        res.ab.reshape(-1).astype(jnp.float32),
        jnp.asarray([mo_dt, mo_ang], jnp.float32).reshape(-1),
    ])
    return T_world, T_rel, res.ab, scalars


@functools.partial(jax.jit, static_argnames=("cfg",))
def _window_points_in_frame(window: win_mod.Window, slot, cam, cfg: DirectConfig):
    """Warp every valid window point into frame `slot`: the tracker's
    semi-dense reference set (replaces makeCoarseDepthL0,
    reference DSOTracker.cpp:494, with a point-set view — static shapes)."""
    ba = window.ba
    T_l = jax.tree.map(lambda x: x[slot], ba.T)
    X_h = cam.unproject(ba.uv, ba.idepth)                     # (P, 3) host frame
    T_h = ba.T  # (F,) batched; gather per point
    R_h = T_h.R[ba.host]
    t_h = T_h.t[ba.host]
    # world point: X_w = R_h^T (X_h - t_h)
    X_w = jnp.einsum("pji,pj->pi", R_h, X_h - t_h)
    X_l = jnp.einsum("ij,pj->pi", T_l.R, X_w) + T_l.t
    uv_l, z_ok = cam.project(X_l)
    ok = (
        ba.point_valid
        & z_ok
        & cam.in_bounds(uv_l, border=3.0)
        & (X_l[..., 2] > 1e-4)
    )
    rho_l = 1.0 / jnp.maximum(X_l[..., 2], 1e-4)

    # Occlusion z-buffer: among points landing in the same 4x4-pixel cell,
    # keep only those within 25% depth of the nearest — a far-surface point
    # projected onto a pixel where a nearer surface is visible pairs the
    # FOREGROUND's intensity with the BACKGROUND's depth, and a coherent
    # population of those biases tracking (the reference's makeCoarseDepthL0
    # fuses projected depths per pixel, which has the same effect;
    # DSOTracker.cpp:494).
    cell = 4
    Wc = (cam.width + cell - 1) // cell
    cx = jnp.clip(uv_l[:, 0].astype(jnp.int32) // cell, 0, Wc - 1)
    cy = jnp.clip(uv_l[:, 1].astype(jnp.int32) // cell, 0,
                  (cam.height + cell - 1) // cell - 1)
    cid = cy * Wc + cx
    n_cells = Wc * ((cam.height + cell - 1) // cell)
    rho_for_max = jnp.where(ok, rho_l, 0.0)
    cell_max_rho = jnp.zeros((n_cells,), rho_l.dtype).at[cid].max(rho_for_max)
    ok = ok & (rho_l > 0.8 * cell_max_rho[cid])
    return uv_l, rho_l, ok


@functools.partial(jax.jit, static_argnames=("cfg",))
def _make_ref(kf_grad_pyr, cam, uv, idepth, valid, cfg: DirectConfig):
    return make_tracker_ref(kf_grad_pyr, cam, uv, idepth, valid, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _seed_new_immatures(
    arena: ImmatureArena, slot, new_grad0, rho_lo, rho_hi, cfg: DirectConfig
):
    """Candidate selection on the new keyframe + immature seeding with the
    map's working inverse-depth range (makeNewTraces)."""
    uv, valid, _ = select_points(new_grad0, cfg.points_per_kf)
    return seed_immatures(arena, slot, new_grad0, uv, valid, rho_lo, rho_hi)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _trace_immatures(
    arena: ImmatureArena, T_hosts, host_valid, new_grad0, T_obs,
    cam, cfg: DirectConfig
):
    return trace_immatures(arena, T_hosts, host_valid, new_grad0, T_obs, cam, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _activate_points(
    window: win_mod.Window, slot, uv, idepth, ok, cfg: DirectConfig
):
    return win_mod.add_points(window, slot, uv, idepth, ok, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _working_rho_range(ba, cfg: DirectConfig):
    rho_valid = jnp.where(ba.point_valid, ba.idepth, jnp.nan)
    rho_med = jnp.nanmedian(rho_valid)
    rho_med = jnp.where(jnp.isfinite(rho_med), rho_med, 1.0)
    rho_lo = jnp.maximum(rho_med / 8.0, cfg.idepth_min)
    rho_hi = jnp.minimum(rho_med * 8.0, cfg.idepth_max)
    return rho_lo, rho_hi


@functools.partial(jax.jit, static_argnames=("cfg",))
def _kf_insert_and_ba(
    window: win_mod.Window,
    grad0,
    T_new: SE3,
    ab_kf,
    ab_rel,
    frame_id,
    cam,
    cfg: DirectConfig,
):
    """Insert keyframe + run windowed photometric BA + outlier ejection —
    one compiled program per keyframe event. (Point activation happens
    separately from the immature arena, before this call.) Also returns the
    new keyframe's OPTIMIZED pose and absolute (a,b) so the host never has
    to fetch or eagerly combine them (each eager device op through the
    remote-TPU tunnel costs ~100 ms; see round-5 cProfile in BASELINE.md)."""
    ab_new = ab_kf + ab_rel       # promoted frame's ab vs the OLD reference
    window, slot = win_mod.add_keyframe(window, grad0, T_new, ab_new, frame_id)
    # fresh Jacobians once per keyframe event (prior shifted exactly)
    window = window.replace(ba=ba_mod.relinearize(window.ba))
    new_ba, energy = ba_mod.run_ba(window.ba, window.images, cam, cfg)
    new_ba = ba_mod.update_residual_status(new_ba, window.images, cam, cfg)
    T_kf = jax.tree.map(lambda x: x[slot], new_ba.T)
    return window.replace(ba=new_ba), slot, energy, T_kf, ab_new


@functools.partial(jax.jit, static_argnames=("cfg",))
def _activate_and_clear(window: win_mod.Window, immature: ImmatureArena,
                        cfg: DirectConfig):
    """Activate every matured immature candidate into the BA arena and
    clear them — the per-host-slot loop is unrolled INSIDE the program
    (F is static), replacing F separate dispatches + a host fetch of the
    readiness mask (reference: DSOTracer::activatePoints,
    DSOTracer.cpp:59)."""
    ready, rho_mid = mature_mask(immature, cfg)
    for f in range(cfg.max_frames):
        window = win_mod.add_points(
            window, jnp.asarray(f), immature.uv[f], rho_mid[f], ready[f], cfg
        )
    immature = immature.replace(valid=immature.valid & ~ready)
    return window, immature


@functools.partial(jax.jit, static_argnames=("cfg",))
def _refresh_after_kf(window: win_mod.Window, slot, kf_pyr,
                      immature: ImmatureArena, cam, cfg: DirectConfig):
    """Post-keyframe refresh as ONE program: rebuild the tracker reference
    from the window points projected into the new keyframe, and seed fresh
    immature candidates on it (makeCoarseDepthL0 + makeNewTraces)."""
    uv_l, rho_l, ok = _window_points_in_frame.__wrapped__(window, slot, cam,
                                                         cfg)
    ref = make_tracker_ref(kf_pyr, cam, uv_l, rho_l, ok, cfg)
    rho_lo, rho_hi = _working_rho_range.__wrapped__(window.ba, cfg)
    uv, valid, _ = select_points(kf_pyr[0], cfg.points_per_kf)
    immature = seed_immatures(immature, slot, kf_pyr[0], uv, valid,
                              rho_lo, rho_hi)
    return ref, immature


@functools.partial(jax.jit, static_argnames=("cfg",))
def _marg_finish(window: win_mod.Window, immature: ImmatureArena,
                 packed, hosted, slot, cfg: DirectConfig):
    """Apply a completed asynchronous marginalization in one program: the
    new prior + state drops (ba._marg_apply), the window frame-id slot, and
    the marginalized host's immature candidates."""
    new_ba = ba_mod._marg_apply.__wrapped__(window.ba, packed, hosted, slot)
    F = new_ba.num_frames
    window = window.replace(
        ba=new_ba,
        frame_id=jnp.where(jnp.arange(F) == slot, -1, window.frame_id),
    )
    immature = immature.replace(
        valid=immature.valid & (jnp.arange(immature.valid.shape[0])
                                != slot)[:, None]
    )
    return window, immature


# jitted: called once per keyframe event from the host driver — the raw
# function is ~30 eager primitives, each a ~100 ms tunnel round trip
_choose_marg_slot = jax.jit(win_mod.choose_marginalization_slot)

# shared identity pose: building SE3.identity() per frame is 2-4 eager
# device ops through the tunnel
_SE3_ID = SE3.identity()


# -- packed device->host fetches --------------------------------------------
# The tunnel charges ~25-30 ms PER ARRAY fetched, independent of size
# (measured round 4; re-confirmed round 5: a 5-array per-frame fetch cost
# 120 ms against the single-array ~30 ms floor). Everything a finalize
# consumes is therefore bit-packed into ONE flat f32 buffer on device and
# split back on host: 4-byte int/uint leaves travel as bitcasts, bools as
# 0/1 floats.


@functools.partial(jax.jit, static_argnames=("meta",))
def _pack_flat(leaves, meta):
    parts = []
    for leaf, (shape, dtype) in zip(leaves, meta):
        if dtype in ("uint32", "int32"):
            p = jax.lax.bitcast_convert_type(leaf, jnp.float32)
        elif dtype == "bool":
            p = leaf.astype(jnp.float32)
        else:
            p = leaf.astype(jnp.float32)
        parts.append(p.reshape(-1))
    return jnp.concatenate(parts)


def pack_refs(tree):
    """Flatten an arbitrary pytree of device arrays into ONE f32 buffer
    (a single tunnel RPC to fetch) + the recipe to reassemble it."""
    leaves, treedef = jax.tree.flatten(tree)
    meta = tuple((tuple(l.shape), str(l.dtype)) for l in leaves)
    return _pack_flat(tuple(leaves), meta), (treedef, meta)


def unpack_refs(flat_np, recipe):
    """Host half: split the fetched f32 buffer back into numpy leaves."""
    treedef, meta = recipe
    out = []
    ofs = 0
    flat_np = np.asarray(flat_np)
    for shape, dtype in meta:
        n = int(np.prod(shape)) if shape else 1
        chunk = flat_np[ofs:ofs + n]
        ofs += n
        if dtype in ("uint32", "int32"):
            arr = chunk.view(np.dtype(dtype)).reshape(shape)
        elif dtype == "bool":
            arr = (chunk > 0.5).reshape(shape)
        else:
            arr = chunk.astype(np.dtype(dtype), copy=False).reshape(shape)
        out.append(arr)
    return jax.tree.unflatten(treedef, out)


@functools.partial(jax.jit, static_argnames=("meta",))
def _device_unpack(flat, meta):
    out = []
    ofs = 0
    for shape, dtype in meta:
        n = int(np.prod(shape)) if shape else 1
        chunk = jax.lax.dynamic_slice_in_dim(flat, ofs, n)
        ofs += n
        if dtype in ("uint32", "int32"):
            arr = jax.lax.bitcast_convert_type(
                chunk, jnp.dtype(dtype)).reshape(shape)
        elif dtype == "bool":
            arr = (chunk > 0.5).reshape(shape)
        else:
            arr = chunk.astype(jnp.dtype(dtype)).reshape(shape)
        out.append(arr)
    return tuple(out)


def upload_packed(arrays):
    """Host->device transfer of MANY numpy arrays as ONE buffer + ONE
    device-side split program (uploads pay the same ~per-array RPC latency
    as fetches through the tunnel; the indirect local-BA dispatch uploads
    ~12 operand arrays). 4-byte int/uint arrays travel as bit views,
    bools as 0/1; returns device arrays in input order."""
    metas = []
    parts = []
    for a in arrays:
        a = np.asarray(a)
        metas.append((tuple(a.shape), str(a.dtype)))
        if a.dtype in (np.uint32, np.int32):
            parts.append(a.reshape(-1).view(np.float32))
        elif a.dtype == np.bool_:
            parts.append(a.reshape(-1).astype(np.float32))
        else:
            parts.append(a.reshape(-1).astype(np.float32))
        if a.dtype == np.int64:
            raise TypeError("upload_packed: int64 would lose bits; "
                            "cast to int32 first")
    flat = np.concatenate(parts) if parts else np.zeros(0, np.float32)
    return _device_unpack(jnp.asarray(flat), tuple(metas))


@jax.jit
def _push_row(rows, slot):
    """Shift `slot` into the recent-rows ring (device side)."""
    return jnp.concatenate(
        [jnp.reshape(jnp.asarray(slot, jnp.int32), (1,)), rows[:-1]])


def _marginalize(window: win_mod.Window, latest_slot, cam, cfg: DirectConfig):
    """Host-driven: slot choice on device, prior algebra in f64 on host
    (ba.marginalize_frame_f64 — the f32 Schur noise at ~1e10 magnitude
    otherwise drifts the monocular scale ~10% per marginalization)."""
    slot = int(_choose_marg_slot(window, latest_slot))
    new_ba = ba_mod.marginalize_frame_f64(
        window.ba, window.images, cam, cfg, slot
    )
    return (
        window.replace(
            ba=new_ba,
            frame_id=jnp.where(jnp.arange(new_ba.num_frames) == slot, -1,
                               window.frame_id),
        ),
        slot,
    )


# ---------------------------------------------------------------------------
# Host state machine
# ---------------------------------------------------------------------------


class DirectOdometry:
    """Monocular direct odometry over a frame stream.

    Usage:
        odo = DirectOdometry(cam, cfg)
        for ts, img in frames: odo.process(img, ts)
        poses = odo.trajectory_c2w()
    """

    def __init__(self, cam: PinholeCamera | Calibration,
                 cfg: DirectConfig | None = None, depth_prior=None,
                 pipelined: bool = False, mesh=None):
        # a full Calibration carries the rectification remap + photometric
        # response/vignette, applied on device to every incoming frame; a
        # bare PinholeCamera means frames arrive already ideal
        if isinstance(cam, Calibration):
            self.calib: Calibration | None = cam
            cam = cam.pinhole
        else:
            self.calib = None
        self.cam = cam
        self.cfg = cfg or DirectConfig()
        # optional neural inverse-depth prior for initialization
        # (reference: NN::Precomputed / Midas seeding of DSOInitializer,
        # Hybrid.cpp:469-473); callable (image, frame_idx, path) -> map|None
        self.depth_prior = depth_prior
        # pipelined mode: the per-frame scalar fetch lags one frame so the
        # device always has the next frame's fused step queued before the
        # host blocks — hides the per-dispatch tunnel overhead; process()
        # then reports the PREVIOUS frame's stats (the reference's threaded
        # mapping mode has the same one-frame observability lag)
        self.pipelined = pipelined
        # optional multi-chip mesh: the BA point arena is sharded over the
        # mesh's 'points' axis (parallel/sharding.py layout — linearization
        # partitions with zero communication, the einsum-reduced camera
        # system psums over ICI); annotations placed once at window
        # creation propagate through every jitted program
        self.mesh = mesh
        self._pending: list[dict] = []
        self._pending_marg = None     # in-flight async marginalization
        self._win_count = 0           # host mirror of window occupancy
        self._n_ref = 1
        # the R most-recently-seeded immature rows — the only rows the
        # per-frame tracer sweeps (see trace_immatures_rows)
        self._recent_rows = jnp.full(
            (min(self.cfg.trace_recent_rows, self.cfg.max_frames),),
            -1, jnp.int32)
        self.state = "INIT_FIRST"
        self.frame_idx = -1

        self._init_state = None
        self._window: win_mod.Window | None = None
        self._tracker_ref = None
        self._immature = empty_immatures(
            self.cfg.max_frames, self.cfg.points_per_kf
        )

        # latest-keyframe host-side data
        self._kf_pyr = None          # gradient pyramid of the latest KF
        self._kf_grad0_prev = None   # grad0 of the previous KF (for tracing)
        self._kf_slot = None
        self._kf_id = None
        self._kf_T = SE3.identity()  # world->cam pose of latest KF (optimized)
        self._kf_ab = jnp.zeros(2, jnp.float32)

        # motion model (constant velocity in SE3)
        self._T_prev = SE3.identity()
        self._T_curr = SE3.identity()

        # system-of-record map (reference: Map.h:31 — frames, points,
        # groups, covisibility, GT error, export all live here): every
        # processed frame becomes a map frame; non-keyframes store their
        # pose RELATIVE to their reference keyframe (the deform graph),
        # keyframes hold absolute poses refreshed from the window BA
        self.map = SlamMap()
        self._fid2map: dict[int, int] = {}   # frame_idx -> map frame index
        self._cur_gt: np.ndarray | None = None
        self.stats: list[dict] = []
        # per-phase timers + named statistic streams (reference:
        # StatisticTimer/StatisticsSheet, Statistic.h:97,123 — ~35 named
        # stats across modules; surfaced via sheet.to_csv / STAT lines)
        self.sheet = StatsSheet()
        self._track_fails = 0
        # failure handling: segment restarts anchored at the last pose
        # (reference: restartOrStop, Hybrid.cpp:214-222) — trajectory keeps
        # one records list across segments; each segment's poses compose
        # with its anchor keyframe
        self.segments = 0
        self.stopped = False
        self._anchor_kf = 0
        self._restart_anchor = SE3.identity()

    # -- helpers ------------------------------------------------------------

    _GT_UNSET = object()

    def _record(self, ts: float, kf_id: int, T_rel: SE3,
                frame_idx: int | None = None, gt=_GT_UNSET):
        """Record a frame's pose in the map, relative to keyframe `kf_id`.
        Re-recording the same frame (keyframe promotion, restart anchoring)
        updates its map entry in place. `frame_idx` defaults to the current
        frame (pipelined finalize passes the lagged frame's own index and
        its own groundtruth — by finalize time self._cur_gt already belongs
        to the NEXT frame)."""
        if frame_idx is None:
            frame_idx = self.frame_idx
        gt_c2w = self._cur_gt if gt is self._GT_UNSET else gt
        # accepts an SE3 OR a plain (R, t) numpy pair — callers that already
        # fetched the pose must NOT wrap it back into device arrays (a
        # wrap-then-read round trip costs ~50 ms through the tunnel)
        if isinstance(T_rel, tuple):
            R_np, t_np = T_rel
        else:
            R_np, t_np = np.asarray(T_rel.R), np.asarray(T_rel.t)
        M = np.eye(4)
        M[:3, :3] = R_np
        M[:3, 3] = t_np
        ref = self._fid2map.get(kf_id, -1)
        existing = self._fid2map.get(frame_idx)
        if existing is not None:
            self.map.set_pose(existing, M, ref)
        else:
            idx = self.map.add_frame(ts, M, ref_frame=ref,
                                     gt_c2w=gt_c2w)
            self._fid2map[frame_idx] = idx

    def _set_abs_pose(self, frame_idx: int, T: SE3, keyframe: bool = False):
        """Write an ABSOLUTE pose for a frame's map entry (keyframes and
        segment anchors — the roots of deform chains)."""
        i = self._fid2map.get(frame_idx)
        if i is None:
            return
        M = np.eye(4)
        M[:3, :3] = np.asarray(T.R)
        M[:3, 3] = np.asarray(T.t)
        self.map.set_pose(i, M, -1)
        if keyframe:
            self.map.set_keyframe(i)

    def _window_host(self):
        """Host copy of the window's (frame_id, frame_valid, R, t),
        fetched in ONE RPC and cached per BA-state object (each separate
        device->host read costs ~30 ms through the tunnel; the keyframe
        postprocess used to refetch these several times per event)."""
        ba = self._window.ba
        if getattr(self, "_win_host_ref", None) is not ba:
            self._win_host = jax.device_get(
                (self._window.frame_id, ba.frame_valid, ba.T.R, ba.T.t))
            self._win_host_ref = ba   # strong ref keys the cache safely
        return self._win_host

    def _sync_kf_poses(self):
        """Pull optimized keyframe poses out of the window into the map
        (deform-anchored frames follow automatically on read)."""
        fids, valid, R, t = self._window_host()
        kf_bit = self.map.groups.frame_group("DIRECTKEYFRAME")
        for s in range(len(fids)):
            if valid[s] and fids[s] >= 0:
                i = self._fid2map.get(int(fids[s]))
                if i is None:
                    continue
                M = np.eye(4)
                M[:3, :3] = R[s]
                M[:3, 3] = t[s]
                self.map.set_pose(i, M, -1)
                self.map.set_keyframe(i)
                self.map.f_group[i] |= np.uint32(kf_bit)
        # refresh the latest-KF pose used for composing tracked poses
        s = int(self._kf_slot)
        self._kf_T = SE3(R=jnp.asarray(R[s]), t=jnp.asarray(t[s]))

    # -- main entry ----------------------------------------------------------

    def process(self, image, timestamp: float,
                gt_pose_c2w: np.ndarray | None = None,
                exposure: float | None = None) -> dict:
        """Feed one grayscale frame (H, W) in ~[0, 255]. Returns a stats
        dict. `gt_pose_c2w` (4, 4), when available, is stored in the map and
        feeds the live ATE/RPE (reference: Map::refreshErrorFromGroundtruth,
        Map.cpp:578)."""
        self.frame_idx += 1
        log.set_frame(self.frame_idx)
        # host-memory kill switch (reference: AbstractSlam.cpp:150-154 —
        # abort the run when RSS exceeds the configured limit rather than
        # letting the OOM killer take the whole process)
        if self.cfg.memory_limit_mb > 0 and self.frame_idx % 10 == 0:
            rss = _rss_mb()
            self.sheet.push("memory_mb", self.frame_idx, rss)
            if rss > self.cfg.memory_limit_mb:
                log.important(
                    "memory limit exceeded (%.0f MB > %d MB): stopping",
                    rss, self.cfg.memory_limit_mb)
                self._flush_pending()
                self.stopped = True
                return {"state": "STOPPED", "memory_mb": rss}
        self._cur_gt = gt_pose_c2w
        self._cur_exposure = exposure
        img = jnp.asarray(image, jnp.float32)
        with self.sheet.timer("time_preprocess").frame(self.frame_idx):
            c = self.calib
            if c is not None and (c.remap is not None or c.gamma is not None
                                  or c.vignette is not None):
                img, pyr = _preprocess_rect(
                    img, c.remap, c.gamma, c.vignette, self.cfg.num_levels
                )
            else:
                pyr = _preprocess(img, self.cfg.num_levels)

        if self.stopped:
            return {"state": "STOPPED"}

        if self.state == "INIT_FIRST":
            prior = None
            if self.depth_prior is not None:
                p = self.depth_prior(image, self.frame_idx, None)
                if p is not None and p.shape == (self.cam.height,
                                                 self.cam.width):
                    prior = jnp.asarray(p, jnp.float32)
            self._init_state = set_first(pyr, self.cam, self.cfg,
                                         prior_idepth=prior)
            self._first_pyr = pyr
            self._first_ts = timestamp
            self.state = "INIT"
            self._anchor_kf = self.frame_idx
            self._record(timestamp, self._anchor_kf, SE3.identity())
            self._set_abs_pose(self._anchor_kf, self._restart_anchor)
            return {"state": self.state}

        if self.state == "LOST":
            out = self._process_lost(pyr, timestamp)
            self.stats.append(out)
            return out

        if self.state == "INIT":
            res = _try_init(self._init_state, pyr, self.cam, self.cfg)
            self._init_state = res.state
            if bool(res.success):
                self._promote_initialization(pyr, timestamp)
                self.state = "TRACKING"
            else:
                # provisional pose straight from the initializer estimate
                self._record(timestamp, self._anchor_kf, res.state.T)
            return {"state": self.state, "init_energy": float(res.energy)}

        return self._track_frame(pyr, img, timestamp)

    # -- phases ---------------------------------------------------------------

    def _promote_initialization(self, pyr, timestamp):
        cfg, cam = self.cfg, self.cam
        ist, _scale = normalize_scale(self._init_state)

        anchor = self._restart_anchor
        window = win_mod.empty_window(cfg, cam.height, cam.width)
        # KF0 at the segment anchor (identity on the first segment; the
        # carried-over world pose after a restart/relocalization)
        window, slot0 = win_mod.add_keyframe(
            window, self._first_pyr[0], anchor,
            jnp.zeros(2, jnp.float32),
            jnp.asarray(self._anchor_kf, jnp.int32),
        )
        window = window.replace(ba=ba_mod.anchor_first_frame(window.ba, 0, cfg))
        # KF1 at the initializer pose (relative to KF0)
        window, slot1 = win_mod.add_keyframe(
            window, pyr[0], ist.T.compose(anchor), ist.ab,
            jnp.asarray(self.frame_idx, jnp.int32),
        )
        # activate the initializer's points, hosted in slot0
        v0 = ist.valid[0]
        window = win_mod.add_points(window, slot0, ist.uv, ist.idepth, v0, cfg)
        new_ba, _ = ba_mod.run_ba(window.ba, window.images, cam, cfg)
        new_ba = ba_mod.update_residual_status(new_ba, window.images, cam, cfg)
        self._window = window.replace(ba=new_ba)
        self._place_on_mesh()

        self._kf_slot = int(slot1)
        self._kf_id = self.frame_idx
        self._win_count = 2
        self._pending_marg = None
        self._push_recent_row(jnp.asarray(int(slot1), jnp.int32))
        self._kf_pyr = pyr
        self._kf_grad0_prev = self._first_pyr[0]
        self._kf_ab = ist.ab
        self._sync_kf_poses()
        self._rebuild_tracker_ref()

        # seed immature candidates on the new keyframe
        rho_lo, rho_hi = _working_rho_range(self._window.ba, cfg)
        self._immature = _seed_new_immatures(
            self._immature, jnp.asarray(self._kf_slot), pyr[0],
            rho_lo, rho_hi, cfg,
        )

        self._T_prev = self._kf_T
        self._T_curr = self._kf_T
        self._kf_exposure = getattr(self, "_cur_exposure", None)
        self._record(timestamp, self._kf_id, SE3.identity())
        self._set_abs_pose(self._kf_id, self._kf_T, keyframe=True)
        self._frames_since_kf = 0

    def _rebuild_tracker_ref(self):
        uv_l, rho_l, ok = _window_points_in_frame(
            self._window, jnp.asarray(self._kf_slot), self.cam, self.cfg
        )
        self._tracker_ref = _make_ref(
            self._kf_pyr, self.cam, uv_l, rho_l, ok, self.cfg
        )
        # cached reference point count for the KF point-ratio rule (one
        # sync per keyframe instead of one per frame)
        self._n_ref = max(int(jnp.sum(self._tracker_ref.valid[0])), 1)

    def _track_frame(self, pyr, img, timestamp, T_seed: SE3 | None = None,
                     use_seed_dev=None) -> dict:
        """Per-frame tracking: ONE fused device program (_frame_step) does
        motion-model prediction, track, on-device suspect test + conditional
        recovery battery, pose gating, and immature tracing. The host fetches
        a small scalar bundle to run the keyframe/failure state machine —
        immediately in sequential mode, one frame later in pipelined mode
        (so the device queue never drains; see _frame_step docstring for the
        measured dispatch-latency rationale)."""
        cfg, cam = self.cfg, self.cam
        # complete the previous keyframe's async marginalization BEFORE
        # dispatching this frame once the pieces are >= 2 frames old — a
        # deterministic completion point (checkpoint-resume replays
        # identically) that gives the keyframe event's program queue time
        # to drain so the completion fetch finds the pieces ready
        self._complete_pending_marg(min_age=2)
        # `use_seed_dev` lets a subclass gate the seed with a DEVICE scalar
        # (e.g. the hybrid's PnP inlier test riding its result bundle) so
        # no host fetch is needed before dispatch. np scalars/arrays here
        # (not jnp) — an eager jnp op is a ~100 ms tunnel round trip, while
        # numpy operands upload as part of the jit call itself
        use_seed = (np.bool_(T_seed is not None) if use_seed_dev is None
                    else use_seed_dev)
        seed = T_seed if T_seed is not None else _SE3_ID
        exp = getattr(self, "_cur_exposure", None)
        a0 = 0.0
        if exp and getattr(self, "_kf_exposure", None):
            a0 = float(np.log(exp / self._kf_exposure))
        with self.sheet.timer("time_track").frame(self.frame_idx):
            imm2, T_world, T_rel, ab, scalars = _frame_step(
                pyr, cam, self._tracker_ref, self._immature,
                self._window.ba.T, self._window.ba.frame_valid,
                self._kf_T, self._T_curr, self._T_prev,
                seed, use_seed, self._recent_rows,
                np.asarray([a0, 0.0], np.float32), cfg,
            )
        self._immature = imm2
        self._T_prev = self._T_curr
        self._T_curr = T_world
        entry = {
            "frame_idx": self.frame_idx, "ts": timestamp, "pyr": pyr,
            "T_world": T_world, "T_rel": T_rel, "ab": ab,
            "scalars": scalars, "kf_id": self._kf_id,
            "exposure": exp, "gt": self._cur_gt,
        }
        entry.update(self._entry_extras())
        if self.pipelined:
            self._pending.append(entry)
            if len(self._pending) > 1:
                out = self._finalize_frame(self._pending.pop(0))
                self.stats.append(out)
                # adaptive depth: fall back to lag-0 when tracking shows
                # stress (failed pose / recovery battery fired) so the state
                # machine reacts with fresh — not speculative — state;
                # healthy frames keep the pipeline full. (KF events don't
                # flush: the one in-flight frame just tracks the previous
                # reference, and its stale flow score is ignored for the
                # next KF decision — see stale_ref in _finalize_frame.)
                if not out.get("ok", True) or out.get("suspect", False):
                    self._flush_pending()
                return out
            return {"state": "TRACKING", "ok": True, "kf": False,
                    "pending": True}
        out = self._finalize_frame(entry)
        self.stats.append(out)
        return out

    def _finalize_frame(self, entry: dict) -> dict:
        """Consume one frame's device results: record the pose, run the
        failure counter / LOST transition, decide and execute the keyframe
        event (reference: the scalar tail of Hybrid.cpp:167 processFrame)."""
        cfg = self.cfg
        fidx, timestamp, pyr = entry["frame_idx"], entry["ts"], entry["pyr"]
        sc = entry.get("scalars_np")   # a subclass may have pre-fetched the
        if sc is None:                 # bundle in a combined per-frame RPC
            sc = jax.device_get(entry["scalars"])
        rel_R = sc[11:20].reshape(3, 3).astype(np.float64)
        rel_t = sc[20:23].astype(np.float64)
        num_valid = int(sc[0])
        saturated = float(sc[1])
        flow = float(sc[2])
        energy = float(sc[3])
        pose_ok = bool(sc[4] > 0.5) and bool(
            np.all(np.isfinite(rel_t)) and np.all(np.isfinite(rel_R)))
        self._record(timestamp, entry["kf_id"],
                     (np.asarray(rel_R), np.asarray(rel_t)), frame_idx=fidx,
                     gt=entry.get("gt"))
        if pose_ok:
            self._track_fails = 0
        else:
            self._track_fails += 1
            log.warn("direct tracking failed (%d valid points, fail #%d)",
                     num_valid, self._track_fails)
            if self._track_fails >= cfg.max_track_fails:
                # record (but do not act on) any in-flight speculative
                # frames so the trajectory stays complete, then drop them:
                # the segment is over
                for e in self._pending:
                    e_sc = jax.device_get(e["scalars"])
                    self._record(e["ts"], e["kf_id"],
                                 (e_sc[11:20].reshape(3, 3),
                                  e_sc[20:23]), frame_idx=e["frame_idx"],
                                 gt=e.get("gt"))
                self._pending.clear()
                return self._on_tracking_lost(pyr, timestamp)

        self._frames_since_kf += 1
        # KF triggers: the reference's resolution-normalized flow score
        # (computed on device in _frame_step), staleness, and a tracked-
        # point-ratio rule — during fast turns the reference set leaves the
        # field of view within a few frames and flow alone reacts too late
        # (reference: directNeedNewKeyFrame flow+brightness,
        # direct/Tracking.cpp:28-41; the ratio rule is
        # indirectNeedNewKeyFrame's ORB-SLAM-style refKF criterion applied
        # to the direct point set)
        kf_score = float(sc[9])
        n_ref = max(int(sc[10]), 1)
        # a pipelined in-flight frame tracked against a reference that a
        # JUST-created keyframe has since replaced carries a stale flow
        # score (relative to the old ref) — acting on it created a spurious
        # second keyframe one frame after every real one (round 4: halved
        # the window lifetime and bled the point population)
        stale_ref = entry["kf_id"] != self._kf_id
        need_kf = pose_ok and not stale_ref and (
            cfg.kf_flow_weight * kf_score > cfg.kf_flow_threshold
            or self._frames_since_kf >= 8
            or num_valid < cfg.kf_point_ratio * n_ref
        )
        out = {
            "state": "TRACKING",
            "flow": flow,
            "energy": energy,
            "num_valid": num_valid,
            "kf": bool(need_kf),
            "ok": pose_ok,
            # statistics feeding the MOD-SLAM decision logic (Research.cpp):
            # rotational covariance tail + saturated-residual ratio
            "cov_rot_diag": np.asarray(sc[6:9]),
            "saturated": saturated,
            "suspect": bool(sc[5] > 0.5),
            "motion": (float(sc[25]), float(sc[26])),
        }
        self._last_track_ab = sc[23:25]   # rides in the bundle — no fetch
        if need_kf:
            with self.sheet.timer("time_keyframe").frame(fidx):
                self._make_keyframe(pyr, entry["ab"], timestamp,
                                    T_new=entry["T_world"], frame_idx=fidx,
                                    exposure=entry.get("exposure"))
        for k in ("flow", "energy", "num_valid", "saturated"):
            self.sheet.push(k, fidx, out[k])
        return out

    def _entry_extras(self) -> dict:
        """Subclass hook: extra device handles to carry in a frame's
        pending entry (the hybrid stashes its ORB features + PnP results
        here so its per-frame scalar tail can run at FINALIZE time — one
        frame later in pipelined mode, when the fetches are free)."""
        return {}

    def _flush_pending(self) -> list[dict]:
        """Finalize every in-flight pipelined frame (end of stream, or
        before any consumer that needs the full trajectory)."""
        outs = []
        while self._pending:
            out = self._finalize_frame(self._pending.pop(0))
            self.stats.append(out)
            outs.append(out)
        self._complete_pending_marg()
        return outs

    # -- failure handling -----------------------------------------------------

    def _on_tracking_lost(self, pyr, timestamp) -> dict:
        """Consecutive-failure limit hit: try relocalization (subclasses);
        else enter LOST and keep retrying for a grace window before a blind
        restart or stop (reference: restartOrStop AbstractSlam.cpp:98-104 —
        restart while young, stop when mature; a library runtime defaults
        to restarting; the grace window gives BoW relocalization its
        chance once good frames return)."""
        if self._attempt_relocalization(pyr, timestamp):
            log.important("relocalized at frame %d", self.frame_idx)
            return {"state": self.state, "ok": True, "relocalized": True,
                    "kf": False}
        if self.cfg.stop_on_lost:
            log.important("tracking lost at frame %d: stopping", self.frame_idx)
            self.stopped = True
            return {"state": "STOPPED", "ok": False, "kf": False}
        log.important("tracking lost at frame %d: entering LOST",
                      self.frame_idx)
        self.state = "LOST"
        self._lost_frames = 0
        return {"state": "LOST", "ok": False, "kf": False}

    def _process_lost(self, pyr, timestamp) -> dict:
        """One frame in the LOST state: hold the last pose (no constant-
        velocity hallucination), retry relocalization, restart after the
        grace window."""
        self._record(timestamp, self._kf_id,
                     self._T_curr.compose(self._kf_T.inverse()))
        if self._attempt_relocalization(pyr, timestamp):
            log.important("relocalized at frame %d", self.frame_idx)
            return {"state": self.state, "ok": True, "relocalized": True,
                    "kf": False}
        self._lost_frames += 1
        if self._lost_frames >= self.cfg.lost_grace_frames:
            self._restart_segment(pyr, timestamp, self._T_curr)
            return {"state": self.state, "ok": False, "kf": False,
                    "restarted": True}
        return {"state": "LOST", "ok": False, "kf": False}

    def _attempt_relocalization(self, pyr, timestamp) -> bool:
        """No relocalization machinery in the direct-only runtime (the
        hybrid overrides this with BoW retrieval + EPnP)."""
        return False

    def _restart_segment(self, pyr, timestamp, anchor: SE3):
        """Restart the map in a fresh segment anchored at `anchor`: the
        current frame becomes the new first frame; the trajectory records
        continue seamlessly (composed through the anchor keyframe)."""
        self.segments += 1
        self._pending.clear()
        self._pending_marg = None
        self._win_count = 0
        self._recent_rows = jnp.full_like(self._recent_rows, -1)
        log.important("restarting map: segment %d anchored at frame %d",
                      self.segments, self.frame_idx)
        anchor = anchor.normalized()
        cfg = self.cfg
        self._window = None
        self._tracker_ref = None
        self._immature = empty_immatures(cfg.max_frames, cfg.points_per_kf)
        self._init_state = set_first(pyr, self.cam, cfg)
        self._first_pyr = pyr
        self._first_ts = timestamp
        self.state = "INIT"
        self._track_fails = 0
        self._frames_since_kf = 0
        self._restart_anchor = anchor
        self._anchor_kf = self.frame_idx
        self._kf_id = self.frame_idx
        self._T_prev = anchor
        self._T_curr = anchor
        # this frame becomes the segment anchor: absolute pose in the map
        self._set_abs_pose(self.frame_idx, anchor)

    def _make_keyframe(self, pyr, ab, timestamp, T_new: SE3 | None = None,
                       frame_idx: int | None = None,
                       exposure: float | None = None):
        """Keyframe event. `T_new`/`frame_idx` identify the promoted frame
        (they default to the current tracking state; the pipelined finalize
        passes the lagged frame's own pose and index)."""
        cfg, cam = self.cfg, self.cam
        if T_new is None:
            T_new = self._T_curr
        if frame_idx is None:
            frame_idx = self.frame_idx
        # finish any in-flight marginalization first: its pieces were
        # dispatched at the previous keyframe event and have had >= 1 frame
        # of tracking to complete, so the fetch is (nearly) free — and it
        # guarantees the window has a free slot for the insert below
        self._complete_pending_marg()
        window = self._window

        # activate mature immature candidates into the BA FIRST
        # (activatePoints): their depths are constrained by every frame
        # traced since creation, not by a single adjacent-frame pair
        window, self._immature = _activate_and_clear(window, self._immature,
                                                     cfg)

        if ab is None:
            ab = np.asarray(
                getattr(self, "_last_track_ab", np.zeros(2, np.float32)))
        ab_rel = ab                   # promoted frame's ab vs the OLD ref
        window, slot, energy, T_kf, ab_new = _kf_insert_and_ba(
            window, pyr[0], T_new, self._kf_ab, ab_rel,
            np.int32(frame_idx), cam, cfg,
        )

        self._window = window
        self._win_count += 1
        self._kf_grad0_prev = self._kf_pyr[0]
        self._kf_pyr = pyr
        self._kf_slot = slot          # device scalar — never fetched here
        self._kf_id = frame_idx
        self._kf_ab = ab_new
        self._kf_T = T_kf             # optimized pose, device-resident
        self._kf_exposure = (exposure if exposure is not None
                             else getattr(self, "_cur_exposure", None))
        self._frames_since_kf = 0
        # the frame's map entry is marked KEYFRAME now; its absolute
        # optimized pose (and all window keyframe poses) are written by the
        # LAZY _sync_kf_poses at export/error/checkpoint time — per-KF
        # fetching of window poses was a measured ~100 ms of blocking
        # transfers per event through the tunnel
        i = self._fid2map.get(frame_idx)
        if i is not None:
            self.map.set_keyframe(i)
            self.map.f_group[i] |= np.uint32(
                self.map.groups.frame_group("DIRECTKEYFRAME"))
        # tracking continuity: current pose snaps to the optimized KF pose
        if not self._pending:
            self._T_curr = self._kf_T
        # rebuild tracker reference + seed new immatures, one fused program
        self._tracker_ref, self._immature = _refresh_after_kf(
            window, slot, pyr, self._immature, cam, cfg)
        self._push_recent_row(slot)
        if self._pending:
            # pipelined mode: frames dispatched before this event tracked
            # the OLD reference — re-track them against the fresh one (see
            # _retrack_step; at lag-1 this is one extra ~8 ms device
            # program per keyframe, no host block) and rebase the
            # speculative motion-model chain on the refreshed poses
            T_prev_w = self._kf_T
            for e in self._pending:
                T_w, T_r, ab2, sc = _retrack_step(
                    e["pyr"], cam, self._tracker_ref,
                    self._kf_T, e["T_world"], e["ab"], ab_rel, cfg)
                self._T_prev = T_prev_w
                e.update(T_world=T_w, T_rel=T_r, ab=ab2, scalars=sc,
                         kf_id=self._kf_id)
                T_prev_w = T_w
            self._T_curr = T_prev_w

        # window full after the insert: start the ASYNC marginalization now
        # (reference order — directMap runs BA, then tryMarginalize,
        # direct/Mapping.cpp:47; the result lands before the next keyframe)
        if self._win_count >= cfg.max_frames:
            self._start_async_marg()

    def _place_on_mesh(self):
        """Shard the window's point arena over the mesh (no-op without
        one). Called once per window creation; XLA propagates the layout
        through all subsequent jitted updates."""
        if self.mesh is None or self._window is None:
            return
        from libcml_tpu.parallel import sharding as sh

        ba = self._window.ba
        self._window = self._window.replace(
            ba=sh.shard_ba_state(ba, self.mesh))

    def _push_recent_row(self, slot):
        """Record `slot` (device scalar ok) as the most recently seeded
        immature row; the tracer only sweeps these (trace_immatures_rows)."""
        self._recent_rows = _push_row(self._recent_rows, slot)

    # -- asynchronous marginalization -----------------------------------------

    def _start_async_marg(self):
        """Dispatch the device half of frame marginalization (slot choice +
        linearize/contract) WITHOUT blocking; the host f64 Schur completes
        at the next keyframe event (or flush), by which time the device
        result is long ready. Hides the dominant keyframe-event line item
        (~127 ms measured) behind subsequent frames' tracking."""
        window = self._window
        slot_dev = _choose_marg_slot(
            window, jnp.asarray(self._kf_slot))
        pieces = ba_mod._marg_pieces(window.ba, window.images, self.cam,
                                     self.cfg, slot_dev)
        self._pending_marg = (pieces, slot_dev, self.frame_idx)

    def _complete_pending_marg(self, min_age: int = 0):
        """Finish the in-flight marginalization. `min_age` > 0 defers
        completion until the device pieces have had that many frames to
        compute (the keyframe event queues ~110 ms of programs ahead of
        them; completing one frame later was measured waiting ~200 ms per
        keyframe for the queue to drain)."""
        if self._pending_marg is None:
            return
        pieces, slot_dev, born = self._pending_marg
        if self.frame_idx - born < min_age:
            return
        self._pending_marg = None
        slot = int(jax.device_get(slot_dev))
        packed, hosted = ba_mod.marg_host_schur(pieces, slot, self.cfg)
        self._window, self._immature = _marg_finish(
            self._window, self._immature, jnp.asarray(packed), hosted,
            jnp.asarray(slot), self.cfg)
        self._win_count -= 1

    # -- checkpoint / resume --------------------------------------------------

    _CKPT_SCALARS = (
        "state", "frame_idx", "segments", "stopped", "_anchor_kf",
        "_kf_slot", "_kf_id", "_frames_since_kf", "_track_fails",
        "_lost_frames", "_fid2map", "_first_ts", "_win_count",
        "_kf_exposure",
    )
    _CKPT_PYTREES = (
        "_window", "_immature", "_init_state", "_first_pyr", "_kf_pyr",
        "_kf_grad0_prev", "_kf_T", "_kf_ab", "_T_prev", "_T_curr",
        "_restart_anchor", "_recent_rows",
    )

    def _ckpt_extra(self) -> dict:
        """Subclass hook: additional host state to checkpoint."""
        return {}

    def _ckpt_restore_extra(self, extra: dict) -> None:
        pass

    def save_state(self, path: str) -> None:
        """Serialize the full SLAM state — arenas, window, map, host scalars
        — so a run can resume mid-sequence (SURVEY.md §5 'cheap win': the
        SoA arenas are trivially serializable; the reference has no SLAM-
        state checkpointing at all, only experiment-level caching)."""
        import pickle

        # finalize any in-flight pipelined frames first: a checkpoint that
        # silently dropped the speculative frame would resume one frame
        # short of the uninterrupted run (ADVICE r4)
        self._flush_pending()

        def to_np(tree):
            return jax.tree.map(np.asarray, tree) if tree is not None else None

        payload = {
            "scalars": {k: getattr(self, k, None) for k in self._CKPT_SCALARS},
            "pytrees": {k: to_np(getattr(self, k, None))
                        for k in self._CKPT_PYTREES},
            "map": self.map,
            "extra": self._ckpt_extra(),
            # in-flight async marginalization rides along verbatim so the
            # resumed run completes it at exactly the frame the
            # uninterrupted run would have (bit-faithful resume)
            "pending_marg": None if self._pending_marg is None else (
                to_np(self._pending_marg[0]),
                int(self._pending_marg[1]),
                self._pending_marg[2],
            ),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def load_state(self, path: str) -> None:
        """Restore a checkpoint written by save_state into this instance
        (which must share cam + cfg). Device-side pytrees are re-uploaded;
        the tracker reference is rebuilt from the window."""
        import pickle

        with open(path, "rb") as f:
            payload = pickle.load(f)
        for k, v in payload["scalars"].items():
            setattr(self, k, v)
        for k, v in payload["pytrees"].items():
            setattr(
                self, k,
                jax.tree.map(jnp.asarray, v) if v is not None else None,
            )
        self.map = payload["map"]
        self._place_on_mesh()
        pm = payload.get("pending_marg")
        self._pending_marg = None if pm is None else (
            jax.tree.map(jnp.asarray, pm[0]), jnp.asarray(pm[1]),
            pm[2] if len(pm) > 2 else self.frame_idx)
        self._ckpt_restore_extra(payload["extra"])
        if self._window is not None:
            self._rebuild_tracker_ref()

    # -- outputs ---------------------------------------------------------------

    def trajectory_c2w(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps (N,), poses (N, 4, 4) camera-to-world) from the map
        (deform-composed with the final optimized keyframe poses)."""
        self._flush_pending()
        if self._window is not None:
            self._sync_kf_poses()
        return self.map.trajectory_c2w()

    def live_error(self) -> dict | None:
        """Scale-corrected ATE/RPE against stored groundtruth, from the map
        (reference: Map::refreshErrorFromGroundtruth, Map.cpp:578)."""
        self._flush_pending()
        if self._window is not None:
            self._sync_kf_poses()
        return self.map.refresh_error_from_groundtruth()

    def export_results(self, out_dir: str, prefix: str = "result"):
        """Five-file trajectory export via the map (reference:
        Map::exportResults, modslam.cpp:393-410)."""
        self._flush_pending()
        if self._window is not None:
            self._sync_kf_poses()
        self.map.export_results(out_dir, prefix)
