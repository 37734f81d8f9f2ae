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
    trace_points,
)
from libcml_tpu.models.direct.tracker import (
    TrackResult,
    make_tracker_ref,
    motion_hypotheses,
    track,
    track_multi,
)
from libcml_tpu.ops.image import bilinear, build_gradient_pyramid
from libcml_tpu.runtime.stats import StatsSheet
from libcml_tpu.utils import logging as log


# ---------------------------------------------------------------------------
# Jitted device programs (config is static → one compile per config)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_levels",))
def _preprocess(image: jax.Array, num_levels: int):
    return build_gradient_pyramid(image, num_levels)


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
    ab_new,
    frame_id,
    cam,
    cfg: DirectConfig,
):
    """Insert keyframe + run windowed photometric BA + outlier ejection —
    one compiled program per keyframe event. (Point activation happens
    separately from the immature arena, before this call.)"""
    window, slot = win_mod.add_keyframe(window, grad0, T_new, ab_new, frame_id)
    # fresh Jacobians once per keyframe event (prior shifted exactly)
    window = window.replace(ba=ba_mod.relinearize(window.ba))
    new_ba, energy = ba_mod.run_ba(window.ba, window.images, cam, cfg)
    new_ba = ba_mod.update_residual_status(new_ba, window.images, cam, cfg)
    return window.replace(ba=new_ba), slot, energy


def _marginalize(window: win_mod.Window, latest_slot, cam, cfg: DirectConfig):
    """Host-driven: slot choice on device, prior algebra in f64 on host
    (ba.marginalize_frame_f64 — the f32 Schur noise at ~1e10 magnitude
    otherwise drifts the monocular scale ~10% per marginalization)."""
    slot = int(win_mod.choose_marginalization_slot(window, latest_slot))
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

    def __init__(self, cam: PinholeCamera, cfg: DirectConfig | None = None,
                 depth_prior=None):
        self.cam = cam
        self.cfg = cfg or DirectConfig()
        # optional neural inverse-depth prior for initialization
        # (reference: NN::Precomputed / Midas seeding of DSOInitializer,
        # Hybrid.cpp:469-473); callable (image, frame_idx, path) -> map|None
        self.depth_prior = depth_prior
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

        # trajectory bookkeeping: frame -> (timestamp, kf_id, T_rel f<-kf)
        self._records: list[tuple[float, int, np.ndarray, np.ndarray]] = []
        # kf_id -> latest known world->cam pose (4x4 np), frozen at marg time
        self._kf_poses: dict[int, np.ndarray] = {}
        self.stats: list[dict] = []
        # per-phase timers + named statistic streams (reference:
        # StatisticTimer/StatisticsSheet, Statistic.h:97,123 — ~35 named
        # stats across modules; surfaced via sheet.to_csv / STAT lines)
        self.sheet = StatsSheet()
        self._track_fails = 0

    # -- helpers ------------------------------------------------------------

    def _record(self, ts: float, kf_id: int, T_rel: SE3):
        self._records.append(
            (ts, kf_id, np.asarray(T_rel.R), np.asarray(T_rel.t))
        )

    def _sync_kf_poses(self):
        """Pull optimized keyframe poses out of the window (host copies)."""
        w = self._window
        fids = np.asarray(w.frame_id)
        valid = np.asarray(w.ba.frame_valid)
        R = np.asarray(w.ba.T.R)
        t = np.asarray(w.ba.T.t)
        for s in range(len(fids)):
            if valid[s] and fids[s] >= 0:
                M = np.eye(4)
                M[:3, :3] = R[s]
                M[:3, 3] = t[s]
                self._kf_poses[int(fids[s])] = M
        # refresh the latest-KF pose used for composing tracked poses
        s = self._kf_slot
        self._kf_T = SE3(R=jnp.asarray(R[s]), t=jnp.asarray(t[s]))

    # -- main entry ----------------------------------------------------------

    def process(self, image, timestamp: float) -> dict:
        """Feed one grayscale frame (H, W) in ~[0, 255]. Returns a stats dict."""
        self.frame_idx += 1
        log.set_frame(self.frame_idx)
        img = jnp.asarray(image, jnp.float32)
        with self.sheet.timer("time_preprocess").frame(self.frame_idx):
            pyr = _preprocess(img, self.cfg.num_levels)

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
            self._record(timestamp, 0, SE3.identity())
            self._kf_poses[0] = np.eye(4)
            return {"state": self.state}

        if self.state == "INIT":
            res = _try_init(self._init_state, pyr, self.cam, self.cfg)
            self._init_state = res.state
            if bool(res.success):
                self._promote_initialization(pyr, timestamp)
                self.state = "TRACKING"
            else:
                # provisional pose straight from the initializer estimate
                self._record(timestamp, 0, res.state.T)
            return {"state": self.state, "init_energy": float(res.energy)}

        return self._track_frame(pyr, img, timestamp)

    # -- phases ---------------------------------------------------------------

    def _promote_initialization(self, pyr, timestamp):
        cfg, cam = self.cfg, self.cam
        ist, _scale = normalize_scale(self._init_state)

        window = win_mod.empty_window(cfg, cam.height, cam.width)
        # KF0 at identity
        window, slot0 = win_mod.add_keyframe(
            window, self._first_pyr[0], SE3.identity(),
            jnp.zeros(2, jnp.float32), jnp.asarray(0, jnp.int32),
        )
        window = window.replace(ba=ba_mod.anchor_first_frame(window.ba, 0, cfg))
        # KF1 at the initializer pose
        window, slot1 = win_mod.add_keyframe(
            window, pyr[0], ist.T, ist.ab, jnp.asarray(self.frame_idx, jnp.int32),
        )
        # activate the initializer's points, hosted in slot0
        v0 = ist.valid[0]
        window = win_mod.add_points(window, slot0, ist.uv, ist.idepth, v0, cfg)
        new_ba, _ = ba_mod.run_ba(window.ba, window.images, cam, cfg)
        new_ba = ba_mod.update_residual_status(new_ba, window.images, cam, cfg)
        self._window = window.replace(ba=new_ba)

        self._kf_slot = int(slot1)
        self._kf_id = self.frame_idx
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
        self._record(timestamp, self._kf_id, SE3.identity())
        self._frames_since_kf = 0

    def _rebuild_tracker_ref(self):
        uv_l, rho_l, ok = _window_points_in_frame(
            self._window, jnp.asarray(self._kf_slot), self.cam, self.cfg
        )
        self._tracker_ref = _make_ref(
            self._kf_pyr, self.cam, uv_l, rho_l, ok, self.cfg
        )

    def _track_frame(self, pyr, img, timestamp, T_seed: SE3 | None = None
                     ) -> dict:
        cfg, cam = self.cfg, self.cam
        # constant-velocity prediction: T_pred = (T_curr T_prev^-1) T_curr;
        # an external seed (e.g. the hybrid's PnP pose) replaces the
        # prediction in the hypothesis battery but leaves the velocity
        # model itself untouched
        T_delta = self._T_curr.compose(self._T_prev.inverse())
        T_pred = T_delta.compose(self._T_curr)
        if T_seed is not None:
            T_pred = T_seed
        T_init = T_pred.compose(self._kf_T.inverse())
        T_zero = self._T_curr.compose(self._kf_T.inverse())

        with self.sheet.timer("time_track").frame(self.frame_idx):
            res = _track_multi(pyr, cam, self._tracker_ref, T_init, T_zero,
                               jnp.zeros(2, jnp.float32), cfg)

        num_valid = int(res.num_valid)
        pose_ok = num_valid >= 24 and bool(
            np.all(np.isfinite(np.asarray(res.T_ji.t)))
        )
        if pose_ok:
            T_world = res.T_ji.compose(self._kf_T)
            self._track_fails = 0
        else:
            # tracking failure: fall back to the motion-model prediction and
            # freeze the velocity (reference: tracking-failure counter +
            # recovery path, Hybrid.cpp:214-222)
            T_world = T_pred
            self._track_fails += 1
            log.warn("direct tracking failed (%d valid points, fail #%d)",
                     num_valid, self._track_fails)
        self._T_prev = self._T_curr
        self._T_curr = T_world
        self._record(timestamp, self._kf_id,
                     T_world.compose(self._kf_T.inverse()))

        # trace all immature candidates against this frame (traceNewCoarse —
        # every frame narrows the intervals, keyframe or not)
        if pose_ok:
            self._immature = _trace_immatures(
                self._immature, self._window.ba.T, self._window.ba.frame_valid,
                pyr[0], T_world, cam, cfg,
            )

        flow = float(res.flow)
        energy = float(res.energy)
        self._frames_since_kf += 1
        need_kf = pose_ok and (
            cfg.kf_flow_weight * flow > cfg.kf_flow_threshold
            or self._frames_since_kf >= 8
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
            "cov_rot_diag": np.diag(np.asarray(res.cov_pose))[3:],
            "saturated": float(res.saturated),
        }
        self._last_track_ab = np.asarray(res.ab)
        if need_kf:
            with self.sheet.timer("time_keyframe").frame(self.frame_idx):
                self._make_keyframe(pyr, res, timestamp)
        for k in ("flow", "energy", "num_valid", "saturated"):
            self.sheet.push(k, self.frame_idx, out[k])
        self.stats.append(out)
        return out

    def _make_keyframe(self, pyr, res: TrackResult, timestamp):
        cfg, cam = self.cfg, self.cam
        window = self._window

        # activate mature immature candidates into the BA FIRST
        # (activatePoints): their depths are constrained by every frame
        # traced since creation, not by a single adjacent-frame pair; doing
        # this before marginalization lets a to-be-dropped host's mature
        # candidates survive as map points
        ready, rho_mid = mature_mask(self._immature, cfg)
        ready_np = np.asarray(jnp.any(ready, axis=1))
        for f in range(cfg.max_frames):
            if ready_np[f]:
                window = _activate_points(
                    window, jnp.asarray(f), self._immature.uv[f],
                    rho_mid[f], ready[f], cfg,
                )
        self._immature = self._immature.replace(
            valid=self._immature.valid & ~ready
        )

        # keep the window under budget (marginalize BEFORE insert, reference:
        # flagFramesForMarginalization runs so the insert always has a slot);
        # immature candidates hosted in a marginalized slot die with it
        while int(win_mod.num_valid_frames(window)) >= cfg.max_frames:
            window, mslot = _marginalize(
                window, jnp.asarray(self._kf_slot), cam, cfg
            )
            self._immature = self._immature.replace(
                valid=self._immature.valid.at[int(mslot)].set(False)
            )

        T_new = self._T_curr
        ab = res.ab if res is not None else jnp.asarray(
            getattr(self, "_last_track_ab", np.zeros(2, np.float32))
        )
        ab_new = self._kf_ab + ab
        window, slot, energy = _kf_insert_and_ba(
            window, pyr[0], T_new, ab_new,
            jnp.asarray(self.frame_idx, jnp.int32), cam, cfg,
        )

        self._window = window
        self._kf_grad0_prev = self._kf_pyr[0]
        self._kf_pyr = pyr
        self._kf_slot = int(slot)
        self._kf_id = self.frame_idx
        self._kf_ab = ab_new
        self._frames_since_kf = 0
        self._sync_kf_poses()
        # tracking continuity: current pose snaps to the optimized KF pose
        self._T_curr = self._kf_T
        self._rebuild_tracker_ref()

        # seed fresh immature candidates on the new keyframe (makeNewTraces)
        rho_lo, rho_hi = _working_rho_range(window.ba, cfg)
        self._immature = _seed_new_immatures(
            self._immature, jnp.asarray(self._kf_slot), pyr[0],
            rho_lo, rho_hi, cfg,
        )
        # rewrite this frame's record to be keyframe-anchored at identity
        self._records[-1] = (
            timestamp, self._kf_id,
            np.asarray(SE3.identity().R), np.asarray(SE3.identity().t),
        )

    # -- outputs ---------------------------------------------------------------

    def trajectory_c2w(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps (N,), poses (N, 4, 4) camera-to-world), deform-composed
        with the final optimized keyframe poses."""
        if self._window is not None:
            self._sync_kf_poses()
        ts, poses = [], []
        for t, kf_id, R_rel, t_rel in self._records:
            kf = self._kf_poses.get(kf_id, np.eye(4))
            M = np.eye(4)
            M[:3, :3] = R_rel
            M[:3, 3] = t_rel
            w2c = M @ kf
            poses.append(np.linalg.inv(w2c))
            ts.append(t)
        return np.asarray(ts), np.asarray(poses)
