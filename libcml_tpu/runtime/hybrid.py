"""MOD-SLAM hybrid odometry: direct (DSO-style) spine + indirect (ORB-style)
pipeline with per-frame uncertainty-based mode selection.

TPU-native replacement for the reference's Hybrid orchestrator
(reference: src/cml/slam/modslam/Hybrid.{h,cpp} — Hybrid.h:47, processFrame
Hybrid.cpp:167: init -> pose-estimation decision -> track (DSO-first or
ORB-first) -> failure counting/restart -> KF decisions -> BA-mode decision ->
direct/indirect postprocess; indirect/Tracking.cpp:82
indirectTrackWithCMLGraph + :413 indirectTrackLocalMap; indirect/Mapping.cpp
indirectMap — triangulation of new immatures, local BA, culling;
Research.cpp decision logic).

TPU-first architecture:
  - The DIRECT pipeline (DirectOdometry) stays the spine: pyramid, tracker,
    tracer, windowed photometric BA all run as the jitted device programs of
    runtime/odometry.py.
  - The INDIRECT pipeline lives in fixed-capacity arenas: an ORB feature set
    per frame (device), a world-point map arena (host SoA, device mirror),
    and an observation ring for local BA. Matching is the dense masked
    Hamming matrix (models/indirect/matching.py) — the reference's BoW-node/
    grid pruning collapses into constraint masks.
  - Decisions (Research.cpp) are host scalar logic over statistics the
    device programs already emit: tracker covariance + saturation, PnP
    covariance + inlier counts.
  - The reference's separate mapping THREADS (Hybrid.cpp:103-110 + bounded
    queues) become synchronous calls: device programs are already async
    w.r.t. the host (XLA dispatch), so the pipeline parallelism the threads
    bought is provided by the runtime itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.direct import ba as ba_mod
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.hybrid.decision import (
    BundleAdjustmentDecision,
    DecisionConfig,
    Mode,
    PoseEstimationDecision,
)
from libcml_tpu.models.indirect import indirect_ba as iba
from libcml_tpu.models.indirect.matching import (
    match_epipolar,
    match_projection,
    orientation_check,
)
from libcml_tpu.models.indirect.orb import extract_orb
from libcml_tpu.models.indirect.pnp import solve_pnp, triangulate_linear
from libcml_tpu.models.indirect.triangulation import optimal_correct
from libcml_tpu.ops.image import build_pyramid
from libcml_tpu.runtime.checker import CameraChecker
from libcml_tpu.runtime.odometry import (
    DirectOdometry,
    pack_refs,
    unpack_refs,
    upload_packed,
)

# arena capacities (static shapes; reference budgets: 625-2000 ORB corners,
# map grows unbounded — here a recycling arena, evaluation presets fit)
MAP_CAP = 4096
KF_RING = 6          # local-BA keyframe count (covisibility-selected)
KF_HISTORY = 48      # indirect keyframes kept for covisibility selection
OBS_PER_KF = 1024


@functools.partial(jax.jit, static_argnames=("budget", "levels"))
def _extract(img: jax.Array, budget: int, levels: int):
    pyr = build_pyramid(img, levels)
    return extract_orb(pyr, budget_per_level=budget)


_run_local_ba = jax.jit(iba.run_local_ba,
                        static_argnames=("stage1_iters", "stage2_iters"))

_run_mixed_ba = jax.jit(ba_mod.run_ba_mixed, static_argnames=("cfg",))

# jitted per-call wrappers for device functions the host driver invokes
# directly — calling the raw (traced-eager) versions costs one ~100 ms
# tunnel round trip PER PRIMITIVE (round-5 cProfile: 701 eager primitives
# in 35 steady frames = 77 s of a 101 s wall)
_match_projection = jax.jit(match_projection)


@jax.jit
def _local_map_pass2(
    Xw, desc_p, valid_p, level_p, T_refined: SE3, cam: PinholeCamera,
    feats_desc, feats_uv, feats_level, feats_valid,
):
    """SECOND local-map tracking pass (reference:
    indirect/Tracking.cpp:413-632 — indirectTrackLocalMap:
    searchLocalPoints at the refined pose -> re-optimize -> inlier count
    feeding the keyframe and failure decisions). The first pass matched at
    the PREDICTED pose before direct refinement; re-projecting the map at
    the REFINED pose recovers matches the prediction error pushed outside
    the first pass's search radius, and its motion-only PnP inlier count is
    the tracking-quality statistic the reference's decisions consume.
    Dispatch-only: the bundle rides the NEXT frame's combined fetch."""
    m, uv_p = match_projection(
        Xw, desc_p, valid_p, level_p, T_refined, cam,
        feats_desc, feats_uv, feats_level, feats_valid,
        radius=9.0,   # tighter radius than pass 1: the pose is refined
    )
    uv_obs = feats_uv[m.idx]
    sigma2 = 1.2 ** (2.0 * feats_level[m.idx].astype(jnp.float32))
    res = solve_pnp(Xw, uv_obs, m.valid, T_refined, cam, sigma2=sigma2)
    finite = jnp.all(jnp.isfinite(res.T.t)) & jnp.all(jnp.isfinite(res.T.R))
    bundle = jnp.asarray(
        [m.num, res.num_inliers, finite], jnp.float32).reshape(-1)
    return m.valid, bundle


@functools.partial(jax.jit, static_argnames=("cfg",))
def _mixed_ba_dispatch(ba, images, cam, cfg, ind, kf_slot):
    """The ENTIRE mixed-BA device half as one program: joint photometric +
    reprojection solve, refined host-frame points, and the promoted
    keyframe's refreshed pose — the eager unproject/tree-slice tail of the
    old dispatch cost ~80 s per 4 calls in tunnel round trips.

    Also returns the window's PHOTOMETRIC-only energy before and after the
    joint solve: the joint accept/reject can legally trade photometric
    energy for reprojection energy, and a solve that degrades the
    photometric optimum degrades the TRACKING REFERENCE built from the
    window — measured round 5 as a deterministic saturated-residual
    tracking collapse two frames after a mixed event. The completion tick
    rolls the swap back when the photometric energy regressed beyond the
    guard (reference analogue: Hybrid.cpp keeps the indirect correction
    only when bundleAdjustmentDecision distrusts the photometric state)."""
    E_photo0 = ba_mod.total_energy(ba, images, cam, cfg)
    new_ba, new_ind, E = ba_mod.run_ba_mixed(ba, images, cam, cfg, ind)
    # re-anchor the linearization point at the post-mixed state (exact
    # prior shift), exactly as every other state-moving event does — the
    # mixed solve otherwise leaves the window mid-way between relinearize
    # points, and the stale-FEJ inconsistency compounds through later
    # marginalizations
    new_ba = ba_mod.relinearize(new_ba)
    E_photo1 = ba_mod.total_energy(new_ba, images, cam, cfg)
    Xh = cam.unproject(new_ind.uv, new_ind.idepth)
    kf_T = jax.tree.map(lambda x: x[kf_slot], new_ba.T)
    return new_ba, new_ind.point_valid, E, Xh, kf_T, E_photo0, E_photo1


@jax.jit
def _project_match_pnp(
    Xw, desc_p, valid_p, level_p, T_curr: SE3, T_prev: SE3,
    cam: PinholeCamera,
    feats_desc, feats_uv, feats_level, feats_angle, feats_valid,
):
    """One device program: constant-velocity pose prediction -> project map
    -> radius/level-masked Hamming match -> motion-only PnP with covariance
    (the reference's indirectTrackWithCMLGraph + IndirectCameraOptimizer,
    fused). The motion-model prediction runs INSIDE the program — composing
    it eagerly on the host cost 4 device round trips per frame (~100 ms
    each through the tunnel; round-5 cProfile).

    Also returns a flat host BUNDLE [num_matches, num_inliers, finite,
    R(9), t(3), cov_rot(3), motion_dt, motion_ang] so the runtime's scalar
    decisions cost ONE device->host RPC, and `use_seed` — the device-side
    inlier/finite gate for ORB-first seeding of the direct spine."""
    T_delta = T_curr.compose(T_prev.inverse())
    T_pred = T_delta.compose(T_curr)
    m, uv_p = match_projection(
        Xw, desc_p, valid_p, level_p, T_pred, cam,
        feats_desc, feats_uv, feats_level, feats_valid,
    )
    uv_obs = feats_uv[m.idx]
    sigma2 = 1.2 ** (2.0 * feats_level[m.idx].astype(jnp.float32))
    res = solve_pnp(Xw, uv_obs, m.valid, T_pred, cam, sigma2=sigma2)
    finite = jnp.all(jnp.isfinite(res.T.t)) & jnp.all(jnp.isfinite(res.T.R))
    cov_rot = jnp.diagonal(res.cov)[3:6]
    T_last = T_curr
    rel_R = res.T.R @ T_last.R.T
    ang = jnp.arccos(jnp.clip((jnp.trace(rel_R) - 1.0) / 2.0, -1.0, 1.0))
    dt = jnp.linalg.norm(res.T.t - rel_R @ T_last.t)
    bundle = jnp.concatenate([
        jnp.asarray([m.num, res.num_inliers], jnp.float32).reshape(-1),
        jnp.asarray([finite], jnp.float32),
        res.T.R.reshape(-1).astype(jnp.float32),
        res.T.t.reshape(-1).astype(jnp.float32),
        cov_rot.astype(jnp.float32),
        jnp.asarray([dt, ang], jnp.float32).reshape(-1),
    ])
    use_seed = (res.num_inliers >= 12) & finite
    return m, res, bundle, use_seed


@functools.partial(jax.jit, static_argnames=("optimal",))
def _epipolar_triangulate(
    desc0, uv0, valid0, angle0,
    desc1, uv1, valid1, angle1,
    T_new: SE3, T0: SE3, cam: PinholeCamera, optimal: bool = True,
):
    """Epipolar-constrained matching between two keyframes + linear
    triangulation (the reference's trackForTriangulation + createNewPoints
    path, indirect/Mapping.cpp:139-239). The relative pose T_10 and its
    baseline norm are computed INSIDE the program (host-eager SE3 algebra
    costs ~100 ms per primitive through the tunnel).

    `optimal` applies the Hartley-Sturm correction before the DLT
    (reference: Triangulation.h:141). Calib SLAM disables it: on RAW
    distorted footage the correction projects the distortion signal onto
    the assumed-pinhole epipolar constraint, biasing the distortion fit."""
    T_10 = T_new.compose(T0.inverse())
    t_norm = jnp.linalg.norm(T_10.t)
    K = cam.K()
    Kinv = jnp.linalg.inv(K)
    tx = jnp.array([
        [0.0, -T_10.t[2], T_10.t[1]],
        [T_10.t[2], 0.0, -T_10.t[0]],
        [-T_10.t[1], T_10.t[0], 0.0],
    ])
    F = Kinv.T @ tx @ T_10.R @ Kinv
    m = match_epipolar(desc0, uv0, valid0, desc1, uv1, valid1, F)
    ok = orientation_check(angle0, angle1, m.idx, m.valid)
    # optimal (Hartley-Sturm) correction before the DLT: accepted pairs are
    # moved the minimum distance onto the epipolar constraint, which the
    # reference applies in its triangulation path (reference:
    # optimization/Triangulation.h:141 triangulateOptimal)
    if optimal:
        uv0c, uv1c = optimal_correct(uv0, uv1[m.idx], F)
    else:
        uv0c, uv1c = uv0, uv1[m.idx]
    X0, tri_ok = triangulate_linear(uv0c, uv1c, T_10, cam)
    # parallax + depth sanity (reference prunes low-parallax triangulations)
    depth_ok = (X0[:, 2] > 1e-3) & (X0[:, 2] < 1e4)
    return m, X0, ok & tri_ok & depth_ok, t_norm


class HybridOdometry(DirectOdometry):
    """MOD-SLAM: DirectOdometry spine + indirect map/tracking/local-BA."""

    def __init__(
        self,
        cam: PinholeCamera,
        cfg: DirectConfig | None = None,
        dcfg: DecisionConfig | None = None,
        orb_budget: int = 512,
        orb_levels: int = 3,
        enable_indirect: bool = True,
        staged_indpost: bool = False,
        **kw,
    ):
        super().__init__(cam, cfg, **kw)
        self.dcfg = dcfg or DecisionConfig()
        self.orb_budget = orb_budget
        self.orb_levels = orb_levels
        self.enable_indirect = enable_indirect
        # EXPERIMENTAL knob: stage the indirect keyframe postprocess over
        # subsequent frames' bundle RPCs even in sequential mode (the
        # pipelined mode always stages). Motivation: completing all three
        # ticks inside the keyframe's own finalize measured 592 ms mean
        # (results_r05.json hybrid_sequential time_ind_post) because every
        # tick fetch blocks on its freshly-dispatched solver. Measured
        # round 5 on the 500-frame head-to-head, full staging LOST tracking
        # twice (late map bookkeeping starves the next frames' PnP), so the
        # staged-sequential variant keeps the bookkeeping tick synchronous
        # and stages only the BA solver ticks — still off by default until
        # its accuracy matches the synchronous path. The reference runs
        # this work on its mapping thread (Hybrid.cpp:103-110).
        self.staged_indpost = staged_indpost

        self.pose_decision = PoseEstimationDecision(self.dcfg)
        self.ba_decision = BundleAdjustmentDecision(self.dcfg)
        # pose-takeover sanity gate (reference: robust/CameraChecker.h:10)
        self.checker = CameraChecker()

        # indirect map arena (host SoA; device mirror rebuilt on change)
        self._pt_Xw = np.zeros((MAP_CAP, 3), np.float32)
        self._pt_desc = np.zeros((MAP_CAP, 8), np.uint32)
        self._pt_level = np.zeros((MAP_CAP,), np.int32)
        self._pt_valid = np.zeros((MAP_CAP,), bool)
        self._pt_last_seen = np.zeros((MAP_CAP,), np.int64)
        # slot generation: bumped whenever a slot is (re)assigned, so stored
        # observations can detect that "their" point was recycled and drop
        # themselves instead of constraining a different 3D point
        self._pt_gen = np.zeros((MAP_CAP,), np.int64)
        # SlamMap point id per arena slot (the system-of-record identity:
        # the arena recycles, the map only grows)
        self._pt_mapid = np.full((MAP_CAP,), -1, np.int64)
        self._pt_cursor = 0
        self._map_dev = None   # device mirror tuple

        # indirect keyframe ring for local BA
        self._ind_kfs: list[dict] = []
        self._last_kf_feats = None
        self._last_kf_T: SE3 | None = None
        self._last_kf_idx = -1
        self._ref_kf_tracked = 1

        # relocalization: BoW keyframe retrieval + per-keyframe feature
        # store with feature -> map-slot association (reference:
        # Relocalization.{h,cpp} + EPnP absolute pose)
        self._kfdb = None          # lazy KeyframeDatabase
        self._kfdb_pending: list[int] = []   # keyframes stored but not yet
                                             # BoW-indexed (indexing costs a
                                             # ~70 ms device round trip and
                                             # is only needed on LOST)
        self._kf_store: dict[int, dict] = {}

        self.mode_history: list[str] = []
        self._last_mode: str = Mode.DIRECT   # latest FINALIZED mode (gates
                                             # next frame's PnP seeding)
        self._pending_extras: dict | None = None
        self._indpost: dict | None = None    # in-flight staged indirect
                                             # keyframe postprocess
        self._pass2: dict | None = None      # in-flight second local-map
                                             # tracking pass (dispatched at
                                             # the refined pose; consumed in
                                             # the NEXT frame's bundle RPC)
        self._last_pass2: tuple | None = None   # (matches, inliers, fidx)

    # -- map arena ----------------------------------------------------------

    def _map_device(self):
        if self._map_dev is None:
            # one packed upload (4 separate transfers pay 4x the tunnel's
            # per-array RPC latency)
            self._map_dev = upload_packed(
                (self._pt_Xw, self._pt_desc, self._pt_valid,
                 self._pt_level))
        return self._map_dev

    def _add_map_points(self, Xw: np.ndarray, desc: np.ndarray,
                        level: np.ndarray, ok: np.ndarray):
        """Insert accepted points into the arena. Returns (slots, src):
        the arena rows written and the rows of `Xw` they came from (both
        None when nothing was inserted)."""
        idx = np.flatnonzero(ok)
        if idx.size == 0:
            return None, None
        # recycle: prefer invalid slots, then the longest-unseen (the
        # reference recycles destroyed MapPoints, Map.h:244)
        free = np.flatnonzero(~self._pt_valid)
        if free.size < idx.size:
            stale = np.argsort(self._pt_last_seen)[: idx.size - free.size]
            free = np.concatenate([free, stale])
        free = free[: idx.size]
        self._pt_Xw[free] = Xw[idx]
        self._pt_desc[free] = desc[idx]
        self._pt_level[free] = level[idx]
        self._pt_valid[free] = True
        self._pt_last_seen[free] = self.frame_idx
        self._pt_gen[free] += 1
        # register in the system-of-record map (reference: Map::createMapPoint)
        self._pt_mapid[free] = self.map.add_points(
            Xw[idx], groups=self.map.groups.point_group("INDIRECTGROUP")
        )
        self._map_dev = None
        return free, idx

    def _cull_map_points(self, max_age: int = 30):
        """Drop points unmatched for max_age frames (reference: keyframe /
        point culling, indirect/Mapping.cpp:97)."""
        stale = self._pt_valid & (
            self.frame_idx - self._pt_last_seen > max_age
        )
        if stale.any():
            self._pt_valid[stale] = False
            self._map_dev = None

    # -- per-frame ----------------------------------------------------------

    def process(self, image, timestamp, gt_pose_c2w=None,
                exposure: float | None = None):
        out = super().process(image, timestamp, gt_pose_c2w,
                              exposure=exposure)
        # ORB two-view bootstrap fallback: when the DSO initializer has not
        # converged after a while (low-texture / low-parallax starts), try
        # the ORB-SLAM-style F/H-RANSAC initializer on matched corners
        # (reference: RobustRaulmurInitializer::track — the indirect
        # bootstrap the reference keeps beside initializeWithDSO)
        if (
            self.enable_indirect
            and self.state == "INIT"
            and self.frame_idx - self._anchor_kf >= 15
            and (self.frame_idx - self._anchor_kf) % 5 == 0
        ):
            if self._twoview_bootstrap(
                jnp.asarray(image, jnp.float32), timestamp
            ):
                out = {"state": self.state, "twoview_init": True}
        return out

    def _twoview_bootstrap(self, img, timestamp) -> bool:
        from libcml_tpu.models.indirect.matching import match_window
        from libcml_tpu.models.indirect.twoview import two_view_init

        f0 = _extract(self._first_pyr[0][..., 0], self.orb_budget,
                      self.orb_levels)
        f1 = _extract(img, self.orb_budget, self.orb_levels)
        m = match_window(f0.desc, f0.uv, f0.valid,
                         f1.desc, f1.uv, f1.valid)
        if int(m.num) < 40:
            return False
        res = two_view_init(
            f0.uv, f1.uv[m.idx], m.valid, self.cam,
            jax.random.PRNGKey(self.frame_idx),
        )
        if not bool(res.ok):
            return False
        inl = np.asarray(res.inlier)
        X0 = np.asarray(res.X0)
        ok = inl & np.isfinite(X0).all(1) & (X0[:, 2] > 1e-3)
        if ok.sum() < 30:
            return False

        # refine the pair with a tiny reprojection BA (frame 0 fixed): the
        # minimal-solver pose from forward-motion narrow-FOV geometry is
        # tens of degrees off in translation direction; joint point+pose
        # refinement over all inliers tightens it (the reference's Raulmur
        # initializer equally relies on the BA that follows)
        N = X0.shape[0]
        uv1m = np.asarray(f1.uv)[np.asarray(m.idx)]
        prob = iba.IndirectBAProblem(
            T=SE3(
                R=jnp.stack([jnp.eye(3), res.T_10.R]),
                t=jnp.stack([jnp.zeros(3), res.T_10.t]),
            ),
            frame_valid=jnp.ones((2,), bool),
            frame_fixed=jnp.asarray([True, False]),
            Xw=jnp.asarray(X0),
            point_valid=jnp.asarray(ok),
            obs_frame=jnp.concatenate([jnp.zeros(N, jnp.int32),
                                       jnp.ones(N, jnp.int32)]),
            obs_point=jnp.tile(jnp.arange(N, dtype=jnp.int32), 2),
            obs_uv=jnp.concatenate([f0.uv, jnp.asarray(uv1m, jnp.float32)]),
            obs_valid=jnp.tile(jnp.asarray(ok), 2),
            obs_sigma2=jnp.ones((2 * N,), jnp.float32),
        )
        out = iba.run_local_ba(prob, self.cam)
        X0 = np.asarray(out.Xw)
        T_ref = jax.tree.map(lambda x: x[1], out.T)
        if not np.isfinite(np.asarray(T_ref.t)).all():
            return False
        res = res.replace(T_10=T_ref)
        ok = ok & np.isfinite(X0).all(1) & (X0[:, 2] > 1e-3)
        if ok.sum() < 30:
            return False
        # seed the direct window: the two-view pose + sparse corner depths
        # become the initial keyframe pair; photometric BA refines from
        # there exactly as after a DSO init
        from libcml_tpu.utils import logging as log

        log.important("two-view bootstrap at frame %d (%d points)",
                      self.frame_idx, int(ok.sum()))
        # median-depth normalization (monocular gauge, as normalize_scale)
        med = float(np.median(X0[ok, 2]))
        scale = 1.0 / max(med, 1e-6)
        idepth0 = 1.0 / np.maximum(X0[:, 2] * scale, 1e-4)
        T_rel = SE3(R=res.T_10.R, t=res.T_10.t * scale)
        self._promote_two_view(
            img, timestamp, T_rel,
            f0.uv, jnp.asarray(idepth0, jnp.float32), jnp.asarray(ok),
        )
        return True

    def _promote_two_view(self, img, timestamp, T_rel, uv0, idepth0, ok):
        """Build the window from a two-view bootstrap (mirrors
        _promote_initialization with external points)."""
        from libcml_tpu.models.direct import ba as ba_mod
        from libcml_tpu.models.direct import window as win_mod
        from libcml_tpu.runtime.odometry import (
            _preprocess,
            _seed_new_immatures,
            _working_rho_range,
        )

        cfg, cam = self.cfg, self.cam
        anchor = self._restart_anchor
        pyr = _preprocess(img, cfg.num_levels)
        window = win_mod.empty_window(cfg, cam.height, cam.width)
        window, slot0 = win_mod.add_keyframe(
            window, self._first_pyr[0], anchor, jnp.zeros(2, jnp.float32),
            jnp.asarray(self._anchor_kf, jnp.int32),
        )
        window = window.replace(
            ba=ba_mod.anchor_first_frame(window.ba, 0, cfg)
        )
        window, slot1 = win_mod.add_keyframe(
            window, pyr[0], T_rel.compose(anchor), jnp.zeros(2, jnp.float32),
            jnp.asarray(self.frame_idx, jnp.int32),
        )
        window = win_mod.add_points(window, slot0, uv0, idepth0, ok, cfg)
        new_ba, _ = ba_mod.run_ba(window.ba, window.images, cam, cfg)
        new_ba = ba_mod.update_residual_status(new_ba, window.images, cam, cfg)
        self._window = window.replace(ba=new_ba)

        self._kf_slot = int(slot1)
        self._kf_id = self.frame_idx
        self._kf_pyr = pyr
        self._kf_grad0_prev = self._first_pyr[0]
        self._kf_ab = jnp.zeros(2, jnp.float32)
        self._record(timestamp, self._kf_id, SE3.identity())
        self._sync_kf_poses()
        self._set_abs_pose(self._kf_id, self._kf_T, keyframe=True)
        self._rebuild_tracker_ref()
        rho_lo, rho_hi = _working_rho_range(self._window.ba, cfg)
        self._immature = _seed_new_immatures(
            self._immature, jnp.asarray(self._kf_slot), pyr[0],
            rho_lo, rho_hi, cfg,
        )
        self._push_recent_row(jnp.asarray(self._kf_slot, jnp.int32))
        self._win_count = 2
        self._pending_marg = None
        self._T_prev = self._kf_T
        self._T_curr = self._kf_T
        self._frames_since_kf = 0
        self.state = "TRACKING"

    def _track_frame(self, pyr, img, timestamp):
        """DISPATCH phase of the hybrid frame: extract ORB, dispatch the
        fused project+match+PnP program, and hand the direct spine a
        device-gated PnP seed — no host fetch anywhere. All scalar
        decisions (mode, takeover, keyframe ratio, indirect postprocess)
        run in _finalize_frame, which in pipelined mode consumes results
        one frame later when they are already sitting on the host side of
        the tunnel (the same lag-1 treatment that took the direct path
        2.1 -> 14.5 fps in round 4)."""
        if not self.enable_indirect:
            return super()._track_frame(pyr, img, timestamp)

        with self.sheet.timer("time_orb").frame(self.frame_idx):
            feats = _extract(img, self.orb_budget, self.orb_levels)
        n_map = int(self._pt_valid.sum())

        self._pending_extras = {"feats": feats}
        seed = None
        use_seed_dev = None
        if n_map >= self.dcfg.min_orb_matches:
            Xw, desc, valid, level = self._map_device()
            with self.sheet.timer("time_pnp").frame(self.frame_idx):
                m, pnp, bundle, seed_gate = _project_match_pnp(
                    Xw, desc, valid, level, self._T_curr, self._T_prev,
                    self.cam,
                    feats.desc, feats.uv, feats.level, feats.angle,
                    feats.valid,
                )
            self._pending_extras.update(
                pnp_bundle=bundle, pnp_mvalid=m.valid, pnp_T=pnp.T)
            # ORB-first seeding (reference: trackWithOrbAndDsoRefinement,
            # Hybrid.cpp:330): the host gate is the LATEST finalized mode
            # decision (one frame stale in pipelined mode — the mode is a
            # windowed statistic and moves slowly); the per-frame
            # inlier/finite gate is a DEVICE scalar computed inside the
            # PnP program (an eager comparison chain here cost ~5 tunnel
            # round trips per frame)
            if self._last_mode == Mode.INDIRECT:
                seed = pnp.T
                use_seed_dev = seed_gate
        return super()._track_frame(pyr, img, timestamp, T_seed=seed,
                                    use_seed_dev=use_seed_dev)

    def _entry_extras(self) -> dict:
        extras = getattr(self, "_pending_extras", None) or {}
        self._pending_extras = None
        return extras

    def _finalize_frame(self, entry: dict) -> dict:
        """Hybrid scalar tail, run when the frame's device results land:
        PnP bundle fetch -> mode decision -> PnP takeover -> checker /
        decision pushes -> indirect keyframe postprocess (reference: the
        scalar tail of Hybrid.cpp:167 processFrame + indirectPostprocess
        Hybrid.cpp:286)."""
        fidx, timestamp = entry["frame_idx"], entry["ts"]
        feats = entry.get("feats")
        # ONE device->host RPC for everything this finalize consumes: the
        # direct scalar bundle, the PnP bundle, AND whatever the in-flight
        # indirect-postprocess tick wants (each separate fetch costs ~30 ms
        # fixed latency through the tunnel; at lag-1 all of it is already
        # computed, so the RPC itself is the only cost)
        if feats is not None and "scalars_np" not in entry:
            want = self._bundle_want(entry)
            # ONE flat f32 buffer = ONE tunnel RPC (~25-30 ms per fetched
            # ARRAY regardless of size; the unpacked 5-array fetch measured
            # 120 ms/frame). The buffer was usually PREPACKED at the end of
            # the previous finalize, so the concat program was queued ahead
            # of this frame's device work and the fetch is a pure RPC —
            # packing here would queue it behind ~30 ms of fresh dispatches.
            pre = entry.pop("_prepack", None)
            if pre is not None and self._same_refs(pre[2], want):
                flat, recipe = pre[0], pre[1]
            else:
                flat, recipe = pack_refs(tuple(want))
            ip_refs = want[2]
            p2 = self._pass2
            with self.sheet.timer("time_bundle_fetch").frame(fidx):
                flat_np = jax.device_get(flat)
            sc_np, pnp_np, ip_np, p2_np = unpack_refs(flat_np, recipe)
            entry["scalars_np"] = sc_np
            if pnp_np is not None:
                entry["pnp_np"] = pnp_np
            if ip_refs is not None:
                self._tick_indpost(ip_np)
            if p2 is not None:
                self._consume_pass2(p2, p2_np)
        out = super()._finalize_frame(entry)
        if feats is None:
            return out

        pnp_ok = False
        pnp_motion = None
        orb_cov = None
        n_matches = 0
        if "pnp_np" in entry:
            b, m_valid = entry["pnp_np"]
            n_matches = int(b[0])
            if int(b[1]) >= 12 and b[2] > 0.5:
                pnp_ok = True
                pnp_motion = (float(b[18]), float(b[19]))
                orb_cov = np.asarray(b[15:18])
                self._pt_last_seen[m_valid] = fidx

        mode = self.pose_decision.decide(n_matches)
        self.mode_history.append(mode)
        self._last_mode = mode
        if out.get("restarted") or out.get("relocalized") \
                or out["state"] != "TRACKING":
            # the failure path reset the spine; skip indirect postprocessing
            out["mode"] = mode
            return out
        if (
            mode == Mode.INDIRECT
            and pnp_ok
            and not out["ok"]
            and self.checker.plausible_values(*pnp_motion)
        ):
            # direct refinement failed; the PnP pose stands on its own —
            # but only when it is motion-plausible (CameraChecker): an
            # unchecked takeover lets one bad PnP solve teleport the
            # trajectory (VERDICT r2 weak #7). Ground any in-flight
            # speculative frames first — their prediction chain rode the
            # failed pose
            self._flush_pending()
            pnp_T = entry["pnp_T"]
            self._T_curr = pnp_T
            self._T_prev = pnp_T
            self._record(timestamp, self._kf_id,
                         pnp_T.compose(self._kf_T.inverse()),
                         frame_idx=fidx, gt=entry.get("gt"))
            out["ok"] = True
            self._track_fails = 0
        if out.get("ok"):
            mo = out.get("motion")
            if mo is not None:
                self.checker.push_values(*mo)
            else:
                self.checker.push(self._T_prev, self._T_curr)

        self.pose_decision.push(orb_cov, out.get("cov_rot_diag"))
        out["mode"] = mode
        out["orb_matches"] = n_matches

        # indirect keyframe decision (reference: indirectNeedNewKeyFrame —
        # tracked-vs-reference ratio rule): the direct spine's keyframes
        # carry the indirect postprocess; when matches collapse BETWEEN
        # spine keyframes, insert an INDIRECT-ONLY keyframe (triangulate
        # new map points at the current pose) WITHOUT forcing a
        # photometric-window event — round 4 measured the old forced spine
        # keyframe at 4.7x worse ATE over 500 frames (0.057 -> 0.268): the
        # extra events chewed through the window's marginalization budget.
        # In the reference the two pipelines likewise keyframe
        # independently (indirectNeedNewKeyFrame vs directNeedNewKeyFrame).
        # The tracked-count signal prefers the SECOND local-map pass when a
        # recent one landed (reference: Tracking.cpp's matchesInliers from
        # indirectTrackLocalMap feeds needNewKeyFrame) — the pass-1 count
        # at the predicted pose undercounts exactly when the motion model
        # mispredicts, which is when a spurious forced keyframe would fire.
        n_kf_signal = n_matches
        if self._last_pass2 is not None and fidx - self._last_pass2[2] <= 2:
            n_kf_signal = max(n_matches, self._last_pass2[0])
        if out.get("kf"):
            with self.sheet.timer("time_ind_post").frame(fidx):
                self._indirect_postprocess(feats, timestamp, frame_idx=fidx)
        elif (
            out.get("ok")
            and self._last_kf_feats is not None
            and self.dcfg.force_kf_match_ratio > 0
            and n_kf_signal < self.dcfg.force_kf_match_ratio
                * max(self._ref_kf_tracked, 1)
            and fidx - self._last_kf_idx >= 3
        ):
            with self.sheet.timer("time_ind_post").frame(fidx):
                self._indirect_postprocess(feats, timestamp,
                                           T_pose=entry["T_world"],
                                           frame_idx=fidx)
        # dispatch the SECOND local-map tracking pass at this frame's
        # REFINED pose (consumed in the next frame's bundle RPC)
        if (
            out.get("ok")
            and out["state"] == "TRACKING"
            and int(self._pt_valid.sum()) >= self.dcfg.min_orb_matches
        ):
            Xw, desc, valid, level = self._map_device()
            mv2, b2 = _local_map_pass2(
                Xw, desc, valid, level, entry["T_world"], self.cam,
                feats.desc, feats.uv, feats.level, feats.valid,
            )
            self._pass2 = {"mvalid": mv2, "bundle": b2, "frame_idx": fidx}
        self._cull_map_points()
        self._prepack_next()
        return out

    def _bundle_want(self, entry: dict, at_frame: int | None = None) -> list:
        """The device refs one frame's finalize consumes, in fetch order:
        [scalars, pnp pair | None, indpost tick refs | None, pass2 | None]."""
        want = [entry["scalars"]]
        if "pnp_bundle" in entry:
            want.append((entry["pnp_bundle"], entry["pnp_mvalid"]))
        else:
            want.append(None)
        ip_refs = self._indpost_fetch_refs(at_frame=at_frame)
        want.append(ip_refs if ip_refs is not None else None)
        p2 = self._pass2
        want.append((p2["mvalid"], p2["bundle"]) if p2 else None)
        return want

    @staticmethod
    def _same_refs(a, b) -> bool:
        la, ta = jax.tree.flatten(a)
        lb, tb = jax.tree.flatten(b)
        return ta == tb and len(la) == len(lb) and all(
            x is y for x, y in zip(la, lb))

    def _prepack_next(self):
        """Pre-pack the NEXT pending frame's bundle now, while its device
        operands are already queued and before the next frame's dispatches
        join the queue (see the fetch comment in _finalize_frame)."""
        if not self._pending:
            return
        nxt = self._pending[0]
        if "scalars" not in nxt or "scalars_np" in nxt:
            return
        want = self._bundle_want(nxt, at_frame=self.frame_idx + 1)
        flat, recipe = pack_refs(tuple(want))
        nxt["_prepack"] = (flat, recipe, want)

    def _consume_pass2(self, p2, fetched):
        """Land a completed second local-map pass: refresh point last-seen
        stamps and record the inlier statistic the keyframe decision reads
        (reference: Tracking.cpp:600-632 inlier bookkeeping)."""
        self._pass2 = None
        mvalid, b = fetched
        n2, inl2 = int(b[0]), int(b[1])
        fidx = p2["frame_idx"]
        if b[2] > 0.5:
            self._pt_last_seen[mvalid] = fidx
            self._last_pass2 = (n2, inl2, fidx)
            self.sheet.push("pass2_matches", fidx, float(n2))
            self.sheet.push("pass2_inliers", fidx, float(inl2))

    # -- keyframe postprocess ------------------------------------------------

    def _indirect_postprocess(self, feats, timestamp, T_pose=None,
                              frame_idx: int | None = None):
        """Keyframe indirect mapping, DISPATCH phase: triangulate fresh map
        points against the previous indirect keyframe + project-match the
        map (reference: indirectMap, indirect/Mapping.cpp:19 +
        bundleAdjustmentDecision). `T_pose` overrides the pose for
        INDIRECT-ONLY keyframes (frames that are not direct-window
        keyframes); `frame_idx` identifies the promoted frame (pipelined
        finalize passes the lagged frame's own index).

        The event is a 3-tick pipeline spread over subsequent frames'
        finalizes — match+bookkeeping, mixed BA, local BA — with each
        tick's device->host fetch riding the per-frame bundle RPC
        (~30 ms fixed latency each through the tunnel; round 4 paid the
        whole ~780 ms event synchronously inside one frame). Sequential
        mode completes all ticks immediately (identical results, the
        reference's linearized-mapping analogue; its threaded mapping mode
        is the analogue of the ticked one, Hybrid.cpp:103-110)."""
        if frame_idx is None:
            frame_idx = self.frame_idx
        self._complete_indpost()   # previous event's bookkeeping lands first
        T_new = T_pose if T_pose is not None else self._kf_T

        tri = None
        if self._last_kf_feats is not None:
            f0, T0 = self._last_kf_feats, self._last_kf_T
            m0, X0, ok, t_norm = _epipolar_triangulate(
                f0.desc, f0.uv, f0.valid, f0.angle,
                feats.desc, feats.uv, feats.valid, feats.angle,
                T_new, T0, self.cam,
                optimal=getattr(self, "optimal_triangulation", True),
            )
            tri = (t_norm, X0, ok, f0.desc, f0.level,
                   T0.R, T0.t, m0.idx, m0.dist)

        Xw_d, desc_d, valid_d, level_d = self._map_device()
        m, uv_p = _match_projection(
            Xw_d, desc_d, valid_d, level_d, T_new, self.cam,
            feats.desc, feats.uv, feats.level, feats.valid,
        )
        self._indpost = {
            "phase": "match",
            "tick_born": self.frame_idx,
            "feats": feats,
            "frame_idx": frame_idx,
            "timestamp": timestamp,
            "kf_id": self._kf_id if T_pose is None else -1,
            "T_new_dev": T_new,
            "fetch_refs": (
                m.valid, m.idx, m.dist, m.num,
                feats.desc, feats.uv, feats.level, feats.valid,
                T_new.R, T_new.t,
                tri if tri is not None else (),
            ),
            "has_tri": tri is not None,
        }
        if not self.staged_indpost:
            self._complete_indpost()
        elif not self.pipelined:
            # sequential mode: land the MATCH/bookkeeping tick now — the
            # indirect map must be fresh for the very next frame's PnP
            # (a fully-staged run measured 2 lost segments on the 500-frame
            # sequence where sync postprocess loses none) — but leave the
            # mixed/local BA solver ticks staged: their writebacks are pure
            # refinement, and fetching them synchronously blocks the frame
            # on ~0.4-0.8 s of freshly-dispatched solver device time
            # (results_r05.json hybrid_sequential time_mixed_ba/local_ba).
            self._tick_indpost()

    def _make_keyframe(self, *a, **kw):
        """A new direct keyframe mutates the window — any in-flight mixed
        BA (which swapped the window optimistically) and indirect
        bookkeeping must land first."""
        self._complete_indpost()
        super()._make_keyframe(*a, **kw)

    def _flush_pending(self) -> list[dict]:
        outs = super()._flush_pending()
        self._complete_indpost()
        return outs

    # -- staged indirect postprocess ticks -----------------------------------

    # frames a staged tick's device programs get to execute before their
    # results are fetched: fetching a freshly-dispatched mixed/local BA in
    # the NEXT frame's bundle RPC blocks that fetch on the solver's device
    # time (measured round 5: 127 ms mean bundle fetch vs the ~30 ms floor)
    TICK_LAG = 2

    def _indpost_fetch_refs(self, at_frame: int | None = None):
        """Device refs the current indirect-postprocess tick consumes (the
        per-frame finalize fetches them in the SAME RPC as the frame
        bundle), or None when no event is in flight or the tick's programs
        are younger than TICK_LAG frames. `at_frame` evaluates the age gate
        as of a future frame (the bundle prepack runs one frame early)."""
        st = self._indpost
        if st is None:
            return None
        fidx = self.frame_idx if at_frame is None else at_frame
        if fidx - st.get("tick_born", -10) < self.TICK_LAG:
            return None
        return self._indpost_refs_raw(st)

    @staticmethod
    def _indpost_refs_raw(st):
        if st["phase"] == "match":
            return st["fetch_refs"]
        if st["phase"] == "ba":
            return st.get("mx_refs") or ()
        return st.get("lb_refs") or ()

    def _tick_indpost(self, fetched=None):
        """Advance the in-flight indirect postprocess by ONE tick. `fetched`
        is the pre-fetched value of _indpost_fetch_refs() when the caller
        already bundled it into the per-frame RPC; None fetches here."""
        st = self._indpost
        if st is None:
            return
        if fetched is None:
            # forced completion path: bypass the TICK_LAG readiness gate
            fetched = jax.device_get(self._indpost_refs_raw(st))
        with self.sheet.timer("time_ind_tick").frame(st["frame_idx"]):
            if st["phase"] == "match":
                self._indpost_match(st, fetched)
            elif st["phase"] == "ba":
                self._indpost_ba(st, fetched)
            else:
                self._indpost_local(st, fetched)
        if self._indpost is st:
            # the next tick's programs were dispatched just now — give them
            # TICK_LAG frames of device time before their fetch
            st["tick_born"] = self.frame_idx

    def _complete_indpost(self):
        while self._indpost is not None:
            self._tick_indpost()

    def _indpost_match(self, st, fetched):
        """Tick 1: consume the triangulation + projection match, do the
        host bookkeeping (point insertion, search-and-fuse, descriptor
        refresh, observation ring, reloc store, covisibility), decide the
        BA mode, dispatch the mixed BA if chosen."""
        feats = st["feats"]
        frame_idx = st["frame_idx"]
        (mv, midx, mdist, m_num, fdesc, fuv, flevel, fvalid,
         Tn_R, Tn_t, tri_np) = fetched
        mv, midx, mdist = mv.copy(), midx.copy(), mdist.copy()

        if st["has_tri"]:
            t_norm, X0, ok_np, d0, l0, R0, t0, m0_idx, m0_dist = tri_np
            if float(t_norm) > 1e-4:
                # world coords: X_w = R0^T (X0 - t0)
                Xw = (X0 - t0) @ R0
                slots, src = self._add_map_points(Xw, d0, l0, ok_np)
                if slots is not None:
                    # the creating keyframe OBSERVES its new points: the
                    # epipolar match already pairs source feature src[i]
                    # with current-frame corner m0_idx[src[i]], so record
                    # the match directly instead of re-matching — the
                    # projection match above ran on the PRE-insertion map
                    # (one bulk fetch), and silently dropping these
                    # creation observations regressed the calib-SLAM
                    # distortion fit (round 4)
                    mv[slots] = True
                    midx[slots] = m0_idx[src]
                    mdist[slots] = m0_dist[src]
                    m_num = int(m_num) + slots.size

        # search-and-fuse: two map points matched to the SAME corner are
        # duplicates — keep the better match (smaller Hamming distance),
        # retire the other (reference: indirect/Mapping.cpp:391
        # searchAndFuse). Retired slots are invalidated; the generation
        # check drops their stale observations everywhere.
        matched = np.flatnonzero(mv)
        if matched.size:
            order = matched[np.argsort(mdist[matched], kind="stable")]
            seen_feat: dict[int, int] = {}
            fuse = []
            for p in order:
                f = int(midx[p])
                if f in seen_feat:
                    fuse.append(p)
                else:
                    seen_feat[f] = p
            if fuse:
                fuse = np.asarray(fuse)
                self._pt_valid[fuse] = False
                mv[fuse] = False
                self._map_dev = None

        # descriptor refresh: a map point's descriptor follows its NEWEST
        # observation so matching tracks appearance change (reference:
        # MapPoint descriptor update in indirect mapping)
        pt_idx = np.flatnonzero(mv)[:OBS_PER_KF]
        if pt_idx.size:
            self._pt_desc[pt_idx] = fdesc[midx[pt_idx]]
            self._pt_level[pt_idx] = flevel[midx[pt_idx]]
            self._map_dev = None
        uv_obs = fuv[midx[pt_idx]]
        lv_obs = flevel[midx[pt_idx]]
        k = {
            "frame": frame_idx,
            # window-slot association: indirect-only keyframes have NO
            # direct-window slot — kf_id -1 keeps the mixed-BA assembly and
            # pose refresh from binding this ring entry to whatever spine
            # keyframe happens to be latest
            "kf_id": st["kf_id"],
            "T_R": Tn_R,
            "T_t": Tn_t,
            "obs_point": pt_idx,
            "obs_gen": self._pt_gen[pt_idx].copy(),
            "obs_mapid": self._pt_mapid[pt_idx].copy(),
            "obs_uv": uv_obs.astype(np.float32),
            "obs_sigma2": (1.2 ** (2.0 * lv_obs)).astype(np.float32),
        }
        self._ind_kfs.append(k)
        self._ind_kfs = self._ind_kfs[-KF_HISTORY:]
        # covisibility bookkeeping in the system-of-record map (reference:
        # processIndirectCovisiblity, Map.cpp:449)
        mf = self._fid2map.get(frame_idx)
        if mf is not None:
            mids = self._pt_mapid[pt_idx]
            self.map.add_observations(mf, mids[mids >= 0])
        self._ref_kf_tracked = max(int(m_num), 1)
        self._last_kf_feats = feats
        self._last_kf_T = st["T_new_dev"]
        self._last_kf_idx = frame_idx
        self._add_reloc_keyframe(feats, midx, pt_idx, fdesc, fvalid, fuv,
                                 kf_id=frame_idx)
        self._on_indirect_kf(k)

        ba_mode = self.ba_decision.decide(
            num_indirect_points=int(self._pt_valid.sum()),
            num_tracked=int(m_num),
            num_robust=int(np.sum(mdist < 50)),
            saturated_ratio=(
                self.stats[-1].get("saturated", 0.0) if self.stats else 0.0
            ),
        )
        st["ba_mode"] = ba_mode
        # mixed BA fires when the decision logic distrusts the pure
        # photometric window (reference: bundleAdjustmentDecision ->
        # BAINDIRECT routes correction through indirect constraints); in
        # good photometric conditions the direct BA already sits at the
        # optimum and reprojection noise could only perturb it
        st["mx"] = None
        st["mx_refs"] = None
        if self.cfg.mixed_ba and (self.cfg.mixed_always
                                  or ba_mode == Mode.INDIRECT):
            with self.sheet.timer("time_mixed_ba").frame(frame_idx):
                st["mx"], st["mx_refs"] = self._dispatch_mixed_window_ba()
        st["phase"] = "ba"

    def _on_indirect_kf(self, k: dict) -> None:
        """Subclass hook: a new indirect keyframe's observation record just
        landed (CalibSlam harvests calibration correspondences here)."""

    def _indpost_ba(self, st, fetched):
        """Tick 2: complete the mixed BA (writeback or rollback), cull
        redundant keyframes, dispatch the local BA."""
        if st["mx"] is not None:
            with self.sheet.timer("time_mixed_ba").frame(st["frame_idx"]):
                self._complete_mixed_window_ba(st["mx"], fetched)
        self._cull_redundant_keyframes()
        st["lb"] = None
        st["lb_refs"] = None
        if len(self._ind_kfs) >= 3:
            # points are always refined (they only feed the indirect
            # tracker); POSES move only when the decision logic picked the
            # indirect backend — i.e. when the photometric model is failing
            # (reference: bundleAdjustmentDecision -> BAINDIRECT)
            with self.sheet.timer("time_local_ba").frame(st["frame_idx"]):
                st["lb"], st["lb_refs"] = self._dispatch_indirect_local_ba(
                    move_poses=(st["ba_mode"] == Mode.INDIRECT)
                )
        st["phase"] = "local"

    def _indpost_local(self, st, fetched):
        """Tick 3: complete the local BA writeback; the event is done."""
        if st["lb"] is not None:
            with self.sheet.timer("time_local_ba").frame(st["frame_idx"]):
                self._complete_indirect_local_ba(st["lb"], fetched)
        self._indpost = None

    # -- checkpoint / resume -------------------------------------------------

    def _ckpt_extra(self) -> dict:
        self._complete_indpost()   # serialize a settled indirect state
        return {
            "pt_arrays": {
                k: getattr(self, k).copy()
                for k in ("_pt_Xw", "_pt_desc", "_pt_level", "_pt_valid",
                          "_pt_last_seen", "_pt_gen", "_pt_mapid")
            },
            "ind_kfs": self._ind_kfs,
            "kf_store": self._kf_store,
            "last_kf": (
                None if self._last_kf_feats is None else
                (jax.tree.map(np.asarray, self._last_kf_feats),
                 jax.tree.map(np.asarray, self._last_kf_T),
                 self._last_kf_idx)
            ),
            "ref_kf_tracked": self._ref_kf_tracked,
            "mode_history": self.mode_history,
        }

    def _ckpt_restore_extra(self, extra: dict) -> None:
        for k, v in extra["pt_arrays"].items():
            setattr(self, k, v)
        self._ind_kfs = extra["ind_kfs"]
        self._kf_store = extra["kf_store"]
        if extra["last_kf"] is not None:
            feats, T, idx = extra["last_kf"]
            self._last_kf_feats = jax.tree.map(jnp.asarray, feats)
            self._last_kf_T = jax.tree.map(jnp.asarray, T)
            self._last_kf_idx = idx
        self._ref_kf_tracked = extra["ref_kf_tracked"]
        self.mode_history = extra["mode_history"]
        self._map_dev = None
        # the BoW retrieval index is rebuilt lazily from _kf_store
        if self._kf_store and self._kfdb is None:
            from libcml_tpu.models.indirect.bow import (
                KeyframeDatabase,
                default_vocabulary,
            )

            self._kfdb = KeyframeDatabase(default_vocabulary())
            for kf_id, st in self._kf_store.items():
                self._kfdb.add(kf_id, jnp.asarray(st["desc"]),
                               jnp.asarray(st["valid"]))

    # -- relocalization ------------------------------------------------------

    def _add_reloc_keyframe(self, feats, match_idx: np.ndarray,
                            pt_idx: np.ndarray,
                            fdesc: np.ndarray | None = None,
                            fvalid: np.ndarray | None = None,
                            fuv: np.ndarray | None = None,
                            kf_id: int | None = None):
        """Index this keyframe for BoW relocalization: inverted-file entry +
        feature store with feature -> map-slot association (reference:
        Relocalization::addKeyFrame). `fdesc`/`fvalid` are host copies of
        the feature arrays when the caller already fetched them (saves the
        ~30 ms refetch)."""
        if self._kfdb is None:
            from libcml_tpu.models.indirect.bow import (
                KeyframeDatabase,
                default_vocabulary,
            )

            self._kfdb = KeyframeDatabase(default_vocabulary())
        if fdesc is None:
            fdesc = np.asarray(feats.desc)
        if fvalid is None:
            fvalid = np.asarray(feats.valid)
        if fuv is None:
            fuv = np.asarray(feats.uv)
        if kf_id is None:
            kf_id = self.frame_idx
        # DEFERRED BoW indexing: the store entry is written now; the
        # inverted-file add happens lazily at query time (_drain_kfdb)
        self._kfdb_pending.append(kf_id)
        n = fdesc.shape[0]
        feat2slot = np.full((n,), -1, np.int64)
        feat2gen = np.zeros((n,), np.int64)
        fidx = match_idx[pt_idx]
        feat2slot[fidx] = pt_idx
        feat2gen[fidx] = self._pt_gen[pt_idx]
        self._kf_store[kf_id] = {
            "desc": fdesc,
            "uv": fuv,
            "valid": fvalid,
            "feat2slot": feat2slot,
            "feat2gen": feat2gen,
        }

    def _drain_kfdb(self):
        """Index keyframes whose BoW add was deferred (indexing costs a
        ~70 ms device round trip per keyframe and is only consulted on
        relocalization, so it runs here, not in the keyframe event)."""
        if not self._kfdb_pending:
            return
        if self._kfdb is None:
            from libcml_tpu.models.indirect.bow import (
                KeyframeDatabase,
                default_vocabulary,
            )

            self._kfdb = KeyframeDatabase(default_vocabulary())
        for kf_id in self._kfdb_pending:
            st = self._kf_store.get(kf_id)
            if st is not None:
                self._kfdb.add(kf_id, jnp.asarray(st["desc"]),
                               jnp.asarray(st["valid"]))
        self._kfdb_pending.clear()

    def _attempt_relocalization(self, pyr, timestamp) -> bool:
        """BoW candidate retrieval -> descriptor matching -> EPnP RANSAC
        absolute pose -> restart the window anchored at the recovered pose,
        keeping the indirect map (reference: Relocalization candidates +
        EPnP.h:129; the failure loop of Hybrid.cpp:214-222)."""
        self._complete_indpost()   # settle the keyframe store first
        if not self._kf_store:
            return False
        self._drain_kfdb()
        if self._kfdb is None:
            return False
        from libcml_tpu.models.indirect.epnp import epnp_ransac
        from libcml_tpu.models.indirect.matching import (
            match_descriptors,
            vfc_filter,
        )

        img = pyr[0][..., 0]
        feats = _extract(img, self.orb_budget, self.orb_levels)
        cands = self._kfdb.query(feats.desc, feats.valid, max_results=3)
        for kf_id, _score in cands:
            st = self._kf_store.get(kf_id)
            if st is None:
                continue
            m = match_descriptors(
                feats.desc, feats.valid,
                jnp.asarray(st["desc"]), jnp.asarray(st["valid"]),
            )
            # VFC outlier rejection on the match displacement field
            # (reference: the VFC pass the matchers feed, VFC.h:124) —
            # descriptor-only relocalization matches carry gross outliers
            # that would otherwise burn RANSAC iterations
            if "uv" in st and int(m.num) >= 24:
                m = m.replace(valid=vfc_filter(
                    feats.uv, jnp.asarray(st["uv"])[m.idx], m.valid
                ))
            mi = np.asarray(m.idx)
            mv = np.asarray(m.valid)
            slots = st["feat2slot"][mi]
            safe = np.maximum(slots, 0)
            sel = (
                mv
                & (slots >= 0)
                & self._pt_valid[safe]
                & (self._pt_gen[safe] == st["feat2gen"][mi])
            )
            if sel.sum() < 16:
                continue
            Xw = np.zeros((len(mi), 3), np.float32)
            Xw[sel] = self._pt_Xw[slots[sel]]
            res = epnp_ransac(
                jnp.asarray(Xw), feats.uv, jnp.asarray(sel), self.cam,
                jax.random.PRNGKey(self.frame_idx),
            )
            if bool(res.ok) and np.isfinite(np.asarray(res.T.t)).all():
                self._reloc_restart = True
                self._restart_segment(pyr, timestamp, res.T)
                return True
        return False

    def _restart_segment(self, pyr, timestamp, anchor):
        """Restart the direct spine; the indirect map survives only when the
        new segment is anchored by relocalization (same world frame) —
        a blind restart breaks the world frame, so the map, keyframe ring
        and retrieval index restart with it (reference: Map reset on
        restart, AbstractSlam.cpp:98-104)."""
        keep_map = getattr(self, "_reloc_restart", False)
        self._reloc_restart = False
        # drop any in-flight staged postprocess / second-pass dispatch:
        # they reference the window and map state being torn down
        self._indpost = None
        self._pass2 = None
        self._last_pass2 = None
        super()._restart_segment(pyr, timestamp, anchor)
        self._ind_kfs = []
        self._last_kf_feats = None
        self._last_kf_T = None
        self._ref_kf_tracked = 1
        if not keep_map:
            self._pt_valid[:] = False
            self._map_dev = None
            self._kf_store.clear()
            self._kfdb_pending.clear()
            if self._kfdb is not None:
                from libcml_tpu.models.indirect.bow import KeyframeDatabase

                self._kfdb = KeyframeDatabase(self._kfdb.voc)

    def _build_mixed_factors(self):
        """Assemble fixed-capacity reprojection factors linking the indirect
        map to the direct window's keyframe slots: for every map point with
        >=2 observations among the window's keyframes, anchor it (observed
        corner pixel + inverse depth) in the oldest observing slot and add
        its other observations as residual targets. Returns
        (IndirectFactors, host_slots (Q,), map_slots (Q,)) or (None, ...)."""
        w = self._window
        ba = w.ba
        F = ba.num_frames
        fids, fvalid, R, t = self._window_host()
        slot_of = {
            int(fids[s]): s for s in range(F) if fvalid[s] and fids[s] >= 0
        }
        obs: dict[int, list] = {}
        for k in self._ind_kfs:
            s = slot_of.get(int(k["kf_id"]))
            if s is None:
                continue
            live = (
                (self._pt_gen[k["obs_point"]] == k["obs_gen"])
                & self._pt_valid[k["obs_point"]]
            )
            for p, uv, s2 in zip(k["obs_point"][live], k["obs_uv"][live],
                                 k["obs_sigma2"][live]):
                obs.setdefault(int(p), []).append((s, uv, float(s2)))
        items = [(p, o) for p, o in obs.items() if len(o) >= 3]
        if len(items) < 24:
            return None, None, None
        Q = self.cfg.mixed_points
        items = items[:Q]

        uv_a = np.zeros((Q, 2), np.float32)
        host = np.zeros((Q,), np.int32)
        rho = np.ones((Q,), np.float32)
        pvalid = np.zeros((Q,), bool)
        obs_uv = np.zeros((Q, F, 2), np.float32)
        obs_valid = np.zeros((Q, F), bool)
        sigma2 = np.ones((Q, F), np.float32)
        map_slots = np.full((Q,), -1, np.int64)
        gate_px = 5.0   # drop gross outlier matches before the solve
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        for qi, (p, o) in enumerate(items):
            hs, huv, _ = o[0]       # oldest observation anchors the point
            Xh = R[hs] @ self._pt_Xw[p] + t[hs]
            if Xh[2] <= 0.05:
                continue
            uv_a[qi] = huv
            host[qi] = hs
            rho[qi] = 1.0 / Xh[2]
            for s, uv, s2 in o[1:]:
                Xs = R[s] @ self._pt_Xw[p] + t[s]
                if Xs[2] <= 0.05:
                    continue
                pu = fx * Xs[0] / Xs[2] + cx
                pv = fy * Xs[1] / Xs[2] + cy
                if (pu - uv[0]) ** 2 + (pv - uv[1]) ** 2 > gate_px ** 2 * s2:
                    continue
                obs_uv[qi, s] = uv
                obs_valid[qi, s] = True
                sigma2[qi, s] = s2
            # a single non-anchor observation leaves idepth barely
            # constrained — the factor then mostly injects its matching
            # noise into the pose block; require two
            pvalid[qi] = obs_valid[qi].sum() >= 2
            map_slots[qi] = p if pvalid[qi] else -1

        if pvalid.sum() < 24:
            return None, None, None
        (uv_d, host_d, rho_d, pv_d, ouv_d, ov_d, s2_d) = upload_packed(
            (uv_a, host, rho, pvalid, obs_uv, obs_valid, sigma2))
        ind = ba_mod.IndirectFactors(
            uv=uv_d,
            host=host_d,
            idepth=rho_d,
            point_valid=pv_d,
            obs_uv=ouv_d,
            obs_valid=ov_d,
            sigma2=s2_d,
        )
        return ind, host, map_slots

    def _dispatch_mixed_window_ba(self):
        """MOD-SLAM mixed BA, DISPATCH half: joint photometric +
        reprojection solve over the direct window (reference:
        addIndirectToProblem, DSOBundleAdjustment.cpp:2674-2700). The new
        BA state replaces the window immediately (a device-side swap — no
        host block); _complete_mixed_window_ba validates the energy one
        tick later and rolls back if the solve diverged. Returns
        (state, fetch_refs) or (None, None)."""
        ind, host, map_slots = self._build_mixed_factors()
        if ind is None:
            return None, None
        w = self._window
        new_ba, piv, E, Xh_dev, kf_T, Ep0, Ep1 = _mixed_ba_dispatch(
            w.ba, w.images, self.cam, self.cfg, ind,
            jnp.asarray(self._kf_slot),
        )
        self._window = w.replace(ba=new_ba)
        # the promoted keyframe's pose may have moved: refresh the device
        # handle + tracker reference (dispatches only). The speculative
        # _T_curr chain is NOT reset here — in-flight frames extend past
        # the keyframe (the sequential path resets below, in complete).
        self._kf_T = kf_T
        self._rebuild_tracker_ref()
        mx = {"w_old": w, "new_ba": new_ba, "host": host,
              "map_slots": map_slots}
        refs = (E, piv, new_ba.T.R, new_ba.T.t,
                new_ba.frame_valid, Xh_dev, Ep0, Ep1)
        return mx, refs

    def _complete_mixed_window_ba(self, mx, fetched):
        """Mixed BA COMPLETE half: energy validation, host-cache refresh,
        map-point writeback, keyframe-ring pose refresh."""
        (E_np, piv, R, t, fvalid, Xh, Ep0, Ep1) = fetched
        # reject when diverged (non-finite) OR when the joint solve traded
        # away too much photometric energy: the tracking reference is built
        # from this window, and a photometrically-degraded window collapses
        # tracking within two frames (round 5: deterministic saturated=0.87
        # failure at the 500-frame benchmark's f88 with no guard)
        guard = getattr(self.cfg, "mixed_photo_guard", 1.25)
        if not np.isfinite(E_np) or not np.isfinite(Ep1) \
                or Ep1 > guard * max(float(Ep0), 1e-6):
            self.sheet.push("mixed_ba_rollback", self.frame_idx, 1.0)
            # roll the optimistic swap back (no keyframe event can
            # intervene between dispatch and complete — _make_keyframe
            # force-completes the pipeline first)
            if self._window.ba is mx["new_ba"]:
                self._window = self._window.replace(ba=mx["w_old"].ba)
                self._kf_T = jax.tree.map(
                    lambda x: x[self._kf_slot], mx["w_old"].ba.T)
                self._rebuild_tracker_ref()
            return
        # pre-seed the window-host cache from the same fetch
        fids = np.asarray(self._window.frame_id)
        self._win_host = (fids, fvalid, R, t)
        self._win_host_ref = mx["new_ba"]
        self._sync_kf_poses()
        if not self._pending:
            # sequential mode: tracking continuity snaps to the refreshed
            # keyframe pose (pipelined frames already extend past it)
            self._T_curr = self._kf_T

        # write refined points back: X_w = R_h^T (unproject(uv, rho) - t_h)
        host, map_slots = mx["host"], mx["map_slots"]
        ok = piv & (map_slots >= 0)
        if ok.any():
            hs = host[ok]
            Xw = np.einsum("qji,qj->qi", R[hs], Xh[ok] - t[hs])
            self._pt_Xw[map_slots[ok]] = Xw.astype(np.float32)
            mids = self._pt_mapid[map_slots[ok]]
            self.map.p_xyz[mids[mids >= 0]] = Xw[mids >= 0]
            self._map_dev = None
        # refresh the indirect keyframe ring's poses from the window so the
        # next local BA starts consistent
        slot_of = {
            int(fids[s]): s for s in range(len(fids))
            if fvalid[s] and fids[s] >= 0
        }
        for k in self._ind_kfs:
            s = slot_of.get(int(k["kf_id"]))
            if s is not None:
                k["T_R"], k["T_t"] = R[s], t[s]

    def _cull_redundant_keyframes(self):
        """Redundancy-based keyframe culling (reference:
        indirect/Mapping.cpp:97 — drop a keyframe when >=90% of its
        observed points are seen by >=3 other keyframes). Keeps the
        history and retrieval index bounded and diverse rather than a flat
        recency window."""
        if len(self._ind_kfs) < 6:
            return
        from collections import Counter

        counts: Counter = Counter()
        id_sets = []
        for k in self._ind_kfs:
            ids = set(k["obs_mapid"][k["obs_mapid"] >= 0].tolist())
            id_sets.append(ids)
            counts.update(ids)
        kept = []
        for k, ids in zip(self._ind_kfs[:-2], id_sets[:-2]):
            if ids:
                redundant = sum(1 for i in ids if counts[i] >= 4) / len(ids)
            else:
                redundant = 1.0
            if redundant >= 0.9:
                for i in ids:
                    counts[i] -= 1
                self._kf_store.pop(k["frame"], None)
                if k["frame"] in self._kfdb_pending:
                    self._kfdb_pending.remove(k["frame"])
                if self._kfdb is not None:
                    self._kfdb.remove(k["frame"])
            else:
                kept.append(k)
        self._ind_kfs = kept + self._ind_kfs[-2:]

    def _select_local_keyframes(self) -> list[dict]:
        """Covisibility-driven local keyframe selection: the newest indirect
        keyframe plus the KF_RING-1 history keyframes sharing the most map
        points with it (reference: indirectUpdateLocalKeyFrames,
        Tracking.cpp:527 — covisibility expansion instead of a flat
        recency window)."""
        if not self._ind_kfs:
            return []
        newest = self._ind_kfs[-1]
        ref_ids = set(newest["obs_mapid"][newest["obs_mapid"] >= 0].tolist())
        scored = []
        for k in self._ind_kfs[:-1]:
            ids = k["obs_mapid"][k["obs_mapid"] >= 0]
            shared = len(ref_ids.intersection(ids.tolist()))
            if shared >= 10:
                scored.append((shared, k))
        scored.sort(key=lambda x: -x[0])
        sel = [k for _, k in scored[: KF_RING - 1]] + [newest]
        sel.sort(key=lambda k: k["frame"])   # chronological for fixed-frame 0
        return sel

    def _dispatch_indirect_local_ba(self, move_poses: bool = False):
        """Indirect local BA, DISPATCH half: assemble the fixed-capacity
        problem from the covisibility-selected keyframes and launch the
        solve (reference: IndirectBundleAdjustment::localOptimize). Returns
        (state, fetch_refs) or (None, None); _complete_indirect_local_ba
        writes back one tick later."""
        kfs = self._select_local_keyframes()
        if len(kfs) < 3:
            return None, None
        M = len(kfs)
        # drop observations whose arena slot was recycled since the keyframe
        # recorded them (generation mismatch) or whose point died — stale
        # indices would constrain a DIFFERENT 3D point with old pixels
        live = [
            (self._pt_gen[k["obs_point"]] == k["obs_gen"])
            & self._pt_valid[k["obs_point"]]
            for k in kfs
        ]
        used_pts = np.unique(np.concatenate(
            [k["obs_point"][lv] for k, lv in zip(kfs, live)]
        ))
        if used_pts.size < 10:
            return None, None
        N = int(used_pts.size)
        remap = -np.ones(MAP_CAP, np.int64)
        remap[used_pts] = np.arange(N)

        obs_f, obs_p, obs_uv, obs_s2 = [], [], [], []
        for fi, (k, lv) in enumerate(zip(kfs, live)):
            obs_f.append(np.full(int(lv.sum()), fi, np.int32))
            obs_p.append(remap[k["obs_point"][lv]].astype(np.int32))
            obs_uv.append(k["obs_uv"][lv])
            obs_s2.append(k["obs_sigma2"][lv])
        obs_f = np.concatenate(obs_f)
        obs_p = np.concatenate(obs_p)
        obs_uv = np.concatenate(obs_uv)
        obs_s2 = np.concatenate(obs_s2)

        # pad point/observation counts to power-of-two buckets: run_local_ba
        # traces per shape, so raw dynamic sizes would recompile every call
        def _bucket(n: int) -> int:
            return 1 << max(4, (n - 1).bit_length())

        Np = _bucket(N)
        Kp = _bucket(len(obs_f))
        pad_k = Kp - len(obs_f)
        obs_valid = np.concatenate([np.ones(len(obs_f), bool),
                                    np.zeros(pad_k, bool)])
        obs_f = np.concatenate([obs_f, np.zeros(pad_k, np.int32)])
        obs_p = np.concatenate([obs_p, np.zeros(pad_k, np.int32)])
        obs_uv = np.concatenate([obs_uv, np.zeros((pad_k, 2), np.float32)])
        obs_s2 = np.concatenate([obs_s2, np.ones(pad_k, np.float32)])
        Xw_pad = np.zeros((Np, 3), np.float32)
        Xw_pad[:N] = self._pt_Xw[used_pts]
        point_valid = np.zeros(Np, bool)
        point_valid[:N] = self._pt_valid[used_pts]

        # ONE packed upload for the whole operand set (9 separate
        # jnp.asarray transfers paid ~9x the tunnel's per-array latency)
        (T_R_d, T_t_d, fv_d, ff_d, Xw_d, pv_d, of_d, op_d, ouv_d, ov_d,
         os2_d) = upload_packed((
             np.stack([k["T_R"] for k in kfs]).astype(np.float32),
             np.stack([k["T_t"] for k in kfs]).astype(np.float32),
             np.ones((M,), bool),
             np.asarray([i == 0 for i in range(M)]),
             Xw_pad, point_valid,
             obs_f.astype(np.int32), obs_p.astype(np.int32),
             obs_uv.astype(np.float32), obs_valid,
             obs_s2.astype(np.float32),
         ))
        prob = iba.IndirectBAProblem(
            T=SE3(R=T_R_d, t=T_t_d),
            frame_valid=fv_d,
            frame_fixed=ff_d,
            Xw=Xw_d,
            point_valid=pv_d,
            obs_frame=of_d,
            obs_point=op_d,
            obs_uv=ouv_d,
            obs_valid=ov_d,
            obs_sigma2=os2_d,
        )
        out = _run_local_ba(prob, self.cam)
        lb = {"used_pts": used_pts, "N": N, "kfs": kfs,
              "move_poses": move_poses}
        return lb, (out.Xw, out.T.R, out.T.t)

    def _complete_indirect_local_ba(self, lb, fetched):
        """Local BA COMPLETE half: write optimized points back into the
        arena and (when move_poses) poses back into the keyframe ring
        (reference: localOptimize's apply + setCameraAndDeform)."""
        Xw_new, R_new, t_new = fetched
        used_pts, N, kfs = lb["used_pts"], lb["N"], lb["kfs"]
        Xw_new = Xw_new[:N]
        if not np.isfinite(Xw_new).all():
            return
        self._pt_Xw[used_pts] = Xw_new
        mids = self._pt_mapid[used_pts]
        self.map.p_xyz[mids[mids >= 0]] = Xw_new[mids >= 0]
        self._map_dev = None
        # pose ownership: the exported trajectory is anchored to the direct
        # window's photometric BA (the spine). The indirect BA's pose
        # refinements update only ITS OWN keyframe ring (consistent
        # initialization of the next local BA + better reprojection matching)
        # — full pose takeover of the trajectory is the reference's mixed-BA
        # path (DSOBundleAdjustment.cpp:2674 addIndirectToProblem), which on
        # this architecture means injecting reprojection terms into the
        # photometric window, not overwriting marginalized history.
        if lb["move_poses"]:
            for fi, k in enumerate(kfs):
                k["T_R"], k["T_t"] = R_new[fi], t_new[fi]
