"""Global SLAM map: SoA frame/point tables with group bitmasks,
covisibility, the deform-graph trajectory, groundtruth error tracking and
TUM/KITTI/CSV export.

TPU-native replacement for the reference's map layer (reference:
src/cml/map/Map.{h,cpp} — Map.h:31 thread-safe frame/point container with 32
frame-groups + 32 point-groups bitmask taxonomy GroupsManager.h:8, slab SoA
render buffers Map.cpp:188-219, covisibility processIndirectCovisiblity
Map.cpp:449, groundtruth error refresh Map.cpp:578, exportResults Map.cpp:597;
Frame.h:21 — deform graph Frame.h:58-68 / setCameraAndDeform Frame.cpp:51-92;
MapObject.h:28 map points; GroupsManager.h:10).

Design: the reference builds a mutex-guarded pointer graph with epoch-GC so
reader threads survive concurrent deletion; under the TPU architecture the
device holds fixed-capacity working arenas (direct window / indirect local
map) and THIS host-side map is the single-writer system of record — plain
growable SoA numpy arrays (the reference's own render path already flattens
to SoA slabs, Map.cpp:188-219). Group taxonomy stays a uint32 bitmask per
frame/point: one vectorized mask-compare replaces per-group mirrored sets.

Frames store either an ABSOLUTE world-to-camera pose (keyframes) or a pose
RELATIVE to a reference keyframe (everything else): composing on read is the
deform graph — when optimization moves a keyframe, every frame anchored to
it moves along without being touched (reference: Frame::setCameraAndDeform /
computeNewCameraFromDeforms; single-anchor form)."""

from __future__ import annotations

import dataclasses

import numpy as np


class Groups:
    """Named bitmask groups, up to 32 each for frames and points
    (reference: GroupsManager.h:10, built-in groups Map.h:284-293)."""

    FRAME_BUILTINS = (
        "VALIDFRAME", "KEYFRAME", "INITFRAME", "ORBTRACKED", "DSOTRACKED",
        "RECOVERED", "INDIRECTKEYFRAME", "DIRECTKEYFRAME",
    )
    POINT_BUILTINS = (
        "MAPPED", "INDIRECTGROUP", "DIRECTGROUP", "IMMATUREINDIRECT",
        "ACTIVEINDIRECT", "OUTLIER",
    )

    def __init__(self):
        self._frame: dict[str, int] = {}
        self._point: dict[str, int] = {}
        for name in self.FRAME_BUILTINS:
            self.frame_group(name)
        for name in self.POINT_BUILTINS:
            self.point_group(name)

    def _alloc(self, table: dict[str, int], name: str) -> int:
        if name not in table:
            if len(table) >= 32:
                raise RuntimeError("out of group bits (32 max)")
            table[name] = 1 << len(table)
        return table[name]

    def frame_group(self, name: str) -> int:
        return self._alloc(self._frame, name)

    def point_group(self, name: str) -> int:
        return self._alloc(self._point, name)


def _grow(arr: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((max(n, int(arr.shape[0] * 2)),) + arr.shape[1:], arr.dtype)
    out[: arr.shape[0]] = arr
    return out


@dataclasses.dataclass
class SlamMap:
    """System-of-record map. Single-writer host structure."""

    cap_frames: int = 1024
    cap_points: int = 65536

    def __post_init__(self):
        self.groups = Groups()
        C = self.cap_frames
        self.n_frames = 0
        self.f_timestamp = np.zeros(C)
        self.f_group = np.zeros(C, np.uint32)
        self.f_pose = np.tile(np.eye(4), (C, 1, 1))      # w2c (abs or rel)
        self.f_ref = np.full(C, -1, np.int64)            # deform anchor (-1 = absolute)
        self.f_ab = np.zeros((C, 2))
        self.f_gt = np.full((C, 4, 4), np.nan)           # groundtruth c2w

        P = self.cap_points
        self.n_points = 0
        self.p_xyz = np.zeros((P, 3))
        self.p_color = np.zeros(P)
        self.p_group = np.zeros(P, np.uint32)
        self.p_uncertainty = np.zeros(P)

        # observations: (frame, point) pairs for covisibility
        self._obs_f: list[int] = []
        self._obs_p: list[int] = []

    # -- frames --------------------------------------------------------------

    def add_frame(self, timestamp: float, pose_w2c: np.ndarray,
                  ref_frame: int = -1, gt_c2w: np.ndarray | None = None,
                  groups: int = 0) -> int:
        if self.n_frames >= self.f_pose.shape[0]:
            for name in ("f_timestamp", "f_group", "f_pose", "f_ref", "f_ab",
                         "f_gt"):
                setattr(self, name, _grow(getattr(self, name), self.n_frames + 1))
        i = self.n_frames
        self.n_frames += 1
        self.f_timestamp[i] = timestamp
        self.f_pose[i] = pose_w2c
        self.f_ref[i] = ref_frame
        self.f_group[i] = np.uint32(groups | self.groups.frame_group("VALIDFRAME"))
        if gt_c2w is not None:
            self.f_gt[i] = gt_c2w
        return i

    def set_keyframe(self, i: int, is_kf: bool = True):
        bit = np.uint32(self.groups.frame_group("KEYFRAME"))
        if is_kf:
            self.f_group[i] |= bit
        else:
            self.f_group[i] &= ~bit

    def set_pose(self, i: int, pose_w2c: np.ndarray, ref_frame: int = -1):
        """Update a frame pose (deform anchors of other frames follow
        automatically because composition happens on read)."""
        self.f_pose[i] = pose_w2c
        self.f_ref[i] = ref_frame

    def frames_in_group(self, name: str) -> np.ndarray:
        bit = np.uint32(self.groups.frame_group(name))
        return np.flatnonzero(self.f_group[: self.n_frames] & bit)

    def pose_w2c(self, i: int) -> np.ndarray:
        """Resolved world-to-camera pose (composing the deform chain)."""
        T = self.f_pose[i]
        ref = int(self.f_ref[i])
        hops = 0
        while ref >= 0:
            T = T @ self.f_pose[ref]
            ref = int(self.f_ref[ref])
            hops += 1
            if hops > 64:
                raise RuntimeError("deform chain loop")
        return T

    def trajectory_c2w(self) -> tuple[np.ndarray, np.ndarray]:
        n = self.n_frames
        out = np.zeros((n, 4, 4))
        for i in range(n):
            # SE3 inverse analytically (np.linalg.inv raises on degenerate
            # poses; a rigid transform inverts as [R^T | -R^T t])
            w2c = self.pose_w2c(i)
            R = w2c[:3, :3]
            out[i] = np.eye(4)
            out[i, :3, :3] = R.T
            out[i, :3, 3] = -R.T @ w2c[:3, 3]
        return self.f_timestamp[:n].copy(), out

    # -- points --------------------------------------------------------------

    def add_points(self, xyz: np.ndarray, color: np.ndarray | None = None,
                   groups: int = 0) -> np.ndarray:
        k = xyz.shape[0]
        while self.n_points + k > self.p_xyz.shape[0]:
            for name in ("p_xyz", "p_color", "p_group", "p_uncertainty"):
                setattr(self, name, _grow(getattr(self, name), self.n_points + k))
        idx = np.arange(self.n_points, self.n_points + k)
        self.n_points += k
        self.p_xyz[idx] = xyz
        if color is not None:
            self.p_color[idx] = color
        self.p_group[idx] = np.uint32(groups | self.groups.point_group("MAPPED"))
        return idx

    def points_in_group(self, name: str) -> np.ndarray:
        bit = np.uint32(self.groups.point_group(name))
        return np.flatnonzero(self.p_group[: self.n_points] & bit)

    # -- covisibility ---------------------------------------------------------

    def add_observations(self, frame: int, points: np.ndarray):
        self._obs_f.extend([frame] * len(points))
        self._obs_p.extend(int(p) for p in points)

    def covisibility(self, min_shared: int = 1) -> dict[int, dict[int, int]]:
        """Keyframe covisibility counts from shared observed points
        (reference: processIndirectCovisiblity, Map.cpp:449)."""
        if not self._obs_f:
            return {}
        f = np.asarray(self._obs_f)
        p = np.asarray(self._obs_p)
        order = np.argsort(p, kind="stable")
        f, p = f[order], p[order]
        out: dict[int, dict[int, int]] = {}
        start = 0
        for end in np.flatnonzero(np.diff(p)).tolist() + [len(p) - 1]:
            fs = np.unique(f[start : end + 1])
            for a in fs:
                for b in fs:
                    if a != b:
                        out.setdefault(int(a), {}).setdefault(int(b), 0)
                        out[int(a)][int(b)] += 1
            start = end + 1
        if min_shared > 1:
            out = {
                a: {b: c for b, c in row.items() if c >= min_shared}
                for a, row in out.items()
            }
        return out

    # -- groundtruth error (live ATE/RPE) -------------------------------------

    def refresh_error_from_groundtruth(self) -> dict[str, float] | None:
        """Scale-corrected ATE + RPE vs stored GT (reference:
        Map::refreshErrorFromGroundtruth, Map.cpp:578)."""
        from libcml_tpu.eval.trajectory import ate_rmse, rpe_rmse

        n = self.n_frames
        have = ~np.isnan(self.f_gt[:n, 0, 0])
        if have.sum() < 3:
            return None
        _, est = self.trajectory_c2w()
        est = est[have]
        gt = self.f_gt[:n][have]
        return {
            "ate_rmse": float(ate_rmse(est[:, :3, 3], gt[:, :3, 3],
                                       with_scale=True)),
            "rpe_rmse": float(rpe_rmse(est, gt)),
        }

    # -- export ---------------------------------------------------------------

    def export_results(self, out_dir: str, prefix: str = "result"):
        """TUM + KITTI + CSV trajectories (x {estimate, groundtruth when
        available}), mirroring the reference's five-file export
        (reference: Map::exportResults, Map.cpp:597; modslam.cpp:393-410)."""
        import os

        from libcml_tpu.eval.trajectory import poses_to_kitti, poses_to_tum

        os.makedirs(out_dir, exist_ok=True)
        ts, est = self.trajectory_c2w()
        with open(os.path.join(out_dir, f"{prefix}_tum.txt"), "w") as fh:
            fh.write(poses_to_tum(ts, est))
        with open(os.path.join(out_dir, f"{prefix}_kitti.txt"), "w") as fh:
            fh.write(poses_to_kitti(est))
        with open(os.path.join(out_dir, f"{prefix}.csv"), "w") as fh:
            fh.write("timestamp,tx,ty,tz\n")
            for t, M in zip(ts, est):
                fh.write(f"{t},{M[0,3]},{M[1,3]},{M[2,3]}\n")
        n = self.n_frames
        have = ~np.isnan(self.f_gt[:n, 0, 0])
        if have.any():
            gt = self.f_gt[:n][have]
            with open(os.path.join(out_dir, f"{prefix}_gt_tum.txt"), "w") as fh:
                fh.write(poses_to_tum(ts[have], gt))
            with open(os.path.join(out_dir, f"{prefix}_gt_kitti.txt"), "w") as fh:
                fh.write(poses_to_kitti(gt))
