"""Calib SLAM: self-calibration variant running on top of the hybrid.

TPU-native replacement for the reference's Calib SLAM
(reference: src/cml/slam/calib/Calib.{h,cpp} — Calib.h:5 runs on top of
Hybrid; :28-56 optimizes a distortion map + gamma LUT from tracked points
and persists them; :121-161 export).

Run it on RAW (unrectified, response-uncorrected) footage with a pinhole
guess; while the hybrid tracks, it harvests
  - geometric correspondences: indirect map points (camera-frame) vs their
    OBSERVED corner pixels at every indirect keyframe, feeding the
    parametric radtan distortion fit (models/calib.calibrate_distortion),
  - photometric pairs: tracked point intensities across frames of known
    exposure, feeding the response-curve fit (calibrate_response).
finalize() fits both and returns a Calibration (remap + gamma) ready to
rectify subsequent runs; save() persists the maps like the reference does.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import Calibration, PinholeCamera
from libcml_tpu.models import calib as calib_mod
from libcml_tpu.ops.image import bilinear
from libcml_tpu.runtime.hybrid import HybridOdometry


class CalibSlam(HybridOdometry):
    """Hybrid SLAM + self-calibration harvesting."""

    # raw distorted footage: Hartley-Sturm correction would project the
    # distortion signal onto the assumed-pinhole epipolar constraint and
    # bias the fit (see _epipolar_triangulate)
    optimal_triangulation = False

    def __init__(self, cam: PinholeCamera, *args, **kw):
        super().__init__(cam, *args, **kw)
        # geometric correspondences (camera-frame point, observed pixel)
        self._geo_Xc: list[np.ndarray] = []
        self._geo_uv: list[np.ndarray] = []
        # photometric pairs (I_ref, I_new, exposure ratio)
        self._pho: list[tuple[np.ndarray, np.ndarray, float, np.ndarray]] = []
        self._prev_exposure = 1.0

    def process(self, image, timestamp, gt_pose_c2w=None, exposure: float = 1.0):
        out = super().process(image, timestamp, gt_pose_c2w,
                              exposure=exposure)
        # photometric pairs: reference point colors vs the new frame sampled
        # at their tracked positions, when the exposure ratio is known
        if (
            out.get("ok")
            and self._tracker_ref is not None
            and exposure > 0
            and self._prev_exposure > 0
        ):
            ref = self._tracker_ref
            T_rel = self._T_curr.compose(self._kf_T.inverse())
            X = self.cam.unproject(ref.uv[0], ref.idepth)
            uv_j, z_ok = self.cam.project(T_rel.apply(X))
            img = jnp.asarray(image, jnp.float32)
            I_new = bilinear(img, uv_j)
            ok = np.asarray(
                ref.valid[0] & z_ok & self.cam.in_bounds(uv_j, border=2.0)
            )
            self._pho.append((
                np.asarray(ref.color[0][:, 0]),
                np.asarray(I_new),
                exposure / self._prev_exposure,
                ok,
            ))
            self._pho = self._pho[-64:]
        self._prev_exposure = exposure
        return out

    def _on_indirect_kf(self, k: dict) -> None:
        # harvest geometric correspondences from this keyframe's recorded
        # observations (map point in camera frame vs observed corner pixel)
        super()._on_indirect_kf(k)
        if not len(k["obs_point"]):
            return
        Xw = self._pt_Xw[k["obs_point"]]
        Xc = Xw @ k["T_R"].T + k["T_t"]
        self._geo_Xc.append(Xc.astype(np.float32))
        self._geo_uv.append(k["obs_uv"])
        self._geo_Xc = self._geo_Xc[-64:]
        self._geo_uv = self._geo_uv[-64:]

    # -- calibration outputs --------------------------------------------------

    def fit_distortion(self) -> np.ndarray | None:
        """[k1, k2, p1, p2] from the harvested correspondences, or None."""
        if not self._geo_Xc:
            return None
        Xc = np.concatenate(self._geo_Xc)
        uv = np.concatenate(self._geo_uv)
        ok = np.isfinite(Xc).all(1) & np.isfinite(uv).all(1) & (Xc[:, 2] > 0.1)
        # hard pre-filter: points far outside the field of view or with
        # huge identity-model residuals have Jacobian magnitudes (r^6
        # terms) that overflow f32 — Huber downweighting is not enough
        with np.errstate(invalid="ignore"):
            xn = Xc[:, :2] / np.maximum(Xc[:, 2:3], 1e-6)
            ok &= (np.abs(xn) < 2.0).all(1)
            pred_u = float(self.cam.fx) * xn[:, 0] + float(self.cam.cx)
            pred_v = float(self.cam.fy) * xn[:, 1] + float(self.cam.cy)
            r0 = np.hypot(pred_u - uv[:, 0], pred_v - uv[:, 1])
            ok &= np.nan_to_num(r0, nan=np.inf) < 30.0
        if ok.sum() < 50:
            return None
        return np.asarray(calib_mod.calibrate_distortion(
            jnp.asarray(Xc), jnp.asarray(uv), jnp.asarray(ok), self.cam,
            radial_only=True,
        ))

    def fit_response(self) -> np.ndarray | None:
        """(256,) inverse-response LUT from exposure-pair intensities, or
        None when no exposure variation was seen."""
        pairs = [p for p in self._pho if abs(p[2] - 1.0) > 1e-3]
        if len(pairs) < 4:
            return None
        i1 = np.concatenate([p[0] for p in pairs])
        i2 = np.concatenate([p[1] for p in pairs])
        e = np.concatenate([np.full(len(p[0]), p[2], np.float32)
                            for p in pairs])
        ok = np.concatenate([p[3] for p in pairs])
        c = calib_mod.calibrate_response(
            jnp.asarray(i1), jnp.asarray(i2), jnp.asarray(e), jnp.asarray(ok)
        )
        return calib_mod.response_lut(c)

    def finalize(self) -> Calibration:
        """Fit everything harvested and return the resulting Calibration
        (remap + gamma; pinhole unchanged)."""
        params = self.fit_distortion()
        remap = None
        if params is not None:
            remap = jnp.asarray(calib_mod.distortion_map(
                jnp.asarray(params), self.cam
            ))
        lut = self.fit_response()
        return Calibration(
            pinhole=self.cam,
            remap=remap,
            gamma=jnp.asarray(lut) if lut is not None else None,
        )

    def save(self, path: str) -> None:
        """Persist the fitted calibration (reference: Calib.h:28-56 BMP /
        binary export of the distortion map + LUT)."""
        cal = self.finalize()
        np.savez(
            path,
            remap=(np.asarray(cal.remap) if cal.remap is not None
                   else np.zeros(0)),
            gamma=(np.asarray(cal.gamma) if cal.gamma is not None
                   else np.zeros(0)),
            fx=float(self.cam.fx), fy=float(self.cam.fy),
            cx=float(self.cam.cx), cy=float(self.cam.cy),
            width=self.cam.width, height=self.cam.height,
        )
