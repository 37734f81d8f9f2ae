"""Self-calibration: photometric response and lens distortion estimated
from tracked correspondences.

TPU-native replacement for the reference's Calib SLAM variant
(reference: src/cml/slam/calib/Calib.{h,cpp} — Calib.h:5,28-56: runs on top
of Hybrid and optimizes a per-pixel distortion map + gamma LUT from tracked
points, persisting both; the gamma LUT consumer is
image/LookupTable.h:8 GrayLookupTable).

TPU-first design: the reference's free-form per-pixel distortion map is a
poor fit for batched GN (a million unknowns, each seen by a handful of
residuals); the same lens physics is captured by a low-order parametric
model (radial k1/k2 + tangential p1/p2) fit by one batched
Gauss-Newton — every residual is a point reprojection, every iteration is
one einsum. The response curve uses the EMoR-style low-order basis
(Grosberg-Nayar): g(x) = x + sum_k c_k b_k(x) with smooth polynomial basis
functions, fit from intensity pairs of the same scene point seen in frames
of known exposure ratio (the standard photometric-calibration identity
I2 = g^{-1}(e * g(I1)))."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from libcml_tpu.core.camera import PinholeCamera


# ---------------------------------------------------------------------------
# Photometric response (gamma LUT)
# ---------------------------------------------------------------------------


def _response_basis(x: jax.Array, n_basis: int = 4) -> jax.Array:
    """Smooth perturbation basis on [0, 1] vanishing at both ends:
    b_k(x) = x^(k+1) * (1 - x). Returns (..., n_basis)."""
    return jnp.stack(
        [x ** (k + 1) * (1.0 - x) for k in range(n_basis)], axis=-1
    )


def apply_response(coeffs: jax.Array, x: jax.Array) -> jax.Array:
    """g(x): normalized intensity -> normalized irradiance, monotone-ish for
    small coeffs. x in [0, 1]."""
    return x + _response_basis(x, coeffs.shape[0]) @ coeffs


def calibrate_response(
    i1: jax.Array,
    i2: jax.Array,
    exposure_ratio: jax.Array,
    valid: jax.Array,
    n_basis: int = 4,
    iters: int = 20,
) -> jax.Array:
    """Fit response coefficients from intensity pairs (i1, i2) in [0, 255] of
    the same points under exposure ratio e = t2/t1, minimizing
    r = g(i2/255) - e * g(i1/255) with Huber weights. Returns (n_basis,)
    coefficients; the 256-entry LUT comes from response_lut()."""
    x1 = jnp.asarray(i1, jnp.float32) / 255.0
    x2 = jnp.asarray(i2, jnp.float32) / 255.0
    e = jnp.asarray(exposure_ratio, jnp.float32)
    w0 = valid.astype(jnp.float32)

    B1 = _response_basis(x1, n_basis)           # (N, K)
    B2 = _response_basis(x2, n_basis)

    def step(c, _):
        r = (x2 + B2 @ c) - e * (x1 + B1 @ c)
        J = B2 - e[:, None] * B1                # (N, K)
        hub = jnp.where(jnp.abs(r) > 0.02, 0.02 / jnp.maximum(jnp.abs(r), 1e-9), 1.0)
        w = w0 * hub
        H = J.T @ (w[:, None] * J) + 1e-6 * jnp.eye(n_basis)
        b = J.T @ (w * r)
        return c - jnp.linalg.solve(H, b), None

    c0 = jnp.zeros((n_basis,), jnp.float32)
    c, _ = jax.lax.scan(step, c0, None, length=iters)
    return c


def response_lut(coeffs: jax.Array) -> np.ndarray:
    """(256,) float32 inverse-response LUT in irradiance units (scaled back
    to ~[0, 255]) — drop-in for Calibration.gamma."""
    x = jnp.linspace(0.0, 1.0, 256)
    return np.asarray(apply_response(coeffs, x) * 255.0, np.float32)


# ---------------------------------------------------------------------------
# Lens distortion
# ---------------------------------------------------------------------------


def calibrate_distortion(
    Xc: jax.Array,
    uv_obs: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    iters: int = 15,
    radial_only: bool = False,
) -> jax.Array:
    """Fit radial-tangential distortion [k1, k2, p1, p2] mapping the ideal
    projection of camera-frame points Xc (N, 3) onto their OBSERVED raw
    pixels uv_obs (N, 2) — batched GN with autodiff Jacobians (the model is
    4 parameters; forward-mode through the distortion is one jacfwd)."""
    xn = Xc[:, :2] / jnp.maximum(Xc[:, 2:3], 1e-6)
    # clip invalid rows into a sane range: their weight is zero, but inf/nan
    # Jacobian entries (r^6 growth) would still poison H via inf * 0 = nan
    xn = jnp.clip(jnp.nan_to_num(xn, nan=0.0, posinf=0.0, neginf=0.0),
                  -3.0, 3.0)
    w0 = valid.astype(jnp.float32) * (Xc[:, 2] > 1e-4)

    def predict(params):
        k1, k2, p1, p2 = params
        x, y = xn[:, 0], xn[:, 1]
        r2 = x * x + y * y
        rad = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        u = cam.fx * xd + cam.cx
        v = cam.fy * yd + cam.cy
        return jnp.stack([u, v], -1)

    def step(params, _):
        res = predict(params) - uv_obs                       # (N, 2)
        # Huber on the pixel residual norm: harvested SLAM matches contain
        # gross outliers and the 4-parameter model must not chase them
        rn = jnp.linalg.norm(res, axis=-1)
        hub = jnp.where(rn > 3.0, 3.0 / jnp.maximum(rn, 1e-9), 1.0)
        r = res.reshape(-1)                                  # (2N,)
        J = jax.jacfwd(lambda p: predict(p).reshape(-1))(params)  # (2N, 4)
        w = jnp.repeat(w0 * hub, 2)
        H = J.T @ (w[:, None] * J) + 1e-8 * jnp.eye(4)
        b = J.T @ (w * r)
        if radial_only:
            # self-calibration from SLAM geometry: the tangential terms are
            # weakly observable and overfit correspondence noise — pin them
            pin = jnp.array([0.0, 0.0, 1e12, 1e12], jnp.float32)
            H = H + jnp.diag(pin)
        return params - jnp.linalg.solve(H, b), None

    p0 = jnp.zeros((4,), jnp.float32)
    p, _ = jax.lax.scan(step, p0, None, length=iters)
    return p


def distortion_map(params: jax.Array, cam: PinholeCamera) -> np.ndarray:
    """Materialize the fitted model as the reference's per-pixel map
    (Calib.h:28-55 persists exactly this): (H, W, 2) raw source pixel for
    every ideal pixel — plugs into Calibration.remap."""
    from libcml_tpu.core.camera import build_remap

    k1, k2, p1, p2 = [float(v) for v in np.asarray(params)]

    def distort(xn):
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        rad = 1.0 + k1 * r2 + k2 * r2 * r2
        xd = x * rad + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * rad + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        return np.stack([xd, yd], -1)

    K = np.array([[float(cam.fx), 0, float(cam.cx)],
                  [0, float(cam.fy), float(cam.cy)], [0, 0, 1]])
    return build_remap(cam, K, distort)
