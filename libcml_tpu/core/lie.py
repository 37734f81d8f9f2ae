"""SO(3)/SE(3) Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's rotation algebra and pose type
(reference: src/cml/maths/Rotation.h:12-113, src/cml/map/Camera.h:27). Unlike
the reference's scalar quaternion/axis-angle classes, everything here operates
on arrays with arbitrary leading batch dimensions so that whole arenas of poses
can be transformed in one fused XLA op.

Conventions:
  - Rotations are (..., 3, 3) matrices; tangents are (..., 3) axis-angle.
  - SE(3) elements are (R, t) pairs packed in the `SE3` pytree; the action is
    x_out = R @ x + t.
  - `se3_exp` uses the standard twist convention xi = (v, w) with the V-matrix
    coupling translation and rotation.
All ops guard small angles with Taylor expansions so gradients are finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_EPS = 1e-8


def skew(w: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def _sinc_coeffs(theta2: jax.Array):
    """Return A = sin(t)/t, B = (1-cos(t))/t^2, C = (t-sin(t))/t^3 with Taylor
    fallbacks for small t (t2 = t^2)."""
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / theta2)
    return A, B, C


def _skew_sq(w: jax.Array) -> jax.Array:
    """K(w) @ K(w) computed analytically as w w^T - |w|^2 I — exact in f32 and
    avoids a (possibly reduced-precision) matmul."""
    theta2 = jnp.sum(w * w, axis=-1)
    outer = w[..., :, None] * w[..., None, :]
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), outer.shape)
    return outer - theta2[..., None, None] * I


def so3_exp(w: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrix (..., 3, 3) (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta2)
    K = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return I + A[..., None, None] * K + B[..., None, None] * _skew_sq(w)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> axis-angle (..., 3).

    Handles the theta ~ 0 and theta ~ pi branches without data-dependent
    control flow (everything is computed and selected with where).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # Generic branch: w = theta/(2 sin theta) * vee(R - R^T)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-5
    # theta/(2 sin theta) ~ 0.5 + theta^2/12 for small theta
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.maximum(2.0 * sin_t, _EPS),
    )
    w_generic = factor[..., None] * vee

    # Near-pi branch: w = theta * axis, axis from diagonal of (R + I)/2.
    near_pi = theta > jnp.pi - 1e-3
    B = (R + jnp.eye(3, dtype=R.dtype)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.maximum(diag, 0.0))
    # Resolve signs relative to the largest-magnitude component.
    k = jnp.argmax(axis_abs, axis=-1)
    # off-diagonal averages give products axis_i*axis_j
    off = jnp.stack(
        [
            0.5 * (B[..., 0, 1] + B[..., 1, 0]),
            0.5 * (B[..., 0, 2] + B[..., 2, 0]),
            0.5 * (B[..., 1, 2] + B[..., 2, 1]),
        ],
        axis=-1,
    )  # (xy, xz, yz)

    def signed_axis(k, axis_abs, off):
        ax, ay, az = axis_abs[..., 0], axis_abs[..., 1], axis_abs[..., 2]
        xy, xz, yz = off[..., 0], off[..., 1], off[..., 2]
        # k == 0: x positive, y,z signs from xy,xz
        a0 = jnp.stack([ax, jnp.sign(xy) * ay, jnp.sign(xz) * az], axis=-1)
        a1 = jnp.stack([jnp.sign(xy) * ax, ay, jnp.sign(yz) * az], axis=-1)
        a2 = jnp.stack([jnp.sign(xz) * ax, jnp.sign(yz) * ay, az], axis=-1)
        sel = jnp.stack([a0, a1, a2], axis=-2)  # (..., 3, 3)
        return jnp.take_along_axis(sel, k[..., None, None], axis=-2)[..., 0, :]

    axis = signed_axis(k, axis_abs, off)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.maximum(norm, _EPS)
    w_pi = theta[..., None] * axis
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def so3_V(w: jax.Array) -> jax.Array:
    """Left Jacobian V of SO(3): exp(xi)_t = V(w) @ v."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta2)
    K = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return I + B[..., None, None] * K + C[..., None, None] * _skew_sq(w)


def so3_V_inv(w: jax.Array) -> jax.Array:
    """Inverse left Jacobian of SO(3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    small = theta2 < 1e-8
    half_theta = 0.5 * theta
    cot = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), _EPS))
        / jnp.maximum(theta2, _EPS),
    )
    return I - 0.5 * K + cot[..., None, None] * _skew_sq(w)


@struct.dataclass
class SE3:
    """Rigid transform pytree: x -> R @ x + t, batched over leading dims."""

    R: jax.Array  # (..., 3, 3)
    t: jax.Array  # (..., 3)

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "SE3":
        R = jnp.broadcast_to(jnp.eye(3, dtype=dtype), (*batch_shape, 3, 3))
        t = jnp.zeros((*batch_shape, 3), dtype=dtype)
        return cls(R=R, t=t)

    def apply(self, x: jax.Array) -> jax.Array:
        """Transform points x (..., 3)."""
        return jnp.einsum("...ij,...j->...i", self.R, x) + self.t

    def compose(self, other: "SE3") -> "SE3":
        """self ∘ other: first apply `other`, then `self`."""
        return SE3(
            R=self.R @ other.R,
            t=jnp.einsum("...ij,...j->...i", self.R, other.t) + self.t,
        )

    def inverse(self) -> "SE3":
        Rt = jnp.swapaxes(self.R, -1, -2)
        return SE3(R=Rt, t=-jnp.einsum("...ij,...j->...i", Rt, self.t))

    def to(self, other: "SE3") -> "SE3":
        """Relative transform: maps other-frame coords into self-frame coords
        when both are world-to-camera poses (reference: Camera::to,
        src/cml/map/Camera.h). self.to(other) = self ∘ other^-1."""
        return self.compose(other.inverse())

    def normalized(self) -> "SE3":
        """Project R back onto SO(3) (nearest rotation by SVD).

        Load-bearing for any pose fed back through itself: the constant-
        velocity model pred = curr ∘ prev^-1 ∘ curr SQUARES the pose, which
        doubles R's orthonormality defect every frame — f32's ~1e-7 per
        compose grows exponentially and det(R) visibly collapses within a
        few dozen frames (the inverse() of a non-orthonormal R then no
        longer inverts, and everything downstream is silently wrong). One
        3x3 SVD per use is noise-level cost."""
        U, _, Vt = jnp.linalg.svd(self.R)
        d = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", U, Vt))
        fix = jnp.concatenate(
            [jnp.ones_like(d[..., None]), jnp.ones_like(d[..., None]),
             d[..., None]], axis=-1,
        )
        R = jnp.einsum("...ij,...j,...jk->...ik", U, fix, Vt)
        return SE3(R=R, t=self.t)

    def matrix34(self) -> jax.Array:
        return jnp.concatenate([self.R, self.t[..., None]], axis=-1)

    def adjoint(self) -> jax.Array:
        """(..., 6, 6) adjoint for twists ordered (v, w)."""
        tK = skew(self.t)
        top = jnp.concatenate([self.R, tK @ self.R], axis=-1)
        bottom = jnp.concatenate([jnp.zeros_like(self.R), self.R], axis=-1)
        return jnp.concatenate([top, bottom], axis=-2)


def se3_exp(xi: jax.Array) -> SE3:
    """Twist (..., 6) ordered (v, w) -> SE3."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = so3_V(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return SE3(R=R, t=t)


def se3_log(T: SE3) -> jax.Array:
    """SE3 -> twist (..., 6) ordered (v, w)."""
    w = so3_log(T.R)
    Vinv = so3_V_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, T.t)
    return jnp.concatenate([v, w], axis=-1)


def se3_retract(T: SE3, xi: jax.Array) -> SE3:
    """Left-multiplicative retraction exp(xi) ∘ T (the GN update used by the
    direct solver; matches DSO's left-compose convention)."""
    return se3_exp(xi).compose(T)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) (w, x, y, z) -> rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (..., 4) (w, x, y, z), branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by max pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) * 0.5
    q0 = jnp.stack(
        [qw0, (m21 - m12) / jnp.maximum(4 * qw0, _EPS), (m02 - m20) / jnp.maximum(4 * qw0, _EPS), (m10 - m01) / jnp.maximum(4 * qw0, _EPS)],
        axis=-1,
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) * 0.5
    q1 = jnp.stack(
        [(m21 - m12) / jnp.maximum(4 * qx1, _EPS), qx1, (m01 + m10) / jnp.maximum(4 * qx1, _EPS), (m02 + m20) / jnp.maximum(4 * qx1, _EPS)],
        axis=-1,
    )
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) * 0.5
    q2 = jnp.stack(
        [(m02 - m20) / jnp.maximum(4 * qy2, _EPS), (m01 + m10) / jnp.maximum(4 * qy2, _EPS), qy2, (m12 + m21) / jnp.maximum(4 * qy2, _EPS)],
        axis=-1,
    )
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) * 0.5
    q3 = jnp.stack(
        [(m10 - m01) / jnp.maximum(4 * qz3, _EPS), (m02 + m20) / jnp.maximum(4 * qz3, _EPS), (m12 + m21) / jnp.maximum(4 * qz3, _EPS), qz3],
        axis=-1,
    )
    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    k = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, k[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def slerp(q0: jax.Array, q1: jax.Array, alpha) -> jax.Array:
    """Spherical interpolation between quaternions (used by groundtruth
    resampling; reference interpolates GT poses for TUM timestamps)."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - alpha, jnp.sin((1 - alpha) * theta) / jnp.maximum(sin_t, _EPS))
    w1 = jnp.where(small, alpha, jnp.sin(alpha * theta) / jnp.maximum(sin_t, _EPS))
    q = w0 * q0 + w1 * q1
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
