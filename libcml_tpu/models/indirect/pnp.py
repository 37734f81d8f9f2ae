"""Motion-only PnP: pose optimization over 3D-2D matches with Huber + covariance.

TPU-native replacement for the reference's g2o IndirectCameraOptimizer
(reference: src/cml/optimization/g2o/IndirectCameraOptimizer.cpp:4,201 —
VertexSE3Expmap + unary EdgeSE3ProjectXYZOnlyPose, 4 rounds x 10 iterations
with chi2 outlier re-classification between rounds, optional 6x6 pose
covariance for the MOD-SLAM decision logic).

Design: the g2o graph is overkill for a motion-only problem — every edge is
unary, so the normal equations are a single (N, 2, 6) Jacobian batch reduced
by einsum. Rounds/iterations mirror the reference: lax.scan over 4 rounds,
each 10 LM steps on the currently-inlying set, then a chi2 re-classification
(all masked ops, no dynamic shapes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp, skew

_CHI2_2D = 5.991  # 95% chi2 with 2 dof (the reference's threshold)


@struct.dataclass
class PnPResult:
    T: SE3                # optimized world-to-camera pose
    inlier: jax.Array     # (N,) bool final inlier classification
    num_inliers: jax.Array
    cov: jax.Array        # (6, 6) pose covariance (inverse Hessian)
    chi2: jax.Array       # total inlier chi2


def _residuals(T: SE3, Xw: jax.Array, uv: jax.Array, cam: PinholeCamera):
    Xc = jnp.einsum("ij,nj->ni", T.R, Xw) + T.t
    pred, z_ok = cam.project(Xc)
    r = pred - uv                                       # (N, 2)
    return r, Xc, z_ok


def _jacobian(Xc: jax.Array, cam: PinholeCamera) -> jax.Array:
    """(N, 2, 6) d(reproj)/d(xi) for left-multiplied update exp(xi) T."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    iz = 1.0 / jnp.maximum(z, 1e-9)
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    # d uv / d Xc
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], -1),
            jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], -1),
        ],
        axis=-2,
    )                                                   # (N, 2, 3)
    # d Xc / d xi = [I | -skew(Xc)]
    J_X = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3)), -skew(Xc)], axis=-1
    )                                                   # (N, 3, 6)
    return jnp.einsum("nuc,ncd->nud", J_proj, J_X)


def solve_pnp(
    Xw: jax.Array,          # (N, 3) world points
    uv: jax.Array,          # (N, 2) observed pixels
    valid: jax.Array,       # (N,) candidate mask
    T_init: SE3,
    cam: PinholeCamera,
    sigma2: jax.Array | float = 1.0,   # per-match measurement variance (px^2)
    rounds: int = 4,
    iters_per_round: int = 10,
) -> PnPResult:
    """Jittable motion-only PnP with per-round chi2 outlier reclassification."""
    sigma2 = jnp.broadcast_to(jnp.asarray(sigma2, jnp.float32), Xw.shape[:1])
    w_meas = 1.0 / sigma2

    def lm_step(carry, _):
        T, inlier, lam = carry
        r, Xc, z_ok = _residuals(T, Xw, uv, cam)
        ok = inlier & z_ok
        chi2 = jnp.sum(r * r, -1) * w_meas
        # Huber on the chi2 (reference: RobustKernelHuber, delta^2 = 5.991)
        hub = jnp.where(chi2 > _CHI2_2D, jnp.sqrt(_CHI2_2D / jnp.maximum(chi2, 1e-12)), 1.0)
        w = jnp.where(ok, w_meas * hub, 0.0)
        J = _jacobian(Xc, cam)
        H = jnp.einsum("nud,n,nue->de", J, w, J)
        b = jnp.einsum("nud,n,nu->d", J, w, r)
        H = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6)
        dx = jnp.linalg.solve(H, b)
        T_new = se3_exp(-dx).compose(T)
        # energy-based accept
        r_new, _, _ = _residuals(T_new, Xw, uv, cam)
        E = jnp.sum(jnp.where(ok, jnp.minimum(chi2, _CHI2_2D * jnp.sqrt(jnp.maximum(chi2 / _CHI2_2D, 1.0))), 0.0))
        chi2n = jnp.sum(r_new * r_new, -1) * w_meas
        E_new = jnp.sum(jnp.where(ok, jnp.minimum(chi2n, _CHI2_2D * jnp.sqrt(jnp.maximum(chi2n / _CHI2_2D, 1.0))), 0.0))
        accept = E_new < E
        T = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), T, T_new)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e3))
        return (T, inlier, lam), E

    def round_body(carry, _):
        T, inlier = carry
        (T, _, _), _ = jax.lax.scan(
            lm_step, (T, inlier, jnp.asarray(1e-4, jnp.float32)), None,
            length=iters_per_round,
        )
        # re-classify on the UN-robustified chi2 (reference does exactly this
        # between its 4 optimize() calls)
        r, _, z_ok = _residuals(T, Xw, uv, cam)
        chi2 = jnp.sum(r * r, -1) * w_meas
        inlier = valid & z_ok & (chi2 < _CHI2_2D)
        return (T, inlier), None

    (T, inlier), _ = jax.lax.scan(
        round_body, (T_init, valid), None, length=rounds
    )

    # final covariance from the inlier Gauss-Newton Hessian
    r, Xc, _ = _residuals(T, Xw, uv, cam)
    J = _jacobian(Xc, cam)
    w = jnp.where(inlier, w_meas, 0.0)
    H = jnp.einsum("nud,n,nue->de", J, w, J) + 1e-6 * jnp.eye(6)
    cov = jnp.linalg.inv(H)
    chi2 = jnp.sum(jnp.where(inlier, jnp.sum(r * r, -1) * w_meas, 0.0))
    return PnPResult(
        T=T, inlier=inlier, num_inliers=jnp.sum(inlier), cov=cov, chi2=chi2
    )


def triangulate_linear(
    uv0: jax.Array, uv1: jax.Array, T_10: SE3, cam: PinholeCamera
) -> tuple[jax.Array, jax.Array]:
    """Batched linear two-view triangulation (Hartley 1997 DLT midpoint form;
    reference: Triangulation.h:116). Points in frame-0 coordinates.

    Returns (X0 (N, 3), valid (N,) — positive depth in both views)."""
    x0 = cam.normalized(uv0)                           # (N, 2)
    x1 = cam.normalized(uv1)
    R, t = T_10.R, T_10.t

    # Each view contributes two rows of A X = b: with projection
    # X_v = P_R X + P_t and normalized obs (x, y),
    #   (x * P_R[2] - P_R[0]) . X = P_t[0] - x * P_t[2]   (same for y / row 1)
    def rows(x, P_R, P_t):
        # x: (N, 2); P_R: (3, 3); P_t: (3,) -> A (N, 2, 3), b (N, 2)
        r1 = x[..., 0:1] * P_R[None, 2, :] - P_R[None, 0, :]   # (N, 3)
        r2 = x[..., 1:2] * P_R[None, 2, :] - P_R[None, 1, :]
        b1 = P_t[0] - x[..., 0] * P_t[2]                       # (N,)
        b2 = P_t[1] - x[..., 1] * P_t[2]
        return jnp.stack([r1, r2], -2), jnp.stack([b1, b2], -1)

    A0, b0 = rows(x0, jnp.eye(3, dtype=x0.dtype), jnp.zeros(3, x0.dtype))
    A1, b1 = rows(x1, R, t)
    A = jnp.concatenate([A0, A1], axis=-2)             # (N, 4, 3)
    b = jnp.concatenate([b0, b1], axis=-1)             # (N, 4)

    AtA = jnp.einsum("nij,nik->njk", A, A) + 1e-9 * jnp.eye(3)
    Atb = jnp.einsum("nij,ni->nj", A, b)
    X0 = jnp.linalg.solve(AtA, Atb[..., None])[..., 0]
    X1 = jnp.einsum("ij,nj->ni", R, X0) + t
    valid = (X0[..., 2] > 1e-4) & (X1[..., 2] > 1e-4)
    return X0, valid
