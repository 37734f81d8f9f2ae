"""Photometric residuals and analytic Jacobians, batched over point arenas.

The numerical core shared by the direct tracker, initializer, and windowed
photometric BA. TPU-native replacement for the reference's per-residual SSE
accumulation (reference: src/cml/optimization/dso/DSOTracker.cpp:421-470
computeHessian, DSOBundleAdjustment residual linearization, and the residual
pattern machinery in optimization/dso/DSOResidual): instead of scalar loops
with 4-wide SIMD accumulators, every quantity is an array over (points,
pattern) and the Hessian assembly is one einsum the XLA compiler maps onto
the MXU/VPU.

Model (DSO): point p lives in host frame i at pixel uv with inverse depth
rho; observed in target frame j through relative pose T_ji = T_j ∘ T_i^-1
(poses are world-to-camera). Each of the 8 pattern pixels warps with the
shared rho. The affine brightness residual is
    r_k = I_j[warp(uv + d_k)] - b_ji - s_ji * (color_k)
with s_ji = exp(a_j - a_i), b_ji the relative offset, color_k the host
intensity. Geometric Jacobians are evaluated at the point center and shared
across the pattern (DSO's approximation); the image gradient is per-pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.ops.image import bilinear

# DSO's 8-pixel residual pattern ("spread staircase", pattern #8).
PATTERN = jnp.array(
    [[0, -2], [-1, -1], [1, -1], [-2, 0], [0, 0], [2, 0], [-1, 1], [0, 2]],
    dtype=jnp.float32,
)
PATTERN_N = 8

# Single-pixel "pattern" for the coarse tracker (reference:
# CoarseTracker::calcRes uses ONE pixel per point at every level — the
# 8-pixel pattern exists only in the BA residuals). At coarse levels the
# full pattern spans +-8 level-0 pixels warped with ONE shared inverse
# depth; on slanted surfaces that displaces the photometric minimum by tens
# of percent of the translation and the coarse-to-fine schedule then drags
# even a perfect initialization into the biased basin.
PATTERN_CENTER = jnp.zeros((1, 2), dtype=jnp.float32)


@struct.dataclass
class ResidualEval:
    """Everything the solvers need from one (points x target-frame) sweep."""

    r: jax.Array          # (P, 8) residuals
    w: jax.Array          # (P, 8) robust (Huber x gradient) weights
    valid: jax.Array      # (P,) point-level validity (in-bounds, positive depth)
    energy: jax.Array     # (P,) Huber energy per point (masked)
    uv_j: jax.Array       # (P, 2) warped center pixel in target
    g: jax.Array          # (P, 8, 2) target image gradient at warped pattern
    J_uv_Xj: jax.Array    # (P, 2, 3) d(pixel)/d(target-frame point)
    X_i: jax.Array        # (P, 3) point in host camera frame
    X_j: jax.Array        # (P, 3) point in target camera frame
    s_ji: jax.Array       # scalar brightness scale exp(a_j - a_i)


def huber_weight(r: jax.Array, k: float) -> jax.Array:
    """Huber IRLS weight: 1 inside, k/|r| outside."""
    ar = jnp.abs(r)
    return jnp.where(ar <= k, 1.0, k / jnp.maximum(ar, 1e-12))


def huber_energy(r: jax.Array, k: float) -> jax.Array:
    """Huber loss value (so accept/reject compares the true robust energy)."""
    ar = jnp.abs(r)
    return jnp.where(ar <= k, 0.5 * r * r, k * (ar - 0.5 * k))


def pattern_uv(uv: jax.Array, level_scale: float = 1.0,
               pattern: jax.Array | None = None) -> jax.Array:
    """(P, 2) center pixels -> (P, K, 2) pattern pixels (offsets are in
    level-local pixels, so no scaling of the pattern itself)."""
    pat = PATTERN if pattern is None else pattern
    return uv[:, None, :] + pat[None, :, :] * level_scale


def proj_jacobian(cam: PinholeCamera, X: jax.Array) -> jax.Array:
    """d(pixel)/d(camera point): (P, 2, 3) for points (P, 3)."""
    x, y, z = X[..., 0], X[..., 1], X[..., 2]
    iz = 1.0 / jnp.maximum(z, 1e-8)
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    row_u = jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], axis=-1)
    row_v = jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


def evaluate_residuals(
    grad_j: jax.Array,       # (H, W, 3) target [value, gx, gy] at this level
    cam: PinholeCamera,      # intrinsics at this level
    uv: jax.Array,           # (P, 2) host pixels at this level
    idepth: jax.Array,       # (P,) inverse depth in host frame
    color: jax.Array,        # (P, 8) host pattern intensities at this level
    weight: jax.Array,       # (P, 8) per-pixel gradient weights (host-side)
    T_ji: SE3,               # relative pose target<-host
    a_ji: jax.Array,         # relative log brightness scale
    b_ji: jax.Array,         # relative brightness offset
    huber_k: float = 9.0,
    border: float = 2.0,
    cutoff: float | None = None,
    pattern: jax.Array | None = None,
) -> ResidualEval:
    """One masked sweep of photometric residuals of a point set against one
    target frame. Fully batched; everything out-of-bounds or behind the
    camera is masked, not branched. `pattern` selects the residual support
    (default: DSO 8-pattern; the tracker passes PATTERN_CENTER)."""
    X_i = cam.unproject(uv, idepth)                       # (P, 3)
    X_j = T_ji.apply(X_i)                                 # (P, 3)
    uv_j_center, valid_z = cam.project(X_j)

    # Warp all pattern pixels with the shared inverse depth.
    p_uv = pattern_uv(uv, pattern=pattern)                # (P, K, 2)
    Xp_i = cam.unproject(p_uv, idepth[:, None])           # (P, 8, 3)
    Xp_j = SE3(R=T_ji.R, t=T_ji.t).apply(Xp_i)
    uv_jk, valid_zk = cam.project(Xp_j)                   # (P, 8, 2)

    in_bounds = cam.in_bounds(uv_jk, border=border)       # (P, 8)
    valid = valid_z & jnp.all(valid_zk & in_bounds, axis=-1)

    sample = bilinear(grad_j, uv_jk)                      # (P, 8, 3)
    I_j = sample[..., 0]
    g = sample[..., 1:3]                                  # (P, 8, 2)

    s_ji = jnp.exp(a_ji)
    r = I_j - b_ji - s_ji * color                         # (P, 8)

    w_huber = huber_weight(r, huber_k)
    w = w_huber * weight
    e_pat = huber_energy(r, huber_k)
    if cutoff is not None:
        # DSO's hard cutoff (setting_coarseCutoffTH, DSOTracker.cpp:51-85):
        # residuals beyond `cutoff` get ZERO weight — under plain Huber a
        # coherent outlier population (occluded points: foreground color,
        # background depth) keeps a constant k*J pull per point and biases
        # the pose; the cutoff removes their gradient entirely while their
        # energy saturates at the cap (keeps accept/reject monotone).
        over = jnp.abs(r) > cutoff
        w = jnp.where(over, 0.0, w)
        e_pat = jnp.minimum(e_pat, huber_energy(jnp.asarray(cutoff), huber_k))
    w = jnp.where(valid[:, None], w, 0.0)
    energy = jnp.where(valid, jnp.sum(weight * e_pat, axis=-1), 0.0)

    return ResidualEval(
        r=r,
        w=w,
        valid=valid,
        energy=energy,
        uv_j=uv_j_center,
        g=g,
        J_uv_Xj=proj_jacobian(cam, X_j),
        X_i=X_i,
        X_j=X_j,
        s_ji=s_ji,
    )


def rel_pose_jacobian(ev: ResidualEval, color: jax.Array) -> jax.Array:
    """Jacobian of residuals wrt the 8-dof RELATIVE state
    [v(3), w(3), a_ji, b_ji] (the tracker's parameterization;
    reference: DSOTracker 6 pose + 2 affine, DSOTracker.cpp:421-470).

    Left-multiplicative perturbation of T_ji: X_j' = exp(xi) X_j
    => dX_j/dv = I, dX_j/dw = -skew(X_j).
    Returns (P, 8, 8): per pattern pixel, d r_k / d state."""
    from libcml_tpu.core.lie import skew

    # d(pixel)/d(xi): (P, 2, 6)
    J_Xj_xi = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=ev.X_j.dtype), (*ev.X_j.shape[:-1], 3, 3)),
            -skew(ev.X_j),
        ],
        axis=-1,
    )  # (P, 3, 6)
    J_uv_xi = jnp.einsum("pij,pjk->pik", ev.J_uv_Xj, J_Xj_xi)  # (P, 2, 6)
    # dr_k/dxi = g_k . J_uv_xi (shared center Jacobian, per-pattern gradient)
    J_geo = jnp.einsum("pkc,pcd->pkd", ev.g, J_uv_xi)          # (P, 8, 6)
    # affine: dr/da_ji = -s * color (since s = e^a), dr/db_ji = -1
    J_a = (-ev.s_ji * color)[..., None]                        # (P, 8, 1)
    J_b = -jnp.ones_like(J_a)
    return jnp.concatenate([J_geo, J_a, J_b], axis=-1)         # (P, 8, 8)


def idepth_jacobian(ev: ResidualEval, T_ji: SE3, idepth: jax.Array) -> jax.Array:
    """Jacobian of residuals wrt the host inverse depth: (P, 8).

    X_j = R_ji X_i + t_ji with X_i proportional to 1/rho:
    dX_j/drho = -(X_j - t_ji)/rho."""
    dXj_drho = -(ev.X_j - T_ji.t) / jnp.maximum(idepth, 1e-8)[:, None]   # (P, 3)
    J_uv_rho = jnp.einsum("pij,pj->pi", ev.J_uv_Xj, dXj_drho)            # (P, 2)
    return jnp.einsum("pkc,pc->pk", ev.g, J_uv_rho)                      # (P, 8)


def gauss_newton_system(J: jax.Array, r: jax.Array, w: jax.Array):
    """Weighted GN normal equations from per-pattern Jacobians.

    J: (P, 8, D), r: (P, 8), w: (P, 8) -> H (D, D), b (D,), chi2 scalar.
    One einsum — this is the reduction the reference hand-rolls with SSE
    accumulators (MatrixAccumulators.h)."""
    Jw = J * w[..., None]
    H = jnp.einsum("pkd,pke->de", Jw, J)
    b = jnp.einsum("pkd,pk->d", Jw, r)
    chi2 = jnp.sum(w * r * r)
    return H, b, chi2
