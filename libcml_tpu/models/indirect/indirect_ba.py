"""Indirect (reprojection) local bundle adjustment: batched GN/LM with a
Schur complement over 3D points.

TPU-native replacement for the reference's g2o/Ceres indirect BAs
(reference: src/cml/optimization/g2o/IndirectBundleAdjustment.cpp:7
localOptimize — ORB-SLAM-style local BA: local keyframes + fixed frames,
VertexSE3Expmap + VertexPointXYZ + EdgeSE3ProjectXYZ with Huber, two stages
(5 + 10 iterations) with chi2 outlier pruning between them; and
src/cml/optimization/ceres/IndirectBundleAdjustment.{h,cpp}).

TPU-first design: the g2o graph is replaced by flat observation arrays
(frame index, point index, pixel) with validity masks; one linearization is
a single batched sweep producing (K, 2, 6) pose and (K, 2, 3) point
Jacobians; the point block of the normal equations is block-diagonal (3x3
per point) and eliminated with a batched 3x3 solve, leaving a dense
(M*6, M*6) camera system assembled by one-hot einsum — the same
Schur-over-landmarks structure as the photometric BA, in geometric form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp, skew

_CHI2_2D = 5.991


@struct.dataclass
class IndirectBAProblem:
    """Flat, fixed-capacity local-BA problem (M frame slots, N point slots,
    K observation slots)."""

    T: SE3               # (M,) world-to-camera poses
    frame_valid: jax.Array   # (M,) bool
    frame_fixed: jax.Array   # (M,) bool: poses held constant (reference:
                             # the covisible-but-not-local fixed frames)
    Xw: jax.Array        # (N, 3) world points
    point_valid: jax.Array   # (N,) bool
    obs_frame: jax.Array     # (K,) int32
    obs_point: jax.Array     # (K,) int32
    obs_uv: jax.Array        # (K, 2)
    obs_valid: jax.Array     # (K,) bool
    obs_sigma2: jax.Array    # (K,) measurement variance in px^2 (per-level)


def _residuals(prob: IndirectBAProblem, cam: PinholeCamera):
    Xc = (
        jnp.einsum("kij,kj->ki", prob.T.R[prob.obs_frame],
                   prob.Xw[prob.obs_point])
        + prob.T.t[prob.obs_frame]
    )                                                    # (K, 3)
    pred, z_ok = cam.project(Xc)
    r = pred - prob.obs_uv                               # (K, 2)
    active = (
        prob.obs_valid
        & z_ok
        & prob.frame_valid[prob.obs_frame]
        & prob.point_valid[prob.obs_point]
    )
    return r, Xc, active


def _jacobians(prob: IndirectBAProblem, Xc: jax.Array, cam: PinholeCamera):
    """(K, 2, 6) pose (left-perturbation) and (K, 2, 3) point Jacobians."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    iz = 1.0 / jnp.maximum(z, 1e-9)
    iz2 = iz * iz
    zero = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * iz, zero, -cam.fx * x * iz2], -1),
            jnp.stack([zero, cam.fy * iz, -cam.fy * y * iz2], -1),
        ],
        axis=-2,
    )                                                    # (K, 2, 3)
    J_pose = jnp.einsum(
        "kuc,kcd->kud",
        J_proj,
        jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), Xc.shape[:-1] + (3, 3)), -skew(Xc)],
            axis=-1,
        ),
    )                                                    # (K, 2, 6)
    J_pt = jnp.einsum("kuc,kcd->kud", J_proj, prob.T.R[prob.obs_frame])
    return J_pose, J_pt


def _chi2_weights(r: jax.Array, sigma2: jax.Array, active: jax.Array):
    chi2 = jnp.sum(r * r, -1) / sigma2
    hub = jnp.where(
        chi2 > _CHI2_2D, jnp.sqrt(_CHI2_2D / jnp.maximum(chi2, 1e-12)), 1.0
    )
    w = jnp.where(active, hub / sigma2, 0.0)
    return w, chi2


def ba_energy(prob: IndirectBAProblem, cam: PinholeCamera) -> jax.Array:
    """Robust (Huber-on-chi2) total energy."""
    r, _, active = _residuals(prob, cam)
    chi2 = jnp.sum(r * r, -1) / prob.obs_sigma2
    e = jnp.where(
        chi2 <= _CHI2_2D, chi2,
        2.0 * jnp.sqrt(_CHI2_2D * jnp.maximum(chi2, 1e-12)) - _CHI2_2D,
    )
    return jnp.sum(jnp.where(active, e, 0.0))


def ba_step(prob: IndirectBAProblem, cam: PinholeCamera, lam: jax.Array):
    """One LM iteration with Schur elimination of the point block."""
    M = prob.T.t.shape[0]
    N = prob.Xw.shape[0]
    D = M * 6

    r, Xc, active = _residuals(prob, cam)
    w, _ = _chi2_weights(r, prob.obs_sigma2, active)
    J_c, J_p = _jacobians(prob, Xc, cam)

    free = prob.frame_valid & ~prob.frame_fixed          # (M,)
    w_eff = w                                            # (K,)

    onehot_f = jax.nn.one_hot(prob.obs_frame, M, dtype=r.dtype)   # (K, M)
    onehot_p = jax.nn.one_hot(prob.obs_point, N, dtype=r.dtype)   # (K, N)

    Jc_w = J_c * w_eff[:, None, None]
    # camera blocks (block-diagonal in frames since each obs touches 1 frame)
    H_cc_d = jnp.einsum("kud,kue,km->mde", Jc_w, J_c, onehot_f)   # (M, 6, 6)
    b_c = jnp.einsum("kud,ku,km->md", Jc_w, r, onehot_f)          # (M, 6)

    # point blocks
    Jp_w = J_p * w_eff[:, None, None]
    H_pp = jnp.einsum("kud,kue,kn->nde", Jp_w, J_p, onehot_p)     # (N, 3, 3)
    b_p = jnp.einsum("kud,ku,kn->nd", Jp_w, r, onehot_p)          # (N, 3)

    # cross blocks: W[m, n] = sum_k J_c^T w J_p — keep factored over K
    # (assembling (M, N, 6, 3) is fine at local-BA scale)
    W = jnp.einsum("kud,kue,km,kn->mnde", Jc_w, J_p, onehot_f, onehot_p)

    # LM damping + fixed-point guard, then batched 3x3 inverse
    H_pp_d = H_pp + (lam * jax.vmap(jnp.diag)(jax.vmap(jnp.diag)(H_pp))
                     + 1e-8 * jnp.eye(3))
    H_pp_d = jnp.where(
        prob.point_valid[:, None, None], H_pp_d,
        jnp.broadcast_to(jnp.eye(3), (N, 3, 3)),
    )
    H_pp_inv = jnp.linalg.inv(H_pp_d)
    H_pp_inv = jnp.where(prob.point_valid[:, None, None], H_pp_inv, 0.0)

    # Schur: H_sc = H_cc - W Hpp^-1 W^T  (couples frame pairs via points)
    WHinv = jnp.einsum("mnde,nef->mndf", W, H_pp_inv)             # (M, N, 6, 3)
    H_red = jnp.einsum("mndf,lngf->mldg", WHinv, W)               # (M, M, 6, 6)
    b_red = jnp.einsum("mndf,nf->md", WHinv, b_p)                 # (M, 6)

    H_full = -H_red
    H_full = H_full.at[jnp.arange(M), jnp.arange(M)].add(H_cc_d)
    b_full = (b_c - b_red).reshape(D)

    H_dense = jnp.transpose(H_full, (0, 2, 1, 3)).reshape(D, D)
    # damping + freeze fixed/invalid frames via identity rows
    free_d = jnp.repeat(free, 6)
    H_dense = jnp.where(
        free_d[:, None] & free_d[None, :], H_dense, 0.0
    ) + jnp.diag(jnp.where(free_d, 0.0, 1.0))
    H_dense = H_dense + lam * jnp.diag(jnp.diag(H_dense)) + 1e-7 * jnp.eye(D)
    b_full = jnp.where(free_d, b_full, 0.0)

    dx = jnp.linalg.solve(H_dense, b_full)                        # (D,)
    dx_f = dx.reshape(M, 6)

    # back-substitute points: dX = Hpp^-1 (b_p - W^T dx)
    Wt_dx = jnp.einsum("mnde,md->ne", W, dx_f)                    # (N, 3)
    dX = jnp.einsum("nde,ne->nd", H_pp_inv, b_p - Wt_dx)
    dX = jnp.where(prob.point_valid[:, None], dX, 0.0)

    T_new = se3_exp(-dx_f).compose(prob.T)
    T_new = jax.tree.map(
        lambda cur, new: jnp.where(
            free.reshape((-1,) + (1,) * (cur.ndim - 1)), new, cur
        ),
        prob.T, T_new,
    )
    return prob.replace(T=T_new, Xw=prob.Xw - dX)


def run_local_ba(
    prob: IndirectBAProblem,
    cam: PinholeCamera,
    stage1_iters: int = 5,
    stage2_iters: int = 10,
) -> IndirectBAProblem:
    """Two-stage local BA with chi2 observation pruning between stages
    (reference: IndirectBundleAdjustment::localOptimize — 5 iters, prune
    chi2 > 5.991 edges, 10 more iters)."""

    def lm_loop(prob, iters):
        def step(carry, _):
            p, E, lam = carry
            cand = ba_step(p, cam, lam)
            E_new = ba_energy(cand, cam)
            accept = E_new < E
            p = jax.tree.map(
                lambda a, b: jnp.where(jnp.reshape(accept, (1,) * a.ndim), b, a),
                p, cand,
            )
            E = jnp.where(accept, E_new, E)
            lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-9),
                            jnp.minimum(lam * 5.0, 1e3))
            return (p, E, lam), E

        E0 = ba_energy(prob, cam)
        (prob, _, _), _ = jax.lax.scan(
            step, (prob, E0, jnp.asarray(1e-5, jnp.float32)), None, length=iters
        )
        return prob

    prob = lm_loop(prob, stage1_iters)
    # chi2 prune (un-robustified, as the reference does between stages)
    r, _, active = _residuals(prob, cam)
    chi2 = jnp.sum(r * r, -1) / prob.obs_sigma2
    prob = prob.replace(obs_valid=prob.obs_valid & active & (chi2 < _CHI2_2D))
    prob = lm_loop(prob, stage2_iters)
    # final prune for callers reading inlier observations
    r, _, active = _residuals(prob, cam)
    chi2 = jnp.sum(r * r, -1) / prob.obs_sigma2
    return prob.replace(obs_valid=prob.obs_valid & active & (chi2 < _CHI2_2D))
