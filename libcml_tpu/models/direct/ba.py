"""Windowed photometric bundle adjustment with FEJ + marginalization.

TPU-native replacement for the reference's DSOBundleAdjustment
(reference: src/cml/optimization/dso/DSOBundleAdjustment.cpp:744 run,
:1284 solveLevenbergMarquardt, DSOBundleAdjustment.h:35 marginalizeFrame,
:46 marginalizePointsF, :48 computeNullspaces, :104 computeAdjoints,
:141-147 Hessian stitch, and the SSE accumulators in MatrixAccumulators.h).

TPU-first design:
  - The window is a FIXED arena of F keyframe slots and P point slots with
    validity masks; the residual set is the dense (P, F) grid of
    (point, target-frame) pairs with an activity mask — no pointer graphs,
    no dynamic shapes, no recompiles as the window evolves.
  - One linearization = one fused sweep producing all residuals, robust
    weights, and Jacobians as (P, F, ...) arrays; the 8-dof-per-frame
    Hessian blocks are assembled with einsum one-hot scatters (the MXU does
    the reduction the reference hand-rolls in SSE), and the per-point
    inverse depths are Schur-eliminated with a batched divide (the idepth
    block is diagonal by construction, as in DSO).
  - First-Estimate Jacobians: geometric Jacobians are evaluated at the
    linearization point (pose/affine/idepth stored when a frame/point
    enters the window); only the photometric residual uses current state.
  - Marginalization: dropping a frame Schur-eliminates its 8 dof from the
    running dense prior (H_m, b_m) over window slots after folding in the
    FEJ-shifted residuals of the points it hosts (res_toZeroF semantics);
    the prior's gradient is nullspace-orthogonalized against the global
    gauge directions (translation, rotation, scale), mirroring
    computeNullspaces/orthogonalize in the reference.

State layout (all static shapes; F = frame slots, P = point slots):
  frames : T (F), ab (F, 2), FEJ copies, delta (F, 8), valid (F,)
  points : uv (P, 2), host (P,), idepth (P,), idepth_fej (P,),
           color (P, 8), weight (P, 8), valid (P,)
  resid  : active (P, F) bool
  prior  : H_m (F*8, F*8), b_m (F*8,)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp, skew
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.residuals import (
    huber_energy,
    huber_weight,
    pattern_uv,
    proj_jacobian,
)
from libcml_tpu.ops.image import bilinear

_D = 8  # per-frame state dim: [v(3), w(3), a, b]


@struct.dataclass
class BAState:
    # frames (slot arrays, F slots)
    T: SE3                  # current world-to-camera poses (F, 3, 3)/(F, 3)
    ab: jax.Array           # (F, 2) per-frame affine brightness [a, b]
    T_fej: SE3              # linearization-point poses
    ab_fej: jax.Array       # (F, 2)
    delta: jax.Array        # (F, 8) accumulated left-tangent state - FEJ
    frame_valid: jax.Array  # (F,) bool

    # points (P slots)
    uv: jax.Array           # (P, 2) level-0 pixel in host frame
    host: jax.Array         # (P,) int32 host slot index
    idepth: jax.Array       # (P,)
    idepth_fej: jax.Array   # (P,)
    color: jax.Array        # (P, 8) host pattern intensities
    weight: jax.Array       # (P, 8) host gradient weights
    point_valid: jax.Array  # (P,) bool

    # residual activity (point x target frame)
    res_active: jax.Array   # (P, F) bool

    # marginalization prior over slot states
    H_m: jax.Array          # (F*8, F*8)
    b_m: jax.Array          # (F*8,)

    @property
    def num_frames(self) -> int:
        return self.ab.shape[0]

    @property
    def num_points(self) -> int:
        return self.uv.shape[0]


def empty_state(cfg: DirectConfig) -> BAState:
    F, P = cfg.max_frames, cfg.max_points
    return BAState(
        T=SE3.identity((F,)),
        ab=jnp.zeros((F, 2), jnp.float32),
        T_fej=SE3.identity((F,)),
        ab_fej=jnp.zeros((F, 2), jnp.float32),
        delta=jnp.zeros((F, _D), jnp.float32),
        frame_valid=jnp.zeros((F,), bool),
        uv=jnp.zeros((P, 2), jnp.float32),
        host=jnp.zeros((P,), jnp.int32),
        idepth=jnp.ones((P,), jnp.float32),
        idepth_fej=jnp.ones((P,), jnp.float32),
        color=jnp.zeros((P, 8), jnp.float32),
        weight=jnp.zeros((P, 8), jnp.float32),
        point_valid=jnp.zeros((P,), bool),
        res_active=jnp.zeros((P, F), bool),
        H_m=jnp.zeros((F * _D, F * _D), jnp.float32),
        b_m=jnp.zeros((F * _D,), jnp.float32),
    )


def anchor_first_frame(state: BAState, slot: int, cfg: DirectConfig) -> BAState:
    """Gauge anchor: a strong pose prior on the first keyframe's slot
    (reference: the first-frame prior added to the energy functional; the
    anchor then propagates through marginalization automatically)."""
    idx = slot * _D + jnp.arange(6)
    H_m = state.H_m.at[idx, idx].add(cfg.pose_prior_first)
    return state.replace(H_m=H_m)


# ---------------------------------------------------------------------------
# Mixed-BA indirect factors
# ---------------------------------------------------------------------------


@struct.dataclass
class IndirectFactors:
    """Fixed-capacity reprojection factors injected into the photometric
    window — MOD-SLAM's mixed bundle adjustment (reference:
    DSOBundleAdjustment.h:161 addIndirectToProblem,
    DSOBundleAdjustment.cpp:2674-2700 indirect Schur solve).

    Each of Q indirect map points is idepth-parameterized in a HOST window
    slot (anchor pixel uv, inverse depth rho) and observed as a matched ORB
    corner in other window slots; the 2-d reprojection residuals add to the
    pose block of the window's normal equations and the idepths are
    Schur-eliminated alongside the photometric ones. Factors are transient:
    rebuilt from the live indirect map at every keyframe event, never
    marginalized, so their Jacobians use CURRENT state (no FEJ needed)."""

    uv: jax.Array          # (Q, 2) anchor pixel in host frame (level 0)
    host: jax.Array        # (Q,) int32 host window slot
    idepth: jax.Array      # (Q,) inverse depth in host frame
    point_valid: jax.Array  # (Q,) bool
    obs_uv: jax.Array      # (Q, F, 2) observed corner in target slot
    obs_valid: jax.Array   # (Q, F) bool
    sigma2: jax.Array      # (Q, F) measurement variance (px^2, per level)

    @property
    def num_points(self) -> int:
        return self.uv.shape[0]


def empty_indirect(num_points: int, num_frames: int) -> IndirectFactors:
    Q, F = num_points, num_frames
    return IndirectFactors(
        uv=jnp.zeros((Q, 2), jnp.float32),
        host=jnp.zeros((Q,), jnp.int32),
        idepth=jnp.ones((Q,), jnp.float32),
        point_valid=jnp.zeros((Q,), bool),
        obs_uv=jnp.zeros((Q, F, 2), jnp.float32),
        obs_valid=jnp.zeros((Q, F), bool),
        sigma2=jnp.ones((Q, F), jnp.float32),
    )


_CHI2_2D = 5.991  # 95% chi2 with 2 dof (reference: g2o Huber delta)


def _linearize_indirect(
    state: BAState, ind: IndirectFactors, cam: PinholeCamera,
    cfg: DirectConfig,
):
    """(Q, F) reprojection residual sweep: r = proj(T_f T_h^-1 X_h) - obs.

    Returns r (Q, F, 2), w (Q, F) scalar robust weights (already /sigma2 and
    scaled by cfg.mixed_weight), J_t (Q, F, 2, 6), J_h (Q, F, 2, 6),
    J_rho (Q, F, 2), active (Q, F), energy (scalar, robust)."""
    Q, F = ind.num_points, state.num_frames

    rel = _pairwise_rel(state.T)                               # (F, F)
    T_qf = jax.tree.map(lambda x: x[ind.host], rel)            # (Q, F, ...)

    X_h = cam.unproject(ind.uv, ind.idepth)                    # (Q, 3)
    X_t = jnp.einsum("qfij,qj->qfi", T_qf.R, X_h) + T_qf.t     # (Q, F, 3)
    pred, z_ok = cam.project(X_t)                              # (Q, F, 2)
    r = pred - ind.obs_uv

    J_uv_Xt = proj_jacobian(cam, X_t)                          # (Q, F, 2, 3)
    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (Q, F, 3, 3))
    J_Xt_t = jnp.concatenate([eye3, -skew(X_t)], axis=-1)      # (Q, F, 3, 6)
    J_Xh = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (Q, 3, 3)), -skew(X_h)],
        axis=-1,
    )                                                          # (Q, 3, 6)
    J_Xt_h = -jnp.einsum("qfij,qjd->qfid", T_qf.R, J_Xh)       # (Q, F, 3, 6)
    J_t = jnp.einsum("qfuc,qfcd->qfud", J_uv_Xt, J_Xt_t)       # (Q, F, 2, 6)
    J_h = jnp.einsum("qfuc,qfcd->qfud", J_uv_Xt, J_Xt_h)
    dXt_drho = -(X_t - T_qf.t) / jnp.maximum(ind.idepth, 1e-8)[:, None, None]
    J_rho = jnp.einsum("qfuc,qfc->qfu", J_uv_Xt, dXt_drho)     # (Q, F, 2)

    fv = state.frame_valid
    not_self = ind.host[:, None] != jnp.arange(F)[None, :]
    active = (
        ind.obs_valid
        & ind.point_valid[:, None]
        & fv[None, :]
        & fv[ind.host][:, None]
        & not_self
        & z_ok
        & (X_t[..., 2] > 1e-4)
    )
    chi2 = jnp.sum(r * r, -1) / ind.sigma2                     # (Q, F)
    hub = jnp.where(
        chi2 > _CHI2_2D, jnp.sqrt(_CHI2_2D / jnp.maximum(chi2, 1e-12)), 1.0
    )
    w = jnp.where(active, cfg.mixed_weight * hub / ind.sigma2, 0.0)
    e = jnp.where(
        chi2 <= _CHI2_2D, chi2,
        2.0 * jnp.sqrt(_CHI2_2D * jnp.maximum(chi2, 1e-12)) - _CHI2_2D,
    )
    energy = cfg.mixed_weight * jnp.sum(jnp.where(active, e, 0.0))
    return r, w, J_t, J_h, J_rho, active, energy


def _assemble_indirect(
    state: BAState, ind: IndirectFactors, cam: PinholeCamera,
    cfg: DirectConfig,
):
    """Normal-equation contributions of the indirect factors: dense pose-only
    H (F*8, F*8 — affine rows zero), b, plus the diagonal idepth block and
    its camera coupling for the Schur complement."""
    Q, F = ind.num_points, state.num_frames
    D = F * _D
    r, w, J_t, J_h, J_rho, active, energy = _linearize_indirect(
        state, ind, cam, cfg
    )

    # lift (…, 6) pose Jacobians to the 8-dof slot layout (affine cols zero)
    pad = ((0, 0), (0, 0), (0, 0), (0, 2))
    J_t8 = jnp.pad(J_t, pad)                                  # (Q, F, 2, 8)
    J_h8 = jnp.pad(J_h, pad)

    onehot_h = jax.nn.one_hot(ind.host, F, dtype=r.dtype)     # (Q, F)
    Jt_w = J_t8 * w[..., None, None]
    Jh_w = J_h8 * w[..., None, None]

    H_tt = jnp.einsum("qfud,qfue->fde", Jt_w, J_t8)
    H_hh = jnp.einsum("qfud,qfue,qh->hde", Jh_w, J_h8, onehot_h)
    H_th = jnp.einsum("qfud,qfue,qh->fhde", Jt_w, J_h8, onehot_h)
    b_t = jnp.einsum("qfud,qfu->fd", Jt_w, r)
    b_h = jnp.einsum("qfud,qfu,qh->hd", Jh_w, r, onehot_h)

    diag = H_tt + H_hh
    H_full = (
        H_th
        + jnp.transpose(H_th, (1, 0, 3, 2))
        + jnp.zeros((F, F, _D, _D), r.dtype)
        .at[jnp.arange(F), jnp.arange(F)]
        .add(diag)
    )
    H = jnp.transpose(H_full, (0, 2, 1, 3)).reshape(D, D)
    b = (b_t + b_h).reshape(D)

    # idepth block (diagonal over Q) + coupling rows
    H_rho = jnp.einsum("qfu,qf,qfu->q", J_rho, w, J_rho)
    b_rho = jnp.einsum("qfu,qf,qfu->q", J_rho, w, r)
    Hx_t = jnp.einsum("qfud,qf,qfu->qfd", J_t8, w, J_rho)     # (Q, F, 8)
    Hx_h = jnp.einsum("qfud,qf,qfu->qd", J_h8, w, J_rho)      # (Q, 8)
    H_xr = Hx_t.reshape(Q, D) + jnp.einsum(
        "qd,qh->qhd", Hx_h, onehot_h
    ).reshape(Q, D)
    return H, b, H_rho, b_rho, H_xr, active, energy


def indirect_energy(
    state: BAState, ind: IndirectFactors, cam: PinholeCamera,
    cfg: DirectConfig,
) -> jax.Array:
    *_, energy = _linearize_indirect(state, ind, cam, cfg)
    return energy


# ---------------------------------------------------------------------------
# Linearization
# ---------------------------------------------------------------------------


@struct.dataclass
class Linearization:
    """All (P, F) residual quantities one BA iteration needs."""

    r: jax.Array        # (P, F, 8) residuals at CURRENT state
    w: jax.Array        # (P, F, 8) robust*gradient*active weights
    J_t: jax.Array      # (P, F, 8, 8) d r / d target-frame state (FEJ)
    J_h: jax.Array      # (P, F, 8, 8) d r / d host-frame state (FEJ)
    J_rho: jax.Array    # (P, F, 8) d r / d idepth (FEJ)
    active: jax.Array   # (P, F) residual active & in-bounds & positive depth
    energy: jax.Array   # (P, F) per-residual Huber energy (masked)


def _pairwise_rel(T: SE3) -> SE3:
    """All relative poses T_rel[i, j] = T_j ∘ T_i^-1 (target j <- host i).
    (F, F) batched compose — the reference's precomputed pairwise transforms
    (DSOFrame precomputed transforms)."""
    F = T.t.shape[0]
    Ti = jax.tree.map(lambda x: jnp.repeat(x[:, None], F, axis=1), T)   # host i
    Tj = jax.tree.map(lambda x: jnp.repeat(x[None, :], F, axis=0), T)   # target j
    return Tj.compose(Ti.inverse())


def linearize(
    state: BAState,
    images: jax.Array,      # (F, H, W, 3) level-0 gradient images per slot
    cam: PinholeCamera,
    cfg: DirectConfig,
) -> Linearization:
    """One dense (P, F) linearization sweep. FEJ: geometry at linearization
    point, residual at current state."""
    P, F = state.num_points, state.num_frames

    rel_cur = _pairwise_rel(state.T)       # (F, F) current
    rel_fej = _pairwise_rel(state.T_fej)   # (F, F) FEJ

    host = state.host                       # (P,)
    # gather per-point relative poses for every target: (P, F, 3, 3)/(P, F, 3)
    T_cur = jax.tree.map(lambda x: x[host], rel_cur)
    T_fej = jax.tree.map(lambda x: x[host], rel_fej)

    # ---- current-state warp + residual -----------------------------------
    p_uv = pattern_uv(state.uv)                            # (P, 8, 2)
    Xp_i = cam.unproject(p_uv, state.idepth[:, None])      # (P, 8, 3)
    # warp through every target: (P, F, 8, 3)
    Xp_j = jnp.einsum("pfij,pkj->pfki", T_cur.R, Xp_i) + T_cur.t[:, :, None, :]
    uv_j, valid_z = cam.project(Xp_j)                      # (P, F, 8, 2)
    in_b = cam.in_bounds(uv_j, border=2.0)
    geo_ok = jnp.all(valid_z & in_b, axis=-1)              # (P, F)

    # sample target images: vmap the gather over the F axis
    sample = jax.vmap(bilinear, in_axes=(0, 1), out_axes=1)(images, uv_j)
    I_j = sample[..., 0]                                   # (P, F, 8)
    g = sample[..., 1:3]                                   # (P, F, 8, 2)

    # relative affine from per-frame (a, b):
    #   r = I_j - b_ji - e^{a_j - a_i} * color,  b_ji = b_j - e^{a_j-a_i} b_i
    a_i = state.ab[host, 0][:, None]                       # (P, 1)
    b_i = state.ab[host, 1][:, None]
    a_j = state.ab[None, :, 0]                             # (1, F)
    b_j = state.ab[None, :, 1]
    s_ji = jnp.exp(a_j - a_i)                              # (P, F)
    r = I_j - b_j[:, :, None] - s_ji[:, :, None] * (state.color[:, None, :] - b_i[:, :, None])

    # ---- FEJ geometry for Jacobians ---------------------------------------
    X_i0 = cam.unproject(state.uv, state.idepth_fej)       # (P, 3) center, FEJ
    X_j0 = jnp.einsum("pfij,pj->pfi", T_fej.R, X_i0) + T_fej.t   # (P, F, 3)
    J_uv_Xj = proj_jacobian(cam, X_j0)                     # (P, F, 2, 3)

    eye3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (P, F, 3, 3))
    # target perturbation: dX_j/dxi_j = [I | -skew(X_j)]
    J_Xj_t = jnp.concatenate([eye3, -skew(X_j0)], axis=-1)           # (P, F, 3, 6)
    # host perturbation: dX_j/dxi_i = -R_ji [I | -skew(X_i)]
    J_Xi = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), (P, 3, 3)), -skew(X_i0)],
        axis=-1,
    )                                                                # (P, 3, 6)
    J_Xj_h = -jnp.einsum("pfij,pjd->pfid", T_fej.R, J_Xi)            # (P, F, 3, 6)

    J_uv_t = jnp.einsum("pfuc,pfcd->pfud", J_uv_Xj, J_Xj_t)          # (P, F, 2, 6)
    J_uv_h = jnp.einsum("pfuc,pfcd->pfud", J_uv_Xj, J_Xj_h)
    Jg_t = jnp.einsum("pfku,pfud->pfkd", g, J_uv_t)                  # (P, F, 8, 6)
    Jg_h = jnp.einsum("pfku,pfud->pfkd", g, J_uv_h)

    # idepth: dX_j/drho = -(X_j - t_ji)/rho (FEJ)
    dXj_drho = -(X_j0 - T_fej.t) / jnp.maximum(state.idepth_fej, 1e-8)[:, None, None]
    J_uv_rho = jnp.einsum("pfuc,pfc->pfu", J_uv_Xj, dXj_drho)        # (P, F, 2)
    J_rho = jnp.einsum("pfku,pfu->pfk", g, J_uv_rho)                 # (P, F, 8)

    # affine Jacobians (FEJ affine states)
    a_i0 = state.ab_fej[host, 0][:, None]
    b_i0 = state.ab_fej[host, 1][:, None]
    a_j0 = state.ab_fej[None, :, 0]
    s0 = jnp.exp(a_j0 - a_i0)                                        # (P, F)
    col0 = state.color[:, None, :] - b_i0[:, :, None]                # (P, F, 8)
    dr_daj = -s0[:, :, None] * col0                                  # (P, F, 8)
    dr_dai = s0[:, :, None] * col0
    dr_dbj = -jnp.ones_like(r)
    dr_dbi = jnp.broadcast_to(s0[:, :, None], r.shape)

    J_t = jnp.concatenate([Jg_t, dr_daj[..., None], dr_dbj[..., None]], axis=-1)
    J_h = jnp.concatenate([Jg_h, dr_dai[..., None], dr_dbi[..., None]], axis=-1)

    # ---- masks + robust weights -------------------------------------------
    fv = state.frame_valid
    not_self = state.host[:, None] != jnp.arange(F)[None, :]
    active = (
        state.res_active
        & state.point_valid[:, None]
        & fv[None, :]
        & fv[host][:, None]
        & not_self
        & geo_ok
    )
    w = huber_weight(r, cfg.huber_intensity) * state.weight[:, None, :]
    w = jnp.where(active[..., None], w, 0.0)
    energy = jnp.where(
        active,
        jnp.sum(state.weight[:, None, :] * huber_energy(r, cfg.huber_intensity), axis=-1),
        0.0,
    )
    return Linearization(r=r, w=w, J_t=J_t, J_h=J_h, J_rho=J_rho,
                         active=active, energy=energy)


# ---------------------------------------------------------------------------
# Normal equations: frame blocks + idepth Schur complement
# ---------------------------------------------------------------------------


def _assemble(
    lin: Linearization,
    state: BAState,
    cfg: DirectConfig,
    r_shift: jax.Array | None = None,
):
    """Build the Schur-reduced camera system.

    Returns (H_sc (F*8, F*8), b_sc (F*8,), H_rho (P,), b_rho (P,),
    H_xr (P, F*8)) where H_xr rows let callers back-substitute idepth steps.
    If r_shift is given it replaces the residual used for b (the
    res_toZeroF FEJ shift at marginalization time).
    """
    P, F = state.num_points, state.num_frames
    D = F * _D
    r = lin.r if r_shift is None else r_shift
    w = lin.w

    onehot_h = jax.nn.one_hot(state.host, F, dtype=r.dtype)           # (P, F)

    Jt_w = lin.J_t * w[..., None]                                     # (P, F, 8, 8)

    # frame-block Hessians (t = target axis f, h = host via one-hot)
    H_tt = jnp.einsum("pfkd,pfke->fde", Jt_w, lin.J_t)                # (F, 8, 8)
    H_hh = jnp.einsum("pfkd,pfke,ph->hde", lin.J_h * w[..., None], lin.J_h, onehot_h)
    H_th = jnp.einsum("pfkd,pfke,ph->fhde", Jt_w, lin.J_h, onehot_h)  # (F, F, 8, 8)

    b_t = jnp.einsum("pfkd,pfk->fd", Jt_w, r)                         # (F, 8)
    b_h = jnp.einsum("pfkd,pfk,ph->hd", lin.J_h * w[..., None], r, onehot_h)

    # Stitch into block form: the full per-residual Jacobian touches slots
    # (target f, host g), so H[f,g] += J_t^T W J_h, H[g,f] its transpose,
    # and the diagonal collects both roles. Same-slot residuals are masked
    # (not_self), so there is no double counting.
    diag = H_tt + H_hh                                                # (F, 8, 8)
    H_full = (
        H_th
        + jnp.transpose(H_th, (1, 0, 3, 2))
        + jnp.zeros((F, F, _D, _D), r.dtype)
        .at[jnp.arange(F), jnp.arange(F)]
        .add(diag)
    )
    b_full = (b_t + b_h).reshape(D)
    H_dense = jnp.transpose(H_full, (0, 2, 1, 3)).reshape(D, D)

    # idepth blocks
    Jr_w = lin.J_rho * w                                              # (P, F, 8)
    H_rho = jnp.einsum("pfk,pfk->p", Jr_w, lin.J_rho)                 # (P,)
    b_rho = jnp.einsum("pfk,pfk->p", Jr_w, r)                         # (P,)
    # H_xr: coupling of idepth with target slot f and host slot
    Hx_t = jnp.einsum("pfkd,pfk->pfd", Jt_w, lin.J_rho)               # (P, F, 8)
    Hx_h = jnp.einsum("pfkd,pfk->pd", lin.J_h * w[..., None], lin.J_rho)  # (P, 8)
    H_xr = Hx_t.reshape(P, D) + jnp.einsum("pd,ph->phd", Hx_h, onehot_h).reshape(P, D)

    return H_dense, b_full, H_rho, b_rho, H_xr


def _schur_reduce(H, b, H_rho, b_rho, H_xr, lam, point_valid):
    """Eliminate the (diagonal) idepth block with LM damping."""
    H_rho_d = jnp.where(point_valid, H_rho * (1.0 + lam) + 1e-10, 1.0)
    scale = jnp.where(point_valid, 1.0 / H_rho_d, 0.0)
    H_sc = H - jnp.einsum("pd,p,pe->de", H_xr, scale, H_xr)
    b_sc = b - jnp.einsum("pd,p->d", H_xr, b_rho * scale)
    return H_sc, b_sc, H_rho_d


def _gauge_priors(state: BAState, cfg: DirectConfig):
    """Diagonal priors: affine anchoring on valid slots + an identity guard
    on invalid slots so the dense solve stays non-singular (their dx = 0
    because their gradient is 0)."""
    F = state.num_frames
    ab_w = jnp.tile(
        jnp.array([0.0] * 6 + [cfg.ba_prior_a, cfg.ba_prior_b], jnp.float32), F
    )
    fv = jnp.repeat(state.frame_valid, _D)
    diag = jnp.where(fv, ab_w, 1.0)
    # gradient of 0.5*w*ab^2 at the current ab values
    ab_flat = jnp.zeros(F * _D, jnp.float32)
    ab_flat = ab_flat.at[jnp.arange(F) * _D + 6].set(state.ab[:, 0])
    ab_flat = ab_flat.at[jnp.arange(F) * _D + 7].set(state.ab[:, 1])
    b_prior = jnp.where(fv, diag * ab_flat, 0.0)
    return diag, b_prior


def total_energy(
    state: BAState, images: jax.Array, cam: PinholeCamera, cfg: DirectConfig,
    ind: IndirectFactors | None = None,
) -> jax.Array:
    """The exact functional the solver minimizes (photometric + prior +
    affine anchors + optional mixed-BA reprojection terms), for
    accept/reject consistency."""
    lin = linearize(state, images, cam, cfg)
    e_photo = jnp.sum(lin.energy)
    delta_flat = state.delta.reshape(-1)
    e_prior = jnp.dot(state.b_m, delta_flat) + 0.5 * jnp.dot(
        delta_flat, state.H_m @ delta_flat
    )
    fv = state.frame_valid
    e_ab = 0.5 * jnp.sum(
        jnp.where(fv, cfg.ba_prior_a * state.ab[:, 0] ** 2
                  + cfg.ba_prior_b * state.ab[:, 1] ** 2, 0.0)
    )
    e = e_photo + e_prior + e_ab
    if ind is not None:
        e = e + indirect_energy(state, ind, cam, cfg)
    return e


def ba_step(
    state: BAState,
    images: jax.Array,
    cam: PinholeCamera,
    cfg: DirectConfig,
    lam: jax.Array,
    ind: IndirectFactors | None = None,
):
    """One LM iteration: linearize, Schur-solve, back-substitute idepths.
    With `ind`, mixed-BA reprojection factors join the normal equations and
    their idepths are Schur-eliminated alongside the photometric ones.
    Returns (new_state, new_ind, lin)."""
    F = state.num_frames
    D = F * _D
    lin = linearize(state, images, cam, cfg)
    H, b, H_rho, b_rho, H_xr = _assemble(lin, state, cfg)

    if ind is not None:
        Hi, bi, Hi_rho, bi_rho, Hi_xr, _, _ = _assemble_indirect(
            state, ind, cam, cfg
        )
        H = H + Hi
        b = b + bi

    # marginalization prior (gradient at current state: b_m + H_m delta)
    delta_flat = state.delta.reshape(-1)
    H = H + state.H_m
    b = b + state.b_m + state.H_m @ delta_flat

    diag_prior, b_prior = _gauge_priors(state, cfg)
    H = H + jnp.diag(diag_prior)
    b = b + b_prior

    H_sc, b_sc, H_rho_d = _schur_reduce(H, b, H_rho, b_rho, H_xr, lam,
                                        state.point_valid)
    if ind is not None:
        H_sc, b_sc, Hi_rho_d = _schur_reduce(
            H_sc, b_sc, Hi_rho, bi_rho, Hi_xr, lam, ind.point_valid
        )
    H_sc = H_sc + lam * jnp.diag(jnp.diag(H_sc)) + 1e-6 * jnp.eye(D, dtype=H.dtype)
    dx = jnp.linalg.solve(H_sc, b_sc)                                  # (D,)

    # Project the SCALE gauge mode out of the step (reference:
    # orthogonalize(&x) after solving, DSOBundleAdjustment solveSystem /
    # DSOBundleAdjustment.h:149). Scale has ~zero photometric curvature, so
    # the raw solve takes noise-driven steps along it — the monocular scale
    # RANDOM-WALKS a few percent per BA run and the accumulated drift
    # eventually breaks the FEJ linearization and the tracker working off
    # the window. Global translation/rotation are NOT projected: they are
    # pinned by the first-frame anchor (and, once it is marginalized, by
    # the prior that inherits it), and projecting them would fight that
    # anchor — the solver then cannot remove the mean component of
    # per-frame errors and equilibrates away from the optimum.
    N = _nullspaces(state)[:, 6:7]                                     # (D, 1)
    coeff = jnp.linalg.solve(
        N.T @ N + 1e-6 * jnp.eye(1, dtype=dx.dtype), N.T @ dx
    )
    dx = dx - N @ coeff

    d_rho = (b_rho - H_xr @ dx) / H_rho_d
    d_rho = jnp.where(state.point_valid, d_rho, 0.0)

    dx_f = dx.reshape(F, _D)
    dx_f = jnp.where(state.frame_valid[:, None], dx_f, 0.0)
    T_new = se3_exp(-dx_f[:, :6]).compose(state.T)
    new_state = state.replace(
        T=jax.tree.map(
            lambda cur, new: jnp.where(
                state.frame_valid.reshape((-1,) + (1,) * (cur.ndim - 1)), new, cur
            ),
            state.T, T_new,
        ),
        ab=state.ab - dx_f[:, 6:],
        delta=state.delta - dx_f,
        idepth=jnp.clip(state.idepth - d_rho, cfg.idepth_min, cfg.idepth_max),
    )
    new_ind = ind
    if ind is not None:
        d_rho_i = (bi_rho - Hi_xr @ dx) / Hi_rho_d
        d_rho_i = jnp.where(ind.point_valid, d_rho_i, 0.0)
        new_ind = ind.replace(
            idepth=jnp.clip(ind.idepth - d_rho_i, cfg.idepth_min,
                            cfg.idepth_max)
        )
    return new_state, new_ind, lin


def run_ba(
    state: BAState,
    images: jax.Array,
    cam: PinholeCamera,
    cfg: DirectConfig,
) -> tuple[BAState, jax.Array]:
    """Fixed-iteration LM loop with accept/reject (jit-friendly; reference:
    DSOBundleAdjustment::run, 4 iterations with energy-based step control)."""

    E0 = total_energy(state, images, cam, cfg)

    def step(carry, _):
        st, E, lam = carry
        cand, _, _ = ba_step(st, images, cam, cfg, lam)
        E_new = total_energy(cand, images, cam, cfg)
        accept = E_new < E
        st = jax.tree.map(
            lambda a, b_: jnp.where(jnp.reshape(accept, (1,) * a.ndim), b_, a),
            st, cand,
        )
        E = jnp.where(accept, E_new, E)
        lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-7),
                        jnp.minimum(lam * 5.0, 1e2))
        return (st, E, lam), E

    (state, E, _), _ = jax.lax.scan(
        step, (state, E0, jnp.asarray(cfg.ba_lambda_init, jnp.float32)), None,
        length=cfg.ba_iters,
    )
    return state, E


def run_ba_mixed(
    state: BAState,
    images: jax.Array,
    cam: PinholeCamera,
    cfg: DirectConfig,
    ind: IndirectFactors,
) -> tuple[BAState, IndirectFactors, jax.Array]:
    """Joint photometric + indirect-reprojection LM over the window — the
    mixed bundle adjustment (reference: DSOBundleAdjustment.cpp:2674
    addIndirectToProblem + joint Schur solve). Same accept/reject loop as
    run_ba with the reprojection terms in both the normal equations and the
    energy; indirect idepths ride the carry."""

    E0 = total_energy(state, images, cam, cfg, ind)

    def step(carry, _):
        st, ii, E, lam = carry
        cand, cand_i, _ = ba_step(st, images, cam, cfg, lam, ii)
        E_new = total_energy(cand, images, cam, cfg, cand_i)
        accept = E_new < E
        st = jax.tree.map(
            lambda a, b_: jnp.where(jnp.reshape(accept, (1,) * a.ndim), b_, a),
            st, cand,
        )
        ii = jax.tree.map(
            lambda a, b_: jnp.where(jnp.reshape(accept, (1,) * a.ndim), b_, a),
            ii, cand_i,
        )
        E = jnp.where(accept, E_new, E)
        lam = jnp.where(accept, jnp.maximum(lam * 0.4, 1e-7),
                        jnp.minimum(lam * 5.0, 1e2))
        return (st, ii, E, lam), E

    (state, ind, E, _), _ = jax.lax.scan(
        step,
        (state, ind, E0, jnp.asarray(cfg.ba_lambda_init, jnp.float32)),
        None,
        length=cfg.ba_iters,
    )
    return state, ind, E


def relinearize(state: BAState) -> BAState:
    """Move the linearization point to the CURRENT state, shifting the
    marginalization prior's expansion point along (exact for a quadratic:
    E(d) = b·d + 0.5 d'Hd with d = d' + delta  =>  b' = b + H delta, H
    unchanged). Called once per keyframe event so Gauss-Newton always runs
    with fresh Jacobians — freezing geometry at insertion values (a stricter
    discipline than the reference's, which re-linearizes every iteration and
    applies FEJ only to the frame-state deltas entangled with the prior)
    stalls convergence once tracked states drift ~1 deg/percent from their
    insertion values. Spurious information gain along the gauge directions —
    the failure FEJ guards against — is excluded here by the explicit
    nullspace projection of every solved step (see ba_step)."""
    delta_flat = state.delta.reshape(-1)
    return state.replace(
        b_m=state.b_m + state.H_m @ delta_flat,
        delta=jnp.zeros_like(state.delta),
        T_fej=state.T,
        ab_fej=state.ab,
        idepth_fej=state.idepth,
    )


def refresh_fej(state: BAState) -> BAState:
    """Re-anchor the linearization point at the CURRENT state.

    FEJ exists to keep Jacobians consistent with the marginalization prior;
    while the prior is empty (or a pure diagonal gauge anchor, as right after
    initialization) there is no consistency to protect, and re-linearizing
    turns the solver into plain Gauss-Newton, removing the first-order bias
    a far-off linearization point leaves behind. Callers must NOT use this
    once off-diagonal marginalization information has been accumulated —
    doing so silently re-introduces the gauge drift FEJ prevents
    (reference: the FEJ discipline in DSOBundleAdjustment, EnergyFunctional
    adHost/adTarget evaluated at first estimates)."""
    return state.replace(
        T_fej=state.T,
        ab_fej=state.ab,
        idepth_fej=state.idepth,
        delta=jnp.zeros_like(state.delta),
    )


# ---------------------------------------------------------------------------
# Outlier management
# ---------------------------------------------------------------------------


def update_residual_status(
    state: BAState, images: jax.Array, cam: PinholeCamera, cfg: DirectConfig
) -> BAState:
    """Deactivate residuals whose energy exceeds the outlier threshold and
    points left with no active residual at all (reference: outlier ejection
    in linearizeAll + point status flags; a point's first residual appears
    when its host pairs with ONE other keyframe, so >=1 is the floor — a
    >=2 cut would wipe every point while the window holds two frames)."""
    lin = linearize(state, images, cam, cfg)
    good = lin.active & (lin.energy < cfg.outlier_energy)
    res_active = state.res_active & (good | ~lin.active)
    n_good = jnp.sum(good, axis=1)
    point_valid = state.point_valid & (n_good >= 1)
    return state.replace(res_active=res_active, point_valid=point_valid)


# ---------------------------------------------------------------------------
# Marginalization
# ---------------------------------------------------------------------------


def _psd_project(H: jax.Array) -> jax.Array:
    """Project a (nearly) symmetric matrix onto the PSD cone.

    Repeated float32 Schur complements on ~1e10-magnitude photometric
    Hessians leave H_m with small NEGATIVE eigenvalues; an indefinite
    quadratic prior is unbounded below, so the LM accept/reject test happily
    walks the window off to infinity (the failure mode is a hugely negative
    total energy). The reference avoids this by doing all marginalization
    algebra in double (scalar_t = double, types.h:365); on TPU we stay f32
    and enforce PSD explicitly — the window prior is (F*8)^2 = tiny, so the
    eigh is negligible."""
    H = 0.5 * (H + H.T)
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, 0.0)
    return (V * w[None, :]) @ V.T


def _psd_project_with_gradient(
    H: jax.Array, b: jax.Array, rel_floor: float = 1e-7
) -> tuple[jax.Array, jax.Array]:
    """PSD-project H AND restrict b to the numerically significant range of
    H. A proper Gaussian marginal always has its gradient inside the range
    of its Hessian; f32 roundoff breaks that, leaving gradient components
    along ~zero-curvature directions — an unbounded linear energy slope that
    LM rides to infinity even when H itself is PSD."""
    H = 0.5 * (H + H.T)
    w, V = jnp.linalg.eigh(H)
    w = jnp.maximum(w, 0.0)
    keep = w > rel_floor * jnp.max(w)
    H_out = (V * jnp.where(keep, w, 0.0)[None, :]) @ V.T
    b_out = V @ (jnp.where(keep, V.T @ b, 0.0))
    return H_out, b_out


def _nullspaces(state: BAState) -> jax.Array:
    """(F*8, 7) global gauge directions: world translation (3), world
    rotation (3), scale (1) — reference: computeNullspaces,
    DSOBundleAdjustment.h:48."""
    F = state.num_frames
    R, t = state.T.R, state.T.t
    fv = state.frame_valid[:, None, None]

    N = jnp.zeros((F, _D, 7), jnp.float32)
    # translation: eps_v = R_f s  (s = world shift)
    N = N.at[:, 0:3, 0:3].set(R * fv)
    # rotation: eps_v = skew(t_f) R_f phi, eps_w = R_f phi
    N = N.at[:, 0:3, 3:6].set(jnp.einsum("fij,fjk->fik", skew(t), R) * fv)
    N = N.at[:, 3:6, 3:6].set(R * fv)
    # scale: eps_v = t_f
    N = N.at[:, 0:3, 6].set(t * fv[..., 0])
    return N.reshape(F * _D, 7)


def orthogonalize_gradient(state: BAState, b: jax.Array) -> jax.Array:
    """Project the gauge directions out of a gradient vector (reference:
    orthogonalize, DSOBundleAdjustment.h:149)."""
    N = _nullspaces(state)
    NtN = N.T @ N + 1e-6 * jnp.eye(7, dtype=b.dtype)
    coeff = jnp.linalg.solve(NtN, N.T @ b)
    return b - N @ coeff


def marginalize_frame(
    state: BAState,
    images: jax.Array,
    cam: PinholeCamera,
    cfg: DirectConfig,
    slot: jax.Array,
    exact: bool = False,
) -> BAState:
    """Marginalize the keyframe in `slot`:
      1. fold the FEJ-shifted residuals of points hosted there into the
         prior (Schur over their idepths),
      2. drop those points + all residuals targeting the slot,
      3. Schur-eliminate the slot's 8 dof from (H_m, b_m),
      4. orthogonalize the prior gradient against the gauge nullspace.
    Jittable with a traced slot index."""
    F, P = state.num_frames, state.num_points
    D = F * _D
    slot = jnp.asarray(slot, jnp.int32)

    # --- 1. marginalize hosted points into the prior -----------------------
    hosted = state.point_valid & (state.host == slot)
    marg_state = state.replace(
        point_valid=hosted,
        # keep only residuals NOT targeting the slot itself (self-masked
        # anyway) — hosted points' residuals to other frames
    )
    lin = linearize(marg_state, images, cam, cfg)
    # FEJ shift: r0 = r - J_t dx_t - J_h dx_h - J_rho d_rho  (res_toZeroF)
    d_t = state.delta[None, :, None, :]                                # (1,F,1,8)
    d_h = state.delta[state.host][:, None, None, :]                    # (P,1,1,8)
    d_rho = (state.idepth - state.idepth_fej)[:, None, None]
    r0 = (
        lin.r
        - jnp.sum(lin.J_t * d_t, axis=-1)
        - jnp.sum(lin.J_h * d_h, axis=-1)
        - lin.J_rho * d_rho
    )
    H_pts, b_pts, H_rho, b_rho, H_xr = _assemble(lin, marg_state, cfg, r_shift=r0)
    H_rho_d = jnp.where(hosted, H_rho + 1e-8, 1.0)
    scale = jnp.where(hosted, 1.0 / H_rho_d, 0.0)
    H_add = H_pts - jnp.einsum("pd,p,pe->de", H_xr, scale, H_xr)
    b_add = b_pts - jnp.einsum("pd,p->d", H_xr, b_rho * scale)

    # marg-weight factor (reference: setting_margWeightFac = 0.5 applied to
    # the freshly marginalized information) + PSD guard on the point-Schur
    mw = cfg.marg_weight
    H_m = state.H_m + mw * _psd_project(H_add)
    b_m = state.b_m + mw * b_add

    # --- 2. drop hosted points + residuals targeting the slot --------------
    point_valid = state.point_valid & ~hosted
    res_active = state.res_active & (jnp.arange(F)[None, :] != slot)

    # --- 3. Schur out the slot's 8 dof from the prior ----------------------
    sel = (jnp.arange(D) // _D) == slot                                 # (D,) slot rows

    # Fold the slot's per-frame affine anchors (the 0.5*w*ab^2 terms that
    # _gauge_priors applies to LIVE slots) into the prior before
    # eliminating: without them the slot's affine dofs are eliminated
    # nearly unconstrained and the Schur pushes the kept frames' affine
    # states (and through them, via cross terms, the geometry) off target.
    aff_w = jnp.tile(
        jnp.array([0.0] * 6 + [cfg.ba_prior_a, cfg.ba_prior_b], jnp.float32), F
    )
    ab_fej_flat = jnp.zeros(D, jnp.float32)
    ab_fej_flat = ab_fej_flat.at[jnp.arange(F) * _D + 6].set(state.ab_fej[:, 0])
    ab_fej_flat = ab_fej_flat.at[jnp.arange(F) * _D + 7].set(state.ab_fej[:, 1])
    H_m = H_m + jnp.diag(jnp.where(sel, aff_w, 0.0))
    b_m = b_m + jnp.where(sel, aff_w * ab_fej_flat, 0.0)

    # fold the slot's accumulated delta into b (its delta tracking ends)
    delta_flat = state.delta.reshape(-1) * sel
    b_m = b_m + H_m @ delta_flat

    Hmm = H_m * sel[:, None] * sel[None, :]
    Hmm_block = Hmm + jnp.diag(jnp.where(sel, 1e-6, 1.0))               # invertible
    # extract cross rows: H_am (keep x marg)
    keep = ~sel
    H_am = H_m * keep[:, None] * sel[None, :]
    Hmm_inv = jnp.linalg.inv(Hmm_block) * sel[:, None] * sel[None, :]
    H_m_new = H_m * keep[:, None] * keep[None, :] - H_am @ Hmm_inv @ H_am.T
    b_m_new = b_m * keep - H_am @ (Hmm_inv @ (b_m * sel))

    frame_valid = state.frame_valid & (jnp.arange(F) != slot)
    state = state.replace(
        point_valid=point_valid,
        res_active=res_active,
        frame_valid=frame_valid,
        H_m=H_m_new,
        b_m=b_m_new,
        delta=jnp.where((jnp.arange(F) == slot)[:, None], 0.0, state.delta),
    )

    if exact:
        # no regularizing repairs — for linear-consistency tests
        return state

    # --- 4. gauge-orthogonalize the prior gradient, then repair the f32
    # Schur roundoff: PSD-project H_m and restrict b_m to its range --------
    b_m_new = orthogonalize_gradient(state, state.b_m)
    H_m_fix, b_m_fix = _psd_project_with_gradient(state.H_m, b_m_new)
    return state.replace(H_m=H_m_fix, b_m=b_m_fix)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _marg_pieces(state: BAState, images: jax.Array, cam: PinholeCamera,
                 cfg: DirectConfig, slot: jax.Array):
    """Device half of f64 marginalization: linearize the points hosted in
    `slot`, FEJ-shift the residuals, and CONTRACT the (P, F, 8, ...) arrays
    down to the small normal-equation pieces. Only ~P*(D+2)+D^2 floats cross
    the device->host boundary (~0.5 MB) instead of the raw Jacobian tensors
    (~150 MB — which took ~90 s through the TPU tunnel). The contraction is
    same-sign accumulation, benign in f32; the cancellation-sensitive Schur
    algebra stays on host in f64."""
    hosted = state.point_valid & (state.host == slot)
    marg_state = state.replace(point_valid=hosted)
    lin = linearize(marg_state, images, cam, cfg)
    d_t = state.delta[None, :, None, :]
    d_h = state.delta[state.host][:, None, None, :]
    d_rho = (state.idepth - state.idepth_fej)[:, None, None]
    r0 = (
        lin.r
        - jnp.sum(lin.J_t * d_t, axis=-1)
        - jnp.sum(lin.J_h * d_h, axis=-1)
        - lin.J_rho * d_rho
    )
    H_pts, b_pts, H_rho, b_rho, H_xr = _assemble(lin, marg_state, cfg,
                                                 r_shift=r0)
    # Contract the point-Schur CORRECTION on device but leave the
    # cancellation-sensitive subtraction H_pts - H_corr to the host in f64:
    # both terms are ~1e10 while their difference along the weak (scale)
    # directions is ~1e6, so an f32 subtraction injects percent-level scale
    # noise per marginalization (measured: corridor-200 ATE 0.94 -> 1.83
    # with the subtraction in f32). Shipping the two (D, D) terms is ~25 KB
    # — still ~20x less transfer than the raw (P, D) pieces.
    scale = jnp.where(hosted, 1.0 / (H_rho + 1e-12), 0.0)
    H_corr = jnp.einsum("pd,p,pe->de", H_xr, scale, H_xr)
    b_corr = H_xr.T @ (b_rho * scale)
    # everything the host half needs rides back in this ONE transfer
    return (H_pts, b_pts, H_corr, b_corr, hosted,
            state.T.R, state.T.t, state.frame_valid, state.delta,
            state.ab_fej, state.H_m, state.b_m)


def marginalize_frame_f64(
    state: BAState,
    images: jax.Array,
    cam: PinholeCamera,
    cfg: DirectConfig,
    slot: int,
) -> BAState:
    """Frame marginalization with the prior algebra in HOST float64.

    The per-frame hot path stays f32 on device; this once-per-keyframe step
    moves the tiny (F*8)^2 Schur algebra to numpy f64. Why: photometric
    Hessians reach ~1e10 (intensity^2 px^2 units), and the Schur complement
    cancels entries at that magnitude — in f32 the cancellation leaves ~1e3
    absolute noise, which swamps the weak directions of the prior (notably
    monocular SCALE once the anchored first frame is gone), producing ~10%%
    scale drift per marginalization. The reference runs this math in double
    (scalar_t = double, types.h:365); we do the same where it matters while
    keeping every hot loop f32/TPU-resident (see _marg_pieces for the
    device/host split).

    This synchronous wrapper = dispatch pieces + host Schur + apply; the
    runtime instead calls the three stages asynchronously across frames
    (runtime/odometry.py _start_async_marg / _complete_pending_marg)."""
    slot = int(slot)
    pieces_dev = _marg_pieces(state, images, cam, cfg, jnp.asarray(slot))
    packed, hosted_dev = marg_host_schur(pieces_dev, slot, cfg)
    return _marg_apply(state, jnp.asarray(packed), hosted_dev, slot)


def marg_host_schur(pieces_dev, slot: int, cfg: DirectConfig):
    """Host f64 half of marginalization: consume the device pieces, run the
    cancellation-sensitive Schur/nullspace/PSD algebra in numpy float64,
    return (packed [H_new; b_new] float32 ndarray, device-resident hosted
    mask) ready for _marg_apply / _marg_finish."""
    import numpy as np

    hosted_dev = pieces_dev[4]  # stays device-resident for _marg_apply
    # ONE bulk fetch of exactly what the host f64 algebra consumes; `hosted`
    # (P bools) never crosses the boundary at all (round 4: the previous
    # fetch-everything + 4 separate jnp.asarray uploads cost ~150 ms of
    # tunnel latency per marginalization vs ~13 ms of actual compute).
    (H_pts, b_pts, H_corr, b_corr,
     T_R, T_t, fv, delta, ab_fej, H_m_f32, b_m_f32) = jax.device_get(
        pieces_dev[:4] + pieces_dev[5:]
    )
    D = H_m_f32.shape[0]
    F = D // _D
    H_pts, b_pts, H_corr, b_corr = (
        np.asarray(x, np.float64) for x in (H_pts, b_pts, H_corr, b_corr)
    )
    H_add = H_pts - H_corr
    b_add = b_pts - b_corr
    delta = np.asarray(delta, np.float64)              # (F, 8)
    ab_fej = np.asarray(ab_fej, np.float64)

    mw = cfg.marg_weight
    H_m = np.asarray(H_m_f32, np.float64) + mw * H_add
    b_m = np.asarray(b_m_f32, np.float64) + mw * b_add

    # fold the slot's affine anchors (see marginalize_frame)
    H_m[slot * _D + 6, slot * _D + 6] += cfg.ba_prior_a
    H_m[slot * _D + 7, slot * _D + 7] += cfg.ba_prior_b
    b_m[slot * _D + 6] += cfg.ba_prior_a * ab_fej[slot, 0]
    b_m[slot * _D + 7] += cfg.ba_prior_b * ab_fej[slot, 1]

    # fold the slot's delta, then Schur its 8 dofs
    sel = np.zeros(D, bool); sel[slot * _D : slot * _D + _D] = True
    dflat = delta.reshape(-1) * sel
    b_m = b_m + H_m @ dflat
    keep = ~sel
    Hmm = H_m[np.ix_(sel, sel)]
    Hkm = H_m[np.ix_(keep, sel)]
    Hmm_inv = np.linalg.inv(Hmm + 1e-10 * np.eye(_D))
    H_new = np.zeros((D, D)); b_new = np.zeros(D)
    H_new[np.ix_(keep, keep)] = H_m[np.ix_(keep, keep)] - Hkm @ Hmm_inv @ Hkm.T
    b_new[keep] = b_m[keep] - Hkm @ (Hmm_inv @ b_m[sel])
    H_new = 0.5 * (H_new + H_new.T)

    # gauge-orthogonalize b against the POST-drop nullspaces (slot frame
    # excluded) + PSD floor — all host f64, numpy-built nullspaces so no
    # eager device round-trips
    R_np = np.asarray(T_R, np.float64)
    t_np = np.asarray(T_t, np.float64)
    fv_np = np.asarray(fv).copy()
    fv_np[slot] = False
    Nmat = np.zeros((F, _D, 7))
    for f in range(F):
        if not fv_np[f]:
            continue
        Nmat[f, 0:3, 0:3] = R_np[f]
        Nmat[f, 0:3, 3:6] = _skew_np(t_np[f]) @ R_np[f]
        Nmat[f, 3:6, 3:6] = R_np[f]
        Nmat[f, 0:3, 6] = t_np[f]
    N = Nmat.reshape(D, 7)
    coeff = np.linalg.solve(N.T @ N + 1e-9 * np.eye(7), N.T @ b_new)
    b_new = b_new - N @ coeff
    ew, V = np.linalg.eigh(H_new)
    ew = np.maximum(ew, 0.0)
    H_new = (V * ew[None, :]) @ V.T

    # ONE packed host->device upload (each separate upload/dispatch through
    # the TPU tunnel costs ~10-30 ms of latency)
    packed = np.concatenate([H_new, b_new[None, :]], axis=0).astype(np.float32)
    return packed, hosted_dev


def _skew_np(v: "np.ndarray"):
    import numpy as np

    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])


@jax.jit
def _marg_apply(state: BAState, packed, hosted, slot):
    """Apply the marginalization's state mutations in ONE device program:
    drop hosted points + residuals targeting the slot, invalidate the
    frame, zero its delta, install the new prior. `packed` is the (D+1, D)
    concatenation [H_new; b_new] so the host->device upload is a single
    transfer; `slot` is traced (ONE compile for all slots)."""
    F = state.num_frames
    H_new = packed[:-1]
    b_new = packed[-1]
    return state.replace(
        point_valid=state.point_valid & ~hosted,
        res_active=state.res_active & (jnp.arange(F)[None, :] != slot),
        frame_valid=state.frame_valid & (jnp.arange(F) != slot),
        delta=jnp.where((jnp.arange(F) == slot)[:, None], 0.0, state.delta),
        H_m=H_new,
        b_m=b_new,
    )
