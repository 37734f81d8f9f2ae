"""Two-frame direct bootstrap (monocular initialization).

TPU-native replacement for the reference's DSOInitializer
(reference: src/cml/optimization/dso/DSOInitializer.cpp:7 setFirst,
:111/117 tryInitialize, DSOInitializer.h:98 calcResAndGS with the Schur
complement on inverse depths, :100-112 makeNN idepth regularization and
propagateUp/Down pyramid smoothing).

Design differences from the reference (TPU-first, same semantics):
  - ONE point set selected at level 0 and reused at every pyramid level by
    coordinate scaling, instead of per-level point sets with up/down idepth
    propagation. The shared inverse-depth vector makes propagation implicit
    and keeps all shapes static.
  - The reference's 10-NN graph regularizer becomes a fixed-k neighbor index
    array (computed once on the host at `set_first` time); each GN iteration
    adds a diagonal prior pulling each idepth toward the current neighbor
    mean, followed by an explicit smoothing blend — mirroring DSO's
    iR-regularization + doStep smoothing without off-diagonal idepth
    coupling, so the idepth block stays diagonal and the Schur trick is one
    batched divide.
  - Joint state is [xi(6), a, b] + per-point idepth; every GN iteration is a
    single fused sweep: batched residuals -> 9-dof-per-point Jacobians ->
    Schur-reduced 8x8 solve -> back-substituted idepth step, inside lax.scan.
  - DSO's "alpha" scale anchoring is kept: when translation is small, a
    per-point prior (rho - 1)^2 * alpha_w anchors the gauge; once translation
    is large enough ("snapped") the prior switches to coupling toward the
    regularized neighbor mean (DSOInitializer.cpp alphaOpt branches).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3, se3_exp
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.residuals import (
    evaluate_residuals,
    huber_energy,
    huber_weight,
    idepth_jacobian,
    pattern_uv,
    rel_pose_jacobian,
)
from libcml_tpu.models.direct.selector import select_points
from libcml_tpu.ops.image import bilinear

_NEIGHBORS = 8


@struct.dataclass
class InitializerState:
    """First-frame data + current estimates, all static shapes."""

    uv: jax.Array        # (P, 2) level-0 pixels in the first frame
    color: jax.Array     # (L, P, 8) host pattern intensities per level
    weight: jax.Array    # (L, P, 8) gradient weights per level
    valid: jax.Array     # (L, P)
    nbr: jax.Array       # (P, K) neighbor indices (host-computed k-NN)
    idepth: jax.Array    # (P,) current inverse-depth estimate
    T: SE3               # current relative pose cur <- first
    ab: jax.Array        # (2,) current relative affine
    snapped: jax.Array   # bool: translation has become observable
    snapped_age: jax.Array  # int: consecutive snapped frames


def set_first(
    grad_pyr: tuple[jax.Array, ...],
    cam0: PinholeCamera,
    cfg: DirectConfig,
    prior_idepth: jax.Array | None = None,
) -> InitializerState:
    """Select points on the first frame and build the initializer state.

    Host-side (runs once per initialization attempt sequence). The optional
    `prior_idepth` is a dense (H, W) inverse-depth map (the reference's
    MiDaS NN prior path, DSOInitializer.cpp:117); point idepths are seeded
    from it when given, else at 1.0.
    """
    uv, valid0, _ = select_points(grad_pyr[0], cfg.init_points)

    colors, weights, valids = [], [], []
    for l, G in enumerate(grad_pyr):
        cam_l = cam0.level(l)
        s = 0.5**l
        uv_l = (uv + 0.5) * s - 0.5
        sample = bilinear(G, pattern_uv(uv_l))
        color = sample[..., 0]
        gsq = sample[..., 1] ** 2 + sample[..., 2] ** 2
        w = jnp.sqrt(cfg.gradient_weight_c2 / (cfg.gradient_weight_c2 + gsq))
        ok = valid0 & cam_l.in_bounds(uv_l, border=3.0)
        colors.append(color)
        weights.append(w)
        valids.append(ok)

    # k-NN over pixel coords (small P — exact, host-side once).
    uv_np = np.asarray(uv)
    d2 = ((uv_np[:, None, :] - uv_np[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    invalid = ~np.asarray(valid0)
    d2[:, invalid] = np.inf
    nbr = np.argsort(d2, axis=1)[:, :_NEIGHBORS].astype(np.int32)

    if prior_idepth is not None:
        rho0 = bilinear(prior_idepth, uv)
        med = jnp.median(jnp.where(valid0, rho0, 1.0))
        rho0 = jnp.clip(rho0 / jnp.maximum(med, 1e-6), 0.1, 10.0)
    else:
        rho0 = jnp.ones(uv.shape[0], dtype=jnp.float32)

    return InitializerState(
        uv=uv,
        color=jnp.stack(colors),
        weight=jnp.stack(weights),
        valid=jnp.stack(valids),
        nbr=jnp.asarray(nbr),
        idepth=rho0,
        T=SE3.identity(dtype=jnp.float32),
        ab=jnp.zeros(2, jnp.float32),
        snapped=jnp.asarray(False),
        snapped_age=jnp.asarray(0, jnp.int32),
    )


def _neighbor_mean(idepth: jax.Array, nbr: jax.Array) -> jax.Array:
    return jnp.mean(idepth[nbr], axis=-1)


def _init_level(
    grad_l: jax.Array,
    cam_l: PinholeCamera,
    uv_l: jax.Array,
    color: jax.Array,
    weight: jax.Array,
    valid: jax.Array,
    nbr: jax.Array,
    T0: SE3,
    ab0: jax.Array,
    rho0: jax.Array,
    cfg: DirectConfig,
    alpha_w: jax.Array,
    coupling_w: jax.Array,
    iters: int,
):
    """GN/LM at one pyramid level: joint [xi, a, b] + per-point idepth with
    the idepth block Schur-complemented (diagonal => one batched divide)."""

    weight = jnp.where(valid[:, None], weight, 0.0)

    def energy(T, ab, rho, rho_ref):
        """The exact functional GN minimizes (sums, incl. priors) — using a
        different normalization for accept/reject than for the normal
        equations mis-ranks steps whenever the valid count changes."""
        ev = evaluate_residuals(
            grad_l, cam_l, uv_l, rho, color, weight, T, ab[0], ab[1],
            huber_k=cfg.huber_intensity,
        )
        ok = ev.valid & valid
        # out-of-bounds points pay the outlier energy instead of dropping to
        # zero cost (otherwise pushing points OOB "reduces" the energy)
        e_photo = jnp.sum(
            jnp.where(ok, ev.energy, jnp.where(valid, cfg.outlier_energy, 0.0))
        )
        e_prior = 0.5 * jnp.sum(
            jnp.where(valid,
                      alpha_w * (rho - 1.0) ** 2
                      + coupling_w * (rho - rho_ref) ** 2, 0.0))
        e_ab = 0.5 * (50.0 * ab[0] ** 2 + 0.5 * ab[1] ** 2)
        return e_photo + e_prior + e_ab, ok

    def step(carry, _):
        T, ab, rho, lam, E = carry
        rho_ref = _neighbor_mean(rho, nbr)
        ev = evaluate_residuals(
            grad_l, cam_l, uv_l, rho, color, weight, T, ab[0], ab[1],
            huber_k=cfg.huber_intensity,
        )
        J_x = rel_pose_jacobian(ev, color)           # (P, 8, 8) wrt [xi, a, b]
        J_rho = idepth_jacobian(ev, T, rho)          # (P, 8)

        w = ev.w                                     # (P, 8) robust*grad weights
        # per-point blocks
        Jw = J_x * w[..., None]
        H_xx = jnp.einsum("pkd,pke->de", Jw, J_x)    # (8, 8)
        b_x = jnp.einsum("pkd,pk->d", Jw, ev.r)      # (8,)
        H_xr = jnp.einsum("pkd,pk->pd", Jw, J_rho)   # (P, 8)
        H_rr = jnp.einsum("pk,pk->p", J_rho * w, J_rho)
        b_r = jnp.einsum("pk,pk->p", J_rho * w, ev.r)

        # idepth priors (diagonal): alpha anchor + neighbor coupling
        prior_w = jnp.where(valid, alpha_w + coupling_w, 0.0)
        H_rr = H_rr + prior_w
        b_r = b_r + jnp.where(
            valid, alpha_w * (rho - 1.0) + coupling_w * (rho - rho_ref), 0.0
        )

        # weak affine prior (no exposure metadata during bootstrap; keeps
        # (a, b) from absorbing signal that belongs to pose/depth)
        ab_w = jnp.array([0.0] * 6 + [50.0, 0.5], dtype=H_xx.dtype)
        H_xx = H_xx + jnp.diag(ab_w)
        b_x = b_x + ab_w * jnp.concatenate([jnp.zeros(6, H_xx.dtype), ab])

        # LM damping + Schur complement on idepths
        H_rr_d = H_rr * (1.0 + lam) + 1e-10
        Hs = H_xx - jnp.einsum("pd,pe->de", H_xr / H_rr_d[:, None], H_xr)
        bs = b_x - jnp.einsum("pd,p->d", H_xr, b_r / H_rr_d)

        s = jnp.array([1.0] * 6 + [cfg.scale_a, cfg.scale_b], dtype=Hs.dtype)
        Hs = Hs * s[:, None] * s[None, :]
        Hs = Hs + lam * jnp.diag(jnp.diag(Hs)) + 1e-8 * jnp.eye(8, dtype=Hs.dtype)
        dx = jnp.linalg.solve(Hs, bs * s) * s

        d_rho = (b_r - jnp.einsum("pd,d->p", H_xr, dx)) / H_rr_d
        T_new = se3_exp(-dx[:6]).compose(T)
        ab_new = ab - dx[6:]
        rho_new = jnp.clip(rho - d_rho, cfg.idepth_min, cfg.idepth_max)
        # Light smoothing toward the neighbor mean (DSO's iR regularization;
        # kept weak — an aggressive blend diffuses away true depth structure
        # over the ~100 GN iterations of a full coarse-to-fine pass).
        rho_new = jnp.where(
            valid,
            (1.0 - cfg.init_smooth_blend) * rho_new
            + cfg.init_smooth_blend * _neighbor_mean(rho_new, nbr),
            rho_new,
        )

        E_new, _ = energy(T_new, ab_new, rho_new, _neighbor_mean(rho_new, nbr))
        accept = E_new < E
        T = jax.tree.map(lambda a, b_: jnp.where(accept, b_, a), T, T_new)
        ab = jnp.where(accept, ab_new, ab)
        rho = jnp.where(accept, rho_new, rho)
        E = jnp.where(accept, E_new, E)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 5.0, 1e3))
        return (T, ab, rho, lam, E), E

    E0, _ = energy(T0, ab0, rho0, _neighbor_mean(rho0, nbr))
    (T, ab, rho, _, E), _ = jax.lax.scan(
        step, (T0, ab0, rho0, jnp.asarray(0.1, jnp.float32), E0), None,
        length=iters,
    )
    return T, ab, rho, E


@struct.dataclass
class InitResult:
    state: InitializerState
    success: jax.Array     # ready to promote into the window
    energy: jax.Array
    num_valid: jax.Array


def try_initialize(
    state: InitializerState,
    grad_pyr: tuple[jax.Array, ...],
    cam0: PinholeCamera,
    cfg: DirectConfig,
) -> InitResult:
    """One initialization attempt against a new frame. Jittable.

    Coarse-to-fine over the pyramid; success once translation is observable
    ("snapped") for `init_snapped_age` consecutive frames (reference:
    DSOInitializer snapped/snappedAt logic, DSOInitializer.cpp:111+)."""
    num_levels = len(grad_pyr)
    T, ab, rho = state.T, state.ab, state.idepth

    # alpha anchor active until snapped; coupling takes over after
    alpha_w = jnp.where(state.snapped, 0.0, cfg.init_alpha_w)
    coupling_w = jnp.where(state.snapped, cfg.init_coupling, 0.05)

    E = jnp.asarray(0.0, jnp.float32)
    for l in range(num_levels - 1, -1, -1):
        s = 0.5**l
        uv_l = (state.uv + 0.5) * s - 0.5
        T, ab, rho, E = _init_level(
            grad_pyr[l], cam0.level(l), uv_l,
            state.color[l], state.weight[l], state.valid[l], state.nbr,
            T, ab, rho, cfg, alpha_w, coupling_w,
            cfg.init_iters if l > 0 else cfg.init_iters * 2,
        )

    # snap test: enough parallax. DSO tests alphaEnergy = |t|^2 * npts;
    # normalized by focal-scaled scene depth here.
    t_norm = jnp.linalg.norm(T.t) * jnp.mean(jnp.where(state.valid[0], rho, 0.0))
    snapped_now = t_norm > cfg.init_min_translation
    snapped = state.snapped | snapped_now
    snapped_age = jnp.where(snapped, state.snapped_age + 1, 0)

    new_state = state.replace(
        T=T, ab=ab, idepth=rho, snapped=snapped, snapped_age=snapped_age
    )
    num_valid = jnp.sum(state.valid[0])
    success = snapped & (snapped_age >= cfg.init_snapped_age) & (num_valid > 64)
    return InitResult(state=new_state, success=success, energy=E, num_valid=num_valid)


def normalize_scale(state: InitializerState) -> tuple[InitializerState, jax.Array]:
    """Rescale so the mean valid inverse depth is 1 (monocular gauge fix;
    reference rescales factor = 1/mean(iR) on success). Returns the state and
    the applied scale factor (translation multiplies by it)."""
    v = state.valid[0]
    mean_rho = jnp.sum(jnp.where(v, state.idepth, 0.0)) / jnp.maximum(jnp.sum(v), 1)
    factor = 1.0 / jnp.maximum(mean_rho, 1e-6)
    return (
        state.replace(
            idepth=state.idepth / jnp.maximum(mean_rho, 1e-6),
            T=SE3(R=state.T.R, t=state.T.t * mean_rho),
        ),
        factor,
    )
