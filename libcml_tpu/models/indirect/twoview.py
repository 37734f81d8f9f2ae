"""Two-view geometric bootstrap: batched RANSAC for F and H + model
selection + motion recovery with cheirality voting.

TPU-native replacement for the reference's robust estimation stack
(reference: src/cml/robust/RobustFundamental8Points.{h,cpp} — normalized
8-point + RANSAC scoring; RobustHomography.{h,cpp} — DLT H; backend RANSAC
driver robust/backend/Ransac.h:224; and the ORB-SLAM-style two-view
initializer RobustRaulmurInitializer.h:10,17 — parallel F vs H scoring,
model selection, motion recovery + triangulation).

TPU-first design: instead of the reference's threaded hypothesis batches,
ALL RANSAC hypotheses are generated and scored at once — minimal sets are a
(S, 8) gather, the 8-point/DLT solves are a batched SVD over (S, 9, 9) /
(S, 9, 9) normal matrices, and inlier scoring is one (S, N) einsum sweep.
Model selection follows ORB-SLAM's heuristic: pick H when its inlier score
captures > 0.45 of the combined score (indicates low parallax / planar
scene). Motion is recovered from the essential matrix E = K^T F K (or the
E implied by the chosen H's inliers), testing the 4 (R, t) decompositions by
batched cheirality (triangulated-depth positivity) voting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.indirect.pnp import triangulate_linear


def _normalize_points(x: jax.Array, valid: jax.Array):
    """Hartley normalization: zero-mean, mean distance sqrt(2).
    x: (N, 2) -> (x_n (N, 2), T (3, 3)) with x_n = T x (homogeneous)."""
    w = valid.astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(x * w[:, None], axis=0) / n
    d = jnp.sqrt(jnp.sum((x - mean) ** 2, axis=-1) + 1e-12)
    md = jnp.sum(d * w) / n
    s = jnp.sqrt(2.0) / jnp.maximum(md, 1e-9)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], x.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (x - mean) * s, T


def _sample_minimal_sets(key, n_points: int, n_sets: int, k: int) -> jax.Array:
    """(S, k) int32 random index sets (with replacement across sets; within a
    set collisions are tolerated — a degenerate set yields a degenerate model
    that simply scores poorly, cheaper than rejection sampling on TPU)."""
    return jax.random.randint(key, (n_sets, k), 0, n_points)


def _fit_fundamental(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Batched normalized 8-point: x0/x1 (S, 8, 2) -> F (S, 3, 3) with
    rank-2 enforcement (reference: RobustFundamental8Points)."""
    S = x0.shape[0]
    u0, v0 = x0[..., 0], x0[..., 1]
    u1, v1 = x1[..., 0], x1[..., 1]
    ones = jnp.ones_like(u0)
    # rows: [u1u0, u1v0, u1, v1u0, v1v0, v1, u0, v0, 1]
    A = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0, ones], axis=-1
    )                                                    # (S, 8, 9)
    AtA = jnp.einsum("ski,skj->sij", A, A)               # (S, 9, 9)
    w, V = jnp.linalg.eigh(AtA)
    f = V[..., 0]                                        # smallest eigvec
    F = f.reshape(S, 3, 3)
    # rank-2: zero the smallest singular value
    U, s, Vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return jnp.einsum("sij,sj,sjk->sik", U, s, Vt)


def _fit_homography(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Batched DLT: x0/x1 (S, 4, 2) -> H (S, 3, 3) with x1 ~ H x0
    (reference: RobustHomography)."""
    S, k = x0.shape[0], x0.shape[1]
    u0, v0 = x0[..., 0], x0[..., 1]
    u1, v1 = x1[..., 0], x1[..., 1]
    z = jnp.zeros_like(u0)
    o = jnp.ones_like(u0)
    r1 = jnp.stack([u0, v0, o, z, z, z, -u1 * u0, -u1 * v0, -u1], axis=-1)
    r2 = jnp.stack([z, z, z, u0, v0, o, -v1 * u0, -v1 * v0, -v1], axis=-1)
    A = jnp.concatenate([r1, r2], axis=1)                # (S, 2k, 9)
    AtA = jnp.einsum("ski,skj->sij", A, A)
    w, V = jnp.linalg.eigh(AtA)
    return V[..., 0].reshape(S, 3, 3)


def _sampson_f(F: jax.Array, x0h: jax.Array, x1h: jax.Array) -> jax.Array:
    """Batched squared Sampson distance: F (S, 3, 3), x0h/x1h (N, 3)
    -> (S, N)."""
    Fx0 = jnp.einsum("sij,nj->sni", F, x0h)              # (S, N, 3)
    Ftx1 = jnp.einsum("sji,nj->sni", F, x1h)
    num = jnp.einsum("ni,sni->sn", x1h, Fx0) ** 2
    den = (
        Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2
        + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    )
    return num / jnp.maximum(den, 1e-12)


def _symmetric_transfer_h(H: jax.Array, x0h, x1h) -> jax.Array:
    """Batched symmetric transfer error for H: (S, N)."""
    Hinv = jnp.linalg.inv(H + 1e-12 * jnp.eye(3))
    x1p = jnp.einsum("sij,nj->sni", H, x0h)
    x0p = jnp.einsum("sij,nj->sni", Hinv, x1h)
    e1 = jnp.sum(
        (x1p[..., :2] / jnp.maximum(jnp.abs(x1p[..., 2:]), 1e-9)
         * jnp.sign(x1p[..., 2:]) - x1h[None, :, :2]) ** 2, -1
    )
    e0 = jnp.sum(
        (x0p[..., :2] / jnp.maximum(jnp.abs(x0p[..., 2:]), 1e-9)
         * jnp.sign(x0p[..., 2:]) - x0h[None, :, :2]) ** 2, -1
    )
    return e0 + e1


@struct.dataclass
class TwoViewResult:
    T_10: SE3            # pose of view 1 w.r.t. view 0 (w2c delta; |t| = 1)
    X0: jax.Array        # (N, 3) triangulated points in view-0 frame
    inlier: jax.Array    # (N,) bool final inliers with positive depth
    num_inliers: jax.Array
    used_homography: jax.Array  # bool: model selection picked H
    score_f: jax.Array
    score_h: jax.Array
    ok: jax.Array        # enough inliers + clear cheirality winner


def _decompose_essential(E: jax.Array):
    """E (3, 3) -> (4,) batched (R, t) candidates (Hartley-Zisserman)."""
    U, s, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def two_view_init(
    uv0: jax.Array,          # (N, 2) pixels in view 0
    uv1: jax.Array,          # (N, 2) matched pixels in view 1
    valid: jax.Array,        # (N,) match mask
    cam: PinholeCamera,
    key: jax.Array,
    n_hyp: int = 256,
    th_px: float = 1.5,      # inlier threshold in pixels
    min_inliers: int = 30,
) -> TwoViewResult:
    """ORB-SLAM-style robust two-view bootstrap, fully batched + jittable
    (reference: RobustRaulmurInitializer::track).

    Scores n_hyp F-hypotheses and n_hyp H-hypotheses in parallel, selects
    the model family by score share, recovers (R, t) from the essential
    matrix with cheirality voting over all matches, and triangulates."""
    N = uv0.shape[0]
    x0h = jnp.concatenate([uv0, jnp.ones((N, 1), uv0.dtype)], -1)
    x1h = jnp.concatenate([uv1, jnp.ones((N, 1), uv1.dtype)], -1)

    k_f, k_h, k_pick = jax.random.split(key, 3)
    idx_f = _sample_minimal_sets(k_f, N, n_hyp, 8)
    idx_h = _sample_minimal_sets(k_h, N, n_hyp, 4)

    # normalized fits (shared normalization over all matches)
    xn0, T0 = _normalize_points(uv0, valid)
    xn1, T1 = _normalize_points(uv1, valid)
    Fn = _fit_fundamental(xn0[idx_f], xn1[idx_f])
    F = jnp.einsum("ji,sjk,kl->sil", T1, Fn, T0)        # denormalize: T1^T Fn T0
    Hn = _fit_homography(xn0[idx_h], xn1[idx_h])
    H = jnp.einsum("ij,sjk,kl->sil", jnp.linalg.inv(T1), Hn, T0)

    th2 = th_px * th_px
    d_f = _sampson_f(F, x0h, x1h)                        # (S, N)
    d_h = _symmetric_transfer_h(H, x0h, x1h)
    vmask = valid[None, :]
    # ORB-SLAM scoring: sum of (th - d) over inliers (truncated)
    sc_f = jnp.sum(jnp.where(vmask & (d_f < th2), th2 - d_f, 0.0), axis=1)
    sc_h = jnp.sum(jnp.where(vmask & (d_h < 2 * th2), 2 * th2 - d_h, 0.0), axis=1)

    best_f = jnp.argmax(sc_f)
    best_h = jnp.argmax(sc_h)
    score_f = sc_f[best_f]
    score_h = sc_h[best_h]
    use_h = score_h / jnp.maximum(score_f + score_h, 1e-9) > 0.45

    F_best = F[best_f]
    inl_f = valid & (d_f[best_f] < th2)
    inl_h = valid & (d_h[best_h] < 2 * th2)
    inlier0 = jnp.where(use_h, inl_h, inl_f)

    # essential matrix from the chosen support: for the F path, E = K^T F K;
    # for the H path, refit F on H's inliers (a plane-induced H still admits
    # an E from the same correspondences when there IS parallax; pure
    # rotation fails cheirality and is rejected via ok=False)
    K = cam.K()
    w_in = inlier0.astype(uv0.dtype)
    xn0i, T0i = _normalize_points(uv0, inlier0)
    xn1i, T1i = _normalize_points(uv1, inlier0)
    # single least-squares F over ALL inliers (weighted 8-point)
    u0, v0 = xn0i[:, 0], xn0i[:, 1]
    u1, v1 = xn1i[:, 0], xn1i[:, 1]
    A = jnp.stack(
        [u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0,
         jnp.ones_like(u0)], -1
    ) * w_in[:, None]
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    Fi = V[:, 0].reshape(3, 3)
    Ui, si, Vti = jnp.linalg.svd(Fi)
    Fi = Ui @ jnp.diag(si.at[2].set(0.0)) @ Vti
    F_all = T1i.T @ Fi @ T0i
    E = K.T @ F_all @ K

    Rs, ts = _decompose_essential(E)                     # (4, 3, 3), (4, 3)

    def cheirality(R, t):
        T_10 = SE3(R=R, t=t)
        X0, okd = triangulate_linear(uv0, uv1, T_10, cam)
        good = inlier0 & okd & (X0[..., 2] > 1e-3) & (X0[..., 2] < 1e4)
        # parallax per point: angle between the two observation rays
        # (reference / ORB-SLAM: CheckRT requires a minimum median parallax
        # — under pure rotation triangulated depths are arbitrary but the
        # rays are parallel, which is the reliable tell)
        C1 = -jnp.einsum("ji,j->i", R, t)               # view-1 centre in 0
        ray0 = X0 / jnp.maximum(jnp.linalg.norm(X0, axis=-1, keepdims=True), 1e-9)
        d1 = X0 - C1
        ray1 = d1 / jnp.maximum(jnp.linalg.norm(d1, axis=-1, keepdims=True), 1e-9)
        cospar = jnp.sum(ray0 * ray1, axis=-1)
        with_parallax = good & (cospar < jnp.cos(jnp.deg2rad(1.0)))
        return jnp.sum(good), jnp.sum(with_parallax), X0, good

    votes, par_votes, X0s, goods = jax.vmap(cheirality)(Rs, ts)
    best = jnp.argmax(votes)
    n_best = votes[best]
    # winner must clearly dominate AND carry real parallax (pure rotation
    # spreads positive-depth votes across candidates and has ~no parallax)
    second = jnp.sort(votes)[-2]
    ok = (
        (n_best >= min_inliers)
        & (n_best > 1.5 * second + 1)
        & (par_votes[best] > 0.5 * n_best)
    )

    return TwoViewResult(
        T_10=SE3(R=Rs[best], t=ts[best]),
        X0=X0s[best],
        inlier=goods[best],
        num_inliers=n_best,
        used_homography=use_h,
        score_f=score_f,
        score_h=score_h,
        ok=ok,
    )
