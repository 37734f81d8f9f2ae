"""EPnP absolute pose + RANSAC: pose from 3D-2D matches with NO prior.

TPU-native replacement for the reference's EPnP + EPnPRansac
(reference: src/cml/optimization/EPnP.h:116 — control-point formulation
with Gauss-Newton beta refinement; EPnP.h:129 RANSAC wrapper; used by
relocalization, which has no motion prior for the iterative PnP to start
from).

TPU-first design: the reference runs one EPnP per RANSAC iteration in a
thread pool; here ALL hypotheses run as one vmapped program — each
hypothesis draws a fixed-size minimal subset, solves EPnP (control points by
PCA, barycentric lift, null-space of the 12x12 normal matrix, beta cases
N=1/N=2 scored by reprojection, Procrustes pose recovery), and scores
inliers over the full correspondence set; the winner seeds the iterative
LM polish (solve_pnp)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.indirect.pnp import solve_pnp


def _control_points(Xw: jax.Array, w: jax.Array) -> jax.Array:
    """(4, 3) control points: weighted centroid + principal axes scaled by
    the data spread (the EPnP basis choice)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(Xw * w[:, None], axis=0) / wsum
    d = (Xw - c0) * jnp.sqrt(w)[:, None]
    cov = d.T @ d / wsum
    lam, V = jnp.linalg.eigh(cov)                    # ascending
    s = jnp.sqrt(jnp.maximum(lam, 1e-10))
    cs = c0 + (V * s[None, :]).T                     # (3, 3) rows c0 + s_i v_i
    return jnp.concatenate([c0[None, :], cs], axis=0)


def _barycentric(Xw: jax.Array, C: jax.Array) -> jax.Array:
    """alphas (N, 4) with X = alphas @ C, sum(alphas) = 1."""
    Ch = jnp.concatenate([C.T, jnp.ones((1, 4), C.dtype)], axis=0)   # (4, 4)
    Xh = jnp.concatenate(
        [Xw.T, jnp.ones((1, Xw.shape[0]), Xw.dtype)], axis=0
    )                                                                # (4, N)
    return jnp.linalg.solve(Ch, Xh).T


def _build_M(alphas: jax.Array, uv: jax.Array, w: jax.Array,
             cam: PinholeCamera) -> jax.Array:
    """EPnP's (2N, 12) linear system rows, weighted."""
    N = alphas.shape[0]
    du = (cam.cx - uv[:, 0])[:, None] * alphas       # (N, 4)
    dv = (cam.cy - uv[:, 1])[:, None] * alphas
    fxa = cam.fx * alphas
    fya = cam.fy * alphas
    z = jnp.zeros_like(fxa)
    # rows: [a_j fx, 0, a_j (cx - u)] per control j
    ru = jnp.stack([fxa, z, du], axis=-1).reshape(N, 12)
    rv = jnp.stack([z, fya, dv], axis=-1).reshape(N, 12)
    sw = jnp.sqrt(w)[:, None]
    return jnp.concatenate([ru * sw, rv * sw], axis=0)


def _dists6(C: jax.Array) -> jax.Array:
    """(6,) pairwise distances of the 4 control points."""
    idx = jnp.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    d = C[idx[:, 0]] - C[idx[:, 1]]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)


def _procrustes(Xw: jax.Array, Xc: jax.Array, w: jax.Array) -> SE3:
    """Rigid alignment Xc ~ R Xw + t (Horn/Umeyama without scale)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mw = jnp.sum(Xw * w[:, None], axis=0) / wsum
    mc = jnp.sum(Xc * w[:, None], axis=0) / wsum
    H = ((Xw - mw) * w[:, None]).T @ (Xc - mc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = mc - R @ mw
    return SE3(R=R, t=t)


def epnp_solve(
    Xw: jax.Array,       # (N, 3) world points
    uv: jax.Array,       # (N, 2) observed pixels
    w: jax.Array,        # (N,) weights (0 disables a correspondence)
    cam: PinholeCamera,
) -> SE3:
    """One EPnP solve over a weighted correspondence set (jittable).

    Follows the standard EPnP recipe with beta cases N=1 and N=2 (the
    dominant cases in practice); callers polish with the iterative PnP,
    which removes the need for the full N=3/4 + GN beta machinery."""
    C = _control_points(Xw, w)
    alphas = _barycentric(Xw, C)
    M = _build_M(alphas, uv, w, cam)
    MtM = M.T @ M                                   # (12, 12)
    _, V = jnp.linalg.eigh(MtM)                     # ascending eigenvalues
    v1 = V[:, 0].reshape(4, 3)                      # smallest
    v2 = V[:, 1].reshape(4, 3)

    dw = _dists6(C)

    # case N=1: x = b v1; b from distance ratios (closed form LS)
    d1 = _dists6(v1)
    b1 = jnp.sum(d1 * dw) / jnp.maximum(jnp.sum(d1 * d1), 1e-12)

    # case N=2: x = b1 v1 + b2 v2; solve LS on squared distances in
    # (b1^2, b1 b2, b2^2) then extract
    idx = jnp.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    e1 = v1[idx[:, 0]] - v1[idx[:, 1]]              # (6, 3)
    e2 = v2[idx[:, 0]] - v2[idx[:, 1]]
    A = jnp.stack(
        [jnp.sum(e1 * e1, -1), 2 * jnp.sum(e1 * e2, -1),
         jnp.sum(e2 * e2, -1)], axis=-1
    )                                               # (6, 3)
    rhs = dw * dw
    sol = jnp.linalg.solve(
        A.T @ A + 1e-9 * jnp.eye(3, dtype=A.dtype), A.T @ rhs
    )
    b11, b12, b22 = sol[0], sol[1], sol[2]
    bb1 = jnp.sqrt(jnp.maximum(b11, 1e-12))
    bb2 = jnp.sqrt(jnp.maximum(b22, 1e-12)) * jnp.sign(b12) * jnp.sign(b11 + 1e-30)

    def pose_from(x: jax.Array) -> SE3:
        Cc = x.reshape(4, 3)
        Xc = alphas @ Cc
        # cheirality: EPnP's null vector has a global sign ambiguity
        flip = jnp.sign(jnp.sum(jnp.where(w > 0, Xc[:, 2], 0.0)))
        flip = jnp.where(flip == 0, 1.0, flip)
        return _procrustes(Xw, Xc * flip, w)

    def reproj_err(T: SE3) -> jax.Array:
        Xc = T.apply(Xw)
        pred, ok = cam.project(Xc)
        e = jnp.sum((pred - uv) ** 2, -1)
        e = jnp.where(ok, e, 1e12)
        return jnp.sum(jnp.where(w > 0, e, 0.0))

    T1 = pose_from(b1 * v1.reshape(-1))
    T2 = pose_from((bb1 * v1 + bb2 * v2).reshape(-1))
    use2 = reproj_err(T2) < reproj_err(T1)
    return jax.tree.map(lambda a, b_: jnp.where(use2, b_, a), T1, T2)


@struct.dataclass
class EPnPResult:
    T: SE3
    inliers: jax.Array    # (N,) bool
    num_inliers: jax.Array
    ok: jax.Array         # enough inliers to trust the pose


def epnp_ransac(
    Xw: jax.Array,
    uv: jax.Array,
    valid: jax.Array,
    cam: PinholeCamera,
    key: jax.Array,
    n_hyp: int = 64,
    subset: int = 6,
    inlier_px: float = 3.0,
    min_inliers: int = 12,
    sigma2: jax.Array | None = None,
) -> EPnPResult:
    """Batched EPnP RANSAC: n_hyp minimal subsets solved in parallel
    (vmap), scored by reprojection inliers over all correspondences, winner
    polished with the iterative LM PnP on its inliers (jittable;
    reference: EPnPRansac EPnP.h:129 + threaded batches Ransac.h:224)."""
    N = Xw.shape[0]
    s2 = jnp.ones((N,), jnp.float32) if sigma2 is None else sigma2
    p = valid.astype(jnp.float32)
    p = p / jnp.maximum(jnp.sum(p), 1e-9)

    keys = jax.random.split(key, n_hyp)

    def one(k):
        idx = jax.random.choice(k, N, shape=(subset,), replace=False, p=p)
        w = jnp.zeros((N,), jnp.float32).at[idx].set(1.0) * valid
        T = epnp_solve(Xw, uv, w, cam)
        Xc = T.apply(Xw)
        pred, ok = cam.project(Xc)
        e2 = jnp.sum((pred - uv) ** 2, -1)
        inl = valid & ok & (e2 < inlier_px**2 * s2) & (Xc[..., 2] > 1e-3)
        return T, jnp.sum(inl)

    Ts, scores = jax.vmap(one)(keys)
    best = jnp.argmax(scores)
    T_best = jax.tree.map(lambda x: x[best], Ts)

    # recompute the winner's inliers, polish with LM PnP on them
    Xc = T_best.apply(Xw)
    pred, okz = cam.project(Xc)
    e2 = jnp.sum((pred - uv) ** 2, -1)
    inl = valid & okz & (e2 < inlier_px**2 * s2) & (Xc[..., 2] > 1e-3)
    res = solve_pnp(Xw, uv, inl, T_best, cam, sigma2=s2)
    return EPnPResult(
        T=res.T,
        inliers=res.inlier,
        num_inliers=res.num_inliers,
        ok=res.num_inliers >= min_inliers,
    )
