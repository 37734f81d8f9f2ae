"""Batched epipolar inverse-depth search (immature-point tracing).

TPU-native replacement for the reference's DSOTracer
(reference: src/cml/optimization/dso/DSOTracer.cpp:13 traceNewCoarse —
per-point discrete epipolar-line search + GN refine, :59 activatePoints,
:496 makeNewTraces; status machine DSOTracer.h:38).

Design: the reference walks a variable-length pixel segment per point; here
every point searches a FIXED grid of `trace_steps` inverse-depth hypotheses
spanning [rho_min, rho_max] (geometric spacing). For hypothesis s the point
is warped into the observer frame and its 8-pixel pattern SSD is computed —
so the whole trace is one (P, S, 8) gather + reduction, MXU/VPU friendly with
zero data-dependent control flow. A parabolic refine over the winning
hypothesis's neighbors replaces the reference's GN polish; quality is the
best/second-best ratio outside an exclusion window (the reference's
quality check), and ambiguous/out-of-bounds points are masked, mirroring the
OOB/OUTLIER/SKIPPED statuses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.residuals import pattern_uv
from libcml_tpu.ops.image import bilinear


@struct.dataclass
class TraceResult:
    idepth: jax.Array      # (P,) refined inverse depth in the HOST frame
    good: jax.Array        # (P,) bool: unambiguous, in-bounds match
    quality: jax.Array     # (P,) second-best/best SSD ratio (higher better)
    pixel_span: jax.Array  # (P,) epipolar search length in pixels


def trace_points(
    host_color: jax.Array,    # (P, 8) pattern intensities in the host frame
    uv_host: jax.Array,       # (P, 2) level-0 pixels in the host frame
    valid: jax.Array,         # (P,) candidate mask
    obs_grad: jax.Array,      # (H, W, 3) observer gradient image (level 0)
    T_oh: SE3,                # observer <- host relative pose
    ab_oh: jax.Array,         # (2,) relative affine [a, b]: I_o ~ e^a I_h + b
    cam: PinholeCamera,
    cfg: DirectConfig,
    rho_min: float | None = None,
    rho_max: float | None = None,
) -> TraceResult:
    """One batched epipolar sweep for all P candidates. Jittable."""
    S = cfg.trace_steps
    rho_lo = cfg.idepth_min if rho_min is None else rho_min
    rho_hi = cfg.idepth_max if rho_max is None else rho_max

    # geometric idepth grid (S,) shared by all points
    log_grid = jnp.linspace(jnp.log(rho_lo + 1e-6), jnp.log(rho_hi), S)
    rho_s = jnp.exp(log_grid)                                     # (S,)

    p_uv = pattern_uv(uv_host)                                    # (P, 8, 2)
    # unproject each pattern pixel at every hypothesis: (P, S, 8, 3)
    Xh = cam.unproject(p_uv[:, None, :, :], rho_s[None, :, None])
    Xo = jnp.einsum("ij,pskj->pski", T_oh.R, Xh) + T_oh.t
    uv_o, z_ok = cam.project(Xo)                                  # (P, S, 8, 2)
    in_b = cam.in_bounds(uv_o, border=2.0)
    hyp_ok = jnp.all(z_ok & in_b, axis=-1)                        # (P, S)

    I_o = bilinear(obs_grad[..., 0], uv_o)                        # (P, S, 8)
    pred = jnp.exp(ab_oh[0]) * host_color[:, None, :] + ab_oh[1]
    ssd = jnp.sum((I_o - pred) ** 2, axis=-1)                     # (P, S)
    BIG = jnp.asarray(1e12, ssd.dtype)
    ssd = jnp.where(hyp_ok, ssd, BIG)

    best = jnp.argmin(ssd, axis=1)                                # (P,)
    best_ssd = jnp.take_along_axis(ssd, best[:, None], axis=1)[:, 0]

    # second best outside a +-2-step exclusion window (quality ratio;
    # reference: quality = secondBest / best energy along the line)
    steps = jnp.arange(S)[None, :]
    excl = jnp.abs(steps - best[:, None]) <= 2
    ssd2 = jnp.where(excl, BIG, ssd)
    second_ssd = jnp.min(ssd2, axis=1)
    quality = second_ssd / jnp.maximum(best_ssd, 1e-6)

    # parabolic sub-step refinement in log-idepth
    bm = jnp.clip(best, 1, S - 2)
    f0 = jnp.take_along_axis(ssd, (bm - 1)[:, None], 1)[:, 0]
    f1 = jnp.take_along_axis(ssd, bm[:, None], 1)[:, 0]
    f2 = jnp.take_along_axis(ssd, (bm + 1)[:, None], 1)[:, 0]
    denom = f0 - 2.0 * f1 + f2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (f0 - f2) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    dlog = log_grid[1] - log_grid[0]
    log_best = log_grid[bm] + delta * dlog
    idepth = jnp.exp(log_best)

    # epipolar pixel span (observability): distance between the projections of
    # the nearest and farthest hypotheses of the CENTER pixel
    c_uv_near = uv_o[:, 0, 0, :]
    c_uv_far = uv_o[:, -1, 0, :]
    span = jnp.linalg.norm(c_uv_far - c_uv_near, axis=-1)

    n_ok = jnp.sum(hyp_ok, axis=1)
    good = (
        valid
        & (best_ssd < BIG)
        & (quality > cfg.trace_min_quality)
        & (n_ok >= 3)
        & (span > 1.5)   # enough parallax to constrain depth at all
    )
    return TraceResult(idepth=idepth, good=good, quality=quality, pixel_span=span)
