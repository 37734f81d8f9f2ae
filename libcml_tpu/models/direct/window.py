"""Keyframe-window arena management for the direct pipeline.

TPU-native replacement for the reference's window bookkeeping
(reference: src/cml/optimization/dso/DSOBundleAdjustment addNewFrame/
addPoints/flagFramesForMarginalization, DSOContext window state): keyframes
live in F fixed slots, points in a P-slot arena; insertion scatters into
free slots found by sorting validity masks (deterministic, static shapes),
so the whole lifecycle — insert, activate, marginalize — runs as compiled
device ops with no recompilation as the window evolves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from libcml_tpu.core.camera import PinholeCamera
from libcml_tpu.core.lie import SE3
from libcml_tpu.models.direct.ba import BAState, empty_state
from libcml_tpu.models.direct.config import DirectConfig
from libcml_tpu.models.direct.residuals import pattern_uv
from libcml_tpu.ops.image import bilinear


@struct.dataclass
class Window:
    """BA state + the per-slot image data the solver samples from."""

    ba: BAState
    images: jax.Array    # (F, H, W, 3) level-0 gradient image per slot
    frame_id: jax.Array  # (F,) int32 global frame index, -1 when free


def empty_window(cfg: DirectConfig, height: int, width: int) -> Window:
    return Window(
        ba=empty_state(cfg),
        images=jnp.zeros((cfg.max_frames, height, width, 3), jnp.float32),
        frame_id=jnp.full((cfg.max_frames,), -1, jnp.int32),
    )


def free_frame_slot(window: Window) -> jax.Array:
    """Index of a free keyframe slot (lowest index first). Callers must
    marginalize first when the window is full."""
    return jnp.argmin(window.ba.frame_valid)


def add_keyframe(
    window: Window,
    grad0: jax.Array,
    T: SE3,
    ab: jax.Array,
    frame_id: jax.Array,
) -> tuple[Window, jax.Array]:
    """Insert a keyframe into a free slot: pose becomes the FEJ point,
    existing points get residuals toward the new slot (reference:
    addNewFrame creates a residual from every active point to the new
    keyframe)."""
    ba = window.ba
    slot = free_frame_slot(window)
    onehot = jnp.arange(ba.num_frames) == slot

    set_f = lambda old, new: jnp.where(
        onehot.reshape((-1,) + (1,) * (old.ndim - 1)), new, old
    )
    ba = ba.replace(
        T=SE3(R=set_f(ba.T.R, T.R), t=set_f(ba.T.t, T.t)),
        T_fej=SE3(R=set_f(ba.T_fej.R, T.R), t=set_f(ba.T_fej.t, T.t)),
        ab=set_f(ba.ab, ab),
        ab_fej=set_f(ba.ab_fej, ab),
        delta=jnp.where(onehot[:, None], 0.0, ba.delta),
        frame_valid=ba.frame_valid | onehot,
        res_active=ba.res_active | (onehot[None, :] & ba.point_valid[:, None]),
    )
    return (
        window.replace(
            ba=ba,
            images=window.images.at[slot].set(grad0),
            frame_id=window.frame_id.at[slot].set(frame_id),
        ),
        slot,
    )


def add_points(
    window: Window,
    slot: jax.Array,
    uv: jax.Array,       # (K, 2) level-0 pixels in the host frame
    idepth: jax.Array,   # (K,)
    valid: jax.Array,    # (K,)
    cfg: DirectConfig,
) -> Window:
    """Activate K new points hosted in `slot`, scattered into free point
    slots (deterministic: lowest free indices first). Each new point gets
    residuals to every other valid frame."""
    ba = window.ba
    P = ba.num_points
    K = uv.shape[0]

    # K lowest free slots; argsort(valid) puts False (free) first.
    order = jnp.argsort(ba.point_valid, stable=True)
    dest = order[:K]                                   # (K,)
    # if fewer than K free slots, the tail of dest points at occupied slots;
    # mask those writes out
    free_ok = ~ba.point_valid[dest]
    write = valid & free_ok

    grad_host = window.images[slot]                    # (H, W, 3)
    sample = bilinear(grad_host, pattern_uv(uv))       # (K, 8, 3)
    color = sample[..., 0]
    gsq = sample[..., 1] ** 2 + sample[..., 2] ** 2
    weight = jnp.sqrt(cfg.gradient_weight_c2 / (cfg.gradient_weight_c2 + gsq))

    res_row = ba.frame_valid[None, :] & (jnp.arange(ba.num_frames)[None, :] != slot)
    res_row = jnp.broadcast_to(res_row, (K, ba.num_frames))

    def scatter(arr, new):
        return arr.at[dest].set(
            jnp.where(write.reshape((-1,) + (1,) * (new.ndim - 1)), new, arr[dest])
        )

    ba = ba.replace(
        uv=scatter(ba.uv, uv),
        host=scatter(ba.host, jnp.full((K,), slot, jnp.int32)),
        idepth=scatter(ba.idepth, jnp.maximum(idepth, cfg.idepth_min)),
        idepth_fej=scatter(ba.idepth_fej, jnp.maximum(idepth, cfg.idepth_min)),
        color=scatter(ba.color, color),
        weight=scatter(ba.weight, weight),
        point_valid=ba.point_valid.at[dest].set(ba.point_valid[dest] | write),
        res_active=scatter(ba.res_active, res_row),
    )
    return window.replace(ba=ba)


def choose_marginalization_slot(window: Window, latest_slot: jax.Array) -> jax.Array:
    """Pick the keyframe to marginalize when the window is over budget
    (reference: flagFramesForMarginalization, FullSystem semantics — always
    keep the two newest keyframes; drop nearly-dead frames first; otherwise
    drop the SPATIALLY REDUNDANT frame, keeping the window spread out).

    Protecting the two newest is load-bearing: a fresh keyframe hosts no
    active points yet (its immature candidates need >= 2 traces to mature),
    so any points-count heuristic greedily kills every new slot and the
    window degenerates into stale old frames — the tracking reference then
    dies as the camera moves on. Redundancy = the smallest
    nearest-neighbour distance between keyframe positions: dropping it
    costs the least baseline diversity, and naturally keeps one far-back
    anchor frame (scale memory)."""
    ba = window.ba
    F = ba.num_frames
    fv = ba.frame_valid
    fid = jnp.where(fv, window.frame_id, -1)

    newest = jnp.argmax(fid)
    fid2 = jnp.where(jnp.arange(F) == newest, -1, fid)
    second = jnp.argmax(fid2)
    eligible = fv & (jnp.arange(F) != newest) & (jnp.arange(F) != second)

    hosted = jax.nn.one_hot(ba.host, F, dtype=jnp.float32) * ba.point_valid[:, None]
    counts = jnp.sum(hosted, axis=0)                   # (F,)
    dead = eligible & (counts < 8.0)

    t = ba.T.t                                         # (F, 3)
    d = jnp.linalg.norm(t[:, None, :] - t[None, :, :], axis=-1)
    off = fv[None, :] & (jnp.arange(F)[:, None] != jnp.arange(F)[None, :])
    nn = jnp.min(jnp.where(off, d, jnp.inf), axis=1)   # (F,)

    # dead frames first (oldest dead first), else most redundant (min nn)
    score = jnp.where(dead, -1e6 - fid.astype(jnp.float32), nn)
    score = jnp.where(eligible, score, jnp.inf)
    return jnp.argmin(score)


def num_valid_frames(window: Window) -> jax.Array:
    return jnp.sum(window.ba.frame_valid)
