"""Multi-chip sharding for the direct pipeline: points sharded, cameras replicated.

The reference has NO distributed backend (SURVEY.md §2.10 — SSE SIMD plus
optional OpenMP only); this module is the TPU-native scaling layer it lacks.

Layout (the "context parallelism" of SLAM, SURVEY.md §5):
  - The point/residual arena — the big axis, O(P) with P up to tens of
    thousands — is sharded across the mesh's 'points' axis. Linearization is
    embarrassingly parallel over points; XLA partitions the (P, F, ...)
    residual/Jacobian sweeps with zero communication.
  - The camera system — 8 dof x F frames, at most 64x64 — is tiny. The
    per-shard partial Hessians/gradients produced by the einsum reductions
    over the sharded P axis become `psum`s over ICI (inserted automatically
    by XLA's SPMD partitioner from the sharding annotations), after which the
    dense Schur solve runs replicated on every chip.
  - Inverse-depth back-substitution is again pointwise → sharded, free.

This is exactly the einsum-reduction pattern pjit was built for, so the
implementation is annotations + device_put, not hand-written collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

POINTS_AXIS = "points"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the points axis (ICI within a slice)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), axis_names=(POINTS_AXIS,))


def point_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(POINTS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def ba_shardings(ba_state: Any, mesh: Mesh) -> Any:
    """Sharding pytree for a BAState: arrays whose leading dim is the point
    capacity P go over 'points'; frame-indexed and prior arrays replicate."""
    P = ba_state.num_points
    rep = replicated(mesh)
    pts = point_sharding(mesh)

    def spec_for(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == P:
            return pts
        return rep

    return jax.tree.map(spec_for, ba_state)


def shard_ba_state(ba_state: Any, mesh: Mesh) -> Any:
    """Place a BAState on the mesh with the canonical layout."""
    shardings = ba_shardings(ba_state, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), ba_state, shardings)


def sharded_ba_step(cam, cfg, mesh: Mesh):
    """Compile run_ba with the canonical in-shardings. Returns a callable
    (ba_state_sharded, images_replicated) -> (new_state, energy); XLA inserts
    the psum over ICI for the Schur-reduced camera system."""
    from libcml_tpu.models.direct import ba as ba_mod
    from libcml_tpu.models.direct.config import DirectConfig  # noqa: F401

    template = ba_mod.empty_state(cfg)
    in_shard = (ba_shardings(template, mesh), replicated(mesh))
    return jax.jit(
        lambda st, im: ba_mod.run_ba(st, im, cam, cfg),
        in_shardings=in_shard,
    )
