"""Pallas TPU kernel: fused masked-Hamming match resolution.

The matcher's core primitive (models/indirect/matching._resolve) needs,
for a masked (N, M) Hamming-distance matrix over 256-bit ORB descriptors:
row best + second best (Lowe ratio), the best column index per row, and
the best row per column (mutual cross-check). The XLA formulation
materializes D = popcount(xor) reduced over 8 uint32 words and then sweeps
it four times (argmin, gather, masked re-min, axis-0 argmin) — four HBM
round trips over an N*M*4-byte buffer.

This kernel performs the ENTIRE resolution in one sweep: the train set is
tiled over the (sequential) TPU grid and the query set is chunked inside
the kernel body, so each (chunk, tile) D block lives only in VMEM (xor +
population_count + word-sum on the VPU) and folds into running
row-top2/argmin accumulators, while per-tile column minima merge across
chunks in registers. D never exists in HBM at any size.

Mosaic constraints honoured here (each found the hard way): argmin lowers
only for f32 operands (distances <= 256 are exact in f32); uint32->f32
casts don't lower (popcounts are bitcast to int32 first); sub-32-bit
block layouts misalign (masks travel as f32, 1-D vectors as (1, n)).

Reference semantics: CornerMatcher.h:295 resolveByRatio + mutual check
(the reference prunes candidate pairs with BoW buckets/grids; the dense
formulation replaces those with masks — see matching.py docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_BIG = 257.0  # > max Hamming distance over 256 bits


def _make_kernel(n_chunks: int, chunk: int):
    def kernel(q_ref, qmask_ref, t_ref, tmask_ref, pair_ref,
               d1_ref, d2_ref, idx_ref, colrow_ref):
        j = pl.program_id(0)

        @pl.when(j == 0)
        def _init():
            d1_ref[...] = jnp.full_like(d1_ref, _BIG)
            d2_ref[...] = jnp.full_like(d2_ref, _BIG)
            idx_ref[...] = jnp.zeros_like(idx_ref)

        t = t_ref[...]                       # (TM, 8) uint32
        tm = tmask_ref[0, :]                 # (TM,) f32
        TM = t.shape[0]
        col_d = jnp.full((TM,), _BIG, jnp.float32)
        col_r = jnp.zeros((TM,), jnp.int32)

        for c in range(n_chunks):
            lo = c * chunk
            q = q_ref[lo:lo + chunk, :]      # (CH, 8) uint32

            def pc(w):
                # popcount preserves uint32; Mosaic lacks uint32->f32
                # casts, so reinterpret as int32 (values <= 32)
                x = jax.lax.population_count(
                    q[:, w][:, None] ^ t[:, w][None, :])
                return jax.lax.bitcast_convert_type(x, jnp.int32)

            acc = pc(0)
            for w in range(1, 8):
                acc = acc + pc(w)
            D = acc.astype(jnp.float32)      # (CH, TM)
            mask = (qmask_ref[0, lo:lo + chunk][:, None] * tm[None, :]
                    * pair_ref[lo:lo + chunk, :])
            D = jnp.where(mask > 0.5, D, _BIG)

            t1 = jnp.min(D, axis=1)
            targ = jnp.argmin(D, axis=1).astype(jnp.int32) + j * TM
            D2 = jnp.where(
                jnp.arange(TM, dtype=jnp.int32)[None, :]
                == (targ - j * TM)[:, None], _BIG, D)
            t2 = jnp.min(D2, axis=1)

            d1 = d1_ref[0, lo:lo + chunk]
            d2 = d2_ref[0, lo:lo + chunk]
            # merge running top-2 with the tile's top-2 (first-occurrence
            # ties: earlier tiles win, matching jnp.argmin semantics)
            take = t1 < d1
            idx_ref[0, lo:lo + chunk] = jnp.where(
                take, targ, idx_ref[0, lo:lo + chunk])
            hi = jnp.maximum(d1, t1)
            d1_ref[0, lo:lo + chunk] = jnp.minimum(d1, t1)
            d2_ref[0, lo:lo + chunk] = jnp.minimum(jnp.minimum(d2, t2), hi)

            # column best across chunks (earlier chunk wins ties, matching
            # argmin-over-rows first-occurrence)
            cd = jnp.min(D, axis=0)
            cr = jnp.argmin(D, axis=0).astype(jnp.int32) + lo
            upd = cd < col_d
            col_r = jnp.where(upd, cr, col_r)
            col_d = jnp.minimum(col_d, cd)

        colrow_ref[0, :] = col_r

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hamming_resolve_pallas(
    desc_q: jax.Array,    # (N, 8) uint32
    mask_q: jax.Array,    # (N,) bool
    desc_t: jax.Array,    # (M, 8) uint32
    mask_t: jax.Array,    # (M,) bool
    pair_mask: jax.Array | None = None,   # (N, M) bool constraint mask
    tile_m: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused resolution: returns (d1 (N,), d2 (N,), idx (N,), col_row (M,))
    where idx is the best train column per query row, d1/d2 the best and
    second-best masked distances, and col_row the best query row per train
    column (for the mutual cross-check)."""
    N = desc_q.shape[0]
    M = desc_t.shape[0]
    if pair_mask is None:
        pair_mask = jnp.ones((N, M), bool)
    # masks travel as f32 (Mosaic handles sub-32-bit block layouts poorly)
    mask_q = mask_q.astype(jnp.float32)
    mask_t = mask_t.astype(jnp.float32)
    pair_mask = pair_mask.astype(jnp.float32)

    # query chunking bounds VMEM: the (chunk, tile_m) D block + the pair
    # tile are the only O(N*M) residents, one chunk at a time
    chunk = min(N, 512)
    pad_n = (-N) % chunk
    if pad_n:
        desc_q = jnp.pad(desc_q, ((0, pad_n), (0, 0)))
        mask_q = jnp.pad(mask_q, (0, pad_n))
        pair_mask = jnp.pad(pair_mask, ((0, pad_n), (0, 0)))
    Np = N + pad_n

    pad = (-M) % tile_m
    if pad:
        desc_t = jnp.pad(desc_t, ((0, pad), (0, 0)))
        mask_t = jnp.pad(mask_t, (0, pad))
        pair_mask = jnp.pad(pair_mask, ((0, 0), (0, pad)))
    Mp = M + pad
    grid = (Mp // tile_m,)
    d1, d2, idx, col_row = pl.pallas_call(
        _make_kernel(Np // chunk, chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Np, 8), lambda j: (0, 0)),
            pl.BlockSpec((1, Np), lambda j: (0, 0)),
            pl.BlockSpec((tile_m, 8), lambda j: (j, 0)),
            pl.BlockSpec((1, tile_m), lambda j: (0, j)),
            pl.BlockSpec((Np, tile_m), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, Np), lambda j: (0, 0)),
            pl.BlockSpec((1, Np), lambda j: (0, 0)),
            pl.BlockSpec((1, Np), lambda j: (0, 0)),
            pl.BlockSpec((1, tile_m), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, Np), jnp.int32),
            jax.ShapeDtypeStruct((1, Mp), jnp.int32),
        ],
        interpret=interpret,
    )(desc_q, mask_q.reshape(1, -1), desc_t, mask_t.reshape(1, -1),
      pair_mask)
    # distances are exact small integers carried as f32 (Mosaic argmin
    # lowering constraint); hand callers the int32 view they expect
    return (d1[0, :N].astype(jnp.int32), d2[0, :N].astype(jnp.int32),
            idx[0, :N], col_row[0, :M])
