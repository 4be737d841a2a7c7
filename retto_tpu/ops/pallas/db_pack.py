"""Pallas TPU kernel: fused DB binarize + 2x2 dilate + 8x row bit-pack.

One VMEM pass over the probability map instead of three XLA ops
(threshold, reduce_window, pack): each grid step DMAs a row-tile with a
one-row top halo from HBM, thresholds on the VPU, dilates with up/left
shifted ORs, and packs groups of 8 rows into one uint8 row — the det
mask leaves the chip at 1 bit/pixel (SURVEY.md §7 host/device split).

Layout choice: packing along ROWS keeps the lane dimension at the full
map width W (a multiple of 256 from the det pad grid), so every store is
lane-aligned; packing along W would shrink lanes to W/8 and misalign.

Falls back to the jnp implementation (ops.db_post) off-TPU; parity is
tested in interpreter mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["binarize_dilate_pack_rows", "unpack_rows"]

_TILE_H = 64  # rows per grid step (8 packed output rows)


def _kernel(pred_hbm, out_ref, scratch, halo, sems, *, thresh: float,
            dilate: bool, tile_h: int, h: int, w: int):
    i = pl.program_id(0)
    row0 = i * tile_h

    # two DMAs: the tile, and a single top-halo row (clamped at the edge;
    # the first tile re-reads its own row 0, which the OR absorbs)
    dma_tile = pltpu.make_async_copy(
        pred_hbm.at[pl.ds(row0, tile_h), :], scratch, sems.at[0]
    )
    dma_halo = pltpu.make_async_copy(
        pred_hbm.at[pl.ds(jnp.maximum(row0 - 1, 0), 1), :], halo, sems.at[1]
    )
    dma_tile.start()
    dma_halo.start()
    dma_tile.wait()
    dma_halo.wait()

    cur = (scratch[:] > thresh).astype(jnp.float32)  # [tile_h, w]
    if dilate:
        halo_m = (halo[:] > thresh).astype(jnp.float32)  # [1, w]
        # rows above each output row: halo row then tile rows 0..tile_h-1
        abv = jnp.concatenate([halo_m, cur[: tile_h - 1]], axis=0)
        # out(y, x) = max over the up-left 2x2 neighborhood (cv2 semantics,
        # ops/db_post.py).  Left shift: roll lanes right by 1, zero lane 0.
        col = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 1)
        curl = jnp.where(col == 0, 0.0, pltpu.roll(cur, 1, 1))
        abvl = jnp.where(col == 0, 0.0, pltpu.roll(abv, 1, 1))
        m = jnp.maximum(jnp.maximum(cur, abv), jnp.maximum(curl, abvl))
    else:
        m = cur

    # zero rows past the true height (bucket padding)
    rowid = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0) + row0
    m = jnp.where(rowid < h, m, 0.0)

    # pack 8 consecutive rows into one uint8 row (big-endian: row 0 of the
    # group is the high bit, numpy.unpackbits(axis=0)-compatible)
    k = tile_h // 8
    grouped = m.reshape(k, 8, m.shape[1])
    bit = jax.lax.broadcasted_iota(jnp.int32, grouped.shape, 1)
    weights = jnp.exp2(7 - bit).astype(jnp.float32)
    packed = (grouped * weights).sum(axis=1).astype(jnp.uint8)
    out_ref[:] = packed


@partial(jax.jit, static_argnames=("thresh", "dilate", "interpret"))
def binarize_dilate_pack_rows(
    pred: jax.Array, thresh: float = 0.3, dilate: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """prob map [..., H, W] f32 (H % 64 == 0, W % 128 == 0 — the det bucket
    grid guarantees both) -> packed uint8 [H/8, W]."""
    pred2d = pred.reshape(pred.shape[-2:])
    h, w = pred2d.shape
    assert h % _TILE_H == 0 and w % 128 == 0, (h, w)
    grid = (h // _TILE_H,)
    return pl.pallas_call(
        partial(_kernel, thresh=thresh, dilate=dilate, tile_h=_TILE_H, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((h // 8, w), jnp.uint8),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (_TILE_H // 8, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE_H, w), jnp.float32),
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(pred2d)


def unpack_rows(packed, h: int, w: int) -> np.ndarray:
    """Host-side inverse -> bool [h, w]."""
    arr = np.asarray(packed)
    return np.unpackbits(arr, axis=0)[:h, :w].astype(bool)
