"""Pallas TPU kernel: fused DB binarize + 2x2 dilate + 8x row bit-pack.

One VMEM pass over the probability map instead of three XLA ops
(threshold, reduce_window, pack): each grid step DMAs a row-tile from
HBM, thresholds on the VPU, dilates with up/left shifted ORs, and packs
groups of 8 rows into one uint8 row — the det mask leaves the chip at
1 bit/pixel (SURVEY.md §7 host/device split).

Top-halo handling: TPU grid steps execute sequentially, so the previous
tile's last thresholded row is carried in a persistent VMEM scratch
instead of a second (tile-misaligned — Mosaic rejects 1-row HBM slices)
halo DMA.  The first tile of each image substitutes its own row 0, which
the dilation max absorbs.

Layout choice: packing along ROWS keeps the lane dimension at the full
map width W (a multiple of 128 from the det pad grid), so every store is
lane-aligned; packing along W would shrink lanes to W/8 and misalign.

Falls back to the jnp implementation (ops.db_post) off-TPU; parity is
tested in interpreter mode on CPU and compiled on the real chip
(tests/test_pallas_pack.py, RETTO_TEST_TPU=1).

Measured on v5e (batch 8 @ 1024x768 f32): this kernel ~1.6-2.6 ms vs the
XLA threshold+reduce_window+pack chain at ~2.1-2.3 ms — parity within
noise; both are HBM-bandwidth-bound (~25 MB in / 0.8 MB out).  The
kernel stays wired as the TPU path because it guarantees the single-pass
schedule and the 1-bit output layout independent of fusion heuristics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "binarize_dilate_pack_rows",
    "binarize_dilate_pack_rows_batch",
    "unpack_rows",
]

_TILE_H = 64  # rows per grid step (8 packed output rows)


def _binarize_pack_tile(scratch, carry, first_tile, thresh, dilate, tile_h,
                        h, row0):
    """Threshold + dilate + pack one [tile_h, w] tile; ``carry`` is a
    [1, w] VMEM scratch holding the previous tile's last thresholded row
    (written here for the next step)."""
    # upcast before the compare: Mosaic on v5e rejects bf16 vector cmpf
    # ("Target does not support this comparison"); the convert fuses into
    # the VPU pass, the DMA still moves bf16
    cur = (scratch[:].astype(jnp.float32) > thresh).astype(jnp.float32)
    if dilate:
        prev_last = carry[:]  # [1, w]
        halo_m = jnp.where(first_tile, cur[0:1], prev_last)
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
    carry[:] = cur[tile_h - 1 : tile_h]
    # zero rows past the true height (bucket padding)
    rowid = jax.lax.broadcasted_iota(jnp.int32, m.shape, 0) + row0
    m = jnp.where(rowid < h, m, 0.0)
    # pack 8 consecutive rows into one uint8 row (big-endian: row 0 of the
    # group is the high bit, numpy.unpackbits(axis=0)-compatible)
    k = tile_h // 8
    grouped = m.reshape(k, 8, m.shape[1])
    bit = jax.lax.broadcasted_iota(jnp.int32, grouped.shape, 1)
    weights = jnp.exp2(7 - bit).astype(jnp.float32)
    # Mosaic has no f32->u8 cast; go through int32
    return (grouped * weights).sum(axis=1).astype(jnp.int32).astype(jnp.uint8)


def _kernel(pred_hbm, out_ref, scratch, carry, sems, *, thresh: float,
            dilate: bool, tile_h: int, h: int, w: int):
    i = pl.program_id(0)
    row0 = i * tile_h
    dma_tile = pltpu.make_async_copy(
        pred_hbm.at[pl.ds(row0, tile_h), :], scratch, sems.at[0]
    )
    dma_tile.start()
    dma_tile.wait()
    out_ref[:] = _binarize_pack_tile(
        scratch, carry, i == 0, thresh, dilate, tile_h, h, row0
    )


def _kernel_batched(pred_hbm, out_ref, scratch, carry, sems, *, thresh: float,
                    dilate: bool, tile_h: int, h: int, w: int):
    """Grid (B, H/tile_h); pred_hbm [B, H, W] stays in HBM, each step DMAs
    its row tile into VMEM."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * tile_h
    dma_tile = pltpu.make_async_copy(
        pred_hbm.at[b, pl.ds(row0, tile_h), :], scratch, sems.at[0]
    )
    dma_tile.start()
    dma_tile.wait()
    out_ref[0] = _binarize_pack_tile(
        scratch, carry, i == 0, thresh, dilate, tile_h, h, row0
    )


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
            pltpu.VMEM((_TILE_H, w), pred2d.dtype),
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(pred2d)


@partial(jax.jit, static_argnames=("thresh", "dilate", "interpret"))
def binarize_dilate_pack_rows_batch(
    pred: jax.Array, thresh: float = 0.3, dilate: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Batched fused binarize+dilate+bitpack: [B, H, W] f32 -> uint8
    [B, H/8, W] (the DevicePipeline det mask path on real TPU)."""
    b, h, w = pred.shape
    assert h % _TILE_H == 0 and w % 128 == 0, (h, w)
    return pl.pallas_call(
        partial(_kernel_batched, thresh=thresh, dilate=dilate,
                tile_h=_TILE_H, h=h, w=w),
        out_shape=jax.ShapeDtypeStruct((b, h // 8, w), jnp.uint8),
        grid=(b, h // _TILE_H),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, _TILE_H // 8, w), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((_TILE_H, w), pred.dtype),
            pltpu.VMEM((1, w), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        interpret=interpret,
    )(pred)


def unpack_rows(packed, h: int, w: int) -> np.ndarray:
    """Host-side inverse -> bool [h, w]."""
    arr = np.asarray(packed)
    return np.unpackbits(arr, axis=0)[:h, :w].astype(bool)
