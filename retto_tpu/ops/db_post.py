"""Device-side half of the DB postprocess.

The reference thresholds the probability map and dilates it on the host
(det_processor.rs:286-292).  Here both run on the TPU so only a packed
uint8 mask leaves the device (SURVEY.md §7 "Host/device split in det
postprocess"); contour tracing stays on the host (inherently sequential).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["binarize_dilate", "binarize_dilate_packed", "unpack_mask"]


@partial(jax.jit, static_argnames=("thresh", "use_dilation"))
def binarize_dilate(
    pred: jax.Array, thresh: float = 0.3, use_dilation: bool = True
) -> jax.Array:
    """prob map [..., H, W] -> uint8 mask [H, W].

    mask = pred > thresh (det_processor.rs:286-289), then optional 2x2
    dilation anchored at (1,1) (det_processor.rs:128-138, :290-292) —
    out(x, y) = max over the up-left 2x2 neighborhood, i.e. a max-reduce
    window with top/left padding of 1 (cv2.dilate semantics; imageproc's
    reflected convention differs by a 1-px shift, well inside the
    reference's own +-10 px test tolerance).
    """
    pred2d = pred.reshape(pred.shape[-2:])
    mask = (pred2d > thresh).astype(jnp.uint8)
    if use_dilation:
        mask = jax.lax.reduce_window(
            mask,
            jnp.uint8(0),
            jax.lax.max,
            window_dimensions=(2, 2),
            window_strides=(1, 1),
            padding=((1, 0), (1, 0)),
        )
    return mask


@partial(jax.jit, static_argnames=("thresh", "use_dilation"))
def binarize_dilate_packed(
    pred: jax.Array, thresh: float = 0.3, use_dilation: bool = True
) -> jax.Array:
    """Like binarize_dilate but bit-packs the mask along the row axis so
    only H*W/8 bytes leave the device (SURVEY.md §7: "minimize the mask
    transfer (bit-pack) so only ~1 byte/pixel leaves the TPU" — this gets
    it to 1 bit).  Returns uint8 [H, ceil(W/8)] (big-endian bit order,
    numpy.packbits-compatible)."""
    mask = binarize_dilate(pred, thresh, use_dilation)
    h, w = mask.shape
    pad = (-w) % 8
    if pad:
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    grouped = mask.reshape(h, -1, 8)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (grouped * weights).sum(axis=-1, dtype=jnp.uint8)


def unpack_mask(packed: "jax.Array | object", w: int):
    """Host-side inverse of binarize_dilate_packed -> bool [H, w]."""
    import numpy as np

    arr = np.asarray(packed)
    bits = np.unpackbits(arr, axis=1)[:, :w]
    return bits.astype(bool)
