"""Batched perspective crop on device.

TPU replacement for the reference's per-box host warp
(image_helper.rs:223-249 ``get_crop_img``: 4-point perspective transform,
bicubic, white fill) — SURVEY.md §3.2 lists the per-box warp loop as a hot
host loop; here all boxes of an image are gathered in ONE device kernel as
a dense [N, H, W] bilinear/bicubic sample (pure gathers + FMAs, VPU work).

Design: all crops of a batch are rendered at a single static (out_h, out_w)
bucket shape; each box's homography (3x3, dest->src) is computed on the
host (tiny 8x8 solves) and passed as a [N, 3, 3] tensor, so the device
kernel is shape-static and jit-cacheable.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import PointBox
from .io import perspective_coeffs

__all__ = [
    "crop_homographies",
    "warp_crops",
    "warp_crops_multi",
    "warp_crops_separable",
    "crop_output_size",
]


def crop_output_size(box: PointBox) -> tuple[int, int, bool]:
    """(h, w, rotate) of the reference's crop for this box
    (image_helper.rs:225-228, rotate-if-tall at :245-247)."""
    w = max(int(max(box.width_brc(), box.width_tlc())), 1)
    h = max(int(max(box.height_brc(), box.height_tlc())), 1)
    rotate = h / w >= 1.5
    return h, w, rotate


def crop_homographies(
    boxes: np.ndarray, out_hw: tuple[int, int], sizes: np.ndarray
) -> np.ndarray:
    """Homographies mapping OUTPUT pixel coords -> SOURCE coords, [N, 3, 3].

    boxes: [N, 4, 2] quads (clockwise from TL); sizes: [N, 2] (h, w) natural
    crop sizes.  Each crop is rendered scaled into the shared (out_h, out_w)
    canvas: the quad maps onto [0, w_i] x [0, h_i] scaled by
    (out_h / h_i) vertically and the same factor horizontally (aspect
    preserved, height-fit), so downstream resize_norm semantics hold.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    n = len(boxes)
    out = np.zeros((n, 3, 3), dtype=np.float32)
    out_h, out_w = out_hw
    for i in range(n):
        h_i, w_i = float(sizes[i][0]), float(sizes[i][1])
        s = out_h / h_i
        rect = np.array(
            [[0, 0], [w_i * s, 0], [w_i * s, h_i * s], [0, h_i * s]],
            dtype=np.float64,
        )
        c = perspective_coeffs(rect, boxes[i])
        out[i] = np.array(
            [[c[0], c[1], c[2]], [c[3], c[4], c[5]], [c[6], c[7], 1.0]],
            dtype=np.float32,
        )
    return out


@partial(jax.jit, static_argnames=("out_h", "out_w", "fill"))
def warp_crops(
    image: jax.Array,
    homographies: jax.Array,
    out_h: int,
    out_w: int,
    fill: float = 255.0,
    valid_hw: jax.Array | None = None,
) -> jax.Array:
    """image: [H, W, 3] uint8/f32; homographies: [N, 3, 3] dest->src.
    Returns [N, out_h, out_w, 3] float32 bilinear samples, out-of-range
    filled with ``fill`` (the reference fills white, image_helper.rs:241).

    ``valid_hw`` (dynamic [2] array, optional) restricts the in-bounds
    region to [0, valid_h) x [0, valid_w) — used when ``image`` is padded
    up to a bucket shape and samples in the padding must fill, not read
    padding pixels.
    """
    img = image.astype(jnp.float32)
    if valid_hw is None:
        h, w = img.shape[0], img.shape[1]
    else:
        h, w = valid_hw[0], valid_hw[1]
    return _warp_impl(img, homographies, out_h, out_w, fill, h, w)


@partial(jax.jit, static_argnames=("out_h", "out_w", "fill"))
def warp_crops_multi(
    images: jax.Array,
    img_idx: jax.Array,
    homographies: jax.Array,
    valid_hw: jax.Array,
    out_h: int,
    out_w: int,
    fill: float = 255.0,
) -> jax.Array:
    """Cross-image batch warp: crop n samples ``images[img_idx[n]]``.

    images: [B, H, W, 3] (a det bucket group's stacked tensor);
    img_idx: [N] int32; homographies: [N, 3, 3]; valid_hw: [B, 2].
    One kernel for every crop of every image in the group — collapses the
    per-image dispatch/round-trip pattern on the tunneled TPU."""
    imgs = images.astype(jnp.float32)

    def one(idx, hmg):
        vh = valid_hw[idx]
        return _warp_impl(
            imgs[idx], hmg[None], out_h, out_w, fill, vh[0], vh[1]
        )[0]

    return jax.vmap(one)(img_idx, homographies)


def _warp_impl(img, homographies, out_h: int, out_w: int, fill: float, h, w):
    ch = img.shape[-1]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # [out_h, out_w]
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1).reshape(-1, 3)  # [P, 3]

    def one(hmg: jax.Array) -> jax.Array:
        src = dst @ hmg.T  # [P, 3]
        denom = src[:, 2:3]
        sx = src[:, 0:1] / denom
        sy = src[:, 1:2] / denom
        x0 = jnp.floor(sx)
        y0 = jnp.floor(sy)
        fx = sx - x0
        fy = sy - y0

        def sample(xi, yi):
            inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            v = img[yi_c[:, 0], xi_c[:, 0]]  # [P, 3]
            return jnp.where(inb, v, fill)

        v00 = sample(x0, y0)
        v01 = sample(x0 + 1, y0)
        v10 = sample(x0, y0 + 1)
        v11 = sample(x0 + 1, y0 + 1)
        top = v00 * (1 - fx) + v01 * fx
        bot = v10 * (1 - fx) + v11 * fx
        out = top * (1 - fy) + bot * fy
        return out.reshape(out_h, out_w, ch)

    return jax.vmap(one)(homographies)


def _axis_matrix(o, s, src_size: int, dst_size: int, valid):
    """Per-crop 1-D bilinear sampling matrix [N, dst_size, src_size] for
    the linear map p(d) = o + d*s (s may be negative — the 180-degree
    flip).  Taps outside [0, valid) are dropped; the caller blends the
    missing weight mass with the fill value, which reproduces the gather
    warp's per-tap fill EXACTLY (each 2-D tap is out iff its row or
    column tap is out).  Returns (weights, row tap-mass [N, dst_size])."""
    d = jax.lax.broadcasted_iota(jnp.float32, (1, dst_size, 1), 1)
    j = jax.lax.broadcasted_iota(jnp.float32, (1, 1, src_size), 2)
    o = o[:, None, None]
    s = s[:, None, None]
    v = valid[:, None, None]
    p = o + d * s
    w = jnp.maximum(0.0, 1.0 - jnp.abs(p - j)) * (j < v)
    return w, w.sum(axis=2)


@partial(jax.jit, static_argnames=("out_h", "out_w", "fill"))
def warp_crops_separable(
    images: jax.Array,
    img_idx: jax.Array,
    scal: jax.Array,
    valid_hw: jax.Array,
    out_h: int,
    out_w: int,
    fill: float = 255.0,
) -> jax.Array:
    """AXIS-ALIGNED crop warp as two dense matmuls on the MXU.

    Arbitrary-quad warps gather 4 taps per output pixel — and TPU gathers
    are slow (~60 ms for 32 rec crops, 15x the rec model itself).  Most
    det boxes of horizontal text are axis-aligned rectangles, whose warp
    is a SEPARABLE resample: out = Wv @ img @ Wu^T with per-crop 1-D
    bilinear matrices — dense MXU work, ~20x faster.  The general path
    (warp_crops_multi) remains for rotated quads.

    images: [B, H, W, C] u8; img_idx: [N]; scal: [N, 4] = (ox, sx, oy, sy)
    mapping dest (u, v) -> source (ox + u*sx, oy + v*sy); valid_hw: [B, 2].
    Returns [N, out_h, out_w, C] f32 with out-of-valid dest pixels filled.
    """
    src = images[img_idx].astype(jnp.float32)  # [N, H, W, C]
    h, w = images.shape[1], images.shape[2]
    vh = valid_hw[img_idx, 0].astype(jnp.float32)
    vw = valid_hw[img_idx, 1].astype(jnp.float32)
    wv, mass_v = _axis_matrix(scal[:, 2], scal[:, 3], h, out_h, vh)
    wu, mass_u = _axis_matrix(scal[:, 0], scal[:, 1], w, out_w, vw)
    t = jnp.einsum("ndh,nhwc->ndwc", wv, src)
    out = jnp.einsum("new,ndwc->ndec", wu, t)
    mass = mass_v[:, :, None] * mass_u[:, None, :]  # in-bounds tap mass
    return out + (1.0 - mass)[..., None] * fill
