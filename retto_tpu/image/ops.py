"""Device-side (JAX/XLA) image preprocessing.

TPU replacement for the reference's host-side pixel loops
(image_helper.rs: resize/normalize/pad/transpose, rgb2bgr) — SURVEY.md §2
row 7's "fused preprocessing kernel" north star.  All functions are
shape-polymorphic pure functions; callers jit them per bucket shape.

Layout note: TPU convolutions want NHWC (lane dim = channels); the reference
pipeline (and PP-OCR checkpoints) are NCHW.  We keep the PUBLIC contract
NCHW f32 like the reference worker interface (worker.rs:69-73) and convert
at the model boundary — models consume NHWC internally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "resize_image",
    "normalize_det",
    "resize_norm_pad",
    "pad_to",
]


def resize_image(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Area-style resize of an HWC image (antialiased linear — the closest
    XLA-native analog of the reference's box-filter ``thumbnail``,
    image_helper.rs:128-133).  Output dtype float32 in [0, 255]."""
    img = img.astype(jnp.float32)
    return jax.image.resize(
        img, (out_h, out_w, img.shape[2]), method="linear", antialias=True
    )


def normalize_det(
    img: jax.Array,
    mean: tuple[float, float, float] = (0.5, 0.5, 0.5),
    std: tuple[float, float, float] = (0.5, 0.5, 0.5),
    scale: float = 1.0 / 255.0,
    bgr: bool = True,
) -> jax.Array:
    """Det-stage normalize (det_processor.rs:152-163 + rgb2bgr at :268):
    (x * scale - mean) / std on a HWC image, optional BGR channel swap,
    returns NCHW [1, 3, H, W] float32."""
    x = img.astype(jnp.float32)
    if bgr:
        x = x[..., ::-1]
    mean_a = jnp.asarray(mean, dtype=jnp.float32)
    std_a = jnp.asarray(std, dtype=jnp.float32)
    x = (x * scale - mean_a) / std_a
    return jnp.transpose(x, (2, 0, 1))[None]


def resize_norm_pad(
    img: jax.Array, img_h: int, resized_w: int, target_w: int
) -> jax.Array:
    """Cls/rec crop normalize (image_helper.rs:176-209): aspect resize to
    (img_h, resized_w), x/255 -> (v-0.5)/0.5, CHW, zero-pad right to
    target_w.  Input HWC uint8/float, output [3, img_h, target_w] f32.

    ``resized_w``/``target_w`` must be static (from
    retto_tpu.image.resize.rec_resize_dims, bucketed by the scheduler)."""
    x = resize_image(img, img_h, resized_w)
    x = (x / 255.0 - 0.5) / 0.5
    x = jnp.transpose(x, (2, 0, 1))
    pad = target_w - resized_w
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


def pad_to(
    x: jax.Array, h: int, w: int, value: float = 0.0, mode: str = "constant"
) -> jax.Array:
    """Pad the trailing two spatial dims of an NCHW tensor up to (h, w).
    Used to snap det inputs onto the static bucket grid (BucketConfig).
    ``mode="edge"`` replicates the border pixel instead of filling with
    ``value`` — a constant fill paints a synthetic image→pad transition
    that a det model can fire on (corner false positives)."""
    ph = h - x.shape[-2]
    pw = w - x.shape[-1]
    if ph < 0 or pw < 0:
        raise ValueError(f"pad_to: target ({h},{w}) smaller than {x.shape}")
    if ph == 0 and pw == 0:
        return x
    cfg = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    if mode == "edge":
        return jnp.pad(x, cfg, mode="edge")
    return jnp.pad(x, cfg, constant_values=value)
