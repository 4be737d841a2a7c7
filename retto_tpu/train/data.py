"""Device-resident training datasets.

The TPU here sits behind a ~40 MB/s tunnel, so per-step host->device batch
uploads would dominate training time.  Instead the rendered dataset is
uploaded ONCE as uint8 and each jitted train step gathers its batch by
index, normalizes, and (for det) synthesizes the DB ground-truth maps
directly on device from box coordinates — only a [B] index vector crosses
the wire per step.
"""

from __future__ import annotations

from dataclasses import dataclass, fields
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _register_pytree(cls):
    """Dataset holders must be pytrees so they can be passed as jit
    ARGUMENTS — closing over them embeds hundreds of MB of constants in the
    serialized computation (the tunnel's remote-compile endpoint rejects
    bodies that large with HTTP 413)."""
    names = [f.name for f in fields(cls)]
    jax.tree_util.register_pytree_node(
        cls,
        lambda obj: ([getattr(obj, n) for n in names], None),
        lambda _, children: cls(*children),
    )
    return cls

__all__ = [
    "RecDeviceData",
    "ClsDeviceData",
    "DetDeviceData",
    "gather_rec_batch",
    "gather_cls_batch",
    "gather_det_batch",
    "db_gt_device",
]


@_register_pytree
@dataclass
class RecDeviceData:
    """lines: uint8 [M, H, W, 3] right-padded; widths [M] i32;
    labels [M, L] i32; lengths [M] i32."""

    lines: jax.Array
    widths: jax.Array
    labels: jax.Array
    lengths: jax.Array

    @classmethod
    def build(cls, imgs: list[np.ndarray], labels: np.ndarray, lengths: np.ndarray, w_max: int):
        h = imgs[0].shape[0]
        m = len(imgs)
        buf = np.zeros((m, h, w_max, 3), np.uint8)
        widths = np.zeros((m,), np.int32)
        for i, im in enumerate(imgs):
            w = min(im.shape[1], w_max)
            buf[i, :, :w] = im[:, :w]
            widths[i] = w
        return cls(
            jnp.asarray(buf),
            jnp.asarray(widths),
            jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(lengths.astype(np.int32)),
        )


def gather_rec_batch(data: RecDeviceData, idx: jax.Array,
                     key: jax.Array | None = None,
                     noise_sigma: float = 0.05):
    """[B] indices -> (x [B,3,H,W] f32 normalized+width-masked, labels,
    lengths).  Matches inference resize_norm semantics: content normalized
    (v/255-0.5)/0.5, zero beyond the crop width (image_helper.rs:203-208).

    ``key`` enables per-crop photometric jitter (gain/bias + Gaussian
    noise in normalized space) — low-contrast and noisy/JPEG crops are
    what the held-out eval feeds the recognizer."""
    imgs = data.lines[idx].astype(jnp.float32)
    x = (imgs / 255.0 - 0.5) / 0.5
    if key is not None:
        kg, kb, kn, ka = jax.random.split(key, 4)
        b = x.shape[0]
        gain = jax.random.uniform(kg, (b, 1, 1, 1), minval=0.4, maxval=1.15)
        bias = jax.random.uniform(kb, (b, 1, 1, 1), minval=-1.1, maxval=0.2)
        bias = jnp.clip(bias, -0.6 - gain, 1.0 - gain)
        noise = noise_sigma * jax.random.normal(kn, x.shape)
        aug = jax.random.bernoulli(ka, 0.75, (b, 1, 1, 1))
        x = jnp.where(aug, jnp.clip(x * gain + bias + noise, -1.0, 1.0), x)
    w = data.lines.shape[2]
    col = jnp.arange(w)[None, None, :, None]
    mask = col < data.widths[idx][:, None, None, None]
    x = jnp.where(mask, x, 0.0)
    x = jnp.transpose(x, (0, 3, 1, 2))
    return x, data.labels[idx], data.lengths[idx]


@_register_pytree
@dataclass
class ClsDeviceData:
    """lines uint8 [M, 2, H, W, 3] — BOTH orientations, each resized on the
    host through the inference path, widths [M].

    Why both are stored: rot180(resize(x)) != resize(rot180(x)) for
    non-integer scale factors (the BOX filter phase is not symmetric under
    rotation), so a device-side flip of the resized upright crop produces
    tensors that can never occur at inference — training on them put the
    classifier ~25 points below its train-eval accuracy on real crops."""

    lines: jax.Array
    widths: jax.Array

    @classmethod
    def build(cls, imgs: list[np.ndarray], w_max: int):
        """imgs: RAW crops (any height).  Both orientations are resized
        host-side through the INFERENCE resample kernel (2-tap separable
        bilinear — device_pipeline warps cls crops with _axis_matrix, not
        PIL's anti-aliased BOX/BILINEAR filters; r5b closed the same
        train/infer mismatch for rec)."""
        from .synth import downsample_2tap

        h_out = 48
        buf = np.zeros((len(imgs), 2, h_out, w_max, 3), np.uint8)
        widths = np.zeros((len(imgs),), np.int32)
        for i, im in enumerate(imgs):
            tw = max(min(int(im.shape[1] * h_out / im.shape[0]), w_max), 8)
            buf[i, 0, :, :tw] = downsample_2tap(im, h_out, tw)
            buf[i, 1, :, :tw] = downsample_2tap(
                np.ascontiguousarray(im[::-1, ::-1]), h_out, tw
            )
            widths[i] = tw
        return cls(jnp.asarray(buf), jnp.asarray(widths))


def gather_cls_batch(data: ClsDeviceData, idx: jax.Array, rot: jax.Array,
                     gain: jax.Array | None = None,
                     bias: jax.Array | None = None,
                     key: jax.Array | None = None,
                     noise_sigma: float = 0.05):
    """rot [B] in {0,1}: 1 = the stored 180-rotated orientation (the
    positive cls class).  Optional per-sample photometric jitter
    (gain/bias, applied in normalized space) regularizes training;
    ``key`` adds per-pixel Gaussian noise on top (held-out noise/JPEG
    condition)."""
    imgs = data.lines[idx, rot].astype(jnp.float32)
    w = data.lines.shape[3]
    widths = data.widths[idx]
    x = (imgs / 255.0 - 0.5) / 0.5
    if gain is not None:
        x = x * gain[:, None, None, None] + bias[:, None, None, None]
        if key is not None:
            x = x + noise_sigma * jax.random.normal(key, x.shape)
        x = jnp.clip(x, -1.0, 1.0)
    col = jnp.arange(w)[None, None, :, None]
    x = jnp.where(col < widths[:, None, None, None], x, 0.0)
    return jnp.transpose(x, (0, 3, 1, 2)), rot


@_register_pytree
@dataclass
class DetDeviceData:
    """pages uint8 [M, S, S, 3]; boxes f32 [M, P, 4] xyxy padded with -1."""

    pages: jax.Array
    boxes: jax.Array

    @classmethod
    def build(cls, pages: list[np.ndarray], boxes: list[np.ndarray], max_boxes: int = 16):
        s = pages[0].shape[0]
        m = len(pages)
        buf = np.stack(pages)
        bbuf = np.full((m, max_boxes, 4), -1.0, np.float32)
        for i, bx in enumerate(boxes):
            k = min(len(bx), max_boxes)
            if k:
                bbuf[i, :k] = bx[:k]
        return cls(jnp.asarray(buf), jnp.asarray(bbuf))


def db_gt_device(boxes: jax.Array, size_h: int, size_w: int, shrink_ratio: float = 0.4):
    """On-device DB ground truth from axis-aligned boxes [P, 4] (invalid
    rows = -1).  Returns (shrink, thresh, thresh_mask) each [H, W] f32 —
    the jnp mirror of synth.db_ground_truth."""
    valid = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    x0 = boxes[:, 0][:, None, None]
    y0 = boxes[:, 1][:, None, None]
    x1 = boxes[:, 2][:, None, None]
    y1 = boxes[:, 3][:, None, None]
    gx = jnp.arange(size_w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(size_h, dtype=jnp.float32)[None, :, None]
    bw, bh = x1 - x0, y1 - y0
    area, per = bw * bh, 2 * (bw + bh)
    d = area * (1 - shrink_ratio**2) / jnp.maximum(per, 1e-6)
    d = jnp.minimum(d, jnp.minimum(bw / 2 - 1, bh / 2 - 1))
    d = jnp.maximum(d, 1.0)
    v = valid[:, None, None]
    shrink_p = (
        (gx >= jnp.floor(x0 + d))
        & (gx < jnp.ceil(x1 - d))
        & (gy >= jnp.floor(y0 + d))
        & (gy < jnp.ceil(y1 - d))
        & v
    )
    shrink = jnp.any(shrink_p, axis=0).astype(jnp.float32)
    dx = jnp.maximum(jnp.maximum(x0 - gx, gx - x1), 0.0)
    dy = jnp.maximum(jnp.maximum(y0 - gy, gy - y1), 0.0)
    dist_out = jnp.sqrt(dx * dx + dy * dy)
    inside = jnp.minimum(
        jnp.minimum(gx - x0, x1 - gx), jnp.minimum(gy - y0, y1 - gy)
    )
    signed = jnp.where(inside > 0, -inside, dist_out)
    band = (jnp.abs(signed) <= d) & v
    val = jnp.clip(1.0 - jnp.abs(signed) / d, 0.0, 1.0)
    tmap = jnp.max(jnp.where(band, 0.3 + 0.4 * val, 0.0), axis=0)
    tmask = jnp.any(band, axis=0).astype(jnp.float32)
    return shrink, tmap, tmask


def gather_det_batch(data: DetDeviceData, idx: jax.Array, out_stride: int = 1,
                     key: jax.Array | None = None,
                     noise_sigma: float = 0.06):
    """[B] indices -> (x [B,3,S,S] det-normalized BGR, gt_shrink, gt_mask,
    gt_thresh, gt_thresh_mask).  ``out_stride`` renders the GT maps at the
    model's output stride (models/dbnet.py DetModel.out_stride): the boxes
    scale by 1/s and the grid shrinks by s — same geometry, fewer pixels.

    ``key`` enables photometric augmentation in normalized space: per-page
    gain/bias (covers gray-on-gray low-contrast pages AND the 1-ULP bf16
    DC shifts different XLA backends produce — the r4 TPU divergence
    showed a det trained on one exact background code amplifies a 2^-7
    shift into logit swings of ±50) plus per-pixel Gaussian noise (the
    noise/JPEG held-out condition)."""
    pages = data.pages[idx].astype(jnp.float32)
    bgr = pages[..., ::-1]
    x = (bgr / 255.0 - 0.5) / 0.5
    if key is not None:
        kg, kb, kn, ka, kt = jax.random.split(key, 5)
        b = x.shape[0]
        gain = jax.random.uniform(kg, (b, 1, 1, 1), minval=0.35, maxval=1.15)
        # bias keeps the (gained) white background inside [-0.6, 1.0]
        bias = jax.random.uniform(kb, (b, 1, 1, 1), minval=-1.2, maxval=0.25)
        bias = jnp.clip(bias, -0.6 - gain, 1.0 - gain)
        # per-channel tint: a (250,252,255)-style background is a
        # per-CHANNEL DC shift no grayscale gain/bias covers — the r4
        # CPU repro showed the det firing on a 3/255 tint
        tint = jax.random.uniform(kt, (b, 1, 1, 3), minval=-0.06,
                                  maxval=0.06)
        noise = noise_sigma * jax.random.normal(kn, x.shape)
        aug = jax.random.bernoulli(ka, 0.75, (b, 1, 1, 1))
        x = jnp.where(
            aug, jnp.clip(x * gain + bias + tint + noise, -1.0, 1.0), x)
    x = jnp.transpose(x, (0, 3, 1, 2))
    s_h, s_w = data.pages.shape[1], data.pages.shape[2]
    boxes = data.boxes[idx]
    if out_stride > 1:
        valid = boxes[..., 2:3] > boxes[..., 0:1]  # padded rows stay -1
        boxes = jnp.where(valid, boxes / out_stride, boxes)
        s_h, s_w = s_h // out_stride, s_w // out_stride
    shrink, tmap, tmask = jax.vmap(
        partial(db_gt_device, size_h=s_h, size_w=s_w)
    )(boxes)
    mask = jnp.ones_like(shrink)
    return x, shrink, mask, tmap, tmask
