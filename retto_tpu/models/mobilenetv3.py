"""MobileNetV3 backbone + the angle classifier.

TPU-native counterpart of the reference's cls model
(ch_ppocr_mobile_v2.0_cls: MobileNetV3-small x0.35 -> [N, 2] softmax,
executed through ort at ort_worker.rs:200-209).  Also usable as a DBNet
backbone (MobileNetV3-large), returning stride-4/8/16/32 feature maps.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, SEModule, make_divisible

__all__ = ["MobileNetV3", "ClsModel", "LARGE_CFG", "SMALL_CFG"]

# (kernel, expand, out, use_se, act, stride)
LARGE_CFG = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]

SMALL_CFG = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1),
    (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1),
    (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2),
    (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
]


class ResidualUnit(nn.Module):
    kernel: int
    expand_ch: int
    out_ch: int
    use_se: bool
    act: str
    stride: int | tuple[int, int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        s = self.stride if isinstance(self.stride, tuple) else (self.stride, self.stride)
        y = ConvBNAct(self.expand_ch, 1, 1, act=self.act, dtype=self.dtype)(x, train)
        y = ConvBNAct(
            self.expand_ch, self.kernel, s, groups=self.expand_ch, act=self.act,
            dtype=self.dtype,
        )(y, train)
        if self.use_se:
            y = SEModule(dtype=self.dtype)(y)
        y = ConvBNAct(self.out_ch, 1, 1, act="none", dtype=self.dtype)(y, train)
        if s == (1, 1) and in_ch == self.out_ch:
            y = x + y
        return y


class MobileNetV3(nn.Module):
    """NHWC MobileNetV3.  ``feature_strides`` selects which stride maps are
    returned (for FPN backbones); with None, returns the final feature map.
    """

    cfg: Sequence = tuple(SMALL_CFG)
    scale: float = 0.35
    last_ch: int = 576  # small: 576, large: 960
    feature_strides: Sequence[int] | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        scale = self.scale
        feats: dict[int, jax.Array] = {}
        stride = 2
        x = ConvBNAct(
            make_divisible(16 * scale), 3, 2, act="hardswish", dtype=self.dtype
        )(x, train)
        for (k, exp, out, se, act, s) in self.cfg:
            if s == 2 and self.feature_strides and stride in self.feature_strides:
                feats[stride] = x
            stride *= s if isinstance(s, int) else max(s)
            x = ResidualUnit(
                k,
                make_divisible(exp * scale),
                make_divisible(out * scale),
                se,
                act,
                s,
                dtype=self.dtype,
            )(x, train)
        x = ConvBNAct(
            make_divisible(self.last_ch * scale), 1, 1, act="hardswish",
            dtype=self.dtype,
        )(x, train)
        feats[stride] = x
        if self.feature_strides is not None:
            return [feats[s] for s in self.feature_strides]
        return x


class ClsModel(nn.Module):
    """Angle classifier: backbone -> GAP -> FC -> softmax.

    Engine contract (worker.rs:71): input f32 [N, 3, H, W] (NCHW like the
    reference), output probs f32 [N, num_classes] with classes == the config
    ``label`` list ((0, 180) by default, cls_processor.rs:29-35).

    Backbones:
    * ``arch="mbv3"`` — MobileNetV3-small (the reference checkpoint
      family, ch_ppocr_mobile_v2.0_cls).
    * ``arch="dense"`` — MXU-first (r4): a 4x4 space-to-depth stem packs
      the 48x192 crop losslessly into 12x48x48 channels, then four dense
      3x3 convs at ``width``/2*``width`` channels.  The mbv3 depthwise
      tower measured 46 us/crop at n=32 on v5e (per-op overhead at tiny
      channel counts dominates); this runs the same decision at full-lane
      MXU contractions, with MORE effective capacity.
    """

    num_classes: int = 2
    scale: float = 0.35
    arch: str = "mbv3"  # "mbv3" | "dense"
    width: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        if self.arch == "dense":
            from .dbnet import _space_to_depth

            w = self.width
            x = _space_to_depth(x, 4)  # [N, 12, 48, 48]
            x = ConvBNAct(w, 3, 1, act="relu", dtype=self.dtype)(x, train)
            x = ConvBNAct(2 * w, 3, 2, act="relu", dtype=self.dtype)(x, train)
            x = ConvBNAct(2 * w, 3, 1, act="relu", dtype=self.dtype)(x, train)
            x = ConvBNAct(2 * w, 3, 2, act="relu", dtype=self.dtype)(x, train)
        else:
            x = MobileNetV3(
                cfg=tuple(SMALL_CFG), scale=self.scale, last_ch=576,
                dtype=self.dtype,
            )(x, train)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.num_classes, dtype=self.dtype)(x)
        x = x.astype(jnp.float32)
        return nn.softmax(x, axis=-1)
