"""DBNet text detector (Differentiable Binarization).

TPU-native replacement for the reference's det model
(ch_PP-OCRv4_det_infer.onnx run through ort at ort_worker.rs:189-198).
Engine contract (worker.rs:70): f32 [N, 3, H, W] -> prob map f32
[N, 1, H, W] (same spatial size as the input; the reference postprocess
indexes it as [0, 0, y, x], det_processor.rs:283-289).

Architecture family: configurable backbone (MobileNetV3-large or LCNet) ->
DBFPN neck -> DB head (3x upsampling conv stack -> sigmoid).  In training
mode the head also returns the threshold and approximate-binary maps of the
DB paper (arXiv:1911.08947).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct
from .mobilenetv3 import LARGE_CFG, MobileNetV3

__all__ = ["DBFPN", "DBHead", "DetModel"]


def _upsample(x: jax.Array, factor: int) -> jax.Array:
    """Nearest-neighbor upsample of NHWC by an integer factor (cheap on TPU:
    pure data movement, fuses with the following conv)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
    )
    return x.reshape(n, h * factor, w * factor, c)


class DBFPN(nn.Module):
    """Top-down FPN with concat fuse (PaddleOCR DBFPN)."""

    inner_ch: int = 96
    out_ch: int = 24  # per-level; fused output = 4 * out_ch
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False) -> jax.Array:
        # feats: [c2 (s4), c3 (s8), c4 (s16), c5 (s32)] NHWC
        ins = [
            nn.Conv(self.inner_ch, (1, 1), use_bias=False, dtype=self.dtype)(f)
            for f in feats
        ]
        # top-down pathway
        p5 = ins[3]
        p4 = ins[2] + _upsample(p5, 2)
        p3 = ins[1] + _upsample(p4, 2)
        p2 = ins[0] + _upsample(p3, 2)
        outs = [
            nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(p)
            for p in (p2, p3, p4, p5)
        ]
        # bring all to stride 4 and concat
        fused = jnp.concatenate(
            [outs[0], _upsample(outs[1], 2), _upsample(outs[2], 4),
             _upsample(outs[3], 8)],
            axis=-1,
        )
        return fused


class DBHead(nn.Module):
    """Binarization head: conv -> 2x deconv -> 2x deconv -> sigmoid, taking
    the stride-4 fused map back to full resolution."""

    mid_ch: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c = self.mid_ch // 4
        x = ConvBNAct(c, 3, 1, act="relu", dtype=self.dtype)(x, train)
        x = nn.ConvTranspose(c, (2, 2), strides=(2, 2), use_bias=False,
                             dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2), dtype=self.dtype)(x)
        return nn.sigmoid(x.astype(jnp.float32))


class DetModel(nn.Module):
    """Full DBNet.  Returns [N, 1, H, W] prob map (inference) or a dict with
    shrink/threshold/binary maps (training, DB paper losses)."""

    backbone_scale: float = 0.5
    inner_ch: int = 96
    head_ch: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        feats = MobileNetV3(
            cfg=tuple(LARGE_CFG),
            scale=self.backbone_scale,
            last_ch=960,
            feature_strides=(4, 8, 16, 32),
            dtype=self.dtype,
        )(x, train)
        fused = DBFPN(self.inner_ch, self.inner_ch // 4, dtype=self.dtype)(
            feats, train
        )
        prob = DBHead(self.head_ch, dtype=self.dtype)(fused, train)  # NHWC, C=1
        prob_nchw = jnp.transpose(prob, (0, 3, 1, 2))
        if not train:
            return prob_nchw
        thresh = DBHead(self.head_ch, dtype=self.dtype)(fused, train)
        thresh_nchw = jnp.transpose(thresh, (0, 3, 1, 2))
        # differentiable binarization: B = sigmoid(k (P - T)), k = 50
        binary = nn.sigmoid(50.0 * (prob_nchw - thresh_nchw))
        return {"maps": prob_nchw, "thresh": thresh_nchw, "binary": binary}
