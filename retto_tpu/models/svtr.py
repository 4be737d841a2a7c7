"""SVTR-LCNet text recognizer (CRNN-family, CTC output).

TPU-native replacement for the reference's rec model
(ch_PP-OCRv4_rec_infer.onnx run through ort at ort_worker.rs:211-221).
Engine contract (worker.rs:72): f32 [N, 3, H, W] -> f32 [N, T, C] of
per-timestep class probabilities, T = W / 8, C = len(dict) + 2 (blank at
index 0, trailing space — rec_processor.rs:37-45).

Family: LCNet-style depthwise-separable conv backbone collapsing height
(48 -> 3) while keeping W/8 timesteps, global-mixing SVTR blocks
(pre-norm MHSA + MLP) on the [N, T, D] sequence, CTC head with softmax.
MXU notes: attention and the (T x D) @ (D x C) head are the FLOPs hot
spots; D and C are kept multiples of 8 and the vocab matmul runs in
bfloat16 with f32 accumulation when ``dtype`` is set.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import ConvBNAct, SEModule

__all__ = ["LCNetBackbone", "SVTRBlock", "RecModel"]


class DSConv(nn.Module):
    """Depthwise-separable conv block (LCNet unit)."""

    out_ch: int
    kernel: int = 3
    stride: int | tuple[int, int] = 1
    use_se: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        x = ConvBNAct(
            in_ch, self.kernel, self.stride, groups=in_ch, act="hardswish",
            dtype=self.dtype,
        )(x, train)
        if self.use_se:
            x = SEModule(dtype=self.dtype)(x)
        x = ConvBNAct(self.out_ch, 1, 1, act="hardswish", dtype=self.dtype)(x, train)
        return x


class LCNetBackbone(nn.Module):
    """Conv backbone for 48-px-high line crops.

    Stride plan (H x W): stem (2,2) -> 24 x W/2; stage1 (2,2) -> 12 x W/4;
    stage2 (2,2) -> 6 x W/8; stage3 (2,1) -> 3 x W/8; mean-pool H -> 1 x W/8.
    T = W / 8 (e.g. 40 timesteps for the default 320-wide rec shape,
    matching the PP-OCR rec family).
    """

    dims: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvBNAct(self.dims[0] // 2, 3, 2, act="hardswish", dtype=self.dtype)(
            x, train
        )
        strides = [(2, 2), (2, 2), (2, 1), (1, 1)]
        for dim, depth, stride in zip(self.dims, self.depths, strides):
            for i in range(depth):
                x = DSConv(
                    dim,
                    kernel=3,
                    stride=stride if i == 0 else 1,
                    use_se=(i == depth - 1),
                    dtype=self.dtype,
                )(x, train)
        # collapse remaining height (3) -> sequence [N, W/8, C]
        x = jnp.mean(x, axis=1)
        return x


class SVTRBlock(nn.Module):
    """Pre-norm global mixing block: LN -> MHSA -> LN -> MLP."""

    dim: int
    num_heads: int = 8
    mlp_ratio: float = 2.0
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=self.dtype)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype)(y)
        return x + y


class RecModel(nn.Module):
    """Full recognizer: LCNet backbone -> SVTR mixer -> CTC head."""

    num_classes: int = 6625
    dims: Sequence[int] = (64, 128, 256, 512)
    depths: Sequence[int] = (2, 2, 2, 2)
    mixer_dim: int = 120
    mixer_depth: int = 2
    num_heads: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, return_logits: bool = False
    ) -> jax.Array:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
        seq = LCNetBackbone(self.dims, self.depths, dtype=self.dtype)(x, train)
        seq = nn.Dense(self.mixer_dim, dtype=self.dtype)(seq)
        for _ in range(self.mixer_depth):
            seq = SVTRBlock(
                self.mixer_dim, self.num_heads, dtype=self.dtype
            )(seq, train)
        seq = nn.LayerNorm(dtype=self.dtype)(seq)
        logits = nn.Dense(self.num_classes, dtype=self.dtype)(seq)
        logits = logits.astype(jnp.float32)
        if return_logits:
            return logits
        return nn.softmax(logits, axis=-1)
