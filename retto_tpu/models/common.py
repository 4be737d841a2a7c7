"""Shared building blocks for the PP-OCR model families.

All modules are NHWC (TPU-native layout: channels on the 128-lane dim so
XLA tiles convs onto the MXU).  The public engine boundary stays NCHW like
the reference worker contract (worker.rs:69-73); the transpose at the edge
is fused by XLA.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "make_divisible",
    "hard_sigmoid",
    "hard_swish",
    "ACTIVATIONS",
    "ConvBNAct",
    "SEModule",
]


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Round channel counts to a multiple of ``divisor`` (MobileNet rule)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x: jax.Array, slope: float = 0.2, offset: float = 0.5) -> jax.Array:
    """Paddle-style hard sigmoid (slope 0.2 / offset 0.5 as used by the
    PP-OCR SE modules)."""
    return jnp.clip(x * slope + offset, 0.0, 1.0)


def hard_swish(x: jax.Array) -> jax.Array:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "hardswish": hard_swish,
    "swish": nn.swish,
    "gelu": nn.gelu,
    "none": lambda x: x,
}


class ConvBNAct(nn.Module):
    """Conv2D (no bias) + BatchNorm + activation — the ConvBNLayer idiom of
    every PP-OCR backbone."""

    out_ch: int
    kernel: int | tuple[int, int] = 3
    stride: int | tuple[int, int] = 1
    groups: int = 1
    act: str = "hardswish"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        k = self.kernel if isinstance(self.kernel, tuple) else (self.kernel, self.kernel)
        s = self.stride if isinstance(self.stride, tuple) else (self.stride, self.stride)
        x = nn.Conv(
            self.out_ch,
            kernel_size=k,
            strides=s,
            padding="SAME",
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype
        )(x)
        return ACTIVATIONS[self.act](x)


class SEModule(nn.Module):
    """Squeeze-and-excitation with the Paddle hard-sigmoid gate."""

    reduction: int = 4
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(ch // self.reduction, 1), (1, 1), dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(ch, (1, 1), dtype=self.dtype)(s)
        return x * hard_sigmoid(s)
