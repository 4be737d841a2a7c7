"""Model presets mirroring the reference's model suite
(/root/reference/retto-core/build.rs:7-12: PP-OCRv4 mobile det + rec,
mobile-v2.0 cls) plus a "server" tier (BASELINE.json config 4) and a "tiny"
tier for tests and synthetic training.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .dbnet import DetModel
from .mobilenetv3 import ClsModel
from .svtr import RecModel

__all__ = ["MODEL_PRESETS", "build_det", "build_cls", "build_rec"]

MODEL_PRESETS: dict[str, dict[str, dict[str, Any]]] = {
    # det presets use the dense-conv TpuBackbone + stride-2 head (r3
    # rework — models/dbnet.py): every conv contraction >= 128 so the
    # MXU is fed; channel widths chosen per tier
    "tiny": {
        "det": dict(widths=(32, 48, 64, 96), depths=(1, 1, 1, 1),
                    inner_ch=64, head_ch=32),
        "cls": dict(scale=0.2),
        "rec": dict(dims=(32, 64, 96, 128), depths=(1, 1, 1, 1),
                    mixer_dim=64, mixer_depth=1, num_heads=4),
    },
    "mobile": {
        "det": dict(widths=(64, 128, 192, 256), depths=(1, 2, 2, 2),
                    inner_ch=128, head_ch=64),
        # PP-OCR's cls ships at scale 0.35; ours trains at 0.75 — the extra
        # capacity is needed for orientation on blurred upscaled crops and
        # for 180-degree micro-cues on near-symmetric content (TitleCase
        # short words, digit runs); still ~2M params, negligible vs rec
        "cls": dict(scale=0.75),
        "rec": dict(dims=(64, 128, 256, 512), depths=(2, 2, 2, 2),
                    mixer_dim=120, mixer_depth=2, num_heads=8),
    },
    "server": {
        "det": dict(widths=(96, 192, 384, 512), depths=(2, 3, 3, 3),
                    inner_ch=256, head_ch=128),
        "cls": dict(scale=0.35),
        "rec": dict(dims=(96, 192, 384, 768), depths=(3, 3, 6, 3),
                    mixer_dim=256, mixer_depth=4, num_heads=8),
    },
}


def _dtype(name: str | None):
    if name in (None, "float32", "f32"):
        return None
    return jnp.dtype(name)


def build_det(preset: str = "mobile", compute_dtype: str | None = "bfloat16",
              **overrides: Any) -> DetModel:
    kw = dict(MODEL_PRESETS[preset]["det"])
    kw.update(overrides)
    return DetModel(dtype=_dtype(compute_dtype), **kw)


def build_cls(preset: str = "mobile", num_classes: int = 2,
              compute_dtype: str | None = "bfloat16", **overrides: Any) -> ClsModel:
    kw = dict(MODEL_PRESETS[preset]["cls"])
    kw.update(overrides)
    return ClsModel(num_classes=num_classes, dtype=_dtype(compute_dtype), **kw)


def build_rec(preset: str = "mobile", num_classes: int = 6625,
              compute_dtype: str | None = "bfloat16", **overrides: Any) -> RecModel:
    kw = dict(MODEL_PRESETS[preset]["rec"])
    kw.update(overrides)
    return RecModel(num_classes=num_classes, dtype=_dtype(compute_dtype), **kw)
