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
        # r4: stride-8-native TpuBackboneV2 + sub-pixel head — all channel
        # dims are multiples of the 128-lane MXU granularity; measured
        # 0.71 ms/img at batch 16 @ 1024x768 vs 1.19 for the r3 v1 config
        # (tools/det_probe.py --v2)
        "det": dict(backbone="tpu_v2", widths=(128, 256, 384),
                    depths=(2, 2, 2), inner_ch=128, head_ch=128),
        # r4: dense 4x4-space-to-depth cls net — the MobileNetV3-0.75
        # tower measured 46 us/crop at n=32 (depthwise per-op overhead);
        # this runs full-lane dense contractions with more capacity
        "cls": dict(arch="dense", width=128),
        "rec": dict(dims=(64, 128, 256, 512), depths=(2, 2, 2, 2),
                    mixer_dim=120, mixer_depth=2, num_heads=8),
    },
    "server": {
        "det": dict(backbone="tpu_v2", widths=(256, 384, 512),
                    depths=(1, 2, 2), inner_ch=256, head_ch=256),
        "cls": dict(arch="dense", width=128),
        "rec": dict(dims=(96, 192, 384, 768), depths=(3, 3, 6, 3),
                    mixer_dim=256, mixer_depth=4, num_heads=8),
    },
    # "bare": no preset kwargs at all — for building a model from a
    # checkpoint's SELF-DESCRIBED arch kwargs alone (session.py): merging
    # them over a named preset breaks the moment the preset grows a field
    # the checkpoint era didn't have (r4: mobile gained backbone="tpu_v2"
    # and cls arch="dense", which leaked into tiny-checkpoint builds)
    "bare": {"det": {}, "cls": {}, "rec": {}},
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
