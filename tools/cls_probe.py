#!/usr/bin/env python
"""Per-category cls failure-rate probe on REAL pipeline crops.

Renders single-line pages at the n=512 eval geometry (640x200, DejaVu 44),
runs the trained det stage, warps the crops exactly like the session, then
scores BOTH orientations with the trained cls model through ClsStage.

Categories mirror the residual n=512 eval misses: pure digit runs, short
lowercase words, TitleCase words, ALL-CAPS words, natural multiword lines.

Usage: python tools/cls_probe.py [N_per_cat] [--tpu]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

if "--tpu" not in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

from eval_accuracy import render

WEIGHTS = REPO / "trained_weights"


def texts_for(cat: str, rng: np.random.Generator, n: int) -> list[str]:
    from retto_tpu.train.synth import natural_text

    out = []
    words_lc = ["put", "boy", "too", "and", "was", "open", "good", "play",
                "hand", "say", "will", "dog", "cat", "see", "how", "did"]
    for _ in range(n):
        if cat == "digits":
            out.append(str(rng.integers(0, 10 ** int(rng.integers(2, 7)))))
        elif cat == "lower":
            out.append(words_lc[int(rng.integers(0, len(words_lc)))])
        elif cat == "title":
            out.append(words_lc[int(rng.integers(0, len(words_lc)))].capitalize())
        elif cat == "caps":
            out.append(words_lc[int(rng.integers(0, len(words_lc)))].upper())
        else:
            out.append(natural_text(rng, max_words=3))
    return out


def main() -> None:
    n = 64
    for a in sys.argv[1:]:
        if a.isdigit():
            n = int(a)

    from retto_tpu import SessionConfig
    from retto_tpu.geometry import PointBox
    from retto_tpu.image.io import ImageHelper
    from retto_tpu.models import build_cls, build_det
    from retto_tpu.pipeline.engine import JaxEngine
    from retto_tpu.pipeline.stages import ClsStage, DetStage
    from retto_tpu.weights import load_params, load_params_meta

    cfg = SessionConfig()
    det_m = build_det("mobile", compute_dtype="bfloat16")
    cls_params, cls_meta = load_params_meta(WEIGHTS / "cls.npz")
    cls_m = build_cls(cls_meta.get("preset", "mobile"),
                      **cls_meta.get("overrides", {}))
    eng = JaxEngine(det_model=det_m, det_params=load_params(WEIGHTS / "det.npz"),
                    cls_model=cls_m, cls_params=cls_params)
    det_stage = DetStage(cfg.det, cfg.buckets)
    cls_stage = ClsStage(cfg.cls, cfg.buckets, cfg.mode)

    rng = np.random.default_rng(7)
    cats = ["digits", "lower", "title", "caps", "natural"]
    print(f"{'category':<10} {'up-ok':>8} {'rot@0.9':>8}  worst cases")
    for cat in cats:
        txts = texts_for(cat, rng, n)
        crops, keep = [], []
        for t in txts:
            img, _ = render(t)
            ih = ImageHelper(img)
            ih.resize_both(cfg.max_side_len, cfg.min_side_len)
            boxes, _ = det_stage(ih, eng)
            if len(boxes) != 1:
                continue
            crops.append(ih.get_crop_img(PointBox(boxes[0])))
            keep.append(t)
        ups = [ImageHelper(c) for c in crops]
        rots = [ImageHelper(c[::-1, ::-1].copy()) for c in crops]
        lab_up = cls_stage(ups, eng)
        lab_rot = cls_stage(rots, eng)
        up_ok = sum(
            1 for r in lab_up if not (r.label == 180 and r.score >= 0.9))
        rot_ok = sum(1 for r in lab_rot if r.label == 180 and r.score >= 0.9)
        bad = [
            (t, "UP", r.label, round(r.score, 3))
            for t, r in zip(keep, lab_up)
            if r.label == 180 and r.score >= 0.9
        ] + [
            (t, "ROT", r.label, round(r.score, 3))
            for t, r in zip(keep, lab_rot)
            if not (r.label == 180 and r.score >= 0.9)
        ]
        m = len(crops)
        print(f"{cat:<10} {up_ok:>4}/{m:<4} {rot_ok:>4}/{m:<4}  {bad[:6]}")


if __name__ == "__main__":
    main()
