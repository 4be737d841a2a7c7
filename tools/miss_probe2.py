#!/usr/bin/env python
"""Deep-dive one rec miss: dump the det box, the warped crop (PNG), and
the per-timestep CTC argmax string so the failure can be attributed to
crop geometry vs glyph confusion.

Usage: python tools/miss_probe2.py 'how' 'TEXT'
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "trained_weights"
sys.path.insert(0, str(REPO / "tools"))
from eval_accuracy import render


def main() -> None:
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.geometry import PointBox
    from retto_tpu.image.io import ImageHelper
    from retto_tpu.ops.charset import CharacterDict

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    session = RettoSession(
        SessionConfig(), preset="mobile", charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    for text in sys.argv[1:]:
        img, bbox = render(text)
        resized = ImageHelper(img)
        resized.resize_both(session.config.max_side_len,
                            session.config.min_side_len)
        boxes, _ = session._det(resized, session.engine)
        print(f"=== {text!r}: {len(boxes)} boxes, true bbox={bbox}")
        for b in boxes:
            crop = resized.get_crop_img(PointBox(b))
            h, w = crop.shape[:2]
            from PIL import Image

            out = Path(f"/tmp/crop_{text.replace(' ', '_')}.png")
            Image.fromarray(crop).save(out)
            print(f"    box={np.asarray(b).tolist()} crop {w}x{h} -> {out}")
            # run rec directly, print per-timestep argmax
            ch = ImageHelper(crop)
            _, ih, iw = session.config.rec.image_shape
            natural = int(np.ceil(ih * w / h))
            for bw in (max(natural, iw),):
                batch = ch.resize_norm_image((3, ih, bw), None)[None]
                probs = np.asarray(session.engine.rec(batch))[0]
                am = probs.argmax(-1)
                mx = probs.max(-1)
                toks = []
                for t in range(len(am)):
                    c = "_" if am[t] == 0 else chars.chars[am[t]]
                    toks.append(f"{c}({mx[t]:.2f})" if am[t] != 0 else "_")
                print(f"    T={len(am)} w={bw}: {' '.join(toks)}")


if __name__ == "__main__":
    main()
