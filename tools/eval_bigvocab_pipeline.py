#!/usr/bin/env python
"""Big-vocab FULL-PIPELINE eval (VERDICT r3 item 6).

The 6,625-class head previously had forward-level evidence only
(bench config 2: bare rec forward on pre-cropped lines).  This runs
det -> cls -> rec END TO END on rendered pseudo-glyph pages — width
buckets, the fused flip selection, CTC merge, reading order — with
``trained_weights/rec_big.npz`` + ``charset_big.txt`` standing in for the
reference's ppocr_keys_v1 dict (rec_processor.rs:29-46) and the standard
det/cls checkpoints.

Reports per-line exact match + det line recall at n lines.

Usage: python tools/eval_bigvocab_pipeline.py [n_lines] [--tpu]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "trained_weights"


def main() -> None:
    if "--tpu" not in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
    n_target = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 64

    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.train.bigvocab import render_big_page

    chars = CharacterDict(
        (WEIGHTS / "charset_big.txt").read_text(encoding="utf-8").splitlines()
    )
    print(f"[big-pipe] {chars.num_classes} classes")
    cfg = SessionConfig()
    session = RettoSession(
        cfg, preset="mobile", charset=chars,
        weights={
            "det": str(WEIGHTS / "det.npz"),
            "cls": str(WEIGHTS / "cls.npz"),
            "rec": str(WEIGHTS / "rec_big.npz"),
        },
    )
    dp = session.device_pipeline()

    rng = np.random.default_rng(0xB16)
    pages, gts = [], []
    n_lines = 0
    while n_lines < n_target:
        img, _, texts = render_big_page(rng, 480, 640, max_lines=4,
                                        lh_range=(36, 56), max_len=8)
        if not texts:
            continue
        pages.append(img)
        gts.append(texts)
        n_lines += len(texts)

    ok = det_ok = total = 0
    pages_all = 0
    misses = []
    for lo in range(0, len(pages), 12):
        out = dp.run_many(pages[lo : lo + 12])
        for res, texts in zip(out, gts[lo:]):
            got = [t.text for t in res.rec_result]
            total += len(texts)
            if len(got) == len(texts):
                det_ok += len(texts)
            # align (an extra/missing det box must not shift every later
            # line — same fix as eval_heldout's multiline alignment)
            import difflib

            sm = difflib.SequenceMatcher(a=texts, b=got, autojunk=False)
            page_ok = sum(bl.size for bl in sm.get_matching_blocks())
            ok += page_ok
            matched = set()
            for bl in sm.get_matching_blocks():
                matched.update(range(bl.a, bl.a + bl.size))
            for i, t in enumerate(texts):
                if i not in matched:
                    near = difflib.get_close_matches(t, got, 1, 0.1)
                    misses.append((t, near[0] if near else ""))
            if page_ok == len(texts) and len(got) == len(texts):
                pages_all += 1
        print(f"[big-pipe] {min(lo + 12, len(pages))}/{len(pages)} pages: "
              f"exact {ok}/{total}", flush=True)

    print(f"[big-pipe] pages: {len(pages)}  lines: {total}")
    print(f"[big-pipe] det boxed-all-lines: {det_ok}/{total}")
    print(f"[big-pipe] rec exact line match: {ok}/{total} ({ok / max(total, 1):.4f})")
    print(f"[big-pipe] pages fully exact: {pages_all}/{len(pages)}")
    for t, g in misses[:12]:
        print(f"  MISS {t!r} -> {g!r}")


if __name__ == "__main__":
    main()
