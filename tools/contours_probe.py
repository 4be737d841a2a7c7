#!/usr/bin/env python
"""t_contours regression probe (r4: 27.5 -> 86.7 ms/16 pages vs r3).

Runs the fused det forward on the 16 bench config-3 pages, fetches the
stride-s bitmask + pooled prob map, then times the C++ chunk postprocess
(`det_chunk_native`) in isolation and prints per-page candidate counts —
attributing the host contour cost to mask content (speckle candidates,
fatter bands) vs code path.

Usage: python tools/contours_probe.py [--cpu]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REPO = Path(__file__).resolve().parent.parent
WEIGHTS = REPO / "trained_weights"


def main() -> None:
    if "--cpu" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.train.synth import render_page

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig()
    session = RettoSession(
        cfg, preset="mobile", charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    dp = session.device_pipeline()
    rng = np.random.default_rng(0)
    pages = [
        render_page(rng, chars, h=960, w=704, max_lines=5,
                    lh_range=(24, 48))[0]
        for _ in range(16)
    ]
    # warm + capture masks by running the pipeline once
    dp.run_many(pages)
    print("pipeline warm:", {k: round(v, 4) for k, v in dp.last_stats.items()
                             if k.startswith("t_")})

    # isolate: replay _prepare -> upload/det -> fetch, then time the C++
    state = dp._prepare(pages)
    from retto_tpu.native import det_chunk_native

    s = dp._det_stride
    total_cpp = 0.0
    total_boxes = 0
    for ch in state["chunks"]:
        fetch_fut, rgb, vs, _up = ch.upload_fut.result()
        packed_np, prob_np = fetch_fut.result()
        imgs = state["imgs"]
        nb = len(ch.idxs)
        row_packed = packed_np.shape[1] != ch.key[2] // s
        # mask content stats
        on_bits = int(np.unpackbits(packed_np[:nb]).sum())
        t = time.perf_counter()
        outs = det_chunk_native(
            packed_np[:nb], row_packed, prob_np[:nb],
            [(imgs[i].rh // s, imgs[i].rw // s) for i in ch.idxs], s,
            [(imgs[i].rh, imgs[i].rw) for i in ch.idxs],
            [(imgs[i].ah, imgs[i].aw) for i in ch.idxs],
            max(1, cfg.det.min_mini_box_size // s),
            cfg.det.max_candidates, cfg.det.box_thresh,
            cfg.det.unclip_ratio, cfg.det.min_mini_box_size,
        )
        dt = time.perf_counter() - t
        total_cpp += dt
        nboxes = [len(b) for b, _ in outs] if outs is not None else []
        total_boxes += sum(nboxes)
        print(f"chunk n={nb} key={ch.key}: cpp {dt*1e3:.1f} ms, "
              f"mask_on_bits {on_bits}, boxes {nboxes}")
    print(f"TOTAL C++ postprocess: {total_cpp*1e3:.1f} ms / "
          f"{len(pages)} pages, {total_boxes} boxes")


if __name__ == "__main__":
    main()
