#!/usr/bin/env python
"""Config-5 streaming regression probe (VERDICT r3 item 4).

Replicates bench.bench_streaming exactly (mixed page sizes, batches of
12, dp.stream) and prints PER-BATCH phase stats plus a back-to-back
run_many comparison, so the stream-vs-batch gap is attributable:
upload_wait (wire idle), mask_fetch (RTT), decode (GIL contention with
the prep thread), contours, clsrec fetch, bucket occupancy.

Usage: python tools/stream_probe.py [--reps 3]
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.train.synth import render_page

    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig()
    cfg.engine.transfer_format = "yuv420"
    session = RettoSession(
        cfg, preset="mobile", charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    dp = session.device_pipeline()
    rng = np.random.default_rng(1)
    sizes = [(960, 704), (640, 512), (960, 704), (768, 576)]
    pages = [
        render_page(rng, session.chars, h=h, w=w, max_lines=5,
                    lh_range=(24, 48))[0]
        for _ in range(6)
        for (h, w) in sizes
    ]
    batches = [pages[:12], pages[12:]]
    for b in batches:
        dp.run_many(b)
        dp.run_many(b)

    keys = ("t_decode", "t_upload_wait", "t_mask_fetch", "t_contours",
            "t_score", "t_clsrec_fetch", "t_total")

    # back-to-back run_many
    t0 = time.perf_counter()
    per = []
    for _ in range(args.reps):
        for b in batches:
            dp.run_many(b)
            per.append(dict(dp.last_stats))
    dt_batch = time.perf_counter() - t0
    n_imgs = args.reps * 24
    print(f"run_many back-to-back: {n_imgs / dt_batch:.2f} img/s")
    agg = {k: sum(p[k] for p in per) for k in keys}
    agg["dispatches"] = sum(p["dispatches"] for p in per)
    agg["chunks"] = sum(p["chunks"] for p in per)
    print("  " + "  ".join(f"{k[2:]}={v:.3f}" if isinstance(v, float)
                           else f"{k}={v}" for k, v in agg.items()))

    # streamed
    stream_in = [b for _ in range(args.reps) for b in batches]
    t0 = time.perf_counter()
    per_s = []
    for _ in dp.stream(stream_in):
        per_s.append(dict(dp.last_stats))
    dt_stream = time.perf_counter() - t0
    print(f"dp.stream:            {n_imgs / dt_stream:.2f} img/s")
    for i, p in enumerate(per_s):
        print(f"  batch {i}: " + "  ".join(
            f"{k[2:]}={p[k]:.3f}" for k in keys))
    occ = dp.metrics.summary()["bucket_occupancy"]
    print(f"occupancy: {occ}")


if __name__ == "__main__":
    main()
