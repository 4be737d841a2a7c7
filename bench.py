#!/usr/bin/env python
"""Benchmark entry point (driver-run on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric: end-to-end OCR throughput (det+cls+rec) in document
images/sec/chip when trained weights are present in ``trained_weights/``;
otherwise falls back to the recognition-only throughput (BASELINE.json
config 2) with the mobile SVTR model, since untrained det weights produce
no stable box workload to measure.

vs_baseline is measured against the BASELINE.json north star of 1000 full
document images/sec/chip; the rec-only fallback uses 10 crops/document as
the conversion (a typical document page yields ~10 text lines).
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import numpy as np

NORTH_STAR_IMGS_PER_SEC = 1000.0
CROPS_PER_DOC = 10.0


def bench_rec_only() -> dict:
    import jax
    import jax.numpy as jnp

    from retto_tpu.models import build_rec
    from retto_tpu.ops.ctc import ctc_greedy_decode

    model = build_rec("mobile", num_classes=6625, compute_dtype="bfloat16")
    batch, w = 64, 320
    x = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, 3, 48, w))
        .astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    from retto_tpu.utils import time_fn

    @jax.jit
    def forward_decode(params, x):
        probs = model.apply(params, x)
        return ctc_greedy_decode(probs)

    # NOTE: block_until_ready is unreliable over the axon tunnel; time_fn
    # syncs via host fetch and amortizes the round trip over the chain.
    per_iter, _ = time_fn(forward_decode, params, x, iters=100, warmup=3)
    crops_per_sec = batch / per_iter
    return {
        "metric": "rec crops/sec/chip (SVTR mobile 48x320 + CTC decode)",
        "value": round(crops_per_sec, 1),
        "unit": "crops/sec",
        "vs_baseline": round(
            crops_per_sec / (NORTH_STAR_IMGS_PER_SEC * CROPS_PER_DOC), 4
        ),
    }


def bench_full_pipeline(weights_dir: Path) -> dict:
    from retto_tpu.config import SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.pipeline.session import RettoSession
    from retto_tpu.train.synth import render_page

    charset_file = weights_dir / "charset.txt"
    chars = CharacterDict(
        [ln for ln in charset_file.read_text().splitlines()]
    ) if charset_file.exists() else None
    cfg = SessionConfig()
    session = RettoSession(
        cfg,
        preset="mobile",
        charset=chars,
        weights={
            "det": str(weights_dir / "det.npz"),
            "cls": str(weights_dir / "cls.npz"),
            "rec": str(weights_dir / "rec.npz"),
        },
    )
    dp = session.device_pipeline()
    rng = np.random.default_rng(0)
    pages = [
        render_page(rng, session.chars, h=960, w=704, max_lines=6,
                    lh_range=(24, 48))[0]
        for _ in range(16)
    ]
    # warmup with the FULL page set: the timed runs must hit the same
    # (det bucket x batch, cls/rec batch, rec width) jit cache entries
    dp.run_many(pages)
    dp.run_many(pages)
    iters = 3
    t0 = time.perf_counter()
    total = 0
    for _ in range(iters):
        out = dp.run_many(pages)
        total += len(out)
    dt = time.perf_counter() - t0
    imgs_per_sec = total / dt
    # single-image latency (includes one tunnel round trip per phase)
    lat = []
    for _ in range(5):
        t1 = time.perf_counter()
        dp.run(pages[0])
        lat.append(time.perf_counter() - t1)
    return {
        "metric": "end-to-end OCR images/sec/chip (det+cls+rec, mobile, fused device pipeline)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / NORTH_STAR_IMGS_PER_SEC, 4),
        "p50_latency_ms": round(sorted(lat)[len(lat) // 2] * 1000, 1),
    }


def main() -> None:
    weights_dir = Path(__file__).parent / "trained_weights"
    if (weights_dir / "rec.npz").exists() and (weights_dir / "det.npz").exists():
        result = bench_full_pipeline(weights_dir)
    else:
        result = bench_rec_only()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
