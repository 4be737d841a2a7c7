#!/usr/bin/env python
"""Dev perf harness for DevicePipeline on the real (tunneled) TPU.

Prints per-phase stats (bytes, dispatches, wall splits) for the bench
config-3 shape under both transfer formats.  Not the driver bench —
see bench.py."""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REPO = Path(__file__).parent.parent
WEIGHTS = REPO / "trained_weights"


def main() -> None:
    from retto_tpu.config import SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.pipeline.session import RettoSession
    from retto_tpu.train.synth import render_page

    transfer = sys.argv[1] if len(sys.argv) > 1 else "yuv420"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else None
    chars = CharacterDict(
        (WEIGHTS / "charset.txt").read_text().splitlines()
    )
    cfg = SessionConfig()
    cfg.engine.transfer_format = transfer
    if chunk:
        cfg.buckets.det_chunk = chunk
    session = RettoSession(
        cfg,
        preset="mobile",
        charset=chars,
        weights={k: str(WEIGHTS / f"{k}.npz") for k in ("det", "cls", "rec")},
    )
    dp = session.device_pipeline()
    rng = np.random.default_rng(0)
    pages = [
        render_page(rng, session.chars, h=960, w=704, max_lines=6,
                    lh_range=(24, 48))[0]
        for _ in range(16)
    ]
    print(f"transfer={transfer}", flush=True)
    t = time.perf_counter()
    dp.run_many(pages)
    print(f"warmup1 (compiles): {time.perf_counter()-t:.1f}s", flush=True)
    t = time.perf_counter()
    dp.run_many(pages)
    print(f"warmup2: {time.perf_counter()-t:.1f}s", flush=True)
    rates = []
    for it in range(n_iters):
        t = time.perf_counter()
        out = dp.run_many(pages)
        dt = time.perf_counter() - t
        rates.append(len(out) / dt)
        s = dp.last_stats
        print(
            f"iter{it}: {len(out)/dt:.2f} img/s | up {s['bytes_up']/1e6:.1f}MB "
            f"down {s['bytes_down']/1e6:.2f}MB disp {s['dispatches']} "
            f"chunks {s['chunks']} crops {s['crops']} | "
            f"decode {s['t_decode']*1e3:.0f} upwait {s.get('t_upload_wait',0)*1e3:.0f} "
            f"mask {s['t_mask_fetch']*1e3:.0f} "
            f"contours {s['t_contours']*1e3:.0f} score {s['t_score']*1e3:.0f} "
            f"clsrec {s['t_clsrec_fetch']*1e3:.0f} total {s['t_total']*1e3:.0f} ms",
            flush=True,
        )
    lat = []
    for _ in range(5):
        t = time.perf_counter()
        dp.run(pages[0])
        lat.append(time.perf_counter() - t)
    print(
        f"best {max(rates):.2f} img/s; p50 single {sorted(lat)[2]*1e3:.0f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
