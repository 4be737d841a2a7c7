#!/usr/bin/env python
"""Full-scale ONNX rehearsal (VERDICT r3 item 8).

Generates the full-size Paddle-export replica graphs
(retto_tpu.weights.replica — real backbone depths/channel plans, the
6,625-class rec head, actual-artifact blob sizes), loads them through
OnnxEngine exactly like the real ``ch_PP-OCRv4_*`` files would be
(ort_worker.rs:120-135), and drives:

1. the COMPAT staged session (session.run) over the parity corpus,
2. the fused DevicePipeline (run_many) over the same corpus,
3. timing for both.

With this, the first networked run of the actual artifacts exercises no
new code: same codec, same translator, same engine, same fusion, at the
same graph scale.

Usage: python tools/replica_rehearsal.py [--tpu]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

def main() -> None:
    if "--tpu" not in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from parity import CORPUS, render_case

    from retto_tpu import RettoSession, SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.pipeline.onnx_engine import OnnxEngine
    from retto_tpu.train.bigvocab import big_charset
    from retto_tpu.weights.replica import (
        build_cls_replica,
        build_det_replica,
        build_rec_replica,
    )

    t0 = time.perf_counter()
    det_blob = build_det_replica()
    cls_blob = build_cls_replica()
    rec_blob = build_rec_replica()
    print(f"replica blobs: det {len(det_blob)/1e6:.2f} MB, "
          f"cls {len(cls_blob)/1e6:.2f} MB, rec {len(rec_blob)/1e6:.2f} MB "
          f"(real artifacts: 4.7 / 0.58 / 10.8 MB) "
          f"[{time.perf_counter()-t0:.1f}s]", flush=True)

    t0 = time.perf_counter()
    engine = OnnxEngine(det=det_blob, cls=cls_blob, rec=rec_blob)
    print(f"OnnxEngine built (translate + device_put): "
          f"{time.perf_counter()-t0:.1f}s", flush=True)

    chars = CharacterDict(big_charset())  # 6,625 classes like the dict
    cfg = SessionConfig()
    session = RettoSession(cfg, engine=engine, charset=chars)
    images = [render_case(spec) for spec in CORPUS]

    # 1. COMPAT staged path (the reference's own execution shape)
    t0 = time.perf_counter()
    results = session.run_many(images)
    dt1 = time.perf_counter() - t0
    n_boxes = sum(len(r.det_result) for r in results)
    n_texts = sum(len(r.rec_result.texts) for r in results)
    print(f"staged session: {len(images)} corpus images in {dt1:.1f}s "
          f"({n_boxes} boxes, {n_texts} texts)", flush=True)
    assert n_boxes > 0, "replica det produced no boxes on the corpus"

    # 2. fused DevicePipeline over the bridge-backed models
    dp = session.device_pipeline()
    t0 = time.perf_counter()
    out = dp.run_many(images)
    dt_warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = dp.run_many(images)
    dt2 = time.perf_counter() - t0
    n_boxes2 = sum(len(r.det_result) for r in out)
    print(f"fused DevicePipeline: warm {dt_warm:.1f}s, "
          f"steady {dt2:.2f}s ({len(images)/dt2:.2f} img/s, "
          f"{n_boxes2} boxes)", flush=True)
    assert n_boxes2 > 0
    # box-count agreement between the two paths (loose: the fused path's
    # pooled scoring is a documented PERFORMANCE approximation)
    for i, (a, b) in enumerate(zip(results, out)):
        da, db = len(a.det_result), len(b.det_result)
        if abs(da - db) > max(2, 0.4 * max(da, db)):
            print(f"  WARN case {i}: staged {da} boxes vs fused {db}")
    print("replica rehearsal OK")


if __name__ == "__main__":
    main()
