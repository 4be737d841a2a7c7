#!/usr/bin/env python
"""Fetch the reference's PP-OCRv4 ONNX artifacts and smoke-test them on TPU.

The network-enabled path to exact reference parity: downloads the same four
files the reference's build script pins (build.rs:7-12, repo
pk5ls20/PaddleModel), loads them through the pure-Python ONNX bridge, and
runs one forward per model.

Usage:  python tools/fetch_ppocr.py [dest_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    dest = sys.argv[1] if len(sys.argv) > 1 else "ppocr_v4"
    from retto_tpu.errors import ModelNotFoundError
    from retto_tpu.weights.hub import fetch_ppocr_v4

    try:
        paths = fetch_ppocr_v4(dest)
    except ModelNotFoundError as e:
        print(f"fetch failed (offline environment?): {e}", file=sys.stderr)
        return 1
    print("fetched:", {k: str(v) for k, v in paths.items()})

    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.pipeline.onnx_engine import OnnxEngine

    # op histogram per graph: the PARITY.md op-coverage audit's checklist —
    # confirms the bridge registry covers every op the real exports use
    from collections import Counter

    from retto_tpu.weights.onnx_bridge import _Ops
    from retto_tpu.weights.onnx_proto import parse_model

    for fam in ("det", "cls", "rec"):
        model = parse_model(Path(paths[fam]).read_bytes())
        hist = Counter(n.op_type for n in model.graph.nodes)
        missing = sorted(set(hist) - set(_Ops.registry))
        print(f"{fam} ops: {dict(sorted(hist.items()))}")
        if missing:
            print(f"  !! NOT IN BRIDGE REGISTRY: {missing}")
        else:
            print("  all ops covered by the bridge registry")

    engine = OnnxEngine(det=paths["det"], cls=paths["cls"], rec=paths["rec"])
    chars = CharacterDict.from_file(paths["keys"])
    print(f"charset: {chars.num_classes} classes")
    det_out = engine.det(np.zeros((1, 3, 64, 64), np.float32))
    cls_out = engine.cls(np.zeros((1, 3, 48, 192), np.float32))
    rec_out = engine.rec(np.zeros((1, 3, 48, 320), np.float32))
    print("det:", det_out.shape, "cls:", cls_out.shape, "rec:", rec_out.shape)
    print("OK — use RettoSession(engine=OnnxEngine(...), charset=chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
