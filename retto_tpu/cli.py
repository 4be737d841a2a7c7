"""Command-line front end.

Mirror of the reference CLI (/root/reference/retto-cli/src/main.rs): walk a
directory of images, run the three-stage session on each, report average
latency — plus what the reference left as TODO (main.rs:88: results are
never emitted): JSON output, per-stage timing, throughput, and the fused
device pipeline.

Usage:
    retto ocr IMAGES_DIR [--weights-dir trained_weights] [--json-out out.jsonl]
    retto info
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import argparse
import json
import logging
import sys
import time
from pathlib import Path

__all__ = ["main"]

IMAGE_EXTS = {".png", ".jpg", ".jpeg", ".bmp", ".webp", ".gif", ".tiff"}


def _apply_device_flags(args) -> None:
    """--device / --device-id (reference CLI surface, main.rs:18-39:
    clap flags choosing the execution provider + ordinal).  Here they pick
    the JAX platform and the default device ordinal."""
    device = getattr(args, "device", "auto")
    if device == "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError as e:  # backend already initialized
            print(f"warning: cannot switch device to {device}: {e}",
                  file=sys.stderr)
    # "tpu"/"auto" keep the default platform resolution: the accelerator
    # platform name varies by runtime (e.g. 'tpu' vs this environment's
    # tunneled 'axon'), and jax picks the accelerator first by default
    device_id = getattr(args, "device_id", 0)
    if device_id:
        import jax

        devs = jax.devices()
        if device_id >= len(devs):
            print(
                f"error: device-id {device_id} out of range "
                f"({len(devs)} devices)",
                file=sys.stderr,
            )
            raise SystemExit(1)
        jax.config.update("jax_default_device", devs[device_id])


def _build_session(args):
    from .config import PipelineMode, SessionConfig
    from .ops.charset import CharacterDict
    from .pipeline.session import RettoSession

    _apply_device_flags(args)
    cfg = SessionConfig()
    if getattr(args, "transfer", None):
        cfg.engine.transfer_format = args.transfer
    if getattr(args, "hf_hub", False):
        # reference CLI's use_hf_hub (main.rs:46-66): pull the PP-OCRv4
        # artifact set and run the reference's own models
        from .weights.hub import load_ppocr_onnx_engine

        cfg.mode = PipelineMode(args.mode)
        engine, chars = load_ppocr_onnx_engine()
        return RettoSession(cfg, engine=engine, charset=chars)
    cfg.mode = PipelineMode(args.mode)
    if args.limit_side_len:
        cfg.det.limit_side_len = args.limit_side_len
    if args.no_cls:
        cfg.use_cls = False
    charset = None
    weights = None
    wd = Path(args.weights_dir) if args.weights_dir else None
    if wd and (wd / "rec.npz").exists():
        weights = {k: str(wd / f"{k}.npz") for k in ("det", "cls", "rec")}
        cs = wd / "charset.txt"
        if cs.exists():
            charset = CharacterDict(cs.read_text(encoding="utf-8").splitlines())
    if args.charset:
        charset = CharacterDict.from_file(args.charset)
    return RettoSession(cfg, preset=args.preset, charset=charset, weights=weights)


def cmd_ocr(args) -> int:
    from .errors import RettoError
    from .utils import StageTimers

    root = Path(args.images)
    if root.is_file():
        files = [root]
    else:
        files = sorted(
            p for p in root.rglob("*") if p.suffix.lower() in IMAGE_EXTS
        )
    if not files:
        print(f"no images found under {root}", file=sys.stderr)
        return 1
    print(f"Found {len(files)} files, processing...", file=sys.stderr)

    try:
        session = _build_session(args)
    except RettoError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    runner = session.device_pipeline() if args.device_pipeline else session

    out_f = open(args.json_out, "w", encoding="utf-8") if args.json_out else None
    timers = StageTimers()
    n_ok = 0
    t0 = time.perf_counter()

    def emit(f: Path, res) -> None:
        line = {
            "file": str(f),
            "texts": [
                {"text": t.text, "score": round(t.score, 4)}
                for t in res.rec_result
            ],
        }
        if args.full:
            line["result"] = res.to_dict()
        if out_f:
            out_f.write(json.dumps(line, ensure_ascii=False) + "\n")
        else:
            texts = " | ".join(t.text for t in res.rec_result)
            print(f"{f.name}: {texts}")

    if args.device_pipeline:
        # stream file batches through the fused pipeline: batch i+1's
        # decode/uploads overlap batch i's postprocess tail, so CLI
        # throughput matches the bench's streaming config
        bs = max(1, args.batch)
        groups = [files[s : s + bs] for s in range(0, len(files), bs)]

        def run_group(group: list[Path]):
            try:
                return runner.run_many([f.read_bytes() for f in group])
            except RettoError:
                # isolate: retry one-by-one so a bad image skips itself
                results = []
                for f in group:
                    try:
                        results.append(runner.run(f.read_bytes()))
                    except RettoError as e1:
                        print(f"{f}: ERROR {e1}", file=sys.stderr)
                        results.append(None)
                return results

        emitted: set[Path] = set()
        try:
            with timers.time("stream"):
                for group, results in zip(
                    groups,
                    runner.stream([[f.read_bytes() for f in g] for g in groups]),
                ):
                    for f, res in zip(group, results):
                        emitted.add(f)
                        if isinstance(res, RettoError):
                            # per-image isolation inside the fused path:
                            # the bad image fills its slot with the error
                            print(f"{f}: ERROR {res}", file=sys.stderr)
                            continue
                        emit(f, res)
                        n_ok += 1
        except RettoError:
            # a poisoned batch kills the stream; finish the rest with
            # isolated per-group processing
            for group in groups:
                rest = [f for f in group if f not in emitted]
                if not rest:
                    continue
                for f, res in zip(rest, run_group(rest)):
                    if res is None:
                        continue
                    emit(f, res)
                    n_ok += 1
    else:
        for f in files:
            try:
                with timers.time("image"):
                    res = session_run(runner, f.read_bytes())
                n_ok += 1
            except RettoError as e:
                print(f"{f}: ERROR {e}", file=sys.stderr)
                continue
            emit(f, res)
    dt = time.perf_counter() - t0
    if out_f:
        out_f.close()
    avg = dt / max(n_ok, 1)
    print(
        f"Successfully processed {n_ok} images, avg time: {avg*1000:.1f} ms "
        f"({n_ok/dt:.2f} images/sec)",
        file=sys.stderr,
    )
    return 0


def session_run(runner, data: bytes):
    return runner.run(data)


def cmd_serve(args) -> int:
    from .serve import serve

    session = _build_session(args)
    serve(
        session,
        args.host,
        args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
    )
    return 0


def cmd_info(args) -> int:
    import jax

    from . import __version__

    print(f"retto-tpu {__version__}")
    print(f"jax {jax.__version__}; devices: {jax.devices()}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="retto", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    ocr = sub.add_parser("ocr", help="run OCR over a file or directory")
    ocr.add_argument("images", help="image file or directory")
    ocr.add_argument("--weights-dir", default="trained_weights")
    ocr.add_argument("--charset", default=None, help="character dict file")
    ocr.add_argument("--preset", default="mobile",
                     choices=["tiny", "mobile", "server"])
    ocr.add_argument("--mode", default="performance",
                     choices=["compat", "performance"])
    ocr.add_argument("--device-pipeline", action="store_true",
                     help="use the fused device-resident fast path")
    ocr.add_argument("--batch", type=int, default=16,
                     help="files per run_many batch (with --device-pipeline)")
    ocr.add_argument("--device", default="auto",
                     choices=["auto", "tpu", "cpu"],
                     help="execution platform (reference: --device)")
    ocr.add_argument("--device-id", type=int, default=0,
                     help="device ordinal (reference: --device-id)")
    ocr.add_argument("--transfer", default=None,
                     choices=["rgb", "yuv420"],
                     help="host->device image transfer format")
    ocr.add_argument("--hf-hub", action="store_true",
                     help="fetch + run the reference's PP-OCRv4 ONNX "
                          "artifacts (reference: use_hf_hub; needs network)")
    ocr.add_argument("--json-out", default=None, help="write JSONL results")
    ocr.add_argument("--full", action="store_true",
                     help="include boxes/labels in JSON output")
    ocr.add_argument("--limit-side-len", type=int, default=None)
    ocr.add_argument("--no-cls", action="store_true")
    ocr.add_argument("-v", "--verbose", action="store_true")
    ocr.set_defaults(fn=cmd_ocr)

    info = sub.add_parser("info", help="show version and devices")
    info.set_defaults(fn=cmd_info)

    srv = sub.add_parser("serve", help="HTTP OCR server (NDJSON streaming)")
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8471)
    srv.add_argument("--max-batch", type=int, default=16,
                     help="micro-batch size for concurrent /ocr requests")
    srv.add_argument("--max-wait-ms", type=float, default=5.0,
                     help="micro-batch gather window")
    srv.add_argument("--device", default="auto",
                     choices=["auto", "tpu", "cpu"])
    srv.add_argument("--device-id", type=int, default=0)
    srv.add_argument("--transfer", default=None,
                     choices=["rgb", "yuv420"])
    srv.add_argument("--weights-dir", default="trained_weights")
    srv.add_argument("--charset", default=None)
    srv.add_argument("--preset", default="mobile",
                     choices=["tiny", "mobile", "server"])
    srv.add_argument("--mode", default="performance",
                     choices=["compat", "performance"])
    srv.add_argument("--limit-side-len", type=int, default=None)
    srv.add_argument("--no-cls", action="store_true")
    srv.set_defaults(fn=cmd_serve)

    args = ap.parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if getattr(args, "verbose", False) else logging.INFO
    )
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
