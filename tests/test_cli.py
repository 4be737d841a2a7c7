"""CLI tests (subprocess, tiny preset, random weights)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
ENV_SNIPPET = (
    "import jax; jax.config.update('jax_platforms','cpu');"
)


def run_cli(args, **kw):
    return subprocess.run(
        [sys.executable, "-c",
         f"{ENV_SNIPPET}import sys; sys.path.insert(0, {str(REPO)!r}); "
         f"from retto_tpu.cli import main; sys.exit(main({args!r}))"],
        capture_output=True, text=True, timeout=600, **kw,
    )


def test_help():
    r = run_cli(["--help"])
    # argparse exits 0 on --help
    assert r.returncode == 0
    assert "ocr" in r.stdout


def test_info():
    r = run_cli(["info"])
    assert r.returncode == 0
    assert "retto-tpu" in r.stdout


def test_ocr_empty_dir(tmp_path):
    r = run_cli(["ocr", str(tmp_path)])
    assert r.returncode == 1
    assert "no images" in r.stderr


@pytest.mark.slow
def test_ocr_runs_on_image(tmp_path):
    img = np.random.default_rng(0).integers(0, 255, (96, 128, 3), dtype=np.uint8)
    Image.fromarray(img).save(tmp_path / "a.png")
    out = tmp_path / "out.jsonl"
    r = run_cli([
        "ocr", str(tmp_path), "--preset", "tiny", "--weights-dir", "/nonexistent",
        "--limit-side-len", "96", "--json-out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    assert "processed 1 images" in r.stderr
    lines = out.read_text().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["file"].endswith("a.png")
    assert isinstance(rec["texts"], list)


@pytest.mark.slow
def test_ocr_device_pipeline_streams_batches(tmp_path):
    """--device-pipeline streams file batches through run_many; a corrupt
    file must not kill the run (isolated fallback)."""
    rng = np.random.default_rng(1)
    for i in range(3):
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"{i}.png")
    (tmp_path / "bad.png").write_bytes(b"not a png at all")
    out = tmp_path / "out.jsonl"
    r = run_cli([
        "ocr", str(tmp_path), "--preset", "tiny", "--weights-dir", "/nonexistent",
        "--limit-side-len", "96", "--device-pipeline", "--batch", "2",
        "--json-out", str(out),
    ])
    assert r.returncode == 0, r.stderr
    assert "processed 3 images" in r.stderr, r.stderr
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 3
    assert not any(l["file"].endswith("bad.png") for l in lines)


def test_ocr_hf_hub_offline_error(tmp_path):
    """--hf-hub (reference use_hf_hub flag) degrades to a clean error in
    offline environments instead of a traceback."""
    img = np.zeros((64, 64, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "a.png")
    r = run_cli(["ocr", str(tmp_path), "--hf-hub"])
    assert r.returncode == 1
    assert "error:" in r.stderr
    assert "Traceback" not in r.stderr
