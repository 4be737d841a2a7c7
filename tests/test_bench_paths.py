"""CPU smoke tests for bench.py's measurement plumbing.

bench.py's config4 server-e2e path historically only executed AFTER the
server checkpoints finished training on the real chip — a failure at that
point wastes the whole training ladder (VERDICT r4 item 6 landed it for
real in r5; this test keeps the plumbing proven on every CPU test run).
The checkpoints here are tiny self-described arches saved under the
server-checkpoint filenames: session.py builds models from checkpoint
meta, so the bench body runs end-to-end without server-sized compiles.
"""

from __future__ import annotations

import sys
from pathlib import Path

import jax.numpy as jnp
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

from retto_tpu.models import MODEL_PRESETS, build_cls, build_det, build_rec  # noqa: E402
from retto_tpu.ops.charset import CharacterDict  # noqa: E402
from retto_tpu.weights import init_random_params, save_params  # noqa: E402


@pytest.fixture(scope="module")
def tiny_server_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_server_weights")
    lines = [chr(c) for c in range(33, 127)]
    (d / "charset.txt").write_text("\n".join(lines))
    n_cls = CharacterDict(lines).num_classes
    tiny = MODEL_PRESETS["tiny"]
    det = build_det("tiny", compute_dtype=None)
    cls = build_cls("tiny", compute_dtype=None)
    rec = build_rec("tiny", num_classes=n_cls, compute_dtype=None)
    save_params(
        d / "det_server.npz",
        init_random_params(det, jnp.zeros((1, 3, 64, 64))),
        meta={"preset": "tiny", "overrides": tiny["det"]},
    )
    save_params(
        d / "cls.npz",
        init_random_params(cls, jnp.zeros((1, 3, 48, 192))),
        meta={"preset": "tiny", "overrides": tiny["cls"]},
    )
    save_params(
        d / "rec_server.npz",
        init_random_params(rec, jnp.zeros((1, 3, 48, 64))),
        meta={"preset": "tiny",
              "overrides": dict(tiny["rec"], num_classes=n_cls)},
    )
    return d


def test_server_e2e_plumbing(tiny_server_dir):
    out = bench.bench_server_e2e(
        tiny_server_dir, n_pages=2, page_hw=(256, 192), iters=1
    )
    assert "config4_error" not in out, out
    assert out["config4_server_imgs_per_sec"] > 0
    assert out["config4_server_imgs_per_sec_median"] > 0
    assert out["config4_server_p50_ms"] > 0


def test_server_e2e_skips_without_checkpoints(tmp_path):
    (tmp_path / "charset.txt").write_text("a\nb")
    out = bench.bench_server_e2e(tmp_path, n_pages=1, page_hw=(64, 64),
                                 iters=1)
    assert "config4_error" in out
