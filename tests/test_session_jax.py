"""Full-pipeline smoke test with REAL jitted models (tiny preset, random
weights): exercises engine construction, bucketing, and all device paths.
Slow (compiles several graphs); marked accordingly."""

import io

import numpy as np
import pytest
from PIL import Image

from retto_tpu.config import BucketConfig, SessionConfig
from retto_tpu.pipeline.session import RettoSession


@pytest.fixture(scope="module")
def session():
    cfg = SessionConfig()
    cfg.det.limit_side_len = 192  # keep det input small on CPU
    cfg.buckets = BucketConfig(det_pad_to=64, det_max_side=512)
    cfg.engine.compute_dtype = "float32"
    return RettoSession(cfg, preset="tiny")


def _png(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_random_weight_pipeline_runs(session):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (200, 260, 3), dtype=np.uint8)
    res = session.run(_png(arr))
    # random weights: results arbitrary but structurally valid
    assert len(res.cls_result) == len(res.det_result)
    assert len(res.rec_result) == len(res.det_result)
    for t in res.rec_result:
        assert isinstance(t.text, str)


def test_jit_cache_stays_bounded(session):
    rng = np.random.default_rng(1)
    for shape in [(150, 200), (190, 250), (200, 260)]:
        arr = rng.integers(0, 255, (*shape, 3), dtype=np.uint8)
        session.run(_png(arr))
    sizes = session.engine.compiled_shapes()
    # bucketing must keep the det jit cache small despite 3 input sizes
    assert sizes["det"] <= 2
