"""Metrics/observability tests."""

import numpy as np

from retto_tpu.config import SessionConfig
from retto_tpu.ops.charset import CharacterDict
from retto_tpu.pipeline.engine import FakeEngine
from retto_tpu.pipeline.session import RettoSession
from retto_tpu.utils.metrics import PipelineMetrics


def test_session_collects_metrics():
    chars = CharacterDict(["a", "b", "c"])
    s = RettoSession(
        SessionConfig(),
        engine=FakeEngine(rec_classes=chars.num_classes),
        charset=chars,
    )
    img = np.zeros((256, 320, 3), np.uint8)
    img[60:90, 40:240] = 255
    s.run(img)
    s.run(img)
    m = s.metrics.summary()
    assert m["images"] == 2
    assert m["crops"] == 2
    assert m["latency_ms"]["p50"] > 0
    assert set(m["stage_time_s"]) >= {"det", "cls", "rec"}
    # one crop padded into a bucket of >= 8 -> occupancy < 1
    assert any(v <= 0.5 for v in m["bucket_occupancy"].values())


def test_metrics_empty_summary():
    m = PipelineMetrics().summary()
    assert m["images"] == 0
    assert m["images_per_sec"] == 0.0
