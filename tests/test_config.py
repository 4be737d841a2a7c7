"""Config defaults must match the reference bit-for-bit (SURVEY.md §5:
"bit-compat requires identical thresholds: 0.3/0.5/1.6/0.9/736/2000/30/batch 6")."""

from retto_tpu.config import (
    ClsConfig,
    DetConfig,
    LimitType,
    PipelineMode,
    RecConfig,
    ScoreMode,
    SessionConfig,
)


def test_det_defaults_match_reference():
    # det_processor.rs:75-93
    d = DetConfig()
    assert d.limit_side_len == 736
    assert d.limit_type == LimitType.MIN
    assert d.mean == (0.5, 0.5, 0.5)
    assert d.std == (0.5, 0.5, 0.5)
    assert d.scale == 1.0 / 255.0
    assert d.thresh == 0.3
    assert d.box_thresh == 0.5
    assert d.max_candidates == 1000
    assert d.unclip_ratio == 1.6
    assert d.use_dilation is True
    assert d.score_mode == ScoreMode.FAST
    assert d.min_mini_box_size == 3
    assert d.dilation_kernel == (2, 2)


def test_cls_defaults_match_reference():
    # cls_processor.rs:27-36
    c = ClsConfig()
    assert c.image_shape == (3, 48, 192)
    assert c.batch_num == 6
    assert c.thresh == 0.9
    assert c.label == (0, 180)


def test_rec_defaults_match_reference():
    # rec_processor.rs:126-135
    r = RecConfig()
    assert r.image_shape == (3, 48, 320)
    assert r.batch_num == 6


def test_session_defaults_match_reference():
    # session.rs:30-39
    s = SessionConfig()
    assert s.max_side_len == 2000
    assert s.min_side_len == 30


def test_config_json_roundtrip():
    s = SessionConfig()
    s.det.thresh = 0.42
    s.mode = PipelineMode.COMPAT
    s2 = SessionConfig.from_json(s.to_json())
    assert s2.det.thresh == 0.42
    assert s2.mode == PipelineMode.COMPAT
    assert s2.det.limit_type == LimitType.MIN
    assert s2.rec.image_shape == (3, 48, 320)
    assert s2.buckets.rec_width_buckets == s.buckets.rec_width_buckets
