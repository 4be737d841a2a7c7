"""COMPAT-mode batching must reproduce the reference's observable tensor
shapes: descending-ratio chunks of batch_num and the carried-over
max_wh_ratio width rule (cls_processor.rs:137-139, rec_processor.rs:224-247)."""

import numpy as np

from retto_tpu.config import BucketConfig, PipelineMode, RecConfig, ClsConfig
from retto_tpu.image.io import ImageHelper
from retto_tpu.ops.charset import CharacterDict
from retto_tpu.pipeline.engine import FakeEngine
from retto_tpu.pipeline.stages import ClsStage, RecStage

CHARS = CharacterDict(["a", "b", "c"])


def crops_with_ratios(ratios, h=40):
    out = []
    for r in ratios:
        w = max(int(h * r), 2)
        out.append(ImageHelper(np.zeros((h, w, 3), np.uint8)))
    return out


def test_rec_compat_width_is_carried_max_ratio():
    # rec_processor.rs:227 sorts by Reverse(h/w) == ASCENDING width ratio;
    # the width accumulator (:237-247) never shrinks, so each chunk uses
    # the max ratio seen SO FAR: narrow chunks first, widest chunk last.
    cfg = RecConfig(batch_num=2)
    stage = RecStage(cfg, BucketConfig(), PipelineMode.COMPAT, CHARS)
    eng = FakeEngine(rec_classes=CHARS.num_classes)
    crops = crops_with_ratios([12.0, 3.0, 2.0, 8.0])
    stage(crops, eng)
    rec_calls = [c for c in eng.calls if c[0] == "rec"]
    assert len(rec_calls) == 2
    # chunk 1 = ratios [2, 3] -> width floor 320; chunk 2 = [8, 12] -> 576
    assert rec_calls[0][1] == (2, 3, 48, 320)
    assert rec_calls[1][1] == (2, 3, 48, 48 * 12)


def test_rec_compat_min_width_is_image_shape():
    # narrow crops still use the base 320 width (ratio floor 320/48)
    cfg = RecConfig(batch_num=6)
    stage = RecStage(cfg, BucketConfig(), PipelineMode.COMPAT, CHARS)
    eng = FakeEngine(rec_classes=CHARS.num_classes)
    stage(crops_with_ratios([2.0, 1.5]), eng)
    _, shape = [c for c in eng.calls if c[0] == "rec"][0]
    assert shape[3] == 320


def test_cls_compat_chunking_and_shape():
    # symmetrize off: this test pins the reference's chunk semantics
    # (one forward per chunk of batch_num, cls_processor.rs:137-139)
    cfg = ClsConfig(batch_num=3, symmetrize=False)
    stage = ClsStage(cfg, BucketConfig(), PipelineMode.COMPAT)
    eng = FakeEngine(rec_classes=CHARS.num_classes)
    crops = crops_with_ratios([5, 4, 3, 2])
    labels = stage(crops, eng)
    cls_calls = [c for c in eng.calls if c[0] == "cls"]
    assert [c[1][0] for c in cls_calls] == [3, 1]
    # cls input is always the fixed (3, 48, 192) shape
    assert all(c[1][1:] == (3, 48, 192) for c in cls_calls)
    assert len(labels) == 4


def test_cls_symmetrize_runs_both_orientations_and_averages():
    # orientation-blind engine: symmetrized score collapses to 0.5 and the
    # 0.9 rotation gate never fires (ClsConfig.symmetrize docstring)
    cfg = ClsConfig(batch_num=6)  # symmetrize defaults on
    stage = ClsStage(cfg, BucketConfig(), PipelineMode.COMPAT)
    eng = FakeEngine(cls_probs=(0.03, 0.97), rec_classes=CHARS.num_classes)
    crops = crops_with_ratios([3, 2])
    labels = stage(crops, eng)
    cls_calls = [c for c in eng.calls if c[0] == "cls"]
    assert len(cls_calls) == 2  # plain + rot180 forward per chunk
    for lab in labels:
        assert abs(lab.score - 0.5) < 1e-6
    assert not any(c.rotated for c in crops if hasattr(c, "rotated"))


def test_performance_width_buckets_quantize():
    cfg = RecConfig(batch_num=6)
    buckets = BucketConfig(rec_width_buckets=(320, 640), rec_batch_buckets=(4,))
    stage = RecStage(cfg, buckets, PipelineMode.PERFORMANCE, CHARS)
    eng = FakeEngine(rec_classes=CHARS.num_classes)
    # ratios 5 and 9 -> natural widths 240, 432 -> buckets 320 and 640
    stage(crops_with_ratios([5.0, 9.0]), eng)
    widths = sorted(c[1][3] for c in eng.calls if c[0] == "rec")
    assert widths == [320, 640]
