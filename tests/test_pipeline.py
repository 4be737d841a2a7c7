"""End-to-end pipeline tests with the FakeEngine (deterministic outputs),
covering the session contract (session.rs:75-143): stage ordering, box
coordinate spaces, crop rotation, result restoration order, streaming."""

import io

import numpy as np
import pytest
from PIL import Image

from retto_tpu.config import PipelineMode, SessionConfig
from retto_tpu.ops.charset import CharacterDict
from retto_tpu.pipeline.engine import FakeEngine
from retto_tpu.pipeline.session import RettoSession


def make_image(rects, h=256, w=320, encode=True):
    """White rectangles on black: FakeEngine.det maps brightness to prob."""
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for (x0, y0, x1, y1) in rects:
        arr[y0:y1, x0:x1] = 255
    if not encode:
        return arr
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


CHARS = CharacterDict(["a", "b", "c"])


def make_session(mode=PipelineMode.PERFORMANCE, **engine_kw):
    cfg = SessionConfig(mode=mode)
    # FakeEngine is orientation-blind, so symmetrized cls scores collapse
    # to 0.5 by design; these tests pin the reference's threshold/rotation
    # semantics against the raw per-forward probabilities
    cfg.cls.symmetrize = False
    engine = FakeEngine(rec_classes=CHARS.num_classes, **engine_kw)
    return RettoSession(cfg, engine=engine, charset=CHARS), engine


class TestEndToEnd:
    def test_detects_bright_regions_and_recognizes(self):
        session, engine = make_session()
        res = session.run(make_image([(40, 60, 240, 90), (40, 150, 200, 180)]))
        assert len(res.det_result) == 2
        assert len(res.cls_result) == 2
        assert len(res.rec_result) == 2
        # FakeEngine rec indices (1,1,0,2) -> collapse -> "ab"
        assert [t.text for t in res.rec_result] == ["ab", "ab"]
        assert all(t.score > 0.8 for t in res.rec_result)
        # stages were actually called
        stages = [c[0] for c in engine.calls]
        assert stages[0] == "det" and "cls" in stages and "rec" in stages

    def test_boxes_in_original_coords(self):
        # image is large -> resize_both shrinks it; boxes must come back in
        # ORIGINAL pixel coords (session.rs:93-97)
        rects = [(400, 600, 2400, 900)]
        session, _ = make_session()
        res = session.run(make_image(rects, h=2560, w=3200))
        assert len(res.det_result) == 1
        box = res.det_result[0].box
        # unclip growth ~ area*1.6/perim of a 2000x300 rect ~ 200px
        assert abs(box.tl.x - 400) < 350
        assert abs(box.tl.y - 600) < 350
        assert box.br.x > 2300 and box.br.x < 3199

    def test_empty_image_no_boxes(self):
        session, engine = make_session()
        res = session.run(make_image([]))
        assert len(res.det_result) == 0
        assert len(res.cls_result) == 0
        assert len(res.rec_result) == 0
        # no cls/rec engine calls for zero crops (chunks-of-empty)
        assert [c[0] for c in engine.calls] == ["det"]

    def test_cls_rotates_crops_when_180(self):
        session, engine = make_session(cls_probs=(0.02, 0.98))
        res = session.run(make_image([(40, 60, 240, 90)]))
        assert res.cls_result[0].label == 180
        assert res.cls_result[0].score == pytest.approx(0.98)

    def test_cls_below_thresh_not_rotated(self):
        session, _ = make_session(cls_probs=(0.15, 0.85))  # < 0.9 thresh
        res = session.run(make_image([(40, 60, 240, 90)]))
        assert res.cls_result[0].label == 180  # label reported
        # rotation skipped is internal; reported label still 180 w/ score
        assert res.cls_result[0].score == pytest.approx(0.85)

    def test_use_cls_false_skips_cls(self):
        cfg = SessionConfig(use_cls=False)
        engine = FakeEngine(rec_classes=CHARS.num_classes)
        session = RettoSession(cfg, engine=engine, charset=CHARS)
        res = session.run(make_image([(40, 60, 240, 90)]))
        assert len(res.cls_result) == 0
        assert "cls" not in [c[0] for c in engine.calls]

    def test_run_stream_stage_order(self):
        session, _ = make_session()
        seen = []
        session.run_stream(
            make_image([(40, 60, 240, 90)]), lambda s: seen.append(s.stage)
        )
        assert seen == ["det", "cls", "rec"]

    def test_raw_ndarray_input(self):
        session, _ = make_session()
        res = session.run(make_image([(40, 60, 240, 90)], encode=False))
        assert len(res.det_result) == 1

    def test_json_serialization(self):
        session, _ = make_session()
        res = session.run(make_image([(40, 60, 240, 90)]))
        d = res.to_dict()
        assert set(d) == {"det_result", "cls_result", "rec_result"}
        assert "boxes" in d["det_result"][0]
        assert res.to_json()


class TestModes:
    @pytest.mark.parametrize("mode", [PipelineMode.COMPAT, PipelineMode.PERFORMANCE])
    def test_both_modes_same_texts(self, mode):
        session, _ = make_session(mode)
        res = session.run(make_image([(20, 40, 300, 70), (20, 120, 160, 150)]))
        assert [t.text for t in res.rec_result] == ["ab", "ab"]

    def test_compat_chunks_of_batch_num(self):
        # 7 crops with batch_num 6 -> two rec calls of 6 and 1 rows
        rects = [(10, 10 + 34 * i, 250, 38 + 34 * i) for i in range(7)]
        session, engine = make_session(PipelineMode.COMPAT)
        session.run(make_image(rects, h=300, w=320))
        rec_calls = [c for c in engine.calls if c[0] == "rec"]
        assert len(rec_calls) == 2
        assert rec_calls[0][1][0] == 6 and rec_calls[1][1][0] == 1

    def test_performance_batches_padded_to_bucket(self):
        rects = [(10, 10 + 34 * i, 250, 38 + 34 * i) for i in range(7)]
        session, engine = make_session(PipelineMode.PERFORMANCE)
        res = session.run(make_image(rects, h=300, w=320))
        rec_calls = [c for c in engine.calls if c[0] == "rec"]
        # same-width crops -> ONE bucketed call, batch padded to 8
        assert len(rec_calls) == 1
        assert rec_calls[0][1][0] == 8
        assert len(res.rec_result) == 7
        cls_calls = [c for c in engine.calls if c[0] == "cls"]
        assert len(cls_calls) == 1 and cls_calls[0][1][0] == 8


class TestRunMany:
    def test_batch_and_error_isolation(self):
        session, _ = make_session()
        good = make_image([(40, 60, 240, 90)])
        out = session.run_many([good, b"garbage", good])
        assert len(out) == 3
        from retto_tpu.errors import RettoError

        assert not isinstance(out[0], RettoError)
        assert isinstance(out[1], RettoError)
        assert not isinstance(out[2], RettoError)

    def test_raise_on_error(self):
        session, _ = make_session()
        from retto_tpu.errors import RettoImageError

        with pytest.raises(RettoImageError):
            session.run_many([b"garbage"], raise_on_error=True)
