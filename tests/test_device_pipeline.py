"""Device-resident pipeline tests: packed mask transfer and the fused
warp->normalize->forward path (tiny models, CPU)."""

import numpy as np
import pytest

from retto_tpu.config import BucketConfig, SessionConfig


class TestPackedMask:
    def test_pack_unpack_roundtrip(self):
        import jax.numpy as jnp

        from retto_tpu.ops.db_post import (
            binarize_dilate,
            binarize_dilate_packed,
            unpack_mask,
        )

        rng = np.random.default_rng(0)
        pred = rng.uniform(0, 1, (64, 100)).astype(np.float32)
        ref = np.asarray(binarize_dilate(jnp.asarray(pred), 0.3, True))
        packed = binarize_dilate_packed(jnp.asarray(pred), 0.3, True)
        assert packed.shape == (64, 13)  # ceil(100/8)
        un = unpack_mask(packed, 100)
        np.testing.assert_array_equal(un, ref.astype(bool))


@pytest.fixture(scope="module")
def dp_session():
    from retto_tpu.pipeline.session import RettoSession

    cfg = SessionConfig()
    cfg.det.limit_side_len = 128
    cfg.buckets = BucketConfig(
        det_pad_to=64,
        det_max_side=256,
        rec_width_buckets=(320,),
        cls_batch_buckets=(4,),
        rec_batch_buckets=(4,),
    )
    cfg.engine.compute_dtype = "float32"
    session = RettoSession(cfg, preset="tiny")
    return session


class TestDevicePipeline:
    def test_structural_run(self, dp_session):
        dp = dp_session.device_pipeline()
        rng = np.random.default_rng(0)
        imgs = [
            rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
            for _ in range(2)
        ]
        res = dp.run_many(imgs)
        assert len(res) == 2
        for r in res:
            assert len(r.rec_result) == len(r.det_result)
            if dp_session.config.use_cls:
                assert len(r.cls_result) == len(r.det_result)

    def test_empty_image(self, dp_session):
        dp = dp_session.device_pipeline()
        res = dp.run(np.full((160, 200, 3), 255, dtype=np.uint8))
        assert len(res.det_result) == len(res.rec_result)

    def test_requires_session_models(self):
        from retto_tpu.errors import RettoEngineError
        from retto_tpu.ops.charset import CharacterDict
        from retto_tpu.pipeline.engine import FakeEngine
        from retto_tpu.pipeline.session import RettoSession

        s = RettoSession(
            SessionConfig(),
            engine=FakeEngine(),
            charset=CharacterDict(["a"]),
        )
        with pytest.raises(RettoEngineError):
            s.device_pipeline()


class TestStream:
    def test_stream_matches_run_many(self, dp_session):
        dp = dp_session.device_pipeline()
        rng = np.random.default_rng(1)
        batches = [
            [rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
             for _ in range(2)]
            for _ in range(3)
        ]
        seq = [dp.run_many(b) for b in batches]
        got = list(dp.stream(batches))
        assert len(got) == 3
        for rs, rg in zip(seq, got):
            for a, b in zip(rs, rg):
                assert len(a.det_result) == len(b.det_result)
                assert [t.text for t in a.rec_result] == [
                    t.text for t in b.rec_result
                ]

    def test_stream_empty(self, dp_session):
        dp = dp_session.device_pipeline()
        assert list(dp.stream([])) == []


def test_metrics_accumulate(dp_session):
    dp = dp_session.device_pipeline()
    before = dp.metrics.images
    rng = np.random.default_rng(2)
    dp.run_many(
        [rng.integers(0, 255, (160, 200, 3), dtype=np.uint8) for _ in range(2)]
    )
    assert dp.metrics.images == before + 2
    s = dp.metrics.summary()
    assert "det_batch" in s["bucket_occupancy"]
    # session and pipeline share ONE metrics object (serve /metrics)
    assert dp.metrics is dp_session.metrics


def test_run_many_empty_list(dp_session):
    assert dp_session.device_pipeline().run_many([]) == []


def test_mixed_gray_and_color_batch():
    """yuv420 transfer auto-detects grayscale per image; a mixed batch
    splits into gray + yuv chunks and both must come back in order."""
    from retto_tpu.config import BucketConfig, SessionConfig
    from retto_tpu.pipeline.session import RettoSession

    cfg = SessionConfig()
    cfg.det.limit_side_len = 128
    cfg.buckets = BucketConfig(
        det_pad_to=64, det_max_side=256, rec_width_buckets=(320,),
        cls_batch_buckets=(4,), rec_batch_buckets=(4,), det_batch_buckets=(4,),
    )
    cfg.engine.compute_dtype = "float32"
    cfg.engine.transfer_format = "yuv420"
    session = RettoSession(cfg, preset="tiny")
    rng = np.random.default_rng(3)
    gray = np.repeat(
        rng.integers(0, 255, (160, 200, 1), dtype=np.uint8), 3, axis=2
    )
    color = rng.integers(0, 255, (160, 200, 3), dtype=np.uint8)
    res = session.device_pipeline().run_many([gray, color, gray])
    assert len(res) == 3
    for r in res:
        assert len(r.rec_result) == len(r.det_result)
