"""Mesh/sharding helpers + data-parallel inference engine (8 virtual CPU
devices — SURVEY.md §2 'First-class TPU components')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retto_tpu.parallel import data_sharding, make_mesh, replicate, shard_batch


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
