"""Timing utility tests."""

import jax.numpy as jnp

from retto_tpu.utils import StageTimers, device_fetch_sync, time_fn


def test_time_fn_returns_positive():
    f = lambda x: x * 2
    per_iter, out = time_fn(f, jnp.ones((4, 4)), iters=3, warmup=1)
    assert per_iter > 0
    assert out.shape == (4, 4)


def test_device_fetch_sync_handles_pytrees():
    device_fetch_sync({"a": jnp.ones((2, 2)), "b": [jnp.zeros(3)]})
    device_fetch_sync(None)


def test_stage_timers():
    t = StageTimers()
    with t.time("det"):
        pass
    with t.time("det"):
        pass
    s = t.summary()
    assert s["det"]["count"] == 2
    assert s["det"]["avg_ms"] >= 0
