"""Training checkpoint/resume tests (orbax round trip)."""

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from retto_tpu.models import build_cls
from retto_tpu.train.checkpoint import CheckpointManager
from retto_tpu.train.losses import cls_loss
from retto_tpu.train.trainer import init_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    model = build_cls("tiny", compute_dtype=None)
    tx = optax.adam(1e-3)
    x = np.random.default_rng(0).normal(size=(2, 3, 32, 64)).astype(np.float32)
    state = init_train_state(model, tx, x)
    step = make_train_step(model, cls_loss, tx)
    return model, tx, x, state, step


def test_save_restore_roundtrip(tmp_path_factory, setup):
    model, tx, x, state, step = setup
    d = tmp_path_factory.mktemp("ckpt")
    mgr = CheckpointManager(d)
    y = jnp.asarray([0, 1])
    state1, _ = step(state, jnp.asarray(x), y)
    mgr.save(1, state1)
    assert mgr.latest_step() == 1

    template = init_train_state(model, tx, x)
    restored = mgr.restore(template)
    assert int(restored.step) == 1
    # restored params equal saved params
    import jax

    leaves1 = jax.tree_util.tree_leaves(state1.params)
    leaves2 = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # training continues from the restored state
    state2, loss = step(restored, jnp.asarray(x), y)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 2
    mgr.close()


def test_restore_empty_raises(tmp_path_factory, setup):
    model, tx, x, state, _ = setup
    d = tmp_path_factory.mktemp("empty")
    mgr = CheckpointManager(d)
    with pytest.raises(FileNotFoundError):
        mgr.restore(state)
    mgr.close()
