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


class TestCheckpointMeta:
    """Checkpoint self-description (store.py::save_params meta): the saved
    architecture kwargs win over the named preset's current defaults, so
    presets can evolve without orphaning existing weights."""

    def test_meta_roundtrip(self, tmp_path):
        import numpy as np

        from retto_tpu.weights import load_params_meta, save_params

        tree = {"params": {"Dense_0": {"kernel": np.ones((2, 2), np.float32)}}}
        save_params(tmp_path / "m.npz", tree,
                    meta={"preset": "mobile", "overrides": {"scale": 1.0}})
        out, meta = load_params_meta(tmp_path / "m.npz")
        assert meta == {"preset": "mobile", "overrides": {"scale": 1.0}}
        assert out["params"]["Dense_0"]["kernel"].shape == (2, 2)

    def test_no_meta_returns_none(self, tmp_path):
        import numpy as np

        from retto_tpu.weights import load_params_meta, save_params

        save_params(tmp_path / "m.npz", {"params": {"w": np.zeros(3)}})
        out, meta = load_params_meta(tmp_path / "m.npz")
        assert meta is None and out["params"]["w"].shape == (3,)

    def test_session_honors_checkpoint_overrides(self, tmp_path):
        # save TINY-architecture weights carrying their overrides, then
        # open the session with preset="mobile": the checkpoint meta must
        # drive construction (otherwise shapes mismatch and apply fails)
        import jax.numpy as jnp
        import numpy as np

        from retto_tpu import RettoSession, SessionConfig
        from retto_tpu.models import MODEL_PRESETS, build_cls, build_det, build_rec
        from retto_tpu.ops.charset import CharacterDict, ascii_charset
        from retto_tpu.weights import init_random_params, save_params

        chars = CharacterDict(ascii_charset())
        tiny = MODEL_PRESETS["tiny"]
        models = {
            "det": build_det("tiny"),
            "cls": build_cls("tiny"),
            "rec": build_rec("tiny", num_classes=chars.num_classes),
        }
        paths = {}
        for k, m in models.items():
            v = init_random_params(m, jnp.zeros((1, 3, 64, 64)))
            paths[k] = str(tmp_path / f"{k}.npz")
            save_params(paths[k], v,
                        meta={"preset": "tiny", "overrides": dict(tiny[k])})
        s = RettoSession(SessionConfig(), preset="mobile", charset=chars,
                         weights=paths)
        # the built models must be the tiny architecture
        assert s._models["cls"].scale == tiny["cls"]["scale"]
        assert s._models["det"].widths == tiny["det"]["widths"]
        assert s._models["rec"].dims == tiny["rec"]["dims"]
        # and the loaded params must actually apply
        x = np.zeros((1, 3, 48, 192), np.float32)
        p = s.engine.cls(x)
        assert np.asarray(p).shape == (1, 2)
