"""Model shape/contract tests: every model must satisfy the reference's
worker tensor signatures (worker.rs:69-73) under jit.

NOTE: init/apply are always wrapped in a single jit — per-op eager dispatch
costs seconds per op on this CPU (each op is a separate XLA compile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from retto_tpu.models import build_cls, build_det, build_rec

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def det_setup():
    model = build_det("tiny", compute_dtype=None)
    params = jax.jit(model.init)(RNG, jnp.zeros((1, 3, 96, 160), jnp.float32))
    apply = jax.jit(model.apply)
    return model, params, apply


@pytest.fixture(scope="module")
def cls_setup():
    model = build_cls("tiny", compute_dtype=None)
    params = jax.jit(model.init)(RNG, jnp.zeros((6, 3, 48, 192), jnp.float32))
    apply = jax.jit(model.apply)
    return model, params, apply


@pytest.fixture(scope="module")
def rec_setup():
    model = build_rec("tiny", num_classes=97, compute_dtype=None)
    params = jax.jit(model.init)(RNG, jnp.zeros((2, 3, 48, 320), jnp.float32))
    apply = jax.jit(model.apply)
    return model, params, apply


class TestDet:
    def test_prob_map_shape_and_range(self, det_setup):
        _, params, apply = det_setup
        out = apply(params, jnp.zeros((1, 3, 96, 160), jnp.float32))
        # worker.rs:70: det [N,3,H,W] -> [N,1,H,W]
        assert out.shape == (1, 1, 96, 160)
        assert out.dtype == jnp.float32
        o = np.asarray(out)
        assert (o >= 0).all() and (o <= 1).all()

    def test_fully_convolutional(self, det_setup):
        # same params must run on any /32 input size (bucketed det shapes)
        _, params, apply = det_setup
        out = apply(params, jnp.zeros((1, 3, 64, 128), jnp.float32))
        assert out.shape == (1, 1, 64, 128)

    def test_raw_stride_map(self, det_setup):
        # raw=True skips the contract upsample: the fused pipeline reads
        # the stride-s map directly (device_pipeline det_fwd)
        model, params, _ = det_setup
        raw = jax.jit(lambda p, x: model.apply(p, x, raw=True))(
            params, jnp.zeros((1, 3, 96, 160), jnp.float32)
        )
        s = model.out_stride
        assert raw.shape == (1, 1, 96 // s, 160 // s)

    def test_train_mode_returns_db_maps(self, det_setup):
        model, _, _ = det_setup
        x = jnp.zeros((1, 3, 64, 64), jnp.float32)

        @jax.jit
        def init_and_apply(x):
            variables = model.init(RNG, x, train=True)
            out, _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
            return out

        out = init_and_apply(x)
        assert set(out) == {"maps", "thresh", "binary"}
        # train-mode maps come out at the head's out_stride (targets are
        # rendered at the same stride — train/data.py gather_det_batch)
        s = model.out_stride
        assert out["maps"].shape == (1, 1, 64 // s, 64 // s)


class TestCls:
    def test_probs_shape(self, cls_setup):
        _, params, apply = cls_setup
        out = apply(params, jnp.zeros((6, 3, 48, 192), jnp.float32))
        # worker.rs:71: cls [N,3,H,W] -> [N,2]
        assert out.shape == (6, 2)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


class TestRec:
    def test_timesteps_and_probs(self, rec_setup):
        _, params, apply = rec_setup
        out = apply(params, jnp.zeros((2, 3, 48, 320), jnp.float32))
        # worker.rs:72: rec [N,3,H,W] -> [N,T,C]; T = W/8 = 40
        assert out.shape == (2, 40, 97)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-4)

    def test_width_scaling(self, rec_setup):
        _, params, apply = rec_setup
        out = apply(params, jnp.zeros((1, 3, 48, 640), jnp.float32))
        assert out.shape == (1, 80, 97)

    def test_logits_mode(self, rec_setup):
        model, params, _ = rec_setup
        logits = jax.jit(lambda p, x: model.apply(p, x, return_logits=True))(
            params, jnp.zeros((1, 3, 48, 320), jnp.float32)
        )
        assert logits.shape == (1, 40, 97)
        assert not bool(jnp.allclose(logits.sum(-1), 1.0))


class TestBf16:
    def test_bf16_compute_f32_output(self):
        model = build_rec(
            "tiny", num_classes=97, compute_dtype="bfloat16",
            dims=(16, 32, 48, 64), depths=(1, 1, 1, 1), mixer_depth=1,
        )
        x = jnp.zeros((1, 3, 48, 96), jnp.float32)

        @jax.jit
        def run(x):
            params = model.init(RNG, x)
            return model.apply(params, x)

        out = run(x)
        assert out.dtype == jnp.float32
