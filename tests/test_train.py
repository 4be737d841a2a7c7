"""Training subsystem tests: losses, synthetic data, and the mesh-sharded
train step (8 virtual CPU devices; SURVEY.md §4 multi-chip test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from retto_tpu.models import build_cls, build_rec
from retto_tpu.ops.charset import CharacterDict
from retto_tpu.train.losses import cls_loss, ctc_loss, db_loss
from retto_tpu.train.synth import (
    db_ground_truth,
    make_cls_batch,
    make_det_batch,
    make_rec_batch,
    render_line,
    render_page,
)
from retto_tpu.train.trainer import (
    init_train_state,
    make_mesh,
    make_train_step,
    param_shardings,
)

CHARS = CharacterDict(list("0123456789"))


class TestLosses:
    def test_ctc_loss_decreases_for_correct_logits(self):
        # logits favoring the label sequence must score lower than random
        n, t, c = 2, 12, 12
        labels = jnp.asarray([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
        lengths = jnp.asarray([3, 2], jnp.int32)
        good = np.full((n, t, c), -5.0, np.float32)
        # spread the label indices across time, blanks elsewhere
        for i, row in enumerate([[1, 2, 3], [4, 5]]):
            for j in range(t):
                good[i, j, 0] = 5.0
            for j, lab in enumerate(row):
                good[i, j * 3, 0] = -5.0
                good[i, j * 3, lab] = 5.0
        bad = np.zeros((n, t, c), np.float32)
        l_good = float(ctc_loss(jnp.asarray(good), labels, lengths))
        l_bad = float(ctc_loss(jnp.asarray(bad), labels, lengths))
        assert l_good < l_bad

    def test_db_loss_zero_ish_for_perfect_pred(self):
        h = w = 64
        gt_s, gt_m, gt_t, gt_tm = db_ground_truth(
            np.array([[10, 10, 50, 30]]), h, w
        )
        eps = 1e-4
        perfect = {
            "maps": jnp.asarray(gt_s)[None, None].clip(eps, 1 - eps),
            "thresh": jnp.asarray(gt_t)[None, None],
            "binary": jnp.asarray(gt_s)[None, None],
        }
        wrong = {
            "maps": jnp.full((1, 1, h, w), 0.5),
            "thresh": jnp.zeros((1, 1, h, w)),
            "binary": jnp.full((1, 1, h, w), 0.5),
        }
        lp = float(db_loss(perfect, gt_s[None], gt_m[None], gt_t[None], gt_tm[None]))
        lw = float(db_loss(wrong, gt_s[None], gt_m[None], gt_t[None], gt_tm[None]))
        assert lp < lw
        assert lp < 0.5

    def test_cls_loss(self):
        probs = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
        labels = jnp.asarray([0, 1])
        good = float(cls_loss(probs, labels))
        bad = float(cls_loss(probs, 1 - labels))
        assert good < bad


class TestSynth:
    def test_render_line_shape(self):
        img = render_line("hello 123", 48)
        assert img.shape[0] == 48 and img.shape[2] == 3
        assert img.min() < 100 and img.max() == 255  # text + background

    def test_rec_batch(self):
        rng = np.random.default_rng(0)
        x, labels, lengths, texts = make_rec_batch(rng, CHARS, 4, max_len=8)
        assert x.shape == (4, 3, 48, 320)
        assert labels.shape == (4, 8)
        assert all(1 <= l <= 8 for l in lengths)
        # labels decode back to the texts
        for row, ln, text in zip(labels, lengths, texts):
            assert "".join(CHARS.chars[i] for i in row[:ln]) == text

    def test_cls_batch(self):
        rng = np.random.default_rng(0)
        x, y = make_cls_batch(rng, CHARS, 6)
        assert x.shape == (6, 3, 48, 192)
        assert set(np.unique(y)).issubset({0, 1})

    def test_det_batch_and_gt(self):
        rng = np.random.default_rng(0)
        x, gs, gm, gt, gtm = make_det_batch(rng, CHARS, 2, h=128, w=160)
        assert x.shape == (2, 3, 128, 160)
        assert gs.shape == (2, 128, 160)
        assert gs.max() <= 1.0 and gs.min() >= 0.0
        # the shrink region must be strictly inside at least one rendered box
        img, boxes, _ = render_page(rng, CHARS, 128, 160)
        if len(boxes):
            s, _, t, tm = db_ground_truth(boxes, 128, 160)
            ys, xs = np.nonzero(s)
            x0, y0, x1, y1 = boxes[0]
            assert s.sum() > 0
            assert (t[tm > 0] >= 0.3 - 1e-6).all()


class TestTrainStep:
    def test_rec_train_step_single_device(self):
        model = build_rec("tiny", num_classes=CHARS.num_classes,
                          compute_dtype=None,
                          dims=(16, 32, 48, 64), depths=(1, 1, 1, 1),
                          mixer_depth=1)
        tx = optax.adam(1e-3)
        rng = np.random.default_rng(0)
        x, labels, lengths, _ = make_rec_batch(rng, CHARS, 2, w=96, max_len=4)

        def loss_fn(out, labels, lengths):
            return ctc_loss(out, labels, lengths)

        state = init_train_state(model, tx, x)

        # rec model: train mode must produce logits for CTC
        def apply_logits(variables, x, train=False, mutable=None):
            kw = dict(train=train, return_logits=True)
            if mutable:
                return model.apply(variables, x, mutable=mutable, **kw)
            return model.apply(variables, x, **kw)

        step = make_train_step(apply_logits, loss_fn, tx)
        losses = []
        for i in range(3):
            state, loss = step(state, jnp.asarray(x), jnp.asarray(labels),
                               jnp.asarray(lengths))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert int(state.step) == 3

    def test_mesh_train_step_8_devices(self):
        assert jax.device_count() >= 8
        mesh = make_mesh(8, model_parallel=2)
        assert mesh.shape == {"data": 4, "model": 2}
        model = build_cls("tiny", compute_dtype=None)
        tx = optax.sgd(1e-2)
        rng = np.random.default_rng(0)
        x, y = make_cls_batch(rng, CHARS, 8, shape=(3, 32, 64))
        state = init_train_state(model, tx, x, mesh=mesh)
        step = make_train_step(model, cls_loss, tx, mesh=mesh)
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y))
        assert np.isfinite(float(loss))

    def test_param_shardings_rules(self):
        mesh = make_mesh(8, model_parallel=2)
        params = {
            "backbone": {"kernel": jnp.zeros((3, 3, 8, 16))},
            "head": {"Dense_0": {"kernel": jnp.zeros((64, 128))}},
        }
        sh = param_shardings(params, mesh)
        head_spec = sh["head"]["Dense_0"]["kernel"].spec
        assert head_spec == jax.sharding.PartitionSpec(None, "model")
        bb_spec = sh["backbone"]["kernel"].spec
        assert bb_spec == jax.sharding.PartitionSpec()


class TestBigVocab:
    """Synthetic large-vocabulary charset (train/bigvocab.py): the
    reference-scale 6,623-key dict (rec_processor.rs:29-46) exercised with
    procedural pseudo-glyphs."""

    def test_charset_matches_reference_scale(self):
        from retto_tpu.ops.charset import CharacterDict
        from retto_tpu.train.bigvocab import BIG_NUM_KEYS, big_charset

        cs = big_charset()
        assert len(cs) == BIG_NUM_KEYS == 6623
        cd = CharacterDict(cs)
        assert cd.num_classes == 6625  # blank + keys + " "

    def test_glyphs_deterministic_and_distinct(self):
        import numpy as np

        from retto_tpu.train.bigvocab import glyph_bitmap

        assert glyph_bitmap(7) is glyph_bitmap(7)  # cached
        a = np.stack([glyph_bitmap(i) for i in range(64)])
        # pairwise-distinct over a sample window
        flat = a.reshape(64, -1)
        assert len({bytes(r) for r in flat}) == 64

    def test_render_encode_round_trip(self):
        import numpy as np

        from retto_tpu.ops.charset import CharacterDict
        from retto_tpu.train.bigvocab import (
            BIG_NUM_KEYS,
            big_charset,
            random_big_text,
            render_big_line,
        )

        rng = np.random.default_rng(3)
        cd = CharacterDict(big_charset())
        ids, text = random_big_text(rng, BIG_NUM_KEYS)
        assert cd.encode(text) == ids
        img = render_big_line(ids, 48, rng)
        assert img.shape[0] == 48 and img.shape[2] == 3
        assert img.shape[1] >= 32 * len(ids) // 2


class TestDatasetCache:
    """tools/train_synthetic.py render caches: ragged round trip + keying."""

    def test_ragged_roundtrip(self, tmp_path):
        from tools.train_synthetic import _load_ragged, _save_ragged

        rng = np.random.default_rng(0)
        imgs = [
            rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            for h, w in [(48, 37), (12, 220), (300, 8)]
        ]
        lab = np.arange(6).reshape(3, 2).astype(np.int32)
        _save_ragged(tmp_path / "x.npz", imgs, labels=lab)
        out, extras = _load_ragged(tmp_path / "x.npz")
        assert len(out) == 3
        for a, b in zip(imgs, out):
            assert np.array_equal(a, b)
        assert np.array_equal(extras["labels"], lab)

    def test_cached_hit_miss_and_key(self, tmp_path):
        from tools.train_synthetic import _cached

        calls = []

        def render():
            calls.append(1)
            return [np.zeros((4, 4, 3), np.uint8)], {"v": np.asarray([7])}

        i1, e1 = _cached(tmp_path, "d", 10, render)
        i2, e2 = _cached(tmp_path, "d", 10, render)  # hit
        assert len(calls) == 1 and np.array_equal(e2["v"], e1["v"])
        _cached(tmp_path, "d", 11, render)  # key mismatch -> re-render
        assert len(calls) == 2
        i4, _ = _cached(None, "d", 10, render)  # no cache dir -> render
        assert len(calls) == 3 and len(i4) == 1
        # a torn/corrupt cache file is a miss, not a crash
        (tmp_path / "d.npz").write_bytes(b"not an npz")
        i5, _ = _cached(tmp_path, "d", 11, render)
        assert len(calls) == 4 and len(i5) == 1


class TestInferenceKernelCrops:
    """r5: training crops must go through the SAME resample kernel the
    DevicePipeline warp applies at inference (2-tap separable bilinear) —
    the bicubic get_crop_img + second PIL resize chain left training
    crops sharper than inference ever produces (I/l stem-height misses)."""

    def test_warp_crops_like_inference_matches_device_kernel(self):
        import math

        from tools.train_synthetic import warp_crops_like_inference

        from retto_tpu.image.io import ImageHelper
        from retto_tpu.image.warp import warp_crops_separable
        from retto_tpu.pipeline.device_pipeline import _aligned_scal

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (300, 500, 3), np.uint8)
        ih = ImageHelper(img)
        quads = [
            np.array([[40.0, 50.0], [260.0, 50.0], [260.0, 95.0], [40.0, 95.0]]),
            np.array([[0.0, 0.0], [100.0, 0.0], [100.0, 28.0], [0.0, 28.0]]),
            # edge-clipped: samples past the right/bottom edge must fill
            np.array([[350.0, 260.0], [499.0, 260.0], [499.0, 299.0], [350.0, 299.0]]),
        ]
        crops = warp_crops_like_inference(ih, quads)
        for q, crop in zip(quads, crops):
            h_c = q[3, 1] - q[0, 1]
            w_c = q[1, 0] - q[0, 0]
            natural = int(math.ceil(48 * max(w_c, 1) / max(h_c, 1)))
            tw = max(min(natural, 512), 8)
            assert crop.shape == (48, tw, 3)
            scal = np.asarray([_aligned_scal(q, tw, 48, False)], np.float32)
            ref = np.asarray(warp_crops_separable(
                jnp.asarray(img)[None], jnp.zeros((1,), jnp.int32),
                jnp.asarray(scal), jnp.asarray([[300, 500]], jnp.int32),
                48, 512,
            ))[0, :, :tw]
            ref_u8 = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
            # f32 summation order differs -> at most 1 u8 code apart
            assert np.abs(ref_u8.astype(int) - crop.astype(int)).max() <= 1

    def test_warp_crops_skips_tall_boxes(self):
        from tools.train_synthetic import warp_crops_like_inference

        from retto_tpu.image.io import ImageHelper

        img = np.full((200, 200, 3), 255, np.uint8)
        tall = np.array([[10.0, 10.0], [40.0, 10.0], [40.0, 150.0], [10.0, 150.0]])
        out = warp_crops_like_inference(ImageHelper(img), [tall])
        assert out == [None]

    def test_downsample_2tap_matches_axis_matrix(self):
        from retto_tpu.image.warp import _axis_matrix
        from retto_tpu.train.synth import downsample_2tap

        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (96, 240, 3), np.uint8)
        out = downsample_2tap(img, 48, 100)
        wv, _ = _axis_matrix(jnp.zeros((1,)), jnp.full((1,), 96 / 48),
                             96, 48, jnp.full((1,), 96.0))
        wu, _ = _axis_matrix(jnp.zeros((1,)), jnp.full((1,), 240 / 100),
                             240, 100, jnp.full((1,), 240.0))
        t = jnp.einsum("dh,hwc->dwc", wv[0], jnp.asarray(img, jnp.float32))
        ref = np.asarray(jnp.einsum("ew,dwc->dec", wu[0], t))
        ref_u8 = np.clip(np.rint(ref), 0, 255).astype(np.uint8)
        assert np.abs(ref_u8.astype(int) - out.astype(int)).max() <= 1
        # constant image is preserved exactly (weights sum to 1 in-bounds)
        const = np.full((72, 90, 3), 137, np.uint8)
        assert np.all(downsample_2tap(const, 48, 60) == 137)
