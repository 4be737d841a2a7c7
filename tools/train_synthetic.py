#!/usr/bin/env python
"""Train the three pipeline models from scratch on synthetic rendered text.

Produces ``trained_weights/{rec,cls,det}.npz`` + ``charset.txt`` — working
artifacts for the e2e accuracy oracle and the full-pipeline benchmark in
no-network environments (real PP-OCRv4 weights need the onnx bridge + a
network).  Designed for the tunneled single TPU chip: datasets are rendered
on host once, uploaded once, and every train step runs fully on device
(see retto_tpu.train.data).

Usage:  python tools/train_synthetic.py [rec|cls|det|all] [--steps-scale S]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# persistent remote-compile cache: the pipeline-crop extraction compiles
# one det graph per page shape; without this every trainer PROCESS pays
# those remote compiles again (rec, then cls, then eval)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from retto_tpu.models import build_cls, build_det, build_rec
from retto_tpu.ops.charset import CharacterDict, ascii_charset
from retto_tpu.ops.ctc import ctc_greedy_decode
from retto_tpu.train.data import (
    ClsDeviceData,
    DetDeviceData,
    RecDeviceData,
    gather_cls_batch,
    gather_det_batch,
    gather_rec_batch,
)
from retto_tpu.train.losses import ctc_loss, db_loss
from retto_tpu.image.io import _pil_resize
from retto_tpu.train.synth import (
    cls_text,
    confusion_text,
    default_font,
    downsample_2tap,
    natural_text,
    random_text,
    render_line,
    render_page,
    render_page_natural,
)
from retto_tpu.train.trainer import TrainState, init_train_state
from retto_tpu.weights import save_params

OUT = REPO / "trained_weights"
CHARS = CharacterDict(ascii_charset())
# 512, not the base 320: COMPAT inference runs wide crops at their natural
# carried-ratio width (48 * max_wh_ratio, rec_processor.rs:226-247) — a
# 3-word line at eval sizes is ~400-480 px wide.  Training with everything
# squashed to 320 put those widths out of distribution (insertion-type
# misses concentrated on wide lines); 512 covers ratios up to ~10.7
REC_W = 512
REC_H = 48
DET_S = 512


def _fonts_cycle(rng):
    return int(rng.integers(0, 4))


def _jpeg_degrade(rng, img, p=0.15):
    """With probability ``p``, round-trip the image through JPEG at
    quality 40-85: block/ringing artifacts are a distinct failure mode
    from Gaussian noise (held-out noise_jpeg condition), and only a real
    encode produces them."""
    if rng.random() >= p:
        return img
    import io as _io

    from PIL import Image as _Image

    q = int(rng.integers(40, 86))
    buf = _io.BytesIO()
    _Image.fromarray(img).save(buf, "JPEG", quality=q)
    return np.asarray(_Image.open(buf).convert("RGB"), np.uint8)


def render_rec_dataset(rng, n):
    imgs, labels, lengths, texts = [], [], [], []
    max_len = 16
    usable = CHARS.chars[1:-1]
    for i in range(n):
        # 35% natural-language-like text (the deployment distribution),
        # 25% confusable-glyph-targeted (the n=512 eval residual-miss
        # modes: l/I/|/1 strokes, v/y tails, doubled letters, digit runs),
        # 40% uniform random (full charset coverage)
        r = rng.random()
        if r < 0.35:
            text = natural_text(rng)
        elif r < 0.60:
            text = confusion_text(rng)
        else:
            text = random_text(rng, usable, max_len)
        text = text[:max_len]
        fg, bg = ((255, 255, 255), (0, 0, 0)) if rng.random() < 0.3 else ((0, 0, 0), (255, 255, 255))
        sz = int(rng.integers(26, 44))
        stroke = 1 if rng.random() < 0.2 else 0
        if rng.random() < 0.4:
            # resample-chain augmentation: render taller, then 2-tap
            # bilinear downscale — the INFERENCE warp's kernel (a det-boxed
            # line reaches rec as a single 2-tap warp of the session-res
            # page; PIL's anti-aliased resize never reproduces its stroke
            # aliasing, which is where the I/l stem-height cue degrades)
            f = float(rng.uniform(1.3, 2.8))
            img = render_line(
                text, int(REC_H * f),
                font=default_font(int(sz * f), _fonts_cycle(rng)),
                fg=fg, bg=bg, stroke_width=stroke,
            )
            img = downsample_2tap(
                img, REC_H, max(int(round(img.shape[1] / f)), 8)
            )
        else:
            img = render_line(
                text, REC_H,
                font=default_font(sz, _fonts_cycle(rng)),
                fg=fg, bg=bg,
                # stroke jitter: 20% fake-bold (held-out bold faces)
                stroke_width=stroke,
            )
        if img.shape[1] > REC_W:
            # squash to the bucket width like resize_norm_image does at
            # inference (resized_w = min(target, natural) -> horizontal
            # compression, image_helper.rs:185-190)
            img = _pil_resize(img, REC_W, REC_H)
        ids = CHARS.encode(text)[:max_len]
        imgs.append(_jpeg_degrade(rng, img))
        labels.append(ids + [0] * (max_len - len(ids)))
        lengths.append(len(ids))
        texts.append(text)
    return imgs, np.asarray(labels), np.asarray(lengths), texts


def _save_ragged(path: Path, imgs: list, **arrays) -> None:
    """Cache a list of HxWx3 uint8 images (ragged shapes) + extra arrays.

    Images are concatenated into ONE flat byte buffer with per-image
    offsets.  (The earlier dense layout — zero-pad every image to
    (N, hmax, wmax, 3) — cross-multiplies the tallest image by the widest:
    with the upscale-augmented cls curriculum that's >100 GB for a 687 MB
    file, and loading it OOM-killed the host.)"""
    hs = np.asarray([im.shape[0] for im in imgs], np.int32)
    ws = np.asarray([im.shape[1] for im in imgs], np.int32)
    flat = np.concatenate([np.asarray(im, np.uint8).reshape(-1) for im in imgs])
    np.savez_compressed(path, flat=flat, hs=hs, ws=ws, **arrays)


def _load_ragged(path: Path):
    z = np.load(path)
    hs, ws = z["hs"], z["ws"]
    if "flat" in z.files:
        flat = z["flat"]
        offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64) * ws * 3)])
        imgs = [
            flat[offs[i] : offs[i + 1]].reshape(hs[i], ws[i], 3)
            for i in range(len(hs))
        ]
    else:  # legacy dense layout (safe only for near-uniform shapes)
        buf = z["buf"]  # materialize ONCE: NpzFile.__getitem__ decompresses
        # the whole array on EVERY access — indexing z["buf"][i] in the
        # loop re-decompressed 3.6 GB per image (O(N * full decompress))
        imgs = [buf[i, : hs[i], : ws[i]] for i in range(len(hs))]
    extras = {
        k: z[k] for k in z.files if k not in ("buf", "flat", "hs", "ws")
    }
    return imgs, extras


def _cached(cache_dir: "Path | None", name: str, key: int, render_fn):
    """Load ``{cache_dir}/{name}.npz`` if present and its ``key`` matches
    (key = data_n / n_pages — the curriculum itself is NOT keyed: delete
    the cache dir when retto_tpu/train/synth.py changes), else call
    ``render_fn()`` (returning (imgs, extras dict)) and cache the result.
    Host rendering is the retrain bottleneck on this 1-core machine
    (~15 min for 49k rec lines; pipeline-crop extraction similar), and the
    cache also lets the render pass run while the TPU tunnel is down."""
    path = None if cache_dir is None else cache_dir / f"{name}.npz"
    if path is not None and path.exists():
        try:
            imgs, extras = _load_ragged(path)
            if int(extras.pop("cache_key")) == key:
                print(f"[cache] loaded {len(imgs)} images from {path}", flush=True)
                return imgs, extras
            print(f"[cache] {path} key mismatch; re-rendering", flush=True)
        except Exception as e:  # noqa: BLE001 - a corrupt/partial cache is a miss
            print(f"[cache] {path} unreadable ({e}); re-rendering", flush=True)
    imgs, extras = render_fn()
    if path is not None and len(imgs):
        path.parent.mkdir(parents=True, exist_ok=True)
        # write-then-rename: concurrent writers (e.g. a CPU pre-render racing
        # a TPU training run) must never leave a torn file
        tmp = path.with_suffix(f".tmp{os.getpid()}.npz")
        _save_ragged(tmp, imgs, cache_key=np.int64(key), **extras)
        os.replace(tmp, path)
        print(f"[cache] saved {len(imgs)} images -> {path}", flush=True)
    return imgs, extras


REC_PIPE_PAGES = 4800


def prepare_rec_data(data_n, seed, data_cache: "Path | None",
                     pipe_pages: int = REC_PIPE_PAGES):
    """Rec training set = fresh rendered lines + real-pipeline crops, each
    independently cached (separate rng streams so a cache hit on one phase
    does not shift the other's randomness)."""
    rng_render = np.random.default_rng(seed)
    rng_pipe = np.random.default_rng(seed + 501)

    def _render_lines():
        print(f"[rec] rendering {data_n} lines ...", flush=True)
        im, la, ln, _ = render_rec_dataset(rng_render, data_n)
        return im, {"labels": la, "lengths": ln}

    imgs, ex = _cached(data_cache, "rec_lines", data_n, _render_lines)
    labels, lengths = ex["labels"], ex["lengths"]
    if (OUT / "det.npz").exists():

        def _render_pipe():
            print("[rec] extracting pipeline crops ...", flush=True)
            im, la, ln, _ = render_rec_pipeline_dataset(rng_pipe, pipe_pages)
            return im, {"labels": la, "lengths": ln}

        pi, pex = _cached(data_cache, "rec_pipe", pipe_pages, _render_pipe)
        if len(pi):
            imgs = imgs + pi
            labels = np.concatenate([labels, pex["labels"]])
            lengths = np.concatenate([lengths, pex["lengths"]])
        print(f"[rec] +{len(pi)} pipeline crops = {len(imgs)}", flush=True)
    return imgs, labels, lengths


def _ckpt_name(kind: str, preset: str) -> str:
    """mobile keeps the historical bare names (det.npz/rec.npz/cls.npz);
    other tiers get a suffix (det_server.npz, ...) so BASELINE config 4
    can train + load the server models beside the mobile suite."""
    return f"{kind}.npz" if preset == "mobile" else f"{kind}_{preset}.npz"


def train_rec(steps=16000, batch=128, lr=1.2e-3, data_n=32768, seed=0,
              data_cache: "Path | None" = None, warm_start: bool = False,
              preset: str = "mobile"):
    rng = np.random.default_rng(seed + 1009)
    imgs, labels, lengths = prepare_rec_data(data_n, seed, data_cache)
    data_n = len(imgs)
    data = RecDeviceData.build(imgs, labels, lengths, REC_W)

    ckpt = _ckpt_name("rec", preset)
    model = build_rec(preset, num_classes=CHARS.num_classes, compute_dtype="bfloat16")
    warm = min(200, max(steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warm, max(steps, warm + 1))
    tx = optax.adamw(sched, weight_decay=1e-4)
    x0, _, _ = gather_rec_batch(data, jnp.arange(batch))
    state = init_train_state(model, tx, np.zeros((2, 3, REC_H, REC_W), np.float32))
    if warm_start and (OUT / ckpt).exists():
        # fine-tune from the current checkpoint (CPU-fallback path while
        # the TPU tunnel is down; also fast targeted iteration on TPU) —
        # use a reduced lr when fine-tuning (caller's choice)
        from retto_tpu.weights import load_params

        v = load_params(OUT / ckpt)
        state = TrainState(
            jax.device_put(v["params"]), state.opt_state,
            jax.device_put(v["batch_stats"]), state.step,
        )
        print(f"[rec] warm start from trained_weights/{ckpt}", flush=True)

    def apply_logits(variables, x, train=False, mutable=None):
        kw = dict(train=train, return_logits=True)
        if mutable:
            return model.apply(variables, x, mutable=mutable, **kw)
        return model.apply(variables, x, **kw)

    # Multi-width training: the mixer has no positional embedding, but
    # attention softmax mass depends on sequence length, so a model trained
    # only at W=512 (T=64) emits spurious characters in the pad region at
    # other widths (COMPAT carried-ratio batches start at 320 -> T=40;
    # eval misses 'how'->'howI', 'TEXT'->'TEXT`' fired at pad frame 37/40).
    # Train each step at a sampled bucket width, slicing the 512-wide
    # device dataset; indices are drawn from per-bucket pools so content
    # always fits (exactly like inference width bucketing).
    width_buckets = (192, 320, 384, 448, 512)
    width_probs = (0.08, 0.22, 0.15, 0.15, 0.40)
    widths_np = np.asarray(data.widths)
    lengths_np = np.asarray(data.lengths)
    # besides content fitting, CTC alignment must be feasible at T = w/8
    # frames (T >= L + repeats; 1.5L + 2 is a safe practical bound) —
    # an infeasible pair yields inf loss and NaN grads
    pools = {
        w: np.where((widths_np <= w) & (1.5 * lengths_np + 2 <= w // 8))[0]
        for w in width_buckets
    }
    keep = [i for i, w in enumerate(width_buckets) if len(pools[w]) >= batch]
    width_buckets = tuple(width_buckets[i] for i in keep)
    p = np.asarray([width_probs[i] for i in keep])
    width_probs = tuple(p / p.sum())
    print(f"[rec] width buckets {width_buckets} pool sizes "
          f"{[len(pools[w]) for w in width_buckets]}", flush=True)

    @partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 3))
    def step(state: TrainState, data, idx, ema, w, key=None):
        x, lab, ln = gather_rec_batch(data, idx, key=key)
        x = x[:, :, :, :w]

        def compute(params):
            out, upd = apply_logits(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return ctc_loss(out, lab, ln), upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA of the weights (decay 0.999 ~ 1k-step window): the final raw
        # checkpoint is a lottery over late minibatches — successive runs
        # flipped 3-8 eval misses with no curriculum change; the average
        # is the stable point of that noise
        ema = jax.tree_util.tree_map(
            lambda e, p: 0.999 * e + 0.001 * p, ema, params
        )
        return TrainState(params, opt, stats, state.step + 1), ema, loss

    # real copies: jnp.asarray would alias state.params' buffers, and
    # donating both argnums then double-donates the same buffer
    # (TPU INVALID_ARGUMENT at the first step)
    ema = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))(state.params)
    base_key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
    t0 = time.time()
    for i in range(steps):
        w = int(rng.choice(width_buckets, p=width_probs))
        pool = pools[w]
        idx = jnp.asarray(pool[rng.integers(0, len(pool), batch)])
        state, ema, loss = step(state, data, idx, ema, w,
                                jax.random.fold_in(base_key, i))
        if i % 200 == 0 or i == steps - 1:
            print(f"[rec] step {i}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # quick accuracy eval on fresh samples: raw vs EMA, save the better
    n_eval = 256
    eval_imgs, eval_labels, eval_lengths, eval_texts = render_rec_dataset(rng, n_eval)
    ed = RecDeviceData.build(eval_imgs, eval_labels, eval_lengths, REC_W)
    x, _, _ = gather_rec_batch(ed, jnp.arange(n_eval))
    jit_apply = jax.jit(model.apply)

    def _acc(params):
        probs = jit_apply({"params": params, "batch_stats": state.batch_stats}, x)
        idx_, keep, _ = ctc_greedy_decode(probs)
        preds = CHARS.decode_indices(np.asarray(idx_), np.asarray(keep))
        return np.mean([p == t for p, t in zip(preds, eval_texts)]), preds

    acc_raw, _ = _acc(state.params)
    acc_ema, preds = _acc(ema)
    best = ema if acc_ema >= acc_raw else state.params
    acc = max(acc_ema, acc_raw)
    print(f"[rec] exact-match on {n_eval} fresh lines: raw {acc_raw:.3f}  ema {acc_ema:.3f}"
          f" -> saving {'ema' if acc_ema >= acc_raw else 'raw'}")
    print("[rec] samples:", list(zip(preds[:5], eval_texts[:5])))
    # save FIRST: the spot check below must not be able to cost a finished
    # training run its checkpoint
    from retto_tpu.models import MODEL_PRESETS as _MP

    save_params(OUT / ckpt, {"params": best, "batch_stats": state.batch_stats},
                meta={"preset": preset,
                      "overrides": dict(_MP[preset]["rec"])})
    (OUT / "charset.txt").write_text("\n".join(CHARS.chars[1:-1]), encoding="utf-8")

    # narrow-width spot check (the multi-width pad-robustness target):
    # re-run the <=320px-content subset at the 320 bucket
    nar = np.where(np.asarray(ed.widths) <= 320)[0]
    if len(nar):
        xn, _, _ = gather_rec_batch(ed, jnp.asarray(nar))
        pn = jit_apply({"params": best, "batch_stats": state.batch_stats},
                       xn[:, :, :, :320])
        i_, k_, _ = ctc_greedy_decode(pn)
        pr = CHARS.decode_indices(np.asarray(i_), np.asarray(k_))
        accn = np.mean([pr[j] == eval_texts[q] for j, q in enumerate(nar)])
        print(f"[rec] saved-ckpt exact-match at w=320 on {len(nar)} narrow lines: {accn:.3f}")
    return float(acc)


CLS_PIPE_PAGES = 2400


def prepare_cls_data(data_n, seed, data_cache: "Path | None",
                     pipe_pages: int = CLS_PIPE_PAGES):
    """Cls training set = real-pipeline crops + rendered lines, each
    independently cached (separate rng streams, same rationale as
    prepare_rec_data)."""
    rng_pipe = np.random.default_rng(seed + 501)
    rng_render = np.random.default_rng(seed)
    imgs = []
    if (OUT / "det.npz").exists():

        def _render_pipe():
            print("[cls] extracting crops via the real det pipeline ...", flush=True)
            return render_cls_pipeline_dataset(rng_pipe, pipe_pages), {}

        imgs, _ = _cached(data_cache, "cls_pipe", pipe_pages, _render_pipe)
        print(f"[cls] {len(imgs)} pipeline crops", flush=True)

    def _render_lines():
        print(f"[cls] rendering {data_n} lines ...", flush=True)
        return _render_cls_lines(rng_render, data_n), {}

    rendered, _ = _cached(data_cache, "cls_lines", data_n, _render_lines)
    return imgs + rendered


def train_cls(steps=9000, batch=128, lr=1e-3, data_n=24576, seed=1,
              data_cache: "Path | None" = None, warm_start: bool = False):
    rng = np.random.default_rng(seed + 1009)
    imgs = prepare_cls_data(data_n, seed, data_cache)
    imgs = [imgs[i] for i in rng.permutation(len(imgs))]
    data = ClsDeviceData.build(imgs, 192)
    data_n = len(imgs)
    # scale from the mobile preset (0.75 vs the reference's 0.35):
    # blurred-crop orientation + near-symmetric 180-degree cues need the
    # capacity; still ~2M params (registry.py MODEL_PRESETS)
    model = build_cls("mobile", compute_dtype="bfloat16")
    warm = min(200, max(steps // 10, 1))
    tx = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, lr, warm, max(steps, warm + 1)),
        weight_decay=1e-4,
    )
    state = init_train_state(model, tx, np.zeros((2, 3, 48, 192), np.float32))
    if warm_start and (OUT / "cls.npz").exists():
        from retto_tpu.weights import load_params

        v = load_params(OUT / "cls.npz")
        state = TrainState(
            jax.device_put(v["params"]), state.opt_state,
            jax.device_put(v["batch_stats"]), state.step,
        )
        print("[cls] warm start from trained_weights/cls.npz", flush=True)
    return _cls_fit(model, tx, state, data, data_n, rng, steps, batch)


def _render_cls_lines(rng, data_n):
    imgs = []
    for _ in range(data_n):
        fg, bg = ((255, 255, 255), (0, 0, 0)) if rng.random() < 0.3 else ((0, 0, 0), (255, 255, 255))
        # cls_text: the probe-informed mixture — digit runs ('1'/'6'/'9'
        # heavy), SINGLE short words with ALL-CAPS emphasis (the weakest
        # probe category: rotated 'PUT'/'DID' read confidently upright),
        # two-word mixed-case, natural tail (synth.py:cls_text)
        text = cls_text(rng)
        img = render_line(
            text, int(rng.integers(32, 49)),
            font=default_font(int(rng.integers(24, 44)), _fonts_cycle(rng)),
            fg=fg, bg=bg,
            stroke_width=1 if rng.random() < 0.2 else 0,
        )
        # margin augmentation: det-box crops carry unclip margins around the
        # text (area*1.6/perimeter expansion) -- pad 0-45% of height per side
        h0, w0 = img.shape[:2]
        mt = int(h0 * rng.uniform(0.0, 0.45)); mb = int(h0 * rng.uniform(0.0, 0.45))
        ml = int(h0 * rng.uniform(0.0, 0.6)); mr = int(h0 * rng.uniform(0.0, 0.6))
        padded = np.full((h0 + mt + mb, w0 + ml + mr, 3), bg, np.uint8)
        padded[mt:mt + h0, ml:ml + w0] = img
        img = padded
        # pipeline blur chain: det resize upscales the page 1.5-4x
        # (bilinear) before the crop warp, so real crops are soft; replicate
        # by up-then-down resampling before the final squash
        if rng.random() < 0.7:
            up = rng.uniform(1.5, 4.0)
            img = _pil_resize(img, max(int(img.shape[1] * up), 8),
                              max(int(img.shape[0] * up), 8))
        imgs.append(img)  # raw; ClsDeviceData resizes both orientations
    return imgs


def _cls_fit(model, tx, state, data, data_n, rng, steps, batch):
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, data, idx, rot, gain, bias, key=None):
        k1 = k2 = None
        if key is not None:
            k1, k2 = jax.random.split(key)
        x, lab = gather_cls_batch(data, idx, rot, gain, bias, key=k1)
        # the OPPOSITE stored orientation, left-aligned like every real
        # crop — the r4 inference symmetrize warps the rot180 view
        # in-distribution (device_pipeline.clsrec_fwd), so training's
        # second view must be the same thing, NOT a canvas reversal
        # (which parks content in the right pad region)
        x_opp, _ = gather_cls_batch(data, idx, 1 - rot, gain, bias, key=k2)

        def compute(params):
            # Inference gates the 180-degree rotation on the SYMMETRIZED
            # score q = 0.5*(p(label|x) + p(perm(label)|rot180 x))
            # (stages.py:145-152, ClsConfig.symmetrize) — q is what must
            # clear the 0.9 thresh (cls_processor.rs:163-166), and q is
            # view-invariant, so train q directly: forward both views in
            # one batch (shared BN stats) and cross-entropy the averaged
            # probability, plus a small per-view term that keeps each
            # orientation individually discriminative.
            nb = x.shape[0]
            x2 = jnp.concatenate([x, x_opp], axis=0)
            out, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x2, train=True, mutable=["batch_stats"],
            )
            p1, p2 = out[:nb], out[nb:]
            p_sym = 0.5 * (p1 + p2[:, ::-1])
            # label smoothing 0.02: mild calibration without capping
            # confidence under the pipeline's 0.9 rotation gate (0.05
            # left correctly-labeled rotated crops at 0.5-0.88 scores,
            # which the gate then ignores — eval CLS-ROT failures)
            eps = 1e-8
            sm = 0.02
            onehot = jax.nn.one_hot(lab, 2) * (1 - sm) + sm / 2
            loss_sym = -(onehot * jnp.log(p_sym + eps)).sum(-1).mean()
            loss_view = (
                -(onehot * jnp.log(p1 + eps)).sum(-1).mean()
                - (onehot[:, ::-1] * jnp.log(p2 + eps)).sum(-1).mean()
            )
            return loss_sym + 0.25 * loss_view, upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt, stats, state.step + 1), loss

    cls_key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(rng.integers(0, data_n, batch))
        rot = jnp.asarray(rng.integers(0, 2, batch))
        # widened contrast/brightness jitter (r4 held-out conditions:
        # gray-on-gray gap 60-120, noisy JPEG) — both views of one crop
        # share the same photometric params so the symmetrized target
        # stays view-consistent
        gain = jnp.asarray(rng.uniform(0.5, 1.25, batch).astype(np.float32))
        bias = jnp.asarray(rng.uniform(-0.55, 0.2, batch).astype(np.float32))
        state, loss = step(state, data, idx, rot, gain, bias,
                           jax.random.fold_in(cls_key, i))
        if i % 200 == 0 or i == steps - 1:
            print(f"[cls] step {i}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # eval: report the symmetrized gate metric (q >= 0.9), the quantity the
    # pipeline actually thresholds, alongside plain argmax accuracy
    idx = jnp.asarray(rng.integers(0, data_n, 512))
    rot = jnp.asarray(rng.integers(0, 2, 512))
    x, lab = gather_cls_batch(data, idx, rot)
    x_opp, _ = gather_cls_batch(data, idx, 1 - rot)
    jit_apply = jax.jit(model.apply)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    p1 = np.asarray(jit_apply(variables, x))
    p2 = np.asarray(jit_apply(variables, x_opp))
    q = 0.5 * (p1 + p2[:, ::-1])
    lab = np.asarray(lab)
    acc = float((q.argmax(1) == lab).mean())
    gate = float((q[np.arange(len(lab)), lab] >= 0.9).mean())
    print(f"[cls] sym accuracy: {acc:.3f}  gate@0.9: {gate:.3f}")

    # ---- operating-point temperature calibration -------------------- #
    # The pipeline acts on q >= 0.9 (cls_processor.rs:163-166): a crop
    # whose symmetrized score lands at 0.80-0.89 is CORRECTLY labeled but
    # never rotated.  Pick the temperature that maximizes (rotated crops
    # passing the gate) + (upright crops not falsely rotated) on FRESH
    # held-out renders, then fold 1/T into the final Dense so inference
    # needs no code change.  T is chosen on the gate objective, not NLL —
    # this is threshold calibration, not probability calibration.
    held = _render_cls_lines(np.random.default_rng(rng.integers(1 << 31)), 1024)
    hdata = ClsDeviceData.build(held, 192)
    hidx = jnp.arange(len(held))
    hx_up, _ = gather_cls_batch(hdata, hidx, jnp.zeros(len(held), jnp.int32))
    hx_rot, _ = gather_cls_batch(hdata, hidx, jnp.ones(len(held), jnp.int32))
    out = {}
    # the symmetrize pair is the stored OPPOSITE orientation (left-
    # aligned), matching the r4 inference flip warp
    for name, hx, hx_o in (("up", hx_up, hx_rot), ("rot", hx_rot, hx_up)):
        a = np.asarray(jit_apply(variables, hx))
        b = np.asarray(jit_apply(variables, hx_o))
        out[name] = (a, b)
    eps = 1e-12

    def gate_counts(T):
        score = {}
        for name, (a, b) in out.items():
            la, lb = np.log(a + eps) / T, np.log(b + eps) / T
            pa = np.exp(la - la.max(1, keepdims=True))
            pa /= pa.sum(1, keepdims=True)
            pb = np.exp(lb - lb.max(1, keepdims=True))
            pb /= pb.sum(1, keepdims=True)
            score[name] = 0.5 * (pa + pb[:, ::-1])
        rot_pass = int(((score["rot"].argmax(1) == 1)
                        & (score["rot"][:, 1] >= 0.9)).sum())
        up_ok = int((~((score["up"].argmax(1) == 1)
                       & (score["up"][:, 1] >= 0.9))).sum())
        return rot_pass, up_ok

    best_t, best_obj = 1.0, sum(gate_counts(1.0))
    for T in (0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.25):
        obj = sum(gate_counts(T))
        if obj > best_obj:  # strict: prefer the least-distorting T on ties
            best_t, best_obj = T, obj
    r0, u0 = gate_counts(1.0)
    r1, u1 = gate_counts(best_t)
    n_h = len(held)
    print(f"[cls] calibration: T=1.0 rot-gate {r0}/{n_h} up-ok {u0}/{n_h}"
          f" -> T={best_t} rot-gate {r1}/{n_h} up-ok {u1}/{n_h}")
    params = state.params
    if best_t != 1.0:
        head = dict(params["Dense_0"])
        head["kernel"] = head["kernel"] / best_t
        head["bias"] = head["bias"] / best_t
        params = dict(params)
        params["Dense_0"] = head
    from retto_tpu.models import MODEL_PRESETS

    save_params(OUT / "cls.npz", {"params": params, "batch_stats": state.batch_stats},
                meta={"preset": "mobile",
                      "overrides": dict(MODEL_PRESETS["mobile"]["cls"])})
    return acc


def render_cls_pipeline_dataset(rng, n_pages=1600):
    """Cls training crops from the REAL det pipeline: render pages at varied
    sizes, run the trained det stage, warp out the crops exactly like the
    session does (unclip margins, bicubic warp, upscale blur included) —
    the distribution cls sees at inference, by construction."""
    from PIL import Image as _I

    from retto_tpu.config import SessionConfig
    from retto_tpu.geometry import PointBox
    from retto_tpu.image.io import ImageHelper

    cfg = SessionConfig()
    # build only the det stage (no cls/rec weights needed)
    from retto_tpu.models import build_det
    from retto_tpu.pipeline.engine import JaxEngine
    from retto_tpu.pipeline.stages import DetStage
    from retto_tpu.weights import load_params

    det_m = build_det("mobile", compute_dtype="bfloat16")
    eng = JaxEngine(det_model=det_m, det_params=load_params(OUT / "det.npz"))
    stage = DetStage(cfg.det, cfg.buckets)

    crops = []
    # page sizes from a small fixed set: each maps to one det bucket
    # shape so the jit cache warms after a handful of pages.  The two
    # small-min-side pages match the n=512 eval's 640x200 render regime
    # (min-side-736 rule -> 3.5-3.8x det upscale blur) — cls misses
    # concentrated there because that blur regime was unseen
    _sizes = [(256, 320), (384, 512), (512, 448), (640, 704), (288, 704),
              (192, 640), (208, 512)]
    for i in range(n_pages):
        size_h, size_w = _sizes[int(rng.integers(0, len(_sizes)))]
        lh_lo = int(rng.integers(18, 40))
        img, _, _ = render_page(
            rng, CHARS, size_h, size_w, max_lines=5,
            lh_range=(lh_lo, min(lh_lo + 60, 110)),
            text_fn=cls_text,
        )
        ih = ImageHelper(img)
        ih.resize_both(cfg.max_side_len, cfg.min_side_len)
        boxes, _ = stage(ih, eng)
        for b in boxes:
            crop = ih.get_crop_img(PointBox(b))
            ch, cw = crop.shape[:2]
            if ch < 8 or cw < 8:
                continue
            crops.append(crop)  # raw; ClsDeviceData resizes both orientations
        if len(crops) % 500 < 5:
            print(f"[cls-pipe] {i+1} pages -> {len(crops)} crops", flush=True)
    return crops


def warp_crops_like_inference(ih, boxes, rec_h=REC_H, rec_w=REC_W):
    """Warp det boxes to rec crops through the SAME separable bilinear
    kernel DevicePipeline uses at inference (_aligned_scal geometry +
    warp_crops_separable, device_pipeline.py:1404-1412).

    Training crops previously took host bicubic ``get_crop_img`` THEN a
    second PIL resize to 48 px — two resamples with a sharper kernel than
    the single bilinear pass inference performs.  The r5 n=512 residual
    misses are I/l stem-HEIGHT confusions ('Will'->'WiIl', 'TIME'->'TlME'):
    exactly the cue that extra sharpness preserves in training and the
    bilinear warp blurs at inference.  Extracting through the inference
    kernel removes the mismatch.

    Pure numpy (same math as ``_axis_matrix``; source rows/cols sliced to
    the sampled band) so extraction costs no tunnel round trips and no
    compiles.  Returns a list of [48, tw_i, 3] u8 crops (one per box; tall
    rotate-crops are skipped — returns None at that position)."""
    import math

    from retto_tpu.geometry import PointBox
    from retto_tpu.image.warp import crop_output_size
    from retto_tpu.pipeline.device_pipeline import _aligned_scal

    def _axis_np(o, s, src, dst):
        d = np.arange(dst, dtype=np.float64)[:, None]
        j = np.arange(src, dtype=np.float64)[None, :]
        w = np.maximum(0.0, 1.0 - np.abs(o + d * s - j))
        return w.astype(np.float32), w.sum(axis=1).astype(np.float32)

    img = ih.img
    ah, aw = ih.size()
    out = []
    for b in boxes:
        q = np.asarray(b, np.float64)
        h_c, w_c, rot = crop_output_size(PointBox(q))
        if rot:
            out.append(None)
            continue
        natural = int(math.ceil(rec_h * w_c / h_c))
        tw = max(min(natural, rec_w), 8)
        ox, sx, oy, sy = _aligned_scal(q, tw, rec_h, False)
        y0 = max(int(math.floor(oy)), 0)
        y1 = min(int(math.ceil(oy + (rec_h - 1) * sy)) + 2, ah)
        x0 = max(int(math.floor(ox)), 0)
        x1 = min(int(math.ceil(ox + (tw - 1) * sx)) + 2, aw)
        if y1 <= y0 or x1 <= x0:
            out.append(None)
            continue
        wv, mv = _axis_np(oy - y0, sy, y1 - y0, rec_h)
        wu, mu = _axis_np(ox - x0, sx, x1 - x0, tw)
        sub = img[y0:y1, x0:x1].astype(np.float32)
        t = np.einsum("dh,hwc->dwc", wv, sub)
        o = np.einsum("ew,dwc->dec", wu, t)
        mass = mv[:, None] * mu[None, :]
        o = o + (1.0 - mass)[..., None] * 255.0
        out.append(np.clip(np.rint(o), 0, 255).astype(np.uint8))
    return out


def render_rec_pipeline_dataset(rng, n_pages=2400, max_len=16):
    """Rec training crops from the REAL det pipeline: det boxes are matched
    to ground-truth line boxes by IoU-of-centers so each crop carries its
    true text — rec trains on exactly the crops (margins, warp resampling,
    blur) it will see at inference."""
    from retto_tpu.config import SessionConfig
    from retto_tpu.image.io import ImageHelper
    from retto_tpu.models import build_det
    from retto_tpu.pipeline.engine import JaxEngine
    from retto_tpu.pipeline.stages import DetStage
    from retto_tpu.weights import load_params

    cfg = SessionConfig()
    det_m = build_det("mobile", compute_dtype="bfloat16")
    eng = JaxEngine(det_model=det_m, det_params=load_params(OUT / "det.npz"))
    stage = DetStage(cfg.det, cfg.buckets)

    imgs, labels, lengths, texts = [], [], [], []
    # page sizes from a small fixed set: each maps to one det bucket
    # shape so the jit cache warms after a handful of pages.  The two
    # small-min-side pages put 3.5-3.8x det upscales in the training
    # distribution (min-side-736 rule): the n=512 eval renders 640x200
    # (3.68x) and crops from that blur regime were previously unseen
    # (persistent 'right' -> 'riqht' miss)
    _sizes = [(256, 320), (384, 512), (512, 448), (640, 704), (288, 704),
              (192, 640), (208, 512)]
    for i in range(n_pages):
        size_h, size_w = _sizes[int(rng.integers(0, len(_sizes)))]
        lh_lo = int(rng.integers(18, 40))
        r = rng.random()
        img, gt_boxes, gt_texts = render_page(
            rng, CHARS, size_h, size_w, max_lines=5,
            lh_range=(lh_lo, min(lh_lo + 60, 110)),
            text_fn=(natural_text if r < 0.4 else
                     confusion_text if r < 0.7 else None),
        )
        if not len(gt_boxes):
            continue
        ih = ImageHelper(img)
        ih.resize_both(cfg.max_side_len, cfg.min_side_len)
        ah, aw = ih.size()
        sy, sx = ah / img.shape[0], aw / img.shape[1]
        boxes, _ = stage(ih, eng)
        centers_gt = np.stack(
            [(gt_boxes[:, 0] + gt_boxes[:, 2]) / 2 * sx,
             (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2 * sy], axis=1)
        matched_boxes, matched_texts = [], []
        for b in boxes:
            c = (b[0] + b[2]) / 2.0
            d = np.linalg.norm(centers_gt - c[None], axis=1)
            j = int(d.argmin())
            # reject matches whose centers are further than half the GT
            # line height (merged/split detections would mislabel)
            gt_h = (gt_boxes[j, 3] - gt_boxes[j, 1]) * sy
            if d[j] > gt_h:
                continue
            matched_boxes.append(b)
            matched_texts.append(gt_texts[j])
        # warp through the inference kernel (see warp_crops_like_inference:
        # the old bicubic get_crop_img + second resize left training crops
        # sharper than inference's single bilinear pass)
        crops = (warp_crops_like_inference(ih, matched_boxes)
                 if matched_boxes else [])
        for crop, text in zip(crops, matched_texts):
            if crop is None or crop.shape[0] < 8 or crop.shape[1] < 8:
                continue
            imgs.append(crop)
            ids = CHARS.encode(text)[:max_len]
            labels.append(ids + [0] * (max_len - len(ids)))
            lengths.append(len(ids))
            texts.append(text)
        if (i + 1) % 200 == 0:
            print(f"[rec-pipe] {i+1} pages -> {len(imgs)} crops", flush=True)
    return imgs, np.asarray(labels), np.asarray(lengths), texts


def render_det_dataset(rng, n):
    from retto_tpu.train.bigvocab import render_big_page

    pages, boxes = [], []
    for i in range(n):
        lh_lo = int(rng.integers(16, 40))
        lh_hi = lh_lo + int(rng.integers(8, 90))
        r = rng.random()
        if r < 0.12:
            # big-vocab pseudo-glyph pages: det must box CJK-like stroke
            # lines too (the full-pipeline big-vocab eval runs these
            # through det->cls->rec; rec_processor.rs:29-46)
            img, bx, _ = render_big_page(
                rng, DET_S, DET_S, max_lines=5,
                lh_range=(max(lh_lo, 24), max(min(lh_hi, 96), 32)),
            )
        elif r < 0.32:
            # large-type NATURAL pages: the session's min-side-736 det
            # upscale puts a 44 px line on a 200 px-tall receipt at
            # ~160 px in det coords — the eval/oracle regime.  Natural
            # metrics + tight-ink GT (see render_page_natural docstring:
            # tile-only training made the det paint the full em band,
            # +12 px BR bias on the r4 n=512 eval)
            img, bx, _ = render_page_natural(
                rng, CHARS, DET_S, DET_S, max_lines=3,
                size_range=(80, 170),
            )
        elif r < 0.40:
            # large-type tile pages: keep the wide-word-gap robustness
            # the r4 fix bought ('2203 3478 side' fragmenting)
            img, bx, _ = render_page(
                rng, CHARS, DET_S, DET_S, max_lines=3,
                lh_range=(int(rng.integers(90, 130)), 200),
            )
        elif r < 0.72:
            # natural-metrics pages at body-text sizes (tight-ink GT)
            img, bx, _ = render_page_natural(
                rng, CHARS, DET_S, DET_S, max_lines=6,
                size_range=(max(lh_lo - 4, 12), min(lh_hi, 72)),
            )
        else:
            img, bx, _ = render_page(
                rng, CHARS, DET_S, DET_S, max_lines=6,
                lh_range=(lh_lo, min(lh_hi, 120)),
            )
        if rng.random() < 0.3 and len(bx):
            # 180-rotated pages: det must fire on upside-down text too
            # (the cls stage is what un-rotates it, like the reference's
            # own e2e test, session.rs:201-204)
            img = img[::-1, ::-1].copy()
            bx = np.stack([DET_S - bx[:, 2], DET_S - bx[:, 3],
                           DET_S - bx[:, 0], DET_S - bx[:, 1]], axis=1)
        pages.append(_jpeg_degrade(rng, img))
        boxes.append(bx)
    return pages, boxes


def train_det(steps=6000, batch=8, lr=8e-4, data_n=640, seed=2,
              preset: str = "mobile"):
    rng = np.random.default_rng(seed)
    print(f"[det] rendering {data_n} pages ...", flush=True)
    pages, boxes = render_det_dataset(rng, data_n)
    data = DetDeviceData.build(pages, boxes)
    model = build_det(preset, compute_dtype="bfloat16")
    warm = min(200, max(steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warm, max(steps, warm + 1))
    tx = optax.adamw(sched, weight_decay=1e-4)
    state = init_train_state(
        model, tx, np.zeros((2, 3, 128, 128), np.float32)
    )

    out_stride = int(getattr(model, "out_stride", 1) or 1)

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, data, idx, key=None):
        x, gs, gm, gt, gtm = gather_det_batch(
            data, idx, out_stride=out_stride, key=key)

        def compute(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return db_loss(out, gs, gm, gt, gtm), upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(compute, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt, stats, state.step + 1), loss

    base_key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
    t0 = time.time()
    for i in range(steps):
        idx = jnp.asarray(rng.integers(0, data_n, batch))
        state, loss = step(state, data, idx, jax.random.fold_in(base_key, i))
        if i % 100 == 0 or i == steps - 1:
            print(f"[det] step {i}: loss {float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)

    # meta carries the FULL arch kwargs: presets evolve, checkpoints don't
    # (an old det.npz must keep building the arch it was trained as)
    from retto_tpu.models import MODEL_PRESETS

    save_params(OUT / _ckpt_name("det", preset),
                {"params": state.params, "batch_stats": state.batch_stats},
                meta={"preset": preset,
                      "overrides": dict(MODEL_PRESETS[preset]["det"])})
    # quick qualitative eval: mean prob inside/outside text on a fresh page
    img, bx, _ = render_page(rng, CHARS, DET_S, DET_S, lh_range=(24, 60))
    x = ((img[..., ::-1].astype(np.float32) / 255.0) - 0.5) / 0.5
    x = np.transpose(x, (2, 0, 1))[None]
    pred = jax.jit(model.apply)(
        {"params": state.params, "batch_stats": state.batch_stats}, jnp.asarray(x)
    )
    p = np.asarray(pred[0, 0])
    inside = np.zeros(p.shape, bool)
    for (x0, y0, x1, y1) in bx.astype(int):
        inside[y0 + 4 : y1 - 4, x0 + 4 : x1 - 4] = True
    print(
        f"[det] prob inside text: {p[inside].mean():.3f}  outside: {p[~inside].mean():.3f}"
    )
    return float(p[inside].mean()) if inside.any() else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("target", choices=["rec", "cls", "det", "all", "render"],
                    nargs="?", default="all")
    ap.add_argument("--steps-scale", type=float, default=1.0)
    ap.add_argument("--data-cache", type=Path, default=None,
                    help="cache DIR for the rendered datasets (rec_lines/"
                         "rec_pipe/cls_lines/cls_pipe.npz). 'render' "
                         "populates it host-side; rec/cls read it. Delete "
                         "it when the synth curriculum changes.")
    ap.add_argument("--warm-start", action="store_true",
                    help="initialize rec/cls from the existing "
                         "trained_weights checkpoints (fine-tune) instead "
                         "of fresh init")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the learning rate (use a reduced lr "
                         "with --warm-start)")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the batch size (smaller for CPU runs)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override the step count WITHOUT scaling the "
                         "dataset size (unlike --steps-scale, which keys "
                         "the render caches) — for warm-start fine-tunes")
    ap.add_argument("--cpu", action="store_true",
                    help="pin jax to CPU (the harness sitecustomize pins "
                         "the axon TPU platform programmatically; use this "
                         "to e.g. run 'render' while the tunnel is down)")
    ap.add_argument("--preset", default="mobile",
                    help="model tier to train (mobile|server|tiny). Non-"
                         "mobile checkpoints save with a suffix "
                         "(det_server.npz) for BASELINE config 4; cls "
                         "always trains mobile (the reference has no "
                         "server cls, build.rs:7-12)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    OUT.mkdir(exist_ok=True)
    s = args.steps_scale
    if args.target == "render":
        # render-only pass: populate every cache on the host (e.g. while
        # the TPU tunnel is down) so training runs skip the render time
        assert args.data_cache is not None, "render needs --data-cache"
        prepare_rec_data(int(49152 * s), 0, args.data_cache,
                         pipe_pages=int(REC_PIPE_PAGES * s))
        prepare_cls_data(int(24576 * s), 1, args.data_cache,
                         pipe_pages=int(CLS_PIPE_PAGES * s))
        return
    extra = {"warm_start": args.warm_start}
    if args.lr is not None:
        extra["lr"] = args.lr
    if args.batch is not None:
        extra["batch"] = args.batch
    if args.target in ("rec", "all"):
        # 24k steps / 49k fresh lines: the n=512 residual misses are tail
        # modes (case pairs, y/v, m/n) that need more fresh-sample exposure;
        # device time is ~3 min, host render time dominates
        train_rec(steps=args.steps or int(24000 * s), data_n=int(49152 * s),
                  data_cache=args.data_cache, preset=args.preset, **extra)
    if args.target in ("cls", "all"):
        train_cls(steps=args.steps or int(18000 * s),
                  data_cache=args.data_cache, **extra)
    if args.target in ("det", "all"):
        train_det(steps=args.steps or int(6000 * s), preset=args.preset)


if __name__ == "__main__":
    main()
