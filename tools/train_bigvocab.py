#!/usr/bin/env python
"""Train + evaluate the 6,625-class recognition head on the synthetic
large-vocabulary charset (train/bigvocab.py) — so the reference-scale
vocab path (rec_processor.rs:29-46: 6,623 keys -> 6,625 CTC classes)
stops being random-weights-only (VERDICT r2 missing #2).

Produces trained_weights/{rec_big.npz, charset_big.txt} and prints a
fresh-sample exact-sequence-match rate.

Usage: python tools/train_bigvocab.py [--steps 9000] [--data-n 24576]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from retto_tpu.models import build_rec
from retto_tpu.ops.charset import CharacterDict
from retto_tpu.ops.ctc import ctc_greedy_decode
from retto_tpu.train.bigvocab import (
    BIG_NUM_KEYS,
    big_charset,
    random_big_text,
    render_big_line,
    render_big_page,
)
from retto_tpu.train.data import RecDeviceData, gather_rec_batch
from retto_tpu.train.losses import ctc_loss
from retto_tpu.train.trainer import TrainState, init_train_state
from retto_tpu.weights import save_params

OUT = REPO / "trained_weights"
REC_W = 512
REC_H = 48
MAX_LEN = 12


def render_dataset(rng: np.random.Generator, n: int):
    from retto_tpu.image.io import _pil_resize

    imgs, labels, lengths, texts = [], [], [], []
    for _ in range(n):
        ids, text = random_big_text(rng, BIG_NUM_KEYS, MAX_LEN)
        img = render_big_line(ids, REC_H, rng, invert=rng.random() < 0.25)
        if img.shape[1] > REC_W:
            img = _pil_resize(img, REC_W, REC_H)
        imgs.append(img)
        labels.append(ids + [0] * (MAX_LEN - len(ids)))
        lengths.append(len(ids))
        texts.append(text)
    return imgs, np.asarray(labels), np.asarray(lengths), texts


def render_big_pipeline_dataset(rng: np.random.Generator, n_pages: int,
                                chars: CharacterDict):
    """Big-vocab crops from the REAL det pipeline — the r3 fix that closed
    the small-vocab rec's direct-render/pipeline gap, applied to the
    6,625-class head (r5: the head read 100% on direct renders but 39.1%
    through det->cls->rec, because det-box margins + the device warp's
    resample blur were out of training distribution).  Mirrors
    train_synthetic.render_rec_pipeline_dataset: render pseudo-glyph
    pages, det-box them with the shipped det.npz, match boxes to ground
    truth lines by center distance, crop via the session's own warp."""
    from train_synthetic import warp_crops_like_inference

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
    # fixed page-size set (one det bucket each — jit warms fast); includes
    # the eval's own 480x640 regime plus small-min-side pages whose
    # min-side-736 upscale blur is the hard case
    _sizes = [(480, 640), (384, 512), (256, 320), (288, 704)]
    for i in range(n_pages):
        h, w = _sizes[int(rng.integers(0, len(_sizes)))]
        lh_lo = int(rng.integers(28, 46))
        img, gt_boxes, gt_texts = render_big_page(
            rng, h, w, max_lines=4,
            lh_range=(lh_lo, min(lh_lo + 22, 64)), max_len=8,
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
            gt_h = (gt_boxes[j, 3] - gt_boxes[j, 1]) * sy
            if d[j] > gt_h:
                continue
            matched_boxes.append(b)
            matched_texts.append(gt_texts[j])
        crops = (warp_crops_like_inference(ih, matched_boxes)
                 if matched_boxes else [])
        for crop, text in zip(crops, matched_texts):
            if crop is None or crop.shape[0] < 8 or crop.shape[1] < 8:
                continue
            ids = chars.encode(text)[:MAX_LEN]
            imgs.append(crop)
            labels.append(ids + [0] * (MAX_LEN - len(ids)))
            lengths.append(len(ids))
            texts.append(text)
        if (i + 1) % 200 == 0:
            print(f"[big-pipe-render] {i+1} pages -> {len(imgs)} crops",
                  flush=True)
    return imgs, np.asarray(labels), np.asarray(lengths), texts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=9000)
    ap.add_argument("--data-n", type=int, default=24576)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--pipe-pages", type=int, default=1600,
                    help="pages rendered through the REAL det pipeline for "
                         "in-distribution crops (0 disables)")
    ap.add_argument("--warm-start", action="store_true",
                    help="fine-tune from trained_weights/rec_big.npz")
    args = ap.parse_args()
    OUT.mkdir(exist_ok=True)

    chars = CharacterDict(big_charset())
    print(f"[big] {chars.num_classes} classes "
          f"(reference dict scale, rec_processor.rs:37-45)", flush=True)
    rng = np.random.default_rng(7)
    print(f"[big] rendering {args.data_n} lines ...", flush=True)
    from train_synthetic import _cached

    # same host-render cache dir the small-vocab trainers use (a render
    # pass can populate big_lines while the TPU tunnel is down)
    cache = Path("/tmp/synth_cache2")

    def _render_lines():
        im, la, ln, _ = render_dataset(rng, args.data_n)
        return im, {"labels": la, "lengths": ln}

    imgs, ex = _cached(cache, "big_lines", args.data_n, _render_lines)
    labels, lengths = ex["labels"], ex["lengths"]
    if args.pipe_pages and (OUT / "det.npz").exists():
        rng_pipe = np.random.default_rng(7 + 501)

        def _render_pipe():
            print(f"[big] extracting pipeline crops from "
                  f"{args.pipe_pages} pages ...", flush=True)
            im, la, ln, _ = render_big_pipeline_dataset(
                rng_pipe, args.pipe_pages, chars)
            return im, {"labels": la, "lengths": ln}

        pi, pex = _cached(cache, "big_pipe", args.pipe_pages, _render_pipe)
        if len(pi):
            imgs = imgs + pi
            labels = np.concatenate([labels, pex["labels"]])
            lengths = np.concatenate([lengths, pex["lengths"]])
        print(f"[big] +{len(pi)} pipeline crops = {len(imgs)}", flush=True)
    data = RecDeviceData.build(imgs, labels, lengths, REC_W)

    model = build_rec("mobile", num_classes=chars.num_classes,
                      compute_dtype="bfloat16")
    warm = min(300, max(args.steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warm, max(args.steps, warm + 1)
    )
    tx = optax.adamw(sched, weight_decay=1e-4)
    state = init_train_state(
        model, tx, np.zeros((2, 3, REC_H, REC_W), np.float32)
    )
    if args.warm_start and (OUT / "rec_big.npz").exists():
        from retto_tpu.weights import load_params

        v = load_params(OUT / "rec_big.npz")
        state = TrainState(
            jax.device_put(v["params"]), state.opt_state,
            jax.device_put(v["batch_stats"]), state.step,
        )
        print("[big] warm start from trained_weights/rec_big.npz", flush=True)

    def apply_logits(variables, x, train=False, mutable=None):
        kw = dict(train=train, return_logits=True)
        if mutable:
            return model.apply(variables, x, mutable=mutable, **kw)
        return model.apply(variables, x, **kw)

    # multi-width training (same rationale as tools/train_synthetic.py
    # train_rec): the mixer has no positional embedding and pad-region
    # behavior does not generalize across sequence lengths, so train at
    # the inference width buckets, drawing from content-fits pools
    width_buckets = (320, 384, 448, 512)
    width_probs = (0.25, 0.15, 0.15, 0.45)
    widths_np = np.asarray(data.widths)
    lengths_np = np.asarray(data.lengths)
    # content fits AND CTC alignment feasible at T = w/8 frames
    pools = {
        w: np.where((widths_np <= w) & (1.5 * lengths_np + 2 <= w // 8))[0]
        for w in width_buckets
    }
    keep = [i for i, w in enumerate(width_buckets) if len(pools[w]) >= args.batch]
    width_buckets = tuple(width_buckets[i] for i in keep)
    p = np.asarray([width_probs[i] for i in keep])
    width_probs = tuple(p / p.sum())
    print(f"[big] width buckets {width_buckets} pool sizes "
          f"{[len(pools[w]) for w in width_buckets]}", flush=True)

    @partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
    def step(state: TrainState, data, idx, w):
        x, lab, ln = gather_rec_batch(data, idx)
        x = x[:, :, :, :w]

        def compute(params):
            out, upd = apply_logits(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return ctc_loss(out, lab, ln), upd["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        updates, opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt, stats, state.step + 1), loss

    t0 = time.time()
    n_data = len(imgs)
    for i in range(args.steps):
        w = int(rng.choice(width_buckets, p=width_probs))
        pool = pools[w]
        idx = jnp.asarray(pool[rng.integers(0, len(pool), args.batch)])
        state, loss = step(state, data, idx, w)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"[big] step {i}: loss {float(loss):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # fresh-sample eval: exact sequence match + per-char accuracy
    n_eval = 256
    ei, el, eln, etexts = render_dataset(rng, n_eval)
    ed = RecDeviceData.build(ei, el, eln, REC_W)
    n_exact = n_chars = n_chars_ok = 0
    bs = 64
    for s0 in range(0, n_eval, bs):
        x, _, _ = gather_rec_batch(ed, jnp.arange(s0, s0 + bs))
        probs = jax.jit(model.apply)(
            {"params": state.params, "batch_stats": state.batch_stats}, x
        )
        idx_, keep, _ = ctc_greedy_decode(probs)
        preds = chars.decode_indices(np.asarray(idx_), np.asarray(keep))
        for p, t in zip(preds, etexts[s0 : s0 + bs]):
            n_exact += int(p == t)
            n_chars += len(t)
            n_chars_ok += sum(a == b for a, b in zip(p, t))
    print(f"[big] exact-sequence match on {n_eval} fresh lines: "
          f"{n_exact/n_eval:.4f}")
    print(f"[big] per-char accuracy: {n_chars_ok/max(n_chars,1):.4f}")
    # narrow-bucket spot check (pad-robustness across sequence lengths)
    nar = np.where(np.asarray(ed.widths) <= 320)[0][:64]
    if len(nar):
        x, _, _ = gather_rec_batch(ed, jnp.asarray(nar))
        probs = jax.jit(model.apply)(
            {"params": state.params, "batch_stats": state.batch_stats},
            x[:, :, :, :320],
        )
        idx_, keep, _ = ctc_greedy_decode(probs)
        preds = chars.decode_indices(np.asarray(idx_), np.asarray(keep))
        accn = np.mean([preds[j] == etexts[q] for j, q in enumerate(nar)])
        print(f"[big] exact match at w=320 on {len(nar)} narrow lines: {accn:.4f}")
    save_params(OUT / "rec_big.npz",
                {"params": state.params, "batch_stats": state.batch_stats},
                meta={"preset": "mobile", "overrides": {}})
    (OUT / "charset_big.txt").write_text(
        "\n".join(chars.chars[1:-1]), encoding="utf-8"
    )
    print(f"[big] saved rec_big.npz + charset_big.txt "
          f"({chars.num_classes} classes)")


if __name__ == "__main__":
    main()
