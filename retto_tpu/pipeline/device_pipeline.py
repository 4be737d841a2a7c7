"""Device-resident fused pipeline (PERFORMANCE fast path).

The "north star" design from SURVEY.md: the image is uploaded once as
uint8; preprocessing, the three model forwards, binarization, crop warping,
normalization, and CTC decode all run on the TPU; the host receives only

* a bit-packed det mask + a uint8-quantized prob map (~1.1 bytes/pixel),
* per-crop cls probabilities ([N, 2]),
* per-crop CTC indices/keep-masks/scores (a few KB),

and performs the inherently sequential tail: contour tracing, min-area
rects, homography solves (8x8), and string assembly.

Deviations from the reference path (all confined to PERFORMANCE mode;
COMPAT mode in pipeline.stages reproduces the reference exactly):
* crops are sampled from the det-resized image instead of the
  session-resized image (one device image instead of two);
* box scores are computed from the uint8-quantized prob map (<=0.2%
  quantization error);
* cls inputs are warped directly to the (48, 192) input canvas instead of
  crop -> resize (one resampling instead of two);
* the cls 180-degree rotation is realized by composing the rec-warp
  homography with a 180-degree rotation instead of flipping pixels.

Cross-image batching: ``run_many`` gathers the crops of ALL images in the
call into shared width/batch buckets (BASELINE.json config 5 streaming
shape), and stages device work so host postprocessing overlaps with device
compute for other images.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SessionConfig
from ..geometry import PointBox, scale_and_clip
from ..image.io import ImageHelper, _pil_resize, decode_image, perspective_coeffs
from .stages import _bucket_up, _next_bucket, det_input_dims
from ..image.warp import warp_crops_multi
from ..ops.charset import CharacterDict
from ..ops.ctc import ctc_greedy_decode
from ..ops.db_post import binarize_dilate_packed, unpack_mask
from ..ops.det_postprocess import det_candidates, det_finalize
from ..results import (
    ClsLabel,
    ClsResult,
    DetBox,
    DetResult,
    OcrResult,
    RecResult,
    RecText,
)

__all__ = ["DevicePipeline"]


@dataclass
class _CropTask:
    img_i: int
    box_i: int
    quad_det: np.ndarray  # warp-source quad in det-image coords (maybe rot90-reordered)
    crop_h: int  # natural crop size in session coords (post-rot90)
    crop_w: int
    rotated180: bool = False


@dataclass
class _Staged:
    ah: int
    aw: int
    ori_h: int
    ori_w: int
    rh: int
    rw: int
    group: tuple[int, int] | None = None  # det bucket group key
    row: int = 0  # row within the group's stacked device tensor
    boxes: np.ndarray | None = None
    scores: np.ndarray | None = None
    crops: list[_CropTask] = field(default_factory=list)


class DevicePipeline:
    def __init__(
        self,
        det_model,
        cls_model,
        rec_model,
        params: dict[str, Any],
        config: SessionConfig,
        chars: CharacterDict,
    ):
        self.cfg = config
        self.chars = chars
        # device-resident params (host-numpy params re-upload per call)
        self._params = jax.device_put(params)
        det_cfg = config.det

        def det_fwd_batch(params, imgs_u8, valid_hw):
            """imgs_u8 [B, H, W, 3]; valid_hw [B, 2].  One forward for every
            same-bucket image in the call (dense MXU batch instead of B
            batch-1 convolutions)."""
            x = imgs_u8.astype(jnp.float32)[..., ::-1]  # BGR (det_processor.rs:268)
            mean = jnp.asarray(det_cfg.mean, jnp.float32)
            std = jnp.asarray(det_cfg.std, jnp.float32)
            x = (x * det_cfg.scale - mean) / std
            # zero out bucket padding -> normalized black
            h, w = imgs_u8.shape[1], imgs_u8.shape[2]
            row = jnp.arange(h)[None, :, None, None]
            col = jnp.arange(w)[None, None, :, None]
            inb = (row < valid_hw[:, 0, None, None, None]) & (
                col < valid_hw[:, 1, None, None, None]
            )
            x = jnp.where(inb, x, -1.0)
            x = jnp.transpose(x, (0, 3, 1, 2))
            pred = det_model.apply(params, x)
            dilate = det_cfg.use_dilation and det_cfg.dilation_kernel is not None
            packed = jax.vmap(
                lambda p: binarize_dilate_packed(p, det_cfg.thresh, dilate)
            )(pred)
            # the prob map STAYS on device; candidates are scored there
            return packed, pred[:, 0]

        self._det_fwd_batch = jax.jit(det_fwd_batch)

        def score_fwd(preds, rows, homogs):
            """Mean probability inside each candidate quad, via a 16x64
            bilinear resample of the prob map over the quad (PERFORMANCE-
            mode approximation of box_score_fast; exact pixel means stay in
            the compat path).  preds [B, H, W]; rows/homogs per candidate."""
            samples = warp_crops_multi(
                preds[..., None],
                rows,
                homogs,
                # quads never reach outside the map: pass full bounds
                jnp.tile(
                    jnp.asarray(preds.shape[1:3], jnp.int32)[None],
                    (preds.shape[0], 1),
                ),
                16,
                64,
                fill=0.0,
            )
            return samples.mean(axis=(1, 2, 3))

        self._score_fwd = jax.jit(score_fwd)

        def warp_norm(imgs_u8, rows, homogs, widths, valid_hw, out_h, out_w):
            crops = warp_crops_multi(
                imgs_u8, rows, homogs, valid_hw, out_h, out_w, fill=255.0
            )
            x = (crops / 255.0 - 0.5) / 0.5
            col = jnp.arange(out_w)[None, None, :, None]
            x = jnp.where(col < widths[:, None, None, None], x, 0.0)
            return jnp.transpose(x, (0, 3, 1, 2))

        def cls_fwd(params, imgs_u8, rows, homogs, widths, valid_hw):
            _, h, w = config.cls.image_shape
            x = warp_norm(imgs_u8, rows, homogs, widths, valid_hw, h, w)
            return cls_model.apply(params, x)

        self._cls_fwd = jax.jit(cls_fwd)

        def rec_fwd(params, imgs_u8, rows, homogs, widths, valid_hw, out_w):
            _, h, _ = config.rec.image_shape
            x = warp_norm(imgs_u8, rows, homogs, widths, valid_hw, h, out_w)
            probs = rec_model.apply(params, x)
            return ctc_greedy_decode(probs)

        self._rec_fwd = jax.jit(rec_fwd, static_argnames=("out_w",))

    # ------------------------------------------------------------------ #
    def run(self, data: bytes | np.ndarray) -> OcrResult:
        return self.run_many([data])[0]

    def run_many(self, inputs: Sequence[bytes | np.ndarray]) -> list[OcrResult]:
        cfg = self.cfg
        staged: list[_Staged] = []

        # ---- phase A: host resize chain, group by det bucket, batched
        # upload + ONE det forward per bucket group ---------------------- #
        groups: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
        for data in inputs:
            img = ImageHelper(decode_image(data))
            ori_h, ori_w = img.size()
            img.resize_both(cfg.max_side_len, cfg.min_side_len)
            ah, aw = img.size()
            rh, rw = det_input_dims(
                ah, aw, cfg.det.limit_type, cfg.det.limit_side_len,
                cfg.buckets.det_max_side,
            )
            det_img = (
                img.img if (rh, rw) == (ah, aw) else _pil_resize(img.img, rw, rh)
            )
            bh = _bucket_up(rh, cfg.buckets.det_pad_to, cfg.buckets.det_max_side)
            bw = _bucket_up(rw, cfg.buckets.det_pad_to, cfg.buckets.det_max_side)
            padded = np.zeros((bh, bw, 3), np.uint8)
            padded[:rh, :rw] = det_img
            st = _Staged(ah, aw, ori_h, ori_w, rh, rw)
            staged.append(st)
            groups.setdefault((bh, bw), []).append((len(staged) - 1, padded))
        self._dev_groups = {}
        det_handles = {}
        for key, items in groups.items():
            bh, bw = key
            idxs = [i for i, _ in items]
            batch = np.stack([p for _, p in items])
            valids = np.asarray(
                [[staged[i].rh, staged[i].rw] for i in idxs], np.int32
            )
            nb = _next_bucket(len(idxs), (1, 2, 4, 8, 16))
            if nb > len(idxs):
                pad = nb - len(idxs)
                batch = np.concatenate([batch, np.zeros((pad, bh, bw, 3), np.uint8)])
                valids = np.concatenate([valids, np.ones((pad, 2), np.int32)])
            dev_batch = jnp.asarray(batch)
            valids_dev = jnp.asarray(valids)
            packed_b, prob8_b = self._det_fwd_batch(
                self._params["det"], dev_batch, valids_dev
            )
            self._dev_groups[key] = (dev_batch, valids_dev)
            det_handles[key] = (idxs, packed_b, prob8_b)
            for k, i in enumerate(idxs):
                staged[i].group = key
                staged[i].row = k

        # ---- phase B: fetch the 1-bit mask per group (the prob map stays
        # on device), extract candidates (thread pool — the native C++ call
        # releases the GIL), score candidates ON DEVICE, finalize ---------- #
        from concurrent.futures import ThreadPoolExecutor

        cand_in: list[tuple[_Staged, np.ndarray, int]] = [None] * len(staged)
        for key, (idxs, packed_b, _pred_b) in det_handles.items():
            packed_np = np.asarray(packed_b)  # one transfer per group (1 bit/px)
            w_full = key[1]  # the group's padded width (packed is W/8 wide)
            for k, i in enumerate(idxs):
                cand_in[i] = (staged[i], packed_np[k], w_full)

        def _cands(args):
            st, packed_np, w_full = args
            mask = unpack_mask(packed_np, w_full)[: st.rh, : st.rw]
            return det_candidates(mask, cfg.det)

        if len(staged) > 1:
            with ThreadPoolExecutor(max_workers=min(8, len(staged))) as pool:
                cands = list(pool.map(_cands, cand_in))
        else:
            cands = [_cands(a) for a in cand_in]

        # device scoring: one call per det group over all its candidates
        score_rect = np.array(
            [[0, 0], [64, 0], [64, 16], [0, 16]], np.float64
        )
        all_scores: list[np.ndarray | None] = [None] * len(staged)
        for key, (idxs, _packed_b, pred_b) in det_handles.items():
            rows, homogs, owners = [], [], []
            for k, i in enumerate(idxs):
                for quad in cands[i]:
                    c = perspective_coeffs(score_rect, quad)
                    homogs.append(
                        np.array([[c[0], c[1], c[2]], [c[3], c[4], c[5]],
                                  [c[6], c[7], 1.0]], np.float32)
                    )
                    rows.append(k)
                    owners.append(i)
            if not rows:
                for i in idxs:
                    all_scores[i] = np.zeros((0,), np.float32)
                continue
            m = len(rows)
            mb = _next_bucket(m, (16, 64, 256, 1024))
            if mb > m:
                homogs += [np.eye(3, dtype=np.float32)] * (mb - m)
                rows += [0] * (mb - m)
            sc = np.asarray(
                self._score_fwd(
                    pred_b,
                    jnp.asarray(np.asarray(rows, np.int32)),
                    jnp.asarray(np.stack(homogs)),
                )
            )[:m]
            for i in idxs:
                own = [j for j, o in enumerate(owners) if o == i]
                all_scores[i] = sc[own]

        results = [
            det_finalize(
                cands[i], all_scores[i], cfg.det, st.rh, st.rw, st.ah, st.aw
            )
            for i, st in enumerate(staged)
        ]

        all_crops: list[_CropTask] = []
        for i, st in enumerate(staged):
            boxes, scores = results[i]
            st.boxes, st.scores = boxes, scores
            sx, sy = st.rw / st.aw, st.rh / st.ah
            for j, b in enumerate(boxes):
                pb = PointBox(b)
                w_crop = max(int(max(pb.width_brc(), pb.width_tlc())), 1)
                h_crop = max(int(max(pb.height_brc(), pb.height_tlc())), 1)
                quad = b * np.asarray([sx, sy], np.float32)
                if h_crop / w_crop >= 1.5:
                    # rot90-CCW crop == sampling with corners [tr, br, bl, tl]
                    # (image_helper.rs:245-247)
                    quad = quad[[1, 2, 3, 0]]
                    h_crop, w_crop = w_crop, h_crop
                all_crops.append(_CropTask(i, j, quad, h_crop, w_crop))
            st.crops = [c for c in all_crops if c.img_i == i]

        # ---- phase C: cls over all crops (bucketed, cross-image) ------- #
        if cfg.use_cls and all_crops:
            self._run_cls(staged, all_crops)
        # ---- phase D/E: rec over all crops (width buckets) ------------- #
        rec_texts: dict[tuple[int, int], RecText] = {}
        if all_crops:
            rec_texts = self._run_rec(staged, all_crops)

        # ---- assemble -------------------------------------------------- #
        out: list[OcrResult] = []
        for i, st in enumerate(staged):
            boxes_ori = scale_and_clip(
                st.boxes, st.aw, st.ah, st.ori_w, st.ori_h
            )
            det_res = DetResult(
                [
                    DetBox(PointBox(b), float(s))
                    for b, s in zip(boxes_ori, st.scores)
                ]
            )
            cls_res = ClsResult(
                [getattr(c, "cls_label", ClsLabel()) for c in st.crops]
                if cfg.use_cls
                else []
            )
            rec_res = RecResult(
                [
                    rec_texts.get((i, c.box_i), RecText())
                    for c in st.crops
                ]
            )
            out.append(OcrResult(det_res, cls_res, rec_res))
        return out

    # ------------------------------------------------------------------ #
    def _homog(self, task: _CropTask, content_w: int, content_h: int,
               rot180: bool = False) -> np.ndarray:
        rect = np.array(
            [[0, 0], [content_w, 0], [content_w, content_h], [0, content_h]],
            np.float64,
        )
        if rot180:
            # compose with a 180-degree rotation of the content region
            rect = rect[[2, 3, 0, 1]]
        c = perspective_coeffs(rect, task.quad_det)
        return np.array(
            [[c[0], c[1], c[2]], [c[3], c[4], c[5]], [c[6], c[7], 1.0]],
            np.float32,
        )

    def _run_cls(self, staged: list[_Staged], all_crops: list[_CropTask]) -> None:
        cfg = self.cfg
        _, ch, cw = cfg.cls.image_shape
        # group crops by det bucket group (the warp samples the group's
        # stacked tensor by row index -> ONE call per group)
        by_group: dict[tuple[int, int], list[_CropTask]] = {}
        for c in all_crops:
            by_group.setdefault(staged[c.img_i].group, []).append(c)
        handles = []
        for key, crops in by_group.items():
            imgs_dev, valids_dev = self._dev_groups[key]
            rows = [staged[c.img_i].row for c in crops]
            widths = [
                min(cw, int(math.ceil(ch * c.crop_w / c.crop_h))) for c in crops
            ]
            homogs = np.stack(
                [self._homog(c, w, ch) for c, w in zip(crops, widths)]
            )
            nb = _next_bucket(len(crops), cfg.buckets.cls_batch_buckets)
            if nb > len(crops):
                pad = nb - len(crops)
                homogs = np.concatenate([homogs, np.tile(np.eye(3, dtype=np.float32)[None], (pad, 1, 1))])
                widths = widths + [1] * pad
                rows = rows + [0] * pad
            probs = self._cls_fwd(
                self._params["cls"],
                imgs_dev,
                jnp.asarray(np.asarray(rows, np.int32)),
                jnp.asarray(homogs),
                jnp.asarray(np.asarray(widths, np.int32)),
                valids_dev,
            )
            handles.append((crops, probs))
        for crops, probs in handles:
            p = np.asarray(probs)[: len(crops)]
            pred = p.argmax(axis=1)
            for row, c in enumerate(crops):
                cls_idx = int(pred[row])
                score = float(p[row, cls_idx])
                label = int(cfg.cls.label[cls_idx])
                if label == 180 and score >= cfg.cls.thresh:
                    c.rotated180 = True
                c.cls_label = ClsLabel(label=label, score=score)

    def _run_rec(
        self, staged: list[_Staged], all_crops: list[_CropTask]
    ) -> dict[tuple[int, int], RecText]:
        cfg = self.cfg
        _, rh, rw_default = cfg.rec.image_shape
        # bucket by (det group, padded width): one call per combination
        groups: dict[tuple[tuple[int, int], int], list[tuple[_CropTask, int]]] = {}
        for c in all_crops:
            natural = int(math.ceil(rh * c.crop_w / c.crop_h))
            bw = _next_bucket(
                max(natural, rw_default), cfg.buckets.rec_width_buckets
            )
            key = staged[c.img_i].group
            groups.setdefault((key, bw), []).append((c, min(natural, bw)))
        handles = []
        for (key, bw), items in sorted(groups.items()):
            imgs_dev, valids_dev = self._dev_groups[key]
            crops = [c for c, _ in items]
            rows = [staged[c.img_i].row for c in crops]
            widths = [w for _, w in items]
            homogs = np.stack(
                [
                    self._homog(c, w, rh, rot180=c.rotated180)
                    for (c, w) in items
                ]
            )
            nb = _next_bucket(len(crops), cfg.buckets.rec_batch_buckets)
            if nb > len(crops):
                pad = nb - len(crops)
                homogs = np.concatenate([homogs, np.tile(np.eye(3, dtype=np.float32)[None], (pad, 1, 1))])
                widths = widths + [1] * pad
                rows = rows + [0] * pad
            idx, keep, score = self._rec_fwd(
                self._params["rec"],
                imgs_dev,
                jnp.asarray(np.asarray(rows, np.int32)),
                jnp.asarray(homogs),
                jnp.asarray(np.asarray(widths, np.int32)),
                valids_dev,
                out_w=bw,
            )
            handles.append((crops, idx, keep, score))
        out: dict[tuple[int, int], RecText] = {}
        for crops, idx, keep, score in handles:
            n = len(crops)
            texts = self.chars.decode_indices(
                np.asarray(idx)[:n], np.asarray(keep)[:n]
            )
            scores = np.asarray(score)[:n]
            for c, t, s in zip(crops, texts, scores):
                out[(c.img_i, c.box_i)] = RecText(text=t, score=float(s))
        return out
