"""RettoSession — the public pipeline API.

Mirror of the reference's session layer (session.rs:58-143): decode ->
clamp-resize -> det -> crop -> cls (rotate) -> rec, with per-stage streaming
callbacks, plus TPU extensions the reference lacks: ``run_many`` batch API,
per-image error isolation, and engine/device configuration.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterable, Sequence

import numpy as np

from ..config import SessionConfig
from ..errors import RettoError
from ..geometry import PointBox, scale_and_clip
from ..image.io import ImageHelper, decode_image
from ..ops.charset import CharacterDict, ascii_charset
from ..results import (
    ClsResult,
    DetBox,
    DetResult,
    OcrResult,
    RecResult,
    StageResult,
)
from .engine import Engine, JaxEngine
from .stages import ClsStage, DetStage, RecStage

logger = logging.getLogger("retto_tpu")

__all__ = ["RettoSession"]


class RettoSession:
    """Three-stage OCR session (ref: session.rs:58-143).

    Construction options:
    * ``engine=`` — bring your own Engine (incl. FakeEngine for tests);
    * ``weights={"det": path, "cls": path, "rec": path}`` — load npz pytrees;
    * neither — random-init weights (smoke/dev only; logged loudly).
    """

    def __init__(
        self,
        config: SessionConfig | None = None,
        engine: Engine | None = None,
        preset: str = "mobile",
        charset: CharacterDict | Sequence[str] | None = None,
        weights: dict[str, str] | None = None,
        mesh=None,
    ):
        self.config = config or SessionConfig()
        self.chars = self._resolve_charset(charset)
        self._models: dict[str, Any] | None = None
        self._params: dict[str, Any] | None = None
        self._device_pipeline = None
        self._mesh = mesh
        self.engine = engine or self._build_engine(preset, weights, mesh)
        cfg = self.config
        self._det = DetStage(cfg.det, cfg.buckets)
        self._cls = ClsStage(cfg.cls, cfg.buckets, cfg.mode)
        self._rec = RecStage(cfg.rec, cfg.buckets, cfg.mode, self.chars)
        from ..utils.metrics import PipelineMetrics

        self.metrics = PipelineMetrics()
        self._cls.metrics = self.metrics
        self._rec.metrics = self.metrics

    def device_pipeline(self):
        """The fused device-resident fast path (PERFORMANCE north star;
        see pipeline.device_pipeline).  Works with session-built flax
        models or an ONNX-backed engine (the reference's own PP-OCRv4
        weights fuse into the device programs); a FakeEngine or other
        opaque engine cannot be fused."""
        if self._device_pipeline is None:
            models, params = self._models, self._params
            if not models and hasattr(self.engine, "modules"):
                mods = self.engine.modules()
                if all(k in mods for k in ("det", "cls", "rec")):
                    models = mods
                    params = self.engine.params()
            if not models:
                from ..errors import RettoEngineError

                raise RettoEngineError(
                    "device_pipeline requires fusable models: construct "
                    "RettoSession without engine=, or with an OnnxEngine "
                    "holding det+cls+rec"
                )
            from .device_pipeline import DevicePipeline

            self._device_pipeline = DevicePipeline(
                models["det"],
                models["cls"],
                models["rec"],
                params,
                self.config,
                self.chars,
                mesh=self._mesh,
                metrics=self.metrics,
            )
        return self._device_pipeline

    def close(self) -> None:
        """Release host-side resources (the fused pipeline's thread pools).
        Idempotent; safe when no device pipeline was ever built."""
        if self._device_pipeline is not None:
            self._device_pipeline.close()
            self._device_pipeline = None

    def __enter__(self) -> "RettoSession":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------------ #
    def _resolve_charset(self, charset) -> CharacterDict:
        if isinstance(charset, CharacterDict):
            return charset
        if charset is not None:
            return CharacterDict(list(charset))
        rec_cfg = self.config.rec
        # session.rs:65-66: dict loaded at session init, ignored tokens [0]
        if rec_cfg.character_dict_path:
            return CharacterDict.from_file(rec_cfg.character_dict_path)
        if rec_cfg.characters:
            return CharacterDict(list(rec_cfg.characters))
        return CharacterDict(ascii_charset())

    def _build_engine(self, preset: str, weights: dict[str, str] | None, mesh):
        import jax.numpy as jnp

        from ..models import build_cls, build_det, build_rec
        from ..weights import init_random_params, load_params_meta

        dtype = self.config.engine.compute_dtype
        params: dict[str, Any] = {}
        overrides: dict[str, dict[str, Any]] = {}
        if weights:
            for k, v in weights.items():
                params[k], meta = load_params_meta(v)
                if meta:
                    # checkpoint self-description wins over the named
                    # preset's current defaults: architectures evolve,
                    # saved weights don't (store.py::save_params meta).
                    # JSON lists -> tuples: module fields must stay
                    # hashable (presets use tuples for widths/dims)
                    overrides[k] = {
                        kk: tuple(vv) if isinstance(vv, list) else vv
                        for kk, vv in meta.get("overrides", {}).items()
                    }
        # a self-described checkpoint REPLACES the preset kwargs (the
        # trainers store the full arch kwargs): merging over the named
        # preset leaks fields the checkpoint's era didn't have (a tiny-v1
        # det checkpoint must not inherit mobile's backbone="tpu_v2")
        def pick(k):
            if overrides.get(k):  # non-empty self-description only
                return "bare", overrides[k]
            return preset, {}

        p, kw = pick("det")
        det_m = build_det(p, compute_dtype=dtype, **kw)
        p, kw = pick("cls")
        cls_m = build_cls(p, compute_dtype=dtype, **kw)
        p, rec_kw = pick("rec")
        rec_kw = dict(rec_kw)
        rec_kw.pop("num_classes", None)  # the charset governs the head
        rec_m = build_rec(
            p, num_classes=self.chars.num_classes, compute_dtype=dtype,
            **rec_kw,
        )
        if not weights:
            logger.warning(
                "RettoSession: no weights given — using RANDOM weights "
                "(pipeline will run but recognize nothing; pass weights= "
                "or engine=)"
            )
            params = {
                "det": init_random_params(det_m, jnp.zeros((1, 3, 64, 64))),
                "cls": init_random_params(cls_m, jnp.zeros((1, 3, *self.config.cls.image_shape[1:]))),
                "rec": init_random_params(rec_m, jnp.zeros((1, 3, *self.config.rec.image_shape[1:]))),
            }
        self._models = {"det": det_m, "cls": cls_m, "rec": rec_m}
        self._params = params
        return JaxEngine(
            det_model=det_m,
            cls_model=cls_m,
            rec_model=rec_m,
            det_params=params["det"],
            cls_params=params["cls"],
            rec_params=params["rec"],
            mesh=mesh,
        )

    # ------------------------------------------------------------------ #
    def _process_pipeline(
        self, data: bytes | np.ndarray, callback: Callable[[StageResult], None]
    ) -> None:
        """The forward pass (ref: session.rs:75-106)."""
        m = self.metrics
        image = ImageHelper(decode_image(data))
        ori_h, ori_w = image.size()
        image.resize_both(self.config.max_side_len, self.config.min_side_len)
        after_h, after_w = image.size()

        with m.measure_stage("det"):
            boxes, scores = self._det(image, self.engine)
        m.crops += len(boxes)

        # crops are taken in the RESIZED image coords (session.rs:88-92);
        # the reported boxes are rescaled to original coords after
        # (session.rs:93-97)
        crops = [
            ImageHelper(image.get_crop_img(PointBox(b))) for b in boxes
        ]
        boxes_ori = scale_and_clip(boxes, after_w, after_h, ori_w, ori_h)
        det_result = DetResult(
            [
                DetBox(PointBox(b), float(s))
                for b, s in zip(boxes_ori, scores)
            ]
        )
        callback(StageResult(stage="det", result=det_result))

        if self.config.use_cls:
            with m.measure_stage("cls"):
                labels = self._cls(crops, self.engine)
        else:
            labels = []
        callback(StageResult(stage="cls", result=ClsResult(labels)))

        with m.measure_stage("rec"):
            texts = self._rec(crops, self.engine)
        callback(StageResult(stage="rec", result=RecResult(texts)))

    # ------------------------------------------------------------------ #
    def run(self, data: bytes | np.ndarray) -> OcrResult:
        """One image -> full three-stage result (ref: session.rs:108-131)."""
        slots: dict[str, Any] = {}

        def cb(stage: StageResult) -> None:
            logger.debug("%s result: %s", stage.stage, stage.result)
            slots[stage.stage] = stage.result

        with self.metrics.measure_image():
            self._process_pipeline(data, cb)
        return OcrResult(
            det_result=slots["det"],
            cls_result=slots["cls"],
            rec_result=slots["rec"],
        )

    def run_stream(
        self, data: bytes | np.ndarray, callback: Callable[[StageResult], None]
    ) -> None:
        """Stage-by-stage streaming (ref: session.rs:133-143; the mpsc
        channel becomes a plain callback)."""
        self._process_pipeline(data, callback)

    def run_many(
        self,
        inputs: Iterable[bytes | np.ndarray],
        *,
        raise_on_error: bool = False,
    ) -> list[OcrResult | RettoError]:
        """Batch API (reference is strictly one image per call —
        SURVEY.md §2 row 14).  Per-image errors are isolated: a bad decode
        yields the exception object in that slot instead of killing the
        batch (SURVEY.md §5 failure-detection plan)."""
        out: list[OcrResult | RettoError] = []
        for data in inputs:
            try:
                out.append(self.run(data))
            except RettoError as e:
                if raise_on_error:
                    raise
                logger.warning("run_many: image failed: %s", e)
                out.append(e)
        return out
