"""Configuration tree.

Dataclass mirror of the reference's config structs, with identical field
names (pythonized) and identical defaults — bit-compat depends on these
numbers (see SURVEY.md §5 "Config / flag system"):

* ``DetConfig``     — DetProcessorConfig  (det_processor.rs:44-93)
* ``ClsConfig``     — ClsProcessorConfig  (cls_processor.rs:14-36)
* ``RecConfig``     — RecProcessorConfig  (rec_processor.rs:100-136)
* ``SessionConfig`` — RettoSessionConfig  (session.rs:17-40)

TPU-specific extensions are grouped under ``EngineConfig`` / ``BucketConfig``
(no reference counterpart: the reference runs ONNX sessions with dynamic
shapes; XLA wants a small static-shape set).
"""

from __future__ import annotations

import dataclasses
import enum
import json
from dataclasses import dataclass, field
from typing import Any


class LimitType(str, enum.Enum):
    """Input image side-length restriction type (det_processor.rs:31-39)."""

    MIN = "min"
    MAX = "max"


class ScoreMode(str, enum.Enum):
    """DB detection result scoring method (det_processor.rs:20-29).
    The reference only implements FAST (Slow is declared, never used);
    here SLOW is implemented with PaddleOCR's semantics — mean probability
    over the ORIGINAL contour polygon instead of its min-area rect
    (ops/raster.py::box_score_slow).  SLOW runs on the host NumPy path;
    the C++ pass and the device pipeline's pooled scoring are FAST."""

    FAST = "fast"
    SLOW = "slow"


@dataclass
class DetConfig:
    """DB-algorithm detection stage config (det_processor.rs:44-93)."""

    # Preprocess
    limit_side_len: int = 736
    limit_type: LimitType = LimitType.MIN
    mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    std: tuple[float, float, float] = (0.5, 0.5, 0.5)
    scale: float = 1.0 / 255.0
    # Postprocess
    thresh: float = 0.3  # reference field spelled "threch"
    box_thresh: float = 0.5
    max_candidates: int = 1000
    unclip_ratio: float = 1.6
    use_dilation: bool = True
    score_mode: ScoreMode = ScoreMode.FAST
    min_mini_box_size: int = 3
    dilation_kernel: tuple[int, int] | None = (2, 2)


@dataclass
class ClsConfig:
    """Angle classifier stage config (cls_processor.rs:14-36)."""

    image_shape: tuple[int, int, int] = (3, 48, 192)  # CHW
    batch_num: int = 6
    thresh: float = 0.9
    label: tuple[int, ...] = (0, 180)
    # Orientation-symmetrized inference: score both the crop and its 180°
    # rotation and average the complementary probabilities,
    # p_180(x) <- (p_180(x) + p_0(rot180(x))) / 2.  For content whose 180°
    # rotation is itself plausible text (digit runs like '1061'/'6899',
    # 'open good'), a single forward can be confidently wrong and the
    # pipeline then rotates an upright crop into garbage; the symmetrized
    # score converges to 0.5 on truly ambiguous content so the `thresh`
    # rotation gate (cls_processor.rs:163-166) never fires falsely.  This
    # is a property of OUR trained classifier head, not a pipeline-semantics
    # deviation: the chunking, thresholds, and rotation rule are unchanged.
    symmetrize: bool = True


def rot180_label_perm(labels: "tuple[int, ...]") -> "tuple[int, ...] | None":
    """Index permutation of the cls label set under a 180° input rotation:
    perm[i] = index of label (labels[i]+180) % 360.  Returns None when the
    label set is not closed under rotation (symmetrized inference then
    degrades to the plain single-forward path)."""
    try:
        return tuple(labels.index((l + 180) % 360) for l in labels)
    except ValueError:
        return None


@dataclass
class RecConfig:
    """Text recognition stage config (rec_processor.rs:100-136)."""

    # character dict: path to a text file (one char per line) or an inline
    # list of characters; "blank" is prepended and " " appended at load time
    # (rec_processor.rs:37-45).
    character_dict_path: str | None = None
    characters: tuple[str, ...] | None = None
    image_shape: tuple[int, int, int] = (3, 48, 320)  # CHW
    batch_num: int = 6
    # PERFORMANCE-only: force CTC timesteps that fall entirely inside the
    # right zero-padding (beyond the crop's content width) to blank before
    # decode.  The pad region is synthetic — no text can exist there — but a
    # marginal non-blank argmax deep in it appends a junk char to an
    # otherwise exact decode (observed tail mode: 'how' -> 'howI' with
    # 'I'@0.82 at t=38/40 in pure pad).  COMPAT ignores this flag and
    # decodes the full padded width like the reference
    # (rec_processor.rs:56-75).
    mask_pad_timesteps: bool = True


class PipelineMode(str, enum.Enum):
    """COMPAT reproduces the reference's observable batching semantics
    (sorted chunks of ``batch_num``, global max-ratio width —
    rec_processor.rs:224-247). PERFORMANCE uses width-bucketed dense batching
    (static shapes for XLA; SURVEY.md §2 row 11 "north star")."""

    COMPAT = "compat"
    PERFORMANCE = "performance"


@dataclass
class BucketConfig:
    """Static-shape bucketing for XLA (TPU extension; no reference analog).

    Det inputs are padded up to the next step of ``det_pad_to`` in each
    spatial dim (DBNet is fully convolutional; the prob map is sliced back).
    Rec crop widths are padded up to the nearest of ``rec_width_buckets``.
    """

    det_pad_to: int = 256
    det_max_side: int = 2048
    rec_width_buckets: tuple[int, ...] = (192, 320, 512, 768, 1024, 1536, 2048)
    cls_batch_buckets: tuple[int, ...] = (8, 16, 32, 64)
    rec_batch_buckets: tuple[int, ...] = (8, 16, 32, 64)
    # DevicePipeline extensions (pipeline/device_pipeline.py):
    # batch-dim buckets for the det forward
    det_batch_buckets: tuple[int, ...] = (1, 2, 4, 8, 16)
    # pad step for the uploaded (session-resolution) image planes
    upload_pad_to: int = 64
    # max images per upload/det chunk (chunks pipeline upload vs compute;
    # 4 measured best on the tunneled chip — deep enough overlap without
    # per-dispatch round-trip overhead dominating, see PERF.md)
    det_chunk: int = 4


@dataclass
class EngineConfig:
    """JAX engine knobs (TPU extension)."""

    # compute dtype for conv/matmul-heavy stages; params stay f32
    compute_dtype: str = "bfloat16"
    # donate input buffers to jitted calls
    donate_inputs: bool = True
    # run det/cls/rec under one device mesh, sharding the batch dim
    data_parallel: bool = True
    # host->device image transfer format for DevicePipeline:
    # "rgb" (3 B/px, byte-exact) or "yuv420" (1.5 B/px; JPEG-grade chroma
    # subsampling — see image/yuv.py)
    transfer_format: str = "rgb"


@dataclass
class SessionConfig:
    """Top-level pipeline config (session.rs:17-40)."""

    max_side_len: int = 2000
    min_side_len: int = 30
    det: DetConfig = field(default_factory=DetConfig)
    cls: ClsConfig = field(default_factory=ClsConfig)
    rec: RecConfig = field(default_factory=RecConfig)
    use_cls: bool = True
    mode: PipelineMode = PipelineMode.PERFORMANCE
    buckets: BucketConfig = field(default_factory=BucketConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)

    # ---- serde (the reference derives Serialize/Deserialize on configs) ----
    def to_dict(self) -> dict[str, Any]:
        return _asdict(self)

    def to_json(self, **kw: Any) -> str:
        return json.dumps(self.to_dict(), **kw)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "SessionConfig":
        return _fromdict(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "SessionConfig":
        return cls.from_dict(json.loads(s))


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {
            f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)
        }
    if isinstance(obj, enum.Enum):
        return obj.value
    if isinstance(obj, (list, tuple)):
        return [_asdict(v) for v in obj]
    return obj


def _fromdict(cls: type, d: Any) -> Any:
    if dataclasses.is_dataclass(cls) and isinstance(d, dict):
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            ft = f.type if isinstance(f.type, type) else None
            # resolve dataclass / enum field types declared as strings
            kwargs[f.name] = _coerce_field(f, v)
        return cls(**kwargs)
    return d


_FIELD_TYPES: dict[str, type] = {}


def _coerce_field(f: dataclasses.Field, v: Any) -> Any:
    name_map: dict[str, type] = {
        "det": DetConfig,
        "cls": ClsConfig,
        "rec": RecConfig,
        "buckets": BucketConfig,
        "engine": EngineConfig,
        "limit_type": LimitType,
        "score_mode": ScoreMode,
        "mode": PipelineMode,
    }
    t = name_map.get(f.name)
    if t is None:
        if isinstance(v, list):
            return tuple(v)
        return v
    if issubclass(t, enum.Enum):
        return t(v)
    return _fromdict(t, v)
