"""retto-tpu: a TPU-native OCR framework (PP-OCR pipeline in JAX/XLA/Pallas).

Rebuild of the capabilities of NekoImageLand/retto (Rust + ONNX Runtime)
as a TPU-first framework: jitted JAX forward passes for DBNet detection,
angle classification and SVTR/CTC recognition; on-device pre/postprocess;
width-bucketed dense batching; data-parallel sharding over a device mesh.

Public API (the "prelude" — ref: retto-core/src/lib.rs:14-19):

    from retto_tpu import RettoSession, SessionConfig
    session = RettoSession(SessionConfig())
    result = session.run(image_bytes)
"""

from .config import (
    BucketConfig,
    ClsConfig,
    DetConfig,
    EngineConfig,
    LimitType,
    PipelineMode,
    RecConfig,
    ScoreMode,
    SessionConfig,
)
from .errors import (
    ModelNotFoundError,
    RettoConfigError,
    RettoEngineError,
    RettoError,
    RettoImageError,
    RettoIOError,
    RettoShapeError,
    RettoWeightsError,
)
from .geometry import Point, PointBox
from .results import (
    ClsLabel,
    ClsResult,
    DetBox,
    DetResult,
    OcrResult,
    RecResult,
    RecText,
    StageResult,
)

__version__ = "0.1.0"


def __getattr__(name: str):
    # Lazy import of the session (pulls in jax); keeps light-weight uses of
    # geometry/config import-cheap.
    if name in ("RettoSession", "Pipeline"):
        from .pipeline.session import RettoSession

        return RettoSession
    raise AttributeError(name)


__all__ = [
    "RettoSession",
    "SessionConfig",
    "DetConfig",
    "ClsConfig",
    "RecConfig",
    "BucketConfig",
    "EngineConfig",
    "LimitType",
    "ScoreMode",
    "PipelineMode",
    "Point",
    "PointBox",
    "DetBox",
    "DetResult",
    "ClsLabel",
    "ClsResult",
    "RecText",
    "RecResult",
    "OcrResult",
    "StageResult",
    "RettoError",
    "RettoIOError",
    "RettoImageError",
    "RettoShapeError",
    "RettoEngineError",
    "RettoWeightsError",
    "ModelNotFoundError",
    "RettoConfigError",
]
