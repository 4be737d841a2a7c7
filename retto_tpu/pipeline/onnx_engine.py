"""OnnxEngine — run the reference's actual ONNX artifacts on TPU.

Direct analog of the reference's only worker implementation,
``RettoOrtWorker`` (ort_worker.rs:120-221): three sessions built from
det/cls/rec model sources.  Here each ``.onnx`` graph is translated to a
JAX function (weights.onnx_bridge) and jitted by XLA instead of delegated
to ONNX Runtime — so a user can point the session at the PP-OCRv4 files
from ``pk5ls20/PaddleModel`` (build.rs:7-12) and get the same models
running TPU-native.

Model sources mirror RettoWorkerModelSource (worker.rs:16-57): a path, a
blob (bytes), or a HuggingFace repo spec (resolved via huggingface_hub
when the environment has network access).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax

from ..errors import ModelNotFoundError
from ..weights.onnx_bridge import build_fn

__all__ = ["OnnxEngine", "resolve_model_source"]


class _OnnxModule:
    """Flax-like ``.apply(params, x)`` adapter over a translated ONNX
    graph, so DevicePipeline can fuse the reference's actual PP-OCRv4
    weights into its device programs (ort_worker.rs:188-221 contract:
    NCHW f32 in; det [N,1,H,W], cls [N,2], rec [N,T,C] out)."""

    def __init__(self, fn):
        self._fn = fn

    def apply(self, params, x, **_):
        out = self._fn(params, x)
        return out[0] if isinstance(out, (tuple, list)) else out


def resolve_model_source(source: Any) -> bytes:
    """Path / bytes / {"repo": ..., "file": ...} -> model bytes
    (worker.rs:30-56 ``resolve``)."""
    if isinstance(source, (bytes, bytearray)):
        if not source:
            raise ModelNotFoundError("Empty model blob!")
        return bytes(source)
    if isinstance(source, dict):
        try:
            from huggingface_hub import hf_hub_download
        except ImportError as e:  # pragma: no cover
            raise ModelNotFoundError(
                f"huggingface_hub unavailable for {source}"
            ) from e
        path = hf_hub_download(source["repo"], source["file"])
        return Path(path).read_bytes()
    p = Path(source)
    if not p.exists():
        raise ModelNotFoundError(str(p))
    return p.read_bytes()


class OnnxEngine:
    """Engine protocol implementation backed by translated ONNX graphs.

    det/cls/rec accept NCHW float32 like the reference worker
    (worker.rs:69-73); each graph jits once per input shape.
    """

    def __init__(self, det: Any = None, cls: Any = None, rec: Any = None):
        self._fns: dict[str, tuple[Any, dict]] = {}
        self._raw: dict[str, Any] = {}
        for name, src in (("det", det), ("cls", cls), ("rec", rec)):
            if src is None:
                continue
            fn, params = build_fn(resolve_model_source(src))
            self._raw[name] = fn
            self._fns[name] = (jax.jit(fn), jax.device_put(params))

    # ---- DevicePipeline integration ---------------------------------- #
    def modules(self) -> dict[str, _OnnxModule]:
        """Flax-like modules for the fused DevicePipeline (session
        .device_pipeline() uses these when the engine is ONNX-backed)."""
        return {name: _OnnxModule(fn) for name, fn in self._raw.items()}

    def params(self) -> dict[str, Any]:
        return {name: p for name, (_, p) in self._fns.items()}

    def _run(self, name: str, x):
        from ..errors import RettoEngineError

        if name not in self._fns:
            raise RettoEngineError(f"OnnxEngine has no '{name}' model")
        import jax.numpy as jnp

        fn, params = self._fns[name]
        out = fn(params, jnp.asarray(x, jnp.float32))
        return out[0] if isinstance(out, tuple) else out

    def det(self, x):
        return self._run("det", x)

    def cls(self, x):
        return self._run("cls", x)

    def rec(self, x):
        return self._run("rec", x)
