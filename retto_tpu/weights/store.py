"""Weight persistence and initialization.

The reference treats models as immutable ONNX artifacts fetched from HF and
cached (build.rs:7-65, hf_hub_helper.rs:5-19).  Here the artifact is a JAX
param pytree stored as a flat .npz (portable, no pickle); the ONNX->pytree
conversion path lives in retto_tpu.weights.onnx_bridge (separate milestone)
and the HF fetch helper is gated on network availability.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import jax
import numpy as np

from ..errors import ModelNotFoundError, RettoWeightsError

__all__ = [
    "save_params",
    "load_params",
    "load_params_meta",
    "init_random_params",
]

_SEP = "::"
_META_KEY = "__meta__"


def _flatten(tree: Mapping[str, Any], prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Mapping[str, np.ndarray]) -> dict[str, Any]:
    tree: dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(
    path: str | Path,
    variables: Mapping[str, Any],
    meta: Mapping[str, Any] | None = None,
) -> None:
    """Save a flax variables dict ({'params': ..., 'batch_stats': ...}) to
    .npz with flat ``::``-joined keys.

    ``meta`` (optional) is a JSON-serializable dict stored alongside the
    arrays — the checkpoint's self-description.  The convention for model
    checkpoints is ``{"preset": ..., "overrides": {<build_* kwargs>}}`` so
    inference can reconstruct the exact architecture even after the named
    preset's defaults change (the reference's analog is the ONNX file
    carrying its own graph; a bare param pytree does not)."""
    import json

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = _flatten(variables)
    if meta is not None:
        flat[_META_KEY] = np.asarray(json.dumps(dict(meta)))
    np.savez(path, **flat)


def load_params(path: str | Path) -> dict[str, Any]:
    return load_params_meta(path)[0]


def load_params_meta(
    path: str | Path,
) -> tuple[dict[str, Any], dict[str, Any] | None]:
    """Like load_params but also returns the checkpoint's self-description
    (None for checkpoints written without one)."""
    import json

    path = Path(path)
    if not path.exists():
        raise ModelNotFoundError(str(path))
    try:
        with np.load(path, allow_pickle=False) as z:
            meta = None
            if _META_KEY in z.files:
                meta = json.loads(str(z[_META_KEY][()]))
            tree = _unflatten(
                {k: z[k] for k in z.files if k != _META_KEY}
            )
            return tree, meta
    except (OSError, ValueError) as e:
        raise RettoWeightsError(f"failed to load weights from {path}: {e}") from e


def init_random_params(model, sample_input, seed: int = 0):
    """Random init (for tests / untrained pipelines).  Jitted: per-op eager
    init costs seconds per op on CPU."""
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(seed)
    x = jnp.asarray(sample_input)
    return jax.jit(model.init)(rng, x)
