"""Model execution engines.

The TPU slot of the reference's worker layer (worker.rs:69-98 +
ort_worker.rs): three tensor entry points with the exact reference
signatures —

    det: f32 [N, 3, H, W] -> f32 [N, 1, H, W]
    cls: f32 [N, 3, H, W] -> f32 [N, 2]
    rec: f32 [N, 3, H, W] -> f32 [N, T, C]

``JaxEngine`` jits each forward once per input shape (shapes are bucketed
by the scheduler, so the jit cache stays small) and optionally shards the
batch dim over a device mesh (data parallel — SURVEY.md §2 "Parallelism").
``FakeEngine`` provides deterministic closed-form outputs so pipeline logic
is testable without weights (the fake backend the reference lacks,
SURVEY.md §4 takeaway).
"""

from __future__ import annotations

from typing import Any, Callable, Mapping, Protocol

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import RettoEngineError

__all__ = ["Engine", "JaxEngine", "FakeEngine"]


class Engine(Protocol):
    def det(self, x: Any) -> jax.Array: ...
    def cls(self, x: Any) -> jax.Array: ...
    def rec(self, x: Any) -> jax.Array: ...


def _shard_batch(mesh, x: jax.Array) -> jax.Array:
    """Place x with its batch dim sharded over the mesh's 'data' axis."""
    from ..parallel.mesh import shard_batch

    return shard_batch(mesh, x)


class JaxEngine:
    """Jitted JAX forwards for the three stages.

    params_* are flax variables dicts ({'params': ...[, 'batch_stats': ...]}).
    When ``mesh`` is given, inputs are sharded batch-over-'data' and outputs
    come back fully replicated per shard (XLA inserts the collectives).
    """

    def __init__(
        self,
        det_model=None,
        cls_model=None,
        rec_model=None,
        det_params: Mapping | None = None,
        cls_params: Mapping | None = None,
        rec_params: Mapping | None = None,
        mesh=None,
    ):
        self.mesh = mesh
        self._fns: dict[str, Callable] = {}
        self._params: dict[str, Any] = {}
        for name, model, params in (
            ("det", det_model, det_params),
            ("cls", cls_model, cls_params),
            ("rec", rec_model, rec_params),
        ):
            if model is not None:
                if params is None:
                    raise RettoEngineError(f"{name} model given without params")
                self._fns[name] = jax.jit(model.apply)
                # params MUST live on device: host-numpy params re-upload
                # the full weight set on EVERY call (300 ms/call through
                # the 40 MB/s tunnel)
                self._params[name] = jax.device_put(params)

    def _run(self, name: str, x) -> jax.Array:
        if name not in self._fns:
            raise RettoEngineError(
                f"engine has no '{name}' model (models are optional per "
                f"stage; configure one to run this stage)"
            )
        x = jnp.asarray(x, dtype=jnp.float32)
        if self.mesh is not None:
            x = _shard_batch(self.mesh, x)
        return self._fns[name](self._params[name], x)

    def det(self, x) -> jax.Array:
        return self._run("det", x)

    def cls(self, x) -> jax.Array:
        return self._run("cls", x)

    def rec(self, x) -> jax.Array:
        return self._run("rec", x)

    def compiled_shapes(self) -> dict[str, int]:
        """Jit-cache sizes per stage (observability: recompile budget)."""
        return {k: f._cache_size() for k, f in self._fns.items()}


class FakeEngine:
    """Deterministic engine for pipeline tests.

    * det: prob map = mean input channel mapped from [-1, 1] to [0, 1]
      (so a bright box on black background detects as a region)
    * cls: constant (p0, p1) per call, configurable
    * rec: emits a fixed index sequence per row, configurable
    """

    def __init__(
        self,
        cls_probs: tuple[float, float] = (0.95, 0.05),
        rec_indices: tuple[int, ...] = (1, 1, 0, 2),
        rec_classes: int = 96,
        det_fn: Callable[[np.ndarray], np.ndarray] | None = None,
    ):
        self.cls_probs = cls_probs
        self.rec_indices = rec_indices
        self.rec_classes = rec_classes
        self.det_fn = det_fn
        self.calls: list[tuple[str, tuple]] = []

    def det(self, x) -> jax.Array:
        x = np.asarray(x)
        self.calls.append(("det", x.shape))
        if self.det_fn is not None:
            return jnp.asarray(self.det_fn(x))
        prob = (x.mean(axis=1, keepdims=True) + 1.0) / 2.0
        return jnp.asarray(prob.astype(np.float32))

    def cls(self, x) -> jax.Array:
        x = np.asarray(x)
        self.calls.append(("cls", x.shape))
        return jnp.asarray(
            np.tile(np.asarray(self.cls_probs, np.float32), (x.shape[0], 1))
        )

    def rec(self, x) -> jax.Array:
        x = np.asarray(x)
        self.calls.append(("rec", x.shape))
        n, _, _, w = x.shape
        t = max(w // 8, len(self.rec_indices))
        probs = np.full((n, t, self.rec_classes), 1e-6, np.float32)
        probs[:, :, 0] = 0.9
        for j, idx in enumerate(self.rec_indices):
            probs[:, j, 0] = 1e-6
            probs[:, j, idx] = 0.9
        return jnp.asarray(probs)
