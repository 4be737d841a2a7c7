"""Mesh-sharded training step.

SPMD over a ('data', 'model') jax.sharding.Mesh: the batch dim shards over
'data' (data parallel — the TPU analog of running N reference processes,
SURVEY.md §2 "Parallelism"), and the large vocab matmuls of the rec head
(C = 6625 classes) shard over 'model' (tensor parallel).  XLA inserts the
psum/all-gather collectives over ICI from the sharding annotations; there
is no hand-written communication (scaling-book recipe).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_mesh  # re-export (canonical home)

__all__ = ["TrainState", "make_mesh", "make_train_step", "param_shardings"]


@dataclass
class TrainState:
    """Minimal train state pytree (params + optimizer + BN stats + step)."""

    params: Any
    opt_state: Any
    batch_stats: Any
    step: jax.Array

    def tree_flatten(self):  # pragma: no cover - jax pytree protocol
        return (self.params, self.opt_state, self.batch_stats, self.step), None

    @classmethod
    def tree_unflatten(cls, _, children):  # pragma: no cover
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def param_shardings(params: Any, mesh: Mesh, rules: Mapping[str, P] | None = None):
    """Sharding tree for params: replicated by default; params whose path
    matches a rule substring get its PartitionSpec.  Default rule shards the
    final vocab projection (rec CTC head, [D, C]) over 'model'."""
    if rules is None:
        rules = {"head": P(None, "model")}

    def assign(path, leaf):
        pathstr = "/".join(str(getattr(p, "key", p)) for p in path)
        for frag, spec in rules.items():
            if frag in pathstr and leaf.ndim >= 2:
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def make_train_step(
    model_or_apply,
    loss_fn: Callable[..., jax.Array],
    tx: optax.GradientTransformation,
    mesh: Mesh | None = None,
    has_batch_stats: bool = True,
):
    """Build a jitted (optionally mesh-sharded) train step.

    ``model_or_apply``: a flax module or a bare apply function with the
    signature ``apply(variables, x, train=..., mutable=...)`` (pass a
    partial to add kwargs like return_logits).  loss_fn(output, *batch_rest)
    -> scalar.  The step takes (state, x, *batch_rest); the batch input is
    sharded over 'data' when a mesh is given.
    """
    apply = getattr(model_or_apply, "apply", model_or_apply)

    def step(state: TrainState, x, *rest):
        def compute(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, updates = apply(
                    variables, x, train=True, mutable=["batch_stats"]
                )
                new_stats = updates["batch_stats"]
            else:
                out = apply(variables, x, train=True)
                new_stats = state.batch_stats
            loss = loss_fn(out, *rest)
            return loss, new_stats

        (loss, new_stats), grads = jax.value_and_grad(compute, has_aux=True)(
            state.params
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_opt, new_stats, state.step + 1),
            loss,
        )

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    data_spec = NamedSharding(mesh, P("data"))

    def sharded_step(state, x, *rest):
        x = jax.lax.with_sharding_constraint(x, data_spec)
        return step(state, x, *rest)

    return jax.jit(sharded_step, donate_argnums=(0,))


def init_train_state(
    model, tx: optax.GradientTransformation, sample_input, seed: int = 0,
    mesh: Mesh | None = None, rules: Mapping[str, P] | None = None,
) -> TrainState:
    """Jitted init; when a mesh is given, params are placed per
    ``param_shardings`` (replicated except rule-matched TP params)."""
    rng = jax.random.PRNGKey(seed)
    variables = jax.jit(partial(model.init, train=True))(rng, jnp.asarray(sample_input))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if mesh is not None:
        shardings = param_shardings(params, mesh, rules)
        params = jax.tree.map(jax.device_put, params, shardings)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, batch_stats, jnp.zeros((), jnp.int32))
