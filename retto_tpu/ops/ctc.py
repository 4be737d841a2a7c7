"""CTC greedy decode — on device.

TPU-native replacement for the reference's host-side decode loop
(rec_processor.rs:48-97): per row, argmax over classes, drop blanks
(index 0), collapse adjacent repeats, drop ignored tokens, score = mean
probability of the kept steps.

The whole decode is vectorized: [N, T, C] probs -> (indices [N, T] i32,
keep-mask [N, T] bool, scores [N] f32).  Only the small index/mask arrays
leave the device; the host's remaining job is the dict lookup + string join
(retto_tpu.ops.charset.CharacterDict.decode_indices).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["ctc_greedy_decode"]


@partial(jax.jit, static_argnames=("remove_duplicate",))
def ctc_greedy_decode(
    probs: jax.Array,
    remove_duplicate: bool = True,
    valid_t: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """probs: [N, T, C] post-softmax.  Returns (idx, keep, score):

    * idx   [N, T] int32 — argmax class per step
    * keep  [N, T] bool  — steps that survive blank-drop + repeat-collapse
      (rec_processor.rs:60-75: selection starts as idx != 0; with
      remove_duplicate, step t also requires idx[t] != idx[t-1]; ignored
      token 0 is the blank, set by the session at session.rs:66)
    * score [N] f32 — mean prob over kept steps (0 when none kept, matching
      the reference's 0/0 -> NaN guarded to empty-string results)

    valid_t (optional, [N] int32): per-row count of timesteps that map onto
    the crop's CONTENT extent; steps >= valid_t fall entirely inside the
    right zero-padding (image_helper.rs:203-208) where no text can exist,
    so they are forced to blank.  PERFORMANCE-mode guard against marginal
    pad-region hallucinations (a low-confidence non-blank argmax deep in
    the pad appends a junk char to an otherwise exact decode); COMPAT
    callers pass None — the reference decodes the full padded width
    (rec_processor.rs:56-75).
    """
    idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)
    prob = jnp.max(probs, axis=-1)
    keep = idx != 0
    if valid_t is not None:
        steps = jnp.arange(idx.shape[1], dtype=jnp.int32)[None, :]
        keep = keep & (steps < valid_t.astype(jnp.int32)[:, None])
    if remove_duplicate:
        shifted = jnp.concatenate([jnp.full_like(idx[:, :1], -1), idx[:, :-1]], axis=1)
        keep = keep & (idx != shifted)
    cnt = keep.sum(axis=1)
    total = jnp.where(keep, prob, 0.0).sum(axis=1)
    score = jnp.where(cnt > 0, total / jnp.maximum(cnt, 1), 0.0)
    return idx, keep, score
