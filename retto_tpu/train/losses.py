"""Training losses for the three model families.

The reference is inference-only (SURVEY.md §2: "not a training framework");
training is a capability this framework adds so models can be produced and
fine-tuned on TPU directly.  Losses follow the papers behind the reference's
checkpoints: CTC (rec), DB's bce+dice+masked-L1 (det, arXiv:1911.08947),
cross-entropy (cls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

__all__ = ["ctc_loss", "db_loss", "cls_loss"]


def ctc_loss(
    logits: jax.Array,
    labels: jax.Array,
    label_lengths: jax.Array,
) -> jax.Array:
    """Mean CTC loss.  logits [N, T, C] (pre-softmax, blank = class 0 like
    the decode side, rec_processor.rs:60); labels [N, L] int32 padded with
    zeros; label_lengths [N]."""
    n, t, _ = logits.shape
    logit_paddings = jnp.zeros((n, t), dtype=logits.dtype)
    l = labels.shape[1]
    pos = jnp.arange(l)[None, :]
    label_paddings = (pos >= label_lengths[:, None]).astype(logits.dtype)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels, label_paddings)
    return per_seq.mean()


def _dice(pred: jax.Array, gt: jax.Array, mask: jax.Array, eps: float = 1e-6):
    inter = (pred * gt * mask).sum()
    union = (pred * pred * mask).sum() + (gt * gt * mask).sum() + eps
    return 1.0 - 2.0 * inter / union


def db_loss(
    outputs: dict[str, jax.Array],
    gt_shrink: jax.Array,
    gt_shrink_mask: jax.Array,
    gt_thresh: jax.Array,
    gt_thresh_mask: jax.Array,
    alpha: float = 5.0,
    beta: float = 10.0,
    ohem_ratio: float = 3.0,
) -> jax.Array:
    """DB paper composite loss: balanced BCE on the shrink (prob) map with
    online hard negative mining, L1 on the threshold map inside the border
    band, dice on the differentiable binary map.

    outputs: DetModel train-mode dict {"maps", "thresh", "binary"}, each
    [N, 1, H, W]; gt_* same spatial shape ([N, H, W] or [N, 1, H, W]).
    """

    def _sq(x):
        return x.reshape(x.shape[0], *x.shape[-2:])

    prob = _sq(outputs["maps"])
    thresh = _sq(outputs["thresh"])
    binary = _sq(outputs["binary"])
    gt_s = _sq(gt_shrink).astype(jnp.float32)
    m_s = _sq(gt_shrink_mask).astype(jnp.float32)
    gt_t = _sq(gt_thresh).astype(jnp.float32)
    m_t = _sq(gt_thresh_mask).astype(jnp.float32)

    # balanced BCE with OHEM: all positives + top-k hardest negatives
    eps = 1e-6
    bce = -(gt_s * jnp.log(prob + eps) + (1 - gt_s) * jnp.log(1 - prob + eps))
    pos = gt_s * m_s
    neg = (1 - gt_s) * m_s
    n_pos = pos.sum()
    n_neg_keep = jnp.minimum(neg.sum(), n_pos * ohem_ratio + 256)
    neg_losses = (bce * neg).reshape(-1)
    k = neg_losses.shape[0]
    sorted_neg = jnp.sort(neg_losses)[::-1]
    rank = jnp.arange(k, dtype=jnp.float32)
    neg_loss = jnp.where(rank < n_neg_keep, sorted_neg, 0.0).sum()
    pos_loss = (bce * pos).sum()
    bce_loss = (pos_loss + neg_loss) / (n_pos + n_neg_keep + eps)

    l1 = (jnp.abs(thresh - gt_t) * m_t).sum() / (m_t.sum() + eps)
    dice = _dice(binary, gt_s, m_s)
    return bce_loss * alpha + l1 * beta + dice


def cls_loss(probs: jax.Array, labels: jax.Array) -> jax.Array:
    """Cross entropy on the (post-softmax) cls output. labels [N] int."""
    eps = 1e-8
    logp = jnp.log(probs + eps)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
