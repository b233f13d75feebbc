"""Caption + MLM losses.

Ports of `lib/loss_helper/loss_captioning.py:25-73` and the MLM loss inside
`transformer_captioner.forward_mlm` (:437-464). `lang_cap`/`lang_mlm` are
log-probabilities (the Generator ends in log_softmax); CE on them equals
CE on raw logits since softmax is shift-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_cap_loss(
    lang_cap: jax.Array,  # (B*L, T-1, vocab) log-probs
    input_ids: jax.Array,  # (B, L, T)
    good_bbox_masks: jax.Array,  # (B*L,) bool
    pad_token_id: int = 0,
):
    """Token CE ignoring pad (ignore_index=0), masked by good boxes;
    cap_acc over non-pad tokens of good boxes (loss_captioning.py:25-73)."""
    b, l, t = input_ids.shape
    num_words = lang_cap.shape[1]
    targets = input_ids.reshape(b * l, t)[:, 1 : num_words + 1]

    logp = jax.nn.log_softmax(lang_cap, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    nonpad = (targets != 0).astype(jnp.float32)  # ignore_index=0
    ce = ce * nonpad

    # NOTE: the reference denominator is the count of good (box, word)
    # slots, not non-pad tokens (loss_captioning.py:47-48).
    good = good_bbox_masks.astype(jnp.float32)[:, None]
    denom = jnp.sum(jnp.broadcast_to(good, ce.shape)) + 1e-6
    cap_loss = jnp.sum(ce * good) / denom

    pred = jnp.argmax(lang_cap, axis=-1)
    acc_mask = (targets != pad_token_id).astype(jnp.float32) * good
    cap_acc = jnp.sum(
        (pred == targets).astype(jnp.float32) * acc_mask
    ) / jnp.maximum(jnp.sum(acc_mask), 1.0)
    return cap_loss, cap_acc


def compute_mlm_loss(
    lang_mlm: jax.Array,  # (B*L, T-1, vocab) log-probs
    input_ids: jax.Array,  # (B, L, T)
    mask_index: jax.Array,  # (B*L, T-1) bool — which INPUT tokens were masked
    good_bbox_masks: jax.Array,  # (B*L,) bool
):
    """forward_mlm loss (transformer_captioner.py:437-464): next-token CE
    (ignore pad) restricted to masked input positions, normalized by good
    (box, word) slots."""
    b, l, t = input_ids.shape
    num_words = lang_mlm.shape[1]
    targets = input_ids.reshape(b * l, t)[:, 1 : num_words + 1]
    logp = jax.nn.log_softmax(lang_mlm, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = ce * (targets != 0).astype(jnp.float32)
    ce = ce * mask_index.astype(jnp.float32)
    good = good_bbox_masks.astype(jnp.float32)[:, None]
    denom = jnp.sum(jnp.broadcast_to(good, ce.shape)) + 1e-6
    return jnp.sum(ce * good) / denom
