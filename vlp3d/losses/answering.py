"""VQA answer classification loss (lib/loss_helper/loss_answering.py:2-16)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_answer_classification_loss(
    answer_scores: jax.Array,  # (N, num_answers) logits
    answer_cat_scores: jax.Array | None = None,  # (N, num_answers) soft labels
    answer_cat: jax.Array | None = None,  # (N,) int labels
):
    """Multi-answer BCE-with-logits (sum / N) or plain CE."""
    if answer_cat_scores is not None:
        x = answer_scores
        t = answer_cat_scores
        bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
        return jnp.sum(bce) / x.shape[0]
    logp = jax.nn.log_softmax(answer_scores, axis=-1)
    return -jnp.mean(
        jnp.take_along_axis(logp, answer_cat[:, None], axis=-1)[:, 0]
    )
