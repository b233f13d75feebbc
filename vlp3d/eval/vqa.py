"""ScanQA evaluation: answer EM@1 / EM@10 + grounding IoU.

Port of `lib/vqa/eval_helper.py:218-259` (answer top-k one-hot accuracy
against multi-answer labels) — computable fully on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# jitted: called per eval batch; the eager form dispatched 6 separate
# device ops per call (~30 ms relay each over the axon tunnel)
@functools.partial(jax.jit, static_argnames=("topk",))
def answer_accuracy(answer_scores: jax.Array, answer_cats: jax.Array,
                    topk: int = 10):
    """answer_scores (B, A) logits; answer_cats (B, A) multi-hot labels.

    Returns (acc@1, acc@topk): a sample counts if any of its labelled
    answers appears in the top-1 / top-k predictions."""
    at1 = jnp.argmax(answer_scores, axis=1)
    hit1 = jnp.take_along_axis(answer_cats, at1[:, None], axis=1)[:, 0]
    acc1 = jnp.mean((hit1 > 0).astype(jnp.float32))

    _, topk_idx = jax.lax.top_k(answer_scores, topk)
    hitk = jnp.take_along_axis(answer_cats, topk_idx, axis=1).max(axis=1)
    acck = jnp.mean((hitk > 0).astype(jnp.float32))
    return acc1, acck
