"""Legacy l2p/p2l InfoNCE pretraining loss.

Port of `lib/loss_helper/loss_pretrain.py:4-36` (compute_constrastive_loss).
Superseded in the reference by the ContrastModule OCC/OSC losses (nothing
in the reference produces `sim_l2p`/`sim_p2l` any more), kept for surface
parity. The reference drops invalid rows/columns with boolean indexing;
the fixed-shape equivalent masks invalid columns to -1e9 before the
softmax and averages the diagonal over valid rows only — identical up to
exp(-1e9) underflow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_contrastive_loss(
    sim_l2p: jax.Array,  # (L, K) sentence -> proposal similarities
    sim_p2l: jax.Array,  # (K, L) proposal -> sentence similarities
    positive_labels: jax.Array,  # (L,) best-IoU proposal per sentence
    contrast_mask: jax.Array,  # (B, lang_num_max) valid-sentence mask
) -> jax.Array:
    batch_size = contrast_mask.shape[0]
    m = contrast_mask.reshape(-1).astype(bool)  # (L,)

    # square similarity between sentences and their positive proposals
    sel_l2p = sim_l2p[:, positive_labels]  # (L, L)
    sel_p2l = sim_p2l[positive_labels, :]  # (L, L)

    def masked_nce(s: jax.Array) -> jax.Array:
        logits = jnp.where(m[None, :], s, -1e9)
        logp = jax.nn.log_softmax(logits, axis=1)
        diag = jnp.diagonal(logp)
        n = jnp.maximum(m.sum(), 1)
        return -jnp.where(m, diag, 0.0).sum() / n

    return (masked_nce(sel_l2p) + masked_nce(sel_p2l)) / batch_size
