"""GloVe/LSTM language encoder for the single-task (3DJCG/ScanQA) paths.

Port of `models/vqa/lang_module.py:12-120`: word embeddings (GloVe 300-d
or pretrained) -> dropout -> (bi)LSTM with length masking -> per-token
features + final-state sentence embedding + optional object-class
classifier. torch's pack_padded_sequence becomes flax nn.RNN with
seq_lengths.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LSTMLangModule(nn.Module):
    num_object_class: int = 18
    use_lang_classifier: bool = True
    use_bidir: bool = False
    hidden_size: int = 256
    pdrop: float = 0.1

    @nn.compact
    def __call__(
        self,
        word_embs: jax.Array,  # (B*L, T, E) embeddings
        lang_len: jax.Array,  # (B*L,)
        *,
        train: bool = False,
    ):
        x = nn.Dropout(self.pdrop)(word_embs, deterministic=not train)
        t = x.shape[1]

        fwd = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_size), name="lstm_fwd"
        )(x, seq_lengths=lang_len)
        idx = jnp.clip(lang_len - 1, 0, t - 1).astype(jnp.int32)
        final = jnp.take_along_axis(fwd, idx[:, None, None], axis=1)[:, 0]
        outputs = fwd

        if self.use_bidir:
            bwd = nn.RNN(
                nn.OptimizedLSTMCell(self.hidden_size),
                reverse=True,
                keep_order=True,
                name="lstm_bwd",
            )(x, seq_lengths=lang_len)
            outputs = jnp.concatenate([fwd, bwd], axis=-1)
            final = jnp.concatenate([final, bwd[:, 0]], axis=-1)

        mask = (
            jnp.arange(t)[None, :] < lang_len[:, None]
        )[..., None]
        out = {
            "lang_fea_lstm": outputs * mask,
            "lang_emb_lstm": final,
        }
        if self.use_lang_classifier:
            h = nn.Dropout(self.pdrop)(final, deterministic=not train)
            out["lang_scores"] = nn.Dense(self.num_object_class)(h)
        return out
