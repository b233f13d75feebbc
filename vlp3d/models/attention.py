"""Transformer primitives shared by relation / match / caption / MLM heads.

Mirrors `models/transformer/attention.py` and `mmattention.py`:

  * ``MultiHeadAttention`` — scaled dot-product attention with optional
    ADDITIVE attention-weight injection (the relation module's distance
    bias, attention.py:63-76), post-LN residual: out = LN(q + dropout(att)).
  * ``CrossAttentionDecoderLayer`` — self-attn -> cross-attn -> FFN with a
    single final LN (mmattention.py:53-87; note the reference only
    normalizes after the FFN).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class MultiHeadAttention(nn.Module):
    d_model: int = 128
    heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        queries: jax.Array,
        keys: jax.Array,
        values: jax.Array,
        *,
        attention_mask: jax.Array | None = None,
        attention_weights: jax.Array | None = None,
        way: str = "add",
        deterministic: bool = True,
        return_attention: bool = False,
    ):
        b, nq, _ = queries.shape
        nk = keys.shape[1]
        h = self.heads
        dk = self.d_model // h

        q = nn.Dense(self.d_model, name="fc_q")(queries)
        k = nn.Dense(self.d_model, name="fc_k")(keys)
        v = nn.Dense(self.d_model, name="fc_v")(values)
        q = q.reshape(b, nq, h, dk).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, h, dk).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, h, dk).transpose(0, 2, 1, 3)

        att = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(dk)
        )
        if attention_weights is not None:
            if way == "mul":
                att = att * attention_weights
            else:
                att = att + attention_weights
        if attention_mask is not None:
            # mask==0 positions are suppressed (attention.py:74-75)
            att = jnp.where(attention_mask == 0, -10000.0, att)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.d_model)
        out = nn.Dense(self.d_model, name="fc_o")(out)

        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = nn.LayerNorm(epsilon=1e-5)(queries + out)
        if return_attention:
            return out, att  # att: (B, h, Nq, Nk) softmax probabilities
        return out


class PositionwiseFeedForward(nn.Module):
    d_model: int = 128
    hidden: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.d_model)(x)


class CrossAttentionDecoderLayer(nn.Module):
    hidden_size: int = 128
    ffn_hidden: int = 256
    heads: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        *,
        src_mask: jax.Array | None = None,
        src_trg_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        x = MultiHeadAttention(
            self.hidden_size, self.heads, self.dropout, name="self_attention"
        )(query, query, query, attention_mask=src_mask, deterministic=deterministic)
        x = MultiHeadAttention(
            self.hidden_size, self.heads, self.dropout, name="enc_dec_attention"
        )(x, key, value, attention_mask=src_trg_mask, deterministic=deterministic)
        y = PositionwiseFeedForward(
            self.hidden_size, self.ffn_hidden, self.dropout, name="ffn"
        )(x, deterministic=deterministic)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5)(x + y)


class PredictionHead(nn.Module):
    """MLM head: Dense + GELU + LN + vocab decoder (attention.py:148-158)."""

    vocab_size: int = 30522
    hidden_size: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden_size)(x)
        x = nn.gelu(x)
        x = nn.LayerNorm(epsilon=1e-12)(x)
        return nn.Dense(self.vocab_size)(x)
