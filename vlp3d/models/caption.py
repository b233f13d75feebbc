"""Transformer caption decoder (Scan2Cap head) + masked-LM pretraining path.

Port of `models/caption_module/transformer_captioner.py:301-627`. The
reference instantiates an annotated-transformer EncoderDecoder with
`use_transformer_encoder=False` and `early_guide=True`, which reduces to a
DECODER-ONLY stack: DecoderLayer skips cross-attention entirely when
early_guide is set (transformer_captioner.py:249-254) and conditioning
happens purely through a prepended "object indicator" token — the feature
of the proposal nearest to the GT ref center at train time
(:496-508), and (a reference quirk reproduced here) 2x the proposal's own
feature at eval time (decode() adds memory onto the already-equal
obj_indicator, :282-288).

TPU-first deltas from the reference:
  * greedy decode is a single jitted `lax.scan` over steps on a fixed
    (B*K, T) token buffer — the reference re-runs the full decoder per
    step from Python (:581-594);
  * the 10% caption-MLM input masking (:602-626) is key-threaded instead
    of torch.bernoulli.

Defaults: N=6 layers, h=8 heads, d_model=128, d_ff=512, dropout 0.1,
vocab 30522 (:303, jointnet.py:104).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.geometry.nn_distance import nn_distance

PAD_ID = 0
CLS_ID = 101
MASK_ID = 103


def sinusoidal_positions(max_len: int, d_model: int) -> jax.Array:
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32)
        * -(math.log(10000.0) / d_model)
    )
    pe = jnp.zeros((max_len, d_model))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


class DecoderSelfAttention(nn.Module):
    d_model: int = 128
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True):
        b, t, _ = x.shape
        h, dk = self.heads, self.d_model // self.heads
        q = nn.Dense(self.d_model, name="q")(x).reshape(b, t, h, dk)
        k = nn.Dense(self.d_model, name="k")(x).reshape(b, t, h, dk)
        v = nn.Dense(self.d_model, name="v")(x).reshape(b, t, h, dk)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(dk)
        if mask is not None:
            att = jnp.where(mask, att, -1e9)
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.dropout)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, self.d_model)
        return nn.Dense(self.d_model, name="o")(out)


class CaptionDecoderLayer(nn.Module):
    """Pre-LN: x + drop(attn(LN(x))); x + drop(ffn(LN(x)))
    (SublayerConnection, transformer_captioner.py:132-145; cross-attn
    sublayer skipped under early_guide, :249-254)."""

    d_model: int = 128
    d_ff: int = 512
    heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True):
        y = nn.LayerNorm(epsilon=1e-6, name="ln_attn")(x)
        y = DecoderSelfAttention(
            self.d_model, self.heads, self.dropout, name="self_attn"
        )(y, mask, deterministic=deterministic)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)

        y = nn.LayerNorm(epsilon=1e-6, name="ln_ffn")(x)
        y = nn.Dense(self.d_ff, name="ffn1")(y)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, name="ffn2")(y)
        x = x + nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x


class CaptionDecoder(nn.Module):
    """Token embedding + N decoder layers + final LN + vocab generator."""

    vocab_size: int = 30522
    n_layers: int = 6
    d_model: int = 128
    d_ff: int = 512
    heads: int = 8
    dropout: float = 0.1
    max_len: int = 64

    def setup(self):
        self.embed = nn.Embed(self.vocab_size, self.d_model, name="embed")
        self.layers = [
            CaptionDecoderLayer(
                self.d_model, self.d_ff, self.heads, self.dropout,
                name=f"layer_{i}",
            )
            for i in range(self.n_layers)
        ]
        self.final_ln = nn.LayerNorm(epsilon=1e-6, name="final_ln")
        self.generator = nn.Dense(self.vocab_size, name="generator")
        self.pe = sinusoidal_positions(self.max_len + 1, self.d_model)
        self.pe_drop = nn.Dropout(self.dropout, name="pe_drop")

    def embed_tokens(self, tokens, *, deterministic=True):
        x = self.embed(tokens) * math.sqrt(self.d_model)
        x = x + self.pe[: tokens.shape[1]]
        return self.pe_drop(x, deterministic=deterministic)

    def decode(self, obj_token, tokens, mask, *, deterministic=True):
        """obj_token (N, 1, d); tokens (N, T) ids; mask broadcastable to
        (N, heads, T+1, T+1). Returns hidden states (N, T+1, d)."""
        x = jnp.concatenate(
            [obj_token, self.embed_tokens(tokens, deterministic=deterministic)],
            axis=1,
        )
        for layer in self.layers:
            x = layer(x, mask, deterministic=deterministic)
        return self.final_ln(x)

    def __call__(self, obj_token, tokens, mask, *, deterministic=True):
        h = self.decode(obj_token, tokens, mask, deterministic=deterministic)
        return jax.nn.log_softmax(self.generator(h), axis=-1)

    def decode_step(self, obj_token, ys, i):
        """One greedy step: logits for the token following position i.

        ys: (N, T) fixed token buffer; returns (N, vocab) logits at row
        i+1 (obj token occupies row 0).
        """
        h = self.decode(obj_token, ys, causal_caption_mask(ys),
                        deterministic=True)
        n = ys.shape[0]
        row_idx = jnp.full((n, 1, 1), i + 1, jnp.int32)
        row = jnp.take_along_axis(h, row_idx, axis=1)[:, 0]
        return self.generator(row)


def causal_caption_mask(seq: jax.Array) -> jax.Array:
    """(N, T) token ids -> (N, 1, T+1, T+1) bool mask: position 0 is the
    always-valid obj token; pad tokens masked; causal
    (_prepare_feature, transformer_captioner.py:371-384)."""
    n, t = seq.shape
    keep = jnp.concatenate(
        [jnp.ones((n, 1), bool), seq > 0], axis=1
    )  # (N, T+1)
    causal = jnp.tril(jnp.ones((t + 1, t + 1), bool))
    return keep[:, None, None, :] & causal[None, None, :, :]


def padding_caption_mask(seq: jax.Array) -> jax.Array:
    """Non-causal variant for the MLM path (captioning=False, :382-383)."""
    n, t = seq.shape
    keep = jnp.concatenate([jnp.ones((n, 1), bool), seq > 0], axis=1)
    return keep[:, None, None, :]


def mask_caption_tokens(rng: jax.Array, input_ids: jax.Array, vocab_size: int,
                        mask_ratio: float = 0.1):
    """BERT-style 80/10/10 masking of non-pad, non-CLS tokens
    (transformer_captioner.py:602-626). Returns (masked_ids, masked_indices)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    masked = jax.random.bernoulli(k1, mask_ratio, input_ids.shape)
    masked = masked & (input_ids != PAD_ID) & (input_ids != CLS_ID)
    replace = jax.random.bernoulli(k2, 0.8, input_ids.shape) & masked
    randomize = (
        jax.random.bernoulli(k3, 0.5, input_ids.shape) & masked & ~replace
    )
    random_words = jax.random.randint(
        k4, input_ids.shape, 0, vocab_size, dtype=input_ids.dtype
    )
    out = jnp.where(replace, MASK_ID, input_ids)
    out = jnp.where(randomize, random_words, out)
    return out, masked


def nearest_proposal_token(agg_features, agg_xyz, ref_center, lang_num_max):
    """Object-indicator token: feature of the proposal whose aggregation
    center is nearest the GT ref center (transformer_captioner.py:496-508).

    agg_features (B, K, C); agg_xyz (B, K, 3); ref_center (B, L, 3).
    Returns (obj_token (B*L, 1, C), idx (B*L,), dist (B*L,))."""
    b, k, c = agg_features.shape
    l = lang_num_max
    centers = jnp.repeat(agg_xyz[:, None], l, axis=1).reshape(b * l, k, 3)
    feats = jnp.repeat(agg_features[:, None], l, axis=1).reshape(b * l, k, c)
    ref = ref_center.reshape(b * l, 1, 3)
    _, _, dist2, idx2 = nn_distance(centers, ref)
    idx = idx2[:, 0]
    obj_token = jnp.take_along_axis(feats, idx[:, None, None], axis=1)
    return obj_token, idx, dist2[:, 0]


def greedy_decode(
    decoder_def: CaptionDecoder,
    variables,
    obj_token: jax.Array,  # (N, 1, d) — already 2x feature, see module doc
    max_len: int,
    start_id: int = CLS_ID,
):
    """Jitted greedy decode: lax.scan over steps on a fixed token buffer.

    `decoder_def` is an UNBOUND CaptionDecoder; `variables` its params
    (e.g. {"params": jointnet_params["caption"]}). Returns (N, max_len + 2)
    token ids starting with CLS, matching forward_eval's output contract
    (transformer_captioner.py:575-600).
    """
    n = obj_token.shape[0]
    t_total = max_len + 2  # CLS + max_len+1 generated steps

    def step(ys, i):
        logits = decoder_def.apply(
            variables, obj_token, ys, i, method=CaptionDecoder.decode_step
        )
        nxt = jnp.argmax(logits, axis=-1).astype(ys.dtype)
        ys = jax.lax.dynamic_update_slice_in_dim(
            ys, nxt[:, None], i + 1, axis=1
        )
        return ys, None

    ys0 = jnp.full((n, t_total), PAD_ID, jnp.int32).at[:, 0].set(start_id)
    ys, _ = jax.lax.scan(step, ys0, jnp.arange(max_len + 1))
    return ys
