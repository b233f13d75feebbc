"""xbert-based captioner: BertLMHeadModel equivalent + alt CaptionModule.

Ports the standalone generator path of the vendored xbert
(`models/lang_bert_module/bert/xbert.py` BertLMHeadModel: causal
decoder self-attention + per-layer cross-attention to encoder states +
LM head) and `models/caption_module/caption_module.py:11-272`
(CaptionModule — the alternative captioner that the reference never
wires into JointNet; kept for inventory parity):

  * forward_train: token embeddings with the TARGET proposal's feature
    prepended as an object token, causal LM over the sequence with
    cross-attention to all proposal features; logits exclude the object
    token and the final step (caption_module.py:143-178);
  * generate: greedy decode as a fixed-shape lax.scan, one full decoder
    run per step under the causal mask (the reference calls HF
    generate per proposal, caption_module.py:258-267 — here all
    sequences decode at once).

The reference's config_caption.json is absent from its repo; the decoder
geometry follows CaptionModule's defaults (hidden 128, depth 4,
vocab 30522).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.bert import (
    BertConfig,
    BertEmbeddings,
    BertFusionLayer,
    BertMLMHead,
)

CLS_ID = 101
SEP_ID = 102


def caption_bert_config(
    hidden_size: int = 128, depth: int = 4, vocab_size: int = 30522
) -> BertConfig:
    return BertConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        num_hidden_layers=depth,
        num_attention_heads=8,
        intermediate_size=hidden_size * 4,
        fusion_layer=0,  # every layer cross-attends (BertLMHeadModel)
    )


class BertCausalLM(nn.Module):
    """BertLMHeadModel: causal decoder layers with per-layer
    cross-attention to encoder states, LM head on top. Consumes
    precomputed input embeddings (the HF inputs_embeds path the
    reference uses, caption_module.py:170-177)."""

    config: BertConfig = caption_bert_config()

    @nn.compact
    def __call__(
        self,
        inputs_embeds: jax.Array,  # (N, T, H)
        attention_mask: jax.Array | None = None,  # (N, T)
        encoder_states: jax.Array | None = None,  # (N, K, H)
        encoder_mask: jax.Array | None = None,  # (N, K)
        *,
        deterministic: bool = True,
    ):
        c = self.config
        x = inputs_embeds
        if attention_mask is None:
            attention_mask = jnp.ones(x.shape[:2], jnp.float32)
        for i in range(c.num_hidden_layers):
            x = BertFusionLayer(c, causal=True, name=f"layer_{i}")(
                x,
                attention_mask.astype(jnp.float32),
                encoder_states,
                encoder_mask,
                deterministic=deterministic,
            )
        logits = BertMLMHead(c, name="cls")(x)
        return logits, x


class CaptionModuleX(nn.Module):
    """The alt xbert captioner (caption_module.py). Consumes relation
    bbox features; the object token is the positive (best-IoU) proposal's
    feature at train time and each proposal's own feature at eval."""

    hidden_size: int = 128
    depth: int = 4
    vocab_size: int = 30522
    max_len: int = 32

    def setup(self):
        cfg = caption_bert_config(
            self.hidden_size, self.depth, self.vocab_size
        )
        self.embeddings = BertEmbeddings(cfg)
        self.decoder = BertCausalLM(cfg)

    def __call__(
        self,
        bbox_feature: jax.Array,  # (B, K, H)
        input_ids: jax.Array,  # (B, L, T)
        attention_mask: jax.Array,  # (B, L, T)
        positive_labels: jax.Array,  # (B, L) best-IoU proposal per sentence
        *,
        train: bool = False,
    ):
        b, k, hdim = bbox_feature.shape
        l, t = input_ids.shape[1], input_ids.shape[2]
        ids = input_ids.reshape(b * l, t)
        amask = attention_mask.reshape(b * l, t).astype(jnp.float32)

        ext_feat = jnp.repeat(bbox_feature, l, axis=0)  # (B*L, K, H)
        target = jnp.take_along_axis(
            ext_feat, positive_labels.reshape(b * l)[:, None, None], axis=1
        )  # (B*L, 1, H) object token (caption_module.py:39-48)

        emb = self.embeddings(ids, deterministic=not train)
        inputs_embeds = jnp.concatenate([target, emb], axis=1)
        ext_mask = jnp.concatenate(
            [jnp.ones((b * l, 1), jnp.float32), amask], axis=1
        )
        logits, _ = self.decoder(
            inputs_embeds,
            ext_mask,
            ext_feat,
            deterministic=not train,
        )
        # drop the object token and the final step (caption_module.py:177)
        return logits[:, 1:-1, :]

    def generate(self, bbox_feature: jax.Array) -> jax.Array:
        """Greedy decode one caption per proposal: (B, K, max_len) ids.
        Sequence layout: [object token, CLS, generated...]."""
        b, k, hdim = bbox_feature.shape
        n = b * k
        ext_feat = jnp.repeat(bbox_feature, k, axis=0)  # (B*K, K, H)
        target = bbox_feature.reshape(n, 1, hdim)
        tmax = self.max_len + 1  # + CLS slot

        ids0 = jnp.full((n, tmax), 0, jnp.int32).at[:, 0].set(CLS_ID)

        def step(ids, i):
            emb = self.embeddings(ids, deterministic=True)
            inputs_embeds = jnp.concatenate([target, emb], axis=1)
            mask = (
                jnp.arange(tmax + 1)[None, :] <= (i + 1)
            ).astype(jnp.float32).repeat(n, axis=0)
            logits, _ = self.decoder(
                inputs_embeds, mask, ext_feat, deterministic=True
            )
            nxt = jnp.argmax(logits[:, i + 1], axis=-1).astype(jnp.int32)
            return ids.at[:, i + 1].set(nxt), nxt

        ids = ids0
        for i in range(self.max_len):
            ids, _ = step(ids, i)
        return ids.reshape(b, k, tmax)
