"""Cross-modal match module: grounding confidence per (sentence, proposal).

Port of `models/refnet/match_module.py:10-170`:

  * train-time "copy-paste" augmentation with p=0.5: each scene's
    non-object proposal features are replaced by object features pooled
    from the whole batch (match_module.py:96-121). The reference's
    dynamic-shape gather loop becomes a fixed-shape stable-argsort +
    modular-index gather with identical placement: scene i's r-th
    non-object slot (scan order) receives pooled object feature
    (sum(obj_lens[:i+1]) + r) mod total_objects, replaced only while
    r < total_objects - obj_lens[i];
  * 2x CrossAttentionDecoderLayer: proposal queries attend to per-sentence
    token features (match_module.py:134-136);
  * 3-layer GELU/Dropout MLP -> cluster_ref confidence (:140-145);
  * optional lang_emb second scorer (:148-159) and +-0.05 box regression
    head (:163-168).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.attention import CrossAttentionDecoderLayer, MultiHeadAttention
from vlp3d.models.layers import PReLU


def copy_paste_features(features: jax.Array, obj_mask: jax.Array):
    """Fixed-shape rewrite of the copy-paste loop (match_module.py:96-121).

    features: (B, K, H); obj_mask: (B, K) bool (positive objectness).
    Returns features with non-object slots replaced by batch-pooled object
    features.
    """
    b, k, h = features.shape
    flat_mask = obj_mask.reshape(b * k)
    flat_feats = features.reshape(b * k, h)

    # objects in global scan order (stable sort moves mask=True first)
    order = jnp.argsort(jnp.logical_not(flat_mask), stable=True)
    obj_sorted = flat_feats[order]  # first total_len rows are objects

    obj_lens = jnp.sum(obj_mask, axis=1)  # (B,)
    total_len = jnp.sum(obj_lens)
    start = jnp.cumsum(obj_lens)  # inclusive cumsum = reference's j

    # rank of each slot among its scene's non-object slots (scan order)
    nonobj = jnp.logical_not(obj_mask)
    rank = jnp.cumsum(nonobj.astype(jnp.int32), axis=1) - 1  # (B, K)
    src = (start[:, None] + rank) % jnp.maximum(total_len, 1)
    replace = nonobj & (rank < (total_len - obj_lens)[:, None])

    pasted = obj_sorted[src.reshape(-1)].reshape(b, k, h)
    return jnp.where(replace[..., None], pasted, features)


class MatchModule(nn.Module):
    num_proposals: int = 256
    hidden_size: int = 128
    depth: int = 2
    heads: int = 4
    use_lang_emb: bool = False
    use_reg_head: bool = False
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self,
        bbox_feature: jax.Array,  # (B, K, H) relation output
        lang_fea: jax.Array,  # (B*L, T, H) per-token language features
        lang_emb: jax.Array,  # (B*L, H) CLS embeddings
        objectness_masks: jax.Array,  # (B, K) f32
        *,
        lang_num_max: int,
        train: bool = False,
        random_gate: jax.Array | None = None,  # scalar U[0,1), shared step rng
    ):
        b, k, h = bbox_feature.shape
        l = lang_num_max

        features = bbox_feature
        if train and random_gate is not None:
            pasted = copy_paste_features(features, objectness_masks > 0)
            features = jnp.where(random_gate < 0.5, pasted, features)
        feature0 = features

        # (B, K, H) -> (B*L, K, H)
        feature1 = jnp.repeat(features[:, None], l, axis=1).reshape(
            b * l, k, h
        )
        # drop CLS token from keys/values (match_module.py:129)
        tokens = lang_fea[:, 1:]

        for i in range(self.depth):
            feature1 = CrossAttentionDecoderLayer(
                self.hidden_size,
                heads=self.heads,
                name=f"grounding_cross_attn_{i}",
            )(feature1, tokens, tokens, deterministic=not train)

        out = {"cross_box_feature": feature1}

        x = feature1.reshape(b * l * k, h)
        x = nn.Dense(h)(x)
        x = nn.gelu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        x = nn.Dense(h)(x)
        x = nn.gelu(x)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        confidence = nn.Dense(1)(x).reshape(b * l, k)

        if self.use_lang_emb:
            le = lang_emb.reshape(b, l, h)
            le_feat = MultiHeadAttention(
                self.hidden_size, self.heads, name="lang_emb_cross_attn"
            )(le, feature0, feature0, deterministic=not train)
            y = le_feat.reshape(b * l, h)
            y = nn.Dense(h)(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(y)
            y = PReLU(h, name="prelu0")(y)
            y = nn.Dense(h)(y)
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(y)
            y = PReLU(h, name="prelu1")(y)
            confidence = confidence + nn.Dense(self.num_proposals)(y)

        out["cluster_ref"] = confidence  # (B*L, K)

        if self.use_reg_head:
            z = feature1.reshape(b * l * k, h)
            z = nn.Dense(h)(z)
            z = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(z)
            z = nn.gelu(z)
            z = nn.Dense(h)(z)
            z = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(z)
            z = nn.gelu(z)
            reg = nn.sigmoid(nn.Dense(6)(z)) * 0.1 - 0.05
            reg = reg.reshape(b, l, k, 6)
            out["pred_center_reg"] = reg[..., 0:3]
            out["pred_size_reg"] = reg[..., 3:6]
        return out
