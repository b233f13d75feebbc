"""Proposal relation module: 2-layer self-attention with geometric bias.

Mirrors `models/proposal_module/relation_module.py:9-139`:

  * features_concat: Dense+BN+PReLU+Dense projection of proposal features;
  * per depth: additive attention bias from pairwise center offsets +
    distance through a [4->32->32->4] MLP (one bias per head);
  * multiview "object embedding": gathers the raw per-point multiview
    channels (point_clouds[..., 6:6+128]) through seed_inds at
    aggregated_vote_inds, scaled by 0.1 (relation_module.py:100-117).
    NOTE: the reference's gather permutes (B,N,128)->(B,128,N) and then
    reshape(-1,128)s it, so its row indices (seed + b*128) address a
    scrambled matrix — deterministic noise rather than the named point's
    features (it would IndexError outright for N <= seed range + B*128).
    We implement the documented intent: the point -> seed -> proposal
    index composition (tests/test_refparity_modules.py pins the rest of
    the module bit-for-bit against the reference with this path zeroed);
  * box-corner embedding: Linear(27 -> hidden) of [center, corners-center];
  * MultiHeadAttention with way='add'.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.attention import MultiHeadAttention
from vlp3d.models.layers import PReLU


class RelationModule(nn.Module):
    num_proposals: int = 256
    hidden_size: int = 128
    det_channel: int = 128
    heads: int = 4
    depth: int = 2
    bn_momentum: float = 0.9
    multiview_offset: int = 6  # point_clouds[..., 6:6+128] (relation:101)
    multiview_dim: int = 128
    # the reference hardcodes these True (relation_module.py:12-14)
    use_dist_weight_matrix: bool = True
    use_obj_embedding: bool = True
    use_box_embedding: bool = True
    # bit-exact replication of the reference's scrambled obj-feature
    # read (see ModelConfig.reference_obj_gather)
    reference_obj_gather: bool = False

    @nn.compact
    def __call__(
        self,
        proposal_features: jax.Array,  # (B, K, det_channel) = pred_bbox_feature
        pred_center: jax.Array,  # (B, K, 3)
        pred_size: jax.Array,  # (B, K, 3)
        pred_heading: jax.Array,  # (B, K)
        point_clouds: jax.Array,  # (B, N, C_in) raw input cloud
        seed_inds: jax.Array,  # (B, S) i32 indices into N
        aggregated_vote_inds: jax.Array,  # (B, K) i32 indices into S
        *,
        train: bool = False,
    ):
        # Box geometry is consumed in closed form from (center, size,
        # heading): corner means and AABB centers equal pred_center exactly
        # (symmetric sign pattern), and the 24 corner offsets are built
        # lane-wise — materializing (B, K, 8, 3) corner tensors costs ~4s
        # on TPU (pathological tiling; see geometry.corner_offsets_flat).
        x = nn.Dense(self.hidden_size)(proposal_features)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
        )(x)
        x = PReLU(self.hidden_size)(x)
        features = nn.Dense(self.hidden_size)(x)

        # multiview per-proposal feature: point_clouds -> seed -> proposal.
        # Compose the two index hops first (cheap (B, K) gather), then do a
        # single K-row feature gather instead of the reference's
        # seed-level + proposal-level feature gathers.
        if self.use_obj_embedding:
            obj_feat = jax.lax.dynamic_slice_in_dim(
                point_clouds, self.multiview_offset, self.multiview_dim,
                axis=2,
            )  # (B, N, 128)
            point_idx = jnp.take_along_axis(
                seed_inds, aggregated_vote_inds, axis=1
            )  # (B, K) indices into N
            if self.reference_obj_gather:
                # the reference permutes to (B, C, N), reshapes the
                # contiguous copy to (B*N, C) — rows are 128 CONSECUTIVE
                # N-positions of one channel — and offsets batches by
                # C (=128) instead of N (relation_module.py:101-117):
                # proposals read channel-major slices of (mostly)
                # batch 0's multiview block. Deterministic, so the
                # published weights trained against exactly this read.
                b, n, c = obj_feat.shape
                rows = jnp.transpose(obj_feat, (0, 2, 1)).reshape(-1, c)
                flat_idx = (
                    point_idx + (jnp.arange(b) * c)[:, None]
                ).reshape(-1)
                proposal_mv = rows[flat_idx].reshape(
                    b, self.num_proposals, c
                )
            else:
                proposal_mv = jnp.take_along_axis(
                    obj_feat, point_idx[..., None], axis=1
                )  # (B, K, 128)

        # geometric attention bias inputs (centers == mean of corners)
        centers = pred_center  # (B, K, 3)
        offsets = centers[:, None, :, :] - centers[:, :, None, :]  # (B,K,K,3)
        dist = jnp.sqrt(jnp.sum(offsets**2, axis=-1, keepdims=True))
        geo = jax.lax.stop_gradient(
            jnp.concatenate([offsets, dist], axis=-1)
        )  # (B, K, K, 4)

        # box embedding input: [aabb center (== pred_center),
        # corners - center] (27-d), corners built lane-wise
        from vlp3d.geometry.boxes import corner_offsets_flat

        box_feat = jnp.concatenate(
            [centers, corner_offsets_flat(pred_size, pred_heading)],
            axis=-1,
        )

        dist_weights = None
        attn_maps = []  # per-layer softmax maps (heatmap_visualize.py:433)
        for i in range(self.depth):
            if self.use_dist_weight_matrix:
                w = geo
                w = nn.Dense(32, name=f"attn_fc{i}_0")(w)
                w = nn.relu(w)
                w = nn.LayerNorm(epsilon=1e-5, name=f"attn_ln{i}_0")(w)
                w = nn.Dense(32, name=f"attn_fc{i}_1")(w)
                w = nn.relu(w)
                w = nn.LayerNorm(epsilon=1e-5, name=f"attn_ln{i}_1")(w)
                w = nn.Dense(self.heads, name=f"attn_fc{i}_2")(w)
                dist_weights = w.transpose(0, 3, 1, 2)  # (B, h, K, K)

            if self.use_obj_embedding:
                obj_embedding = nn.Dense(
                    self.hidden_size, name=f"obj_embedding_{i}"
                )(proposal_mv)
                features = features + obj_embedding * 0.1

            if self.use_box_embedding:
                bbox_embedding = nn.Dense(
                    self.hidden_size, name=f"bbox_embedding_{i}"
                )(box_feat)
                features = features + bbox_embedding

            features, att = MultiHeadAttention(
                self.hidden_size, self.heads, name=f"self_attn_{i}"
            )(
                features,
                features,
                features,
                attention_weights=dist_weights,
                way="add" if self.use_dist_weight_matrix else "mul",
                deterministic=not train,
                return_attention=True,
            )
            attn_maps.append(att)

        return {
            "bbox_feature": features,
            "dist_weights": dist_weights,
            # (B, depth*heads, K, K), the reference's
            # torch.cat(data['relation'], dim=1) heatmap source
            "relation_attn": jnp.concatenate(attn_maps, axis=1),
        }
