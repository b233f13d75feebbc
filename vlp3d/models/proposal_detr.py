"""DETR-style proposal module (Transformer3D-Det head).

Port of `models/proposal_module/proposal_module_detr.py:70-180` +
`models/proposal_module/detr/{detr3d.py,transformer3D.py}` (an
alternative head never wired into JointNet — kept for inventory parity),
with the implemented configuration of the reference: transformer_type
'deformable' with myAdd positional attention and weighted input
(proposal_module_detr.py:75-91, transformer3D.py:297-336):

  * vote aggregation (SA npoint=num_proposal, r=0.3, ns=16) then two
    Conv1d+BN+ReLU blocks (proposal_module_detr.py:121-125, 163-164);
  * decoder layers over the proposals themselves (no learned queries:
    'deformable' uses tgt = src, transformer3D.py:117-121); each layer:
      - positional self-attention: additive mask carrying inverse-distance
        weights of the 5 nearest proposals (by CURRENT positions),
        -1e9 elsewhere (MultiheadPositionalAttention 'myAdd',
        transformer3D.py:297-330), residual + post-LN;
      - deformable position refinement: tgt_position += Dense(tgt)
        (transformer3D.py:424-429);
      - positional cross-attention to the original projected features
        with the mask rebuilt from refined-vs-original positions;
      - GELU FFN + residual + post-LN (transformer3D.py:446-450);
  * per-layer (shared-norm) outputs are concatenated and fused by
    hidden_ffn + LayerNorm + ReLU (detr3d.py:40-43, 138-140);
  * class head (2 objectness + num_class) and 2-layer MLP bbox head
    (3 center offset + heading cls/res + size cls/res), decoded
    votenet-style with center = aggregated_xyz + offset
    (center_with_bias, proposal_module_detr.py:99 — 'dec' not in
    'deformable');
  * the per-layer refined positions are the reference's
    transformer_weighted_xyz outputs (detr3d.py:148-153).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.layers import SAModule

NEAR_KTH = 5  # myAdd default (transformer3D.py:301)


def idw_attention_mask(tgt_pos: jax.Array, src_pos: jax.Array) -> jax.Array:
    """Additive attention mask: inverse-distance weights of the NEAR_KTH
    nearest source positions per target, -1e9 elsewhere
    (transformer3D.py:297-330). Shapes (B, Kt, 3), (B, Ks, 3) ->
    (B, 1, Kt, Ks) broadcastable over heads. Weights are detached as in
    the reference (weight = (...).detach())."""
    d2 = jnp.sum(
        (tgt_pos[:, :, None, :] - src_pos[:, None, :, :]) ** 2, axis=-1
    )  # (B, Kt, Ks)
    neg_d, pos = jax.lax.top_k(-d2, NEAR_KTH)  # nearest-k
    dist = jnp.sqrt(jnp.maximum(-neg_d, 0.0))
    recip = 1.0 / (dist + 1e-1)
    weight = recip / jnp.sum(recip, axis=-1, keepdims=True)  # (B, Kt, k)
    onehot = jax.nn.one_hot(pos, d2.shape[-1])  # (B, Kt, k, Ks)
    idw = jnp.einsum("btks,btk->bts", onehot, weight)
    selected = jnp.sum(onehot, axis=2)  # 0/1 indicator (B, Kt, Ks)
    mask = idw + (selected - 1.0) * 1e9
    return jax.lax.stop_gradient(mask)[:, None, :, :]


class PositionalAttention(nn.Module):
    """MyMultiHeadAttention with way='add' (models/transformer/attention.py)
    under the myAdd positional mask; post-LN residual on the queries."""

    d_model: int
    heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, q_in, k_in, v_in, add_mask, *, deterministic=True):
        h, dk = self.heads, self.d_model // self.heads
        b, nq, _ = q_in.shape
        nk = k_in.shape[1]
        q = nn.Dense(self.d_model, name="fc_q")(q_in).reshape(b, nq, h, dk)
        k = nn.Dense(self.d_model, name="fc_k")(k_in).reshape(b, nk, h, dk)
        v = nn.Dense(self.d_model, name="fc_v")(v_in).reshape(b, nk, h, dk)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(dk))
        att = jax.nn.softmax(att + add_mask, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, nq, -1)
        out = nn.Dense(self.d_model, name="fc_o")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5)(q_in + out)


class DeformableDecoderLayer(nn.Module):
    """transformer3D.py TransformerDecoderLayer.forward_post, 'deformable'
    branch: positional self-attn -> offset refinement -> positional
    cross-attn -> GELU FFN, post-LN throughout."""

    d_model: int = 288
    heads: int = 8
    d_ff: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, memory, tgt_pos, src_pos, *, deterministic=True):
        tgt = PositionalAttention(
            self.d_model, self.heads, self.dropout, name="self_attn"
        )(
            tgt, tgt, tgt, idw_attention_mask(tgt_pos, tgt_pos),
            deterministic=deterministic,
        )
        # deformable position refinement (transformer3D.py:424-429)
        tgt_pos = tgt_pos + nn.Dense(3, name="linear_offset")(tgt)
        tgt = PositionalAttention(
            self.d_model, self.heads, self.dropout, name="multihead_attn"
        )(
            tgt, memory, memory, idw_attention_mask(tgt_pos, src_pos),
            deterministic=deterministic,
        )
        y = nn.Dense(self.d_ff, name="linear1")(tgt)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.d_model, name="linear2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + y)
        return tgt, tgt_pos


class DETRProposalModule(nn.Module):
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_proposal: int = 256
    n_layers: int = 4  # dec_layers (proposal_module_detr.py:87)
    d_model: int = 288  # hidden_dim (proposal_module_detr.py:88)
    heads: int = 8
    d_ff: int = 2048
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, xyz, features, mean_size_arr, *, train: bool = False):
        agg_xyz, agg_f, agg_inds = SAModule(
            self.num_proposal, 0.3, 16, [128, 128, 128],
            normalize_xyz=True, bn_momentum=self.bn_momentum,
            name="vote_aggregation",
        )(xyz, features, train=train)

        # conv1/bn1 + conv2/bn2 (proposal_module_detr.py:121-125)
        x = agg_f
        for i in (1, 2):
            x = nn.Dense(128, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)

        memory = nn.Dense(self.d_model, name="input_proj")(x)
        tgt = memory  # 'deformable': queries are the proposals themselves
        tgt_pos = agg_xyz
        shared_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        layer_outs, layer_pos = [], []
        for i in range(self.n_layers):
            tgt, tgt_pos = DeformableDecoderLayer(
                self.d_model, self.heads, self.d_ff, name=f"layer_{i}"
            )(tgt, memory, tgt_pos, agg_xyz, deterministic=not train)
            layer_outs.append(shared_norm(tgt))
            layer_pos.append(tgt_pos)

        # concat per-layer outputs -> hidden_ffn + LN + ReLU (detr3d.py)
        detr_feat = jnp.concatenate(layer_outs, axis=-1)
        detr_feat = nn.Dense(self.d_model, name="hidden_ffn")(detr_feat)
        detr_feat = nn.relu(
            nn.LayerNorm(epsilon=1e-5, name="hidden_norm")(detr_feat)
        )

        nh, ns = self.num_heading_bin, self.num_size_cluster
        logits = nn.Dense(2 + self.num_class, name="class_head")(detr_feat)
        # bbox head = 2-layer MLP (detr3d.py:43)
        box = nn.Dense(self.d_model, name="bbox_mlp0")(detr_feat)
        box = nn.relu(box)
        box = nn.Dense(3 + nh * 2 + ns * 4, name="bbox_mlp1")(box)

        i = 0
        center_offset = box[..., i : i + 3]; i += 3
        heading_scores = box[..., i : i + nh]; i += nh
        heading_res_norm = box[..., i : i + nh]; i += nh
        size_scores = box[..., i : i + ns]; i += ns
        size_res_norm = box[..., i:].reshape(*box.shape[:-1], ns, 3)

        mean = jnp.asarray(mean_size_arr)
        size_cls = jnp.argmax(size_scores, -1)
        size_res = size_res_norm * mean[None, None]
        pred_size = mean[size_cls] + jnp.take_along_axis(
            size_res, size_cls[..., None, None], axis=-2
        )[..., 0, :]

        return {
            "aggregated_vote_xyz": agg_xyz,
            "aggregated_vote_features": agg_f,
            "aggregated_vote_inds": agg_inds,
            "detr_features": detr_feat,
            "transformer_weighted_xyz": layer_pos[-1],
            "transformer_weighted_xyz_all": jnp.stack(layer_pos, axis=0),
            "objectness_scores": logits[..., :2],
            "sem_cls_scores": logits[..., 2:],
            # center_with_bias decode (decode_scores, center = agg + offset)
            "center": agg_xyz + center_offset,
            "pred_center": agg_xyz + center_offset,
            "heading_scores": heading_scores,
            "heading_residuals_normalized": heading_res_norm,
            "heading_residuals": heading_res_norm * (jnp.pi / nh),
            "size_scores": size_scores,
            "size_residuals_normalized": size_res_norm,
            "size_residuals": size_res,
            "pred_size": pred_size,
            "objectness_masks": jnp.argmax(logits[..., :2], -1).astype(
                jnp.float32
            ),
        }
