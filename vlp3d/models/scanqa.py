"""ScanQA standalone model: LSTM lang + VoteNet detector + MCAN fusion.

Port of `models/vqa/qa_module.py:9-260`: language LSTM (hidden 128) and
PointNet++ detection run in parallel; 128-d projections of both feed an
MCAN encoder-decoder (2 layers); AttFlat pooling of each stream sums into
the fused feature scoring num_answers; auxiliary heads: per-object
reference confidence (object_cls gated by objectness) and language
object-class classification from the fused feature.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.layers import RefLayerNorm

from vlp3d.config import Config
from vlp3d.models.answer import AttFlat
from vlp3d.models.backbone import PointNet2Backbone
from vlp3d.models.lang_lstm import LSTMLangModule
from vlp3d.models.mcan import MCAN_ED
from vlp3d.models.votenet_head import VoteNetProposalModule
from vlp3d.models.voting import VotingModule


class ScanQA(nn.Module):
    config: Config
    num_answers: int = 8864
    hidden_size: int = 128
    mcan_flat_out_size: int = 1024
    use_object_mask: bool = True
    use_lang_cls: bool = True
    use_reference: bool = True
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False) -> dict:
        cfg = self.config
        out = {}

        # ---------------- language ----------------
        lang = LSTMLangModule(
            num_object_class=cfg.dataset.num_class,
            use_lang_classifier=False,
            hidden_size=self.hidden_size,
            name="lang_net",
        )(batch["lang_feat"], batch["lang_len"], train=train)
        lang_feat = lang["lang_fea_lstm"]  # (B, T, H)
        lang_mask = (
            jnp.arange(lang_feat.shape[1])[None, :]
            >= batch["lang_len"][:, None]
        )  # True = pad

        # ---------------- detection ----------------
        bb = PointNet2Backbone(
            input_feature_dim=cfg.model.input_feature_dim,
            bn_momentum=self.bn_momentum,
            npoints=tuple(cfg.model.sa_npoints),
            radii=tuple(cfg.model.sa_radii),
            nsamples=tuple(cfg.model.sa_nsamples),
            name="detection_backbone",
        )(batch["point_clouds"], train=train)
        out.update(bb)
        out["seed_inds"] = bb["fp2_inds"]
        out["seed_xyz"] = bb["fp2_xyz"]
        out["seed_features"] = bb["fp2_features"]

        vote_xyz, vote_features = VotingModule(
            1, 256, self.bn_momentum, name="voting_net"
        )(bb["fp2_xyz"], bb["fp2_features"], train=train)
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / jnp.maximum(norm, 1e-12)
        out["vote_xyz"] = vote_xyz
        out["vote_features"] = vote_features

        out.update(
            VoteNetProposalModule(
                num_class=cfg.dataset.num_class,
                num_heading_bin=cfg.dataset.num_heading_bin,
                num_size_cluster=cfg.dataset.num_size_cluster,
                num_proposal=cfg.model.num_proposal,
                bn_momentum=self.bn_momentum,
                name="proposal_net",
            )(vote_xyz, vote_features,
              jnp.asarray(cfg.dataset.mean_size_arr()), train=train)
        )

        # ---------------- fusion ----------------
        lang_h = nn.Dense(self.hidden_size, name="lang_feat_linear")(
            lang_feat
        )
        lang_h = nn.gelu(lang_h)
        obj_h = nn.Dense(self.hidden_size, name="object_feat_linear")(
            out["aggregated_vote_features"]
        )
        obj_h = nn.gelu(obj_h)

        obj_mask = (
            (out["objectness_masks"] == 0) if self.use_object_mask else None
        )
        lang_h, obj_h = MCAN_ED(
            self.hidden_size, num_layers=2, name="fusion_backbone"
        )(lang_h, obj_h, lang_mask, obj_mask, deterministic=not train)

        if self.use_reference:
            conf = nn.Dense(self.hidden_size, name="object_cls_0")(obj_h)
            conf = nn.gelu(conf)
            conf = nn.Dropout(0.1)(conf, deterministic=not train)
            conf = nn.Dense(1, name="object_cls_1")(conf)[..., 0]
            out["cluster_ref"] = (
                conf * out["objectness_masks"]
                if self.use_object_mask
                else conf
            )

        lang_flat = AttFlat(
            self.hidden_size, flat_out_size=self.mcan_flat_out_size,
            name="attflat_lang",
        )(lang_h, lang_mask, train=train)
        obj_flat = AttFlat(
            self.hidden_size, flat_out_size=self.mcan_flat_out_size,
            name="attflat_visual",
        )(obj_h, obj_mask, train=train)
        fuse = RefLayerNorm(name="fusion_norm")(
            lang_flat + obj_flat
        )

        if self.use_lang_cls:
            h = nn.Dense(self.hidden_size, name="lang_cls_0")(fuse)
            h = nn.gelu(h)
            h = nn.Dropout(0.1)(h, deterministic=not train)
            out["lang_scores"] = nn.Dense(
                cfg.dataset.num_class, name="lang_cls_1"
            )(h)

        h = nn.Dense(self.hidden_size, name="answer_cls_0")(fuse)
        h = nn.gelu(h)
        h = nn.Dropout(0.3)(h, deterministic=not train)
        out["answer_scores"] = nn.Dense(
            self.num_answers, name="answer_cls_1"
        )(h)
        return out
