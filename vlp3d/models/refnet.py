"""RefNet: single-task visual grounding model (3DJCG path).

Port of `models/refnet/refnet.py:15-121`: backbone + voting + proposal +
relation + match, without the BERT/contrast/caption branches. The
reference file references a GloVe-GRU LangModule whose import is broken as
checked out (refnet.py:50 — see SURVEY §2.8 stale imports); here the
language branch is the LSTM encoder (models/vqa/lang_module.py semantics)
projected to the 128-d match space, preserving RefNet's contract
(cluster_ref per sentence).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.config import Config
from vlp3d.models.backbone import PointNet2Backbone
from vlp3d.models.lang_lstm import LSTMLangModule
from vlp3d.models.match import MatchModule
from vlp3d.models.proposal import ProposalModule
from vlp3d.models.relation import RelationModule
from vlp3d.models.voting import VotingModule


class RefNet(nn.Module):
    config: Config
    hidden_size: int = 128
    lang_hidden_size: int = 256
    use_bidir: bool = False
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, batch: dict, *, train: bool = False) -> dict:
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
        out["vote_xyz"] = vote_xyz
        out["vote_features"] = vote_features

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

        # language branch: LSTM over word embeddings, projected to 128
        b, l, t, e = batch["lang_feat"].shape
        lang = LSTMLangModule(
            num_object_class=cfg.dataset.num_class,
            use_lang_classifier=cfg.model.use_lang_classifier,
            use_bidir=self.use_bidir,
            hidden_size=self.lang_hidden_size,
            name="lang",
        )(
            batch["lang_feat"].reshape(b * l, t, e),
            batch["lang_len"].reshape(b * l),
            train=train,
        )
        lang_fea = nn.Dense(self.hidden_size, name="lang_proj")(
            lang["lang_fea_lstm"]
        )
        lang_emb = nn.Dense(self.hidden_size, name="lang_emb_proj")(
            lang["lang_emb_lstm"]
        )
        out["lang_fea"] = lang_fea
        out["lang_emb"] = lang_emb
        if "lang_scores" in lang:
            out["lang_scores"] = lang["lang_scores"]

        out.update(
            MatchModule(
                num_proposals=cfg.model.num_proposal,
                bn_momentum=self.bn_momentum,
                name="match",
            )(
                out["bbox_feature"],
                # MatchModule drops the first (CLS) token; the LSTM path
                # has no CLS, so prepend a sentence-embedding slot.
                jnp.concatenate([lang_emb[:, None, :], lang_fea], axis=1),
                lang_emb,
                out["objectness_masks"],
                lang_num_max=l,
                train=train,
                random_gate=batch.get("random"),
            )
        )
        return out
