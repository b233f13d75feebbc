"""JointNet: the 3DVLP joint grounding / captioning / VQA model.

Composition mirrors `models/jointnet/jointnet.py:25-220`:
backbone -> voting (votes L2-normalized, jointnet.py:148-149) -> proposal
-> relation -> BERT language branch -> [mlm] -> match -> [contrast] ->
[caption] -> [answer]. All epoch/flag gating that the reference does with
Python control flow is either static (module config) or masked (epoch
gates inside losses).

The stochastic train-time behaviours share one uniform `random_gate`
scalar per step (the reference draws random.random() once inside the match
module and reuses it in the DIoU loss, match_module.py:94,
loss_grounding.py:239) — the solver draws it and passes it in the batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.config import Config
from vlp3d.models.answer import AnswerModule
from vlp3d.models.backbone import PointNet2Backbone
from vlp3d.models.bert import BertConfig, LangModule
from vlp3d.models.caption import (
    CaptionDecoder,
    causal_caption_mask,
    mask_caption_tokens,
    nearest_proposal_token,
    padding_caption_mask,
)
from vlp3d.models.contrast import ContrastModule
from vlp3d.models.match import MatchModule
from vlp3d.models.proposal import ProposalModule
from vlp3d.models.relation import RelationModule
from vlp3d.models.voting import VotingModule


class JointNet(nn.Module):
    config: Config
    bn_momentum: float = 0.9  # flax convention (1 - torch momentum)

    def setup(self):
        cfg = self.config.model
        ds = self.config.dataset
        import jax.numpy as _jnp

        self.backbone_net = PointNet2Backbone(
            input_feature_dim=cfg.input_feature_dim,
            bn_momentum=self.bn_momentum,
            npoints=tuple(cfg.sa_npoints),
            radii=tuple(cfg.sa_radii),
            nsamples=tuple(cfg.sa_nsamples),
            remat=cfg.remat,
            dtype=(
                _jnp.bfloat16
                if cfg.compute_dtype == "bfloat16"
                else None
            ),
        )
        if cfg.use_mlcv_net:
            from vlp3d.models.mlcvnet import MLCVVotingModule

            self.vgen = MLCVVotingModule(
                cfg.vote_factor, 256, self.bn_momentum
            )
        else:
            self.vgen = VotingModule(cfg.vote_factor, 256, self.bn_momentum)
        self.proposal = ProposalModule(
            num_class=ds.num_class,
            num_heading_bin=ds.num_heading_bin,
            num_proposal=cfg.num_proposal,
            mask_box=cfg.mask_box,
            use_kl_loss=cfg.use_kl_loss,
            use_vote_weight=cfg.use_vote_weight,
            bn_momentum=self.bn_momentum,
        )
        self.relation = RelationModule(
            num_proposals=cfg.num_proposal,
            det_channel=128,
            bn_momentum=self.bn_momentum,
            multiview_offset=cfg.multiview_offset,
            multiview_dim=cfg.multiview_dim,
            reference_obj_gather=cfg.reference_obj_gather,
        )
        if not cfg.no_reference:
            from vlp3d.models.bert import distilbert_config

            self.lang = LangModule(
                num_class=ds.num_class,
                use_lang_classifier=cfg.use_lang_classifier,
                bert_config=(
                    distilbert_config()  # --use_distil, lang_bert_module.py:30-45
                    if cfg.use_distil
                    else BertConfig(fusion_layer=cfg.fusion_layer)
                ),
            )
            self.match = MatchModule(
                num_proposals=cfg.num_proposal,
                use_lang_emb=cfg.use_lang_emb,
                use_reg_head=cfg.use_reg_head,
                bn_momentum=self.bn_momentum,
            )
            if cfg.use_con:
                self.constrast = ContrastModule()
        if not cfg.no_caption:
            self.caption = CaptionDecoder(
                vocab_size=cfg.vocab_size, max_len=cfg.max_des_len + 2
            )
        if cfg.use_mlm:
            self.mlm = CaptionDecoder(
                vocab_size=cfg.vocab_size, max_len=cfg.bert_seq_len + 2
            )
        if cfg.use_answer:
            self.answer = AnswerModule(num_answers=cfg.num_answers)

    def __call__(
        self,
        batch: dict,
        *,
        train: bool = False,
        is_eval: bool = False,
    ) -> dict:
        cfg = self.config.model
        out = {}

        # ---------------- detection branch ----------------
        out.update(self.backbone_net(batch["point_clouds"], train=train))
        seed_xyz = out["fp2_xyz"]
        seed_features = out["fp2_features"]
        out["seed_inds"] = out["fp2_inds"]
        out["seed_xyz"] = seed_xyz
        out["seed_features"] = seed_features

        vote_xyz, vote_features = self.vgen(
            seed_xyz, seed_features, train=train
        )
        # L2-normalize vote features (jointnet.py:148-149)
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / jnp.maximum(norm, 1e-12)
        out["vote_xyz"] = vote_xyz
        out["vote_features"] = vote_features

        rng = self.make_rng("aug") if (train and cfg.mask_box) else None
        out.update(
            self.proposal(vote_xyz, vote_features, train=train, rng=rng)
        )
        out.update(
            self.relation(
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

        if not cfg.no_reference:
            # ---------------- language branch ----------------
            out.update(
                self.lang(
                    batch["input_ids"],
                    batch["bert_attention_mask"],
                    train=train,
                )
            )

            if cfg.use_mlm and train and not is_eval:
                out.update(self._forward_mlm(batch, out))

            # ---------------- matching ----------------
            out.update(
                self.match(
                    out["bbox_feature"],
                    out["lang_fea"],
                    out["lang_emb"],
                    out["objectness_masks"],
                    lang_num_max=batch["input_ids"].shape[1],
                    train=train,
                    random_gate=batch.get("random"),
                )
            )

            # contrast needs GT ref boxes, which exist in train/val
            # batches but not at serving time (is_eval=True); it only
            # produces the OCC/OSC loss inputs, so inference skips it
            if cfg.use_con and not is_eval:
                gt_center, gt_size = self._ref_gt_boxes(batch)
                out.update(
                    self.constrast(
                        out["bbox_feature"],
                        out["lang_emb"],
                        out["pred_center"],
                        out["pred_size"],
                        gt_center,
                        gt_size,
                        out["objectness_masks"],
                        batch["lang_num"],
                        batch["epoch"],
                    )
                )

        # ---------------- caption branch ----------------
        if not cfg.no_caption and not is_eval:
            out.update(self._forward_caption_train(batch, out, train))
        # (eval-time greedy decoding runs outside the module via
        # vlp3d.models.caption.greedy_decode on the caption submodule's
        # params — see eval/captioning.)

        if cfg.use_answer:
            out["answer_scores"] = self.answer(
                out["cross_box_feature"], train=train
            )
        return out

    # ------------------------------------------------------------------
    def _ref_gt_boxes(self, batch):
        """Per-sentence GT ref boxes: center + mean_size[class] + residual
        (param2obb_batch_tensor, model_util_scannet.py:187-190)."""
        mean_size = jnp.asarray(self.config.dataset.mean_size_arr())
        gt_center = batch["ref_center_label_list"][..., 0:3]
        gt_size = (
            mean_size[batch["ref_size_class_label_list"]]
            + batch["ref_size_residual_label_list"]
        )
        return gt_center, gt_size

    def _forward_caption_train(self, batch, out, train):
        cfg = self.config.model
        ids = batch["input_ids"]
        b, l, t = ids.shape
        obj_token, match_idx, dist = nearest_proposal_token(
            out["aggregated_vote_features"],
            out["aggregated_vote_xyz"],
            batch["ref_center_label_list"][..., 0:3],
            l,
        )
        # the captioner consumes des sequences capped at MAX_DES_LEN+2
        # (transformer_captioner.py trains on 32-token des ids, not the
        # 50-token BERT inputs); tokens beyond the cap are truncated
        t_cap = min(t, cfg.max_des_len + 2)
        seq = ids.reshape(b * l, t)[:, :t_cap][:, :-1]
        if train:
            seq, _ = mask_caption_tokens(
                self.make_rng("aug"), seq, cfg.vocab_size
            )
        logp = self.caption(
            obj_token, seq, causal_caption_mask(seq), deterministic=not train
        )
        return {
            "lang_cap": logp[:, 1:],  # drop obj-token position
            "match_idx": match_idx,
            # reference: target_ious = chamfer dist > -1 -> always good
            "good_bbox_masks": dist > -1.0,
            "pred_ious": jnp.mean(dist),
        }

    def _forward_mlm(self, batch, out):
        cfg = self.config.model
        ids = batch["input_ids"]
        b, l, t = ids.shape
        obj_token, match_idx, _ = nearest_proposal_token(
            out["aggregated_vote_features"],
            out["aggregated_vote_xyz"],
            batch["ref_center_label_list"][..., 0:3],
            l,
        )
        seq = ids.reshape(b * l, t)[:, :-1]
        mask_seq, mask_index = mask_caption_tokens(
            self.make_rng("aug"), seq, cfg.vocab_size
        )
        logp = self.mlm(
            obj_token, mask_seq, padding_caption_mask(mask_seq),
            deterministic=False,
        )
        return {"lang_mlm": logp[:, 1:], "mlm_mask_index": mask_index}
