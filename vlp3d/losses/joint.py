"""Joint loss orchestrator.

Vectorized port of `get_joint_loss` (lib/loss_helper/loss_joint.py:26-227):

  total = 10 * (vote + 0.1*objectness + box)
        + ref * (0.3 if epoch < 50 else 1.0)
        + 0.3*diou + 0.3*kl + 0.3*lang + 0.3*attr + 0.3*vote_weight
        + (epoch >= 50) * (0.5*lang_con + 2.5*iou_con)
        + 10*mlm + answer + cap
  where box = 0.1*heading_cls + heading_reg + 0.1*sem_cls + 20*size_distance
  (loss_joint.py:57-60).

Epoch-conditional weights become jnp.where gates so the whole step stays
one compiled program across the epoch-50 curriculum switch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.config import Config
from vlp3d.losses.answering import compute_answer_classification_loss
from vlp3d.losses.captioning import compute_cap_loss, compute_mlm_loss
from vlp3d.losses.detection import (
    compute_box_and_sem_cls_loss,
    compute_objectness_loss,
    compute_vote_loss,
)
from vlp3d.losses.grounding import (
    compute_attr_loss,
    compute_debug_diagnostics,
    compute_diou_loss,
    compute_lang_classification_loss,
    compute_vote_weight_loss,
)


def compute_joint_loss(
    config: Config,
    outputs: dict,
    batch: dict,
    *,
    detection: bool = True,
    reference: bool = True,
    caption: bool = False,
):
    """Returns (total_loss, metrics dict). `outputs` is JointNet's forward
    dict; `batch` carries GT labels + epoch/istrain/random scalars."""
    cfg_l = config.loss
    cfg_m = config.model
    ds = config.dataset
    mean_size = jnp.asarray(ds.mean_size_arr())
    epoch = batch["epoch"]
    m = {}

    vote_loss = compute_vote_loss(
        outputs["seed_xyz"],
        outputs["vote_xyz"],
        outputs["seed_inds"],
        batch["vote_label"],
        batch["vote_label_mask"],
    )
    (
        objectness_loss,
        objectness_label,
        objectness_mask,
        object_assignment,
    ) = compute_objectness_loss(
        outputs["aggregated_vote_xyz"],
        outputs["objectness_scores"],
        batch["center_label"][..., 0:3],
    )
    m["objectness_label"] = objectness_label
    m["objectness_mask"] = objectness_mask
    m["object_assignment"] = object_assignment
    total_props = objectness_label.shape[0] * objectness_label.shape[1]
    m["pos_ratio"] = jnp.sum(objectness_label.astype(jnp.float32)) / total_props
    m["neg_ratio"] = jnp.sum(objectness_mask) / total_props - m["pos_ratio"]

    preds = dict(outputs)
    preds["object_assignment"] = object_assignment
    hcls, hreg, size_dist, sem_cls = compute_box_and_sem_cls_loss(
        preds,
        batch,
        objectness_label,
        ds.num_heading_bin,
        mean_size,
    )
    box_loss = 0.1 * hcls + hreg + 0.1 * sem_cls + 20.0 * size_dist

    obj_pred = jnp.argmax(outputs["objectness_scores"], axis=-1)
    m["obj_acc"] = jnp.sum(
        (obj_pred == objectness_label).astype(jnp.float32) * objectness_mask
    ) / (jnp.sum(objectness_mask) + 1e-6)

    m.update(
        vote_loss=vote_loss,
        objectness_loss=objectness_loss,
        heading_cls_loss=hcls,
        heading_reg_loss=hreg,
        size_distance_loss=size_dist,
        sem_cls_loss=sem_cls,
        box_loss=box_loss,
    )

    loss = jnp.float32(0.0)
    if detection:
        loss = (vote_loss + 0.1 * objectness_loss + box_loss) * cfg_l.detection_scale

    if reference:
        gt_center = batch["ref_center_label_list"][..., 0:3]
        gt_size = (
            mean_size[batch["ref_size_class_label_list"]]
            + batch["ref_size_residual_label_list"]
        )
        diou = compute_diou_loss(
            pred_center=outputs["pred_center"],
            pred_size=outputs["pred_size"],
            cluster_ref=outputs["cluster_ref"],
            objectness_masks=outputs["objectness_masks"],
            gt_center=gt_center,
            gt_size=gt_size,
            lang_num=batch["lang_num"],
            epoch=epoch,
            istrain=batch["istrain"],
            random_gate=batch["random"],
            pred_center_reg=outputs.get("pred_center_reg"),
            pred_size_reg=outputs.get("pred_size_reg"),
            alpha=outputs.get("alpha") if cfg_m.use_kl_loss else None,
        )
        m["ref_loss"] = diou["ref_loss"]
        m["diou_loss"] = diou["diou_loss"]
        m["cluster_labels"] = diou["cluster_labels"]
        m["max_iou_rate_0.25"] = diou["max_iou_rate_0.25"]
        m["max_iou_rate_0.5"] = diou["max_iou_rate_0.5"]
        if cfg_l.debug:
            m.update(
                compute_debug_diagnostics(
                    ious=diou["ious"],
                    cluster_ref=outputs["cluster_ref"],
                    object_cat=batch["object_cat_list"],
                    gt_size=gt_size,
                    lang_num=batch["lang_num"],
                )
            )
        ref_w = jnp.where(
            epoch < cfg_l.num_ground_epoch,
            cfg_l.ref_weight_before_50,
            cfg_l.ref_weight_after_50,
        )
        loss = loss + ref_w * diou["ref_loss"]
        if cfg_l.use_diou_loss:
            loss = loss + cfg_l.diou_weight * diou["diou_loss"]
        if cfg_m.use_kl_loss and "kl_loss" in diou:
            m["kl_loss"] = diou["kl_loss"]
            loss = loss + cfg_l.kl_weight * diou["kl_loss"]

        if cfg_m.use_lang_classifier:
            lang_loss = compute_lang_classification_loss(
                outputs["lang_scores"],
                batch["object_cat_list"],
                batch["lang_num"],
            )
            m["lang_loss"] = lang_loss
            loss = loss + cfg_l.lang_weight * lang_loss

        if cfg_l.use_attr_loss:
            attr = compute_attr_loss(
                outputs["vote_xyz"],
                outputs["seed_inds"],
                batch["instance_labels"],
                batch["vote_label_mask"],
            )
            m["attr_loss"] = attr
            loss = loss + cfg_l.attr_weight * attr

        if cfg_m.use_vote_weight:
            vw = compute_vote_weight_loss(
                outputs["vote_weights"],
                outputs["seed_inds"],
                batch["vote_label_mask"],
            )
            m["vote_weight_loss"] = vw
            loss = loss + cfg_l.vote_weight_weight * vw

    if cfg_m.use_con and reference:
        con = (
            cfg_l.lang_con_weight * outputs["lang_con_loss"]
            + cfg_l.iou_con_weight * outputs["iou_con_loss"]
        )
        m["lang_con_loss"] = outputs["lang_con_loss"]
        m["iou_con_loss"] = outputs["iou_con_loss"]
        m["con_loss"] = con
        loss = loss + con  # epoch>=50 gate applied inside ContrastModule

    if cfg_m.use_mlm and "lang_mlm" in outputs:
        mlm = compute_mlm_loss(
            outputs["lang_mlm"],
            batch["input_ids"],
            outputs["mlm_mask_index"],
            outputs["good_bbox_masks"]
            if "good_bbox_masks" in outputs
            else jnp.ones(
                (batch["input_ids"].shape[0] * batch["input_ids"].shape[1],),
                bool,
            ),
        )
        m["mlm_loss"] = mlm
        loss = loss + cfg_l.mlm_weight * mlm

    if cfg_m.use_answer and "answer_scores" in outputs:
        n_rows = outputs["answer_scores"].shape[0]

        def flat(x):
            if x is None:
                return None
            return x.reshape(n_rows, *x.shape[2:]) if x.ndim >= 2 and x.shape[0] != n_rows else x

        ans = compute_answer_classification_loss(
            outputs["answer_scores"],
            flat(batch.get("answer_cat_scores")),
            flat(batch.get("answer_cat")),
        )
        m["answer_loss"] = ans
        loss = loss + ans

    if caption and "lang_cap" in outputs:
        cap_loss, cap_acc = compute_cap_loss(
            outputs["lang_cap"],
            batch["input_ids"],
            outputs["good_bbox_masks"],
        )
        m["cap_loss"] = cap_loss
        m["cap_acc"] = cap_acc
        loss = loss + cap_loss

    m["loss"] = loss
    return loss, m
