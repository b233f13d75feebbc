"""ScanQA-path losses (VoteNet heading/size class+residual form).

Vectorized port of `lib/loss_helper/loss_vqa.py` (and its duplicate
lib/vqa/loss_helper.py): center Chamfer + heading/size class CE +
normalized-residual hubers + sem CE; reference loss = SoftmaxRankingLoss
against the best-IoU proposal one-hot; total =
10 * (vote + objectness + box + sem + ref + lang + answer)
(loss_vqa.py:347-356 — note sem_cls enters twice: once inside box_loss at
0.1x and once standalone).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlp3d.geometry.boxes import box3d_iou_aabb
from vlp3d.geometry.nn_distance import huber_loss, nn_distance
from vlp3d.losses.answering import compute_answer_classification_loss
from vlp3d.losses.detection import (
    _masked_mean,
    compute_objectness_loss,
    compute_vote_loss,
)
from vlp3d.losses.grounding import softmax_ranking_loss


def compute_vqa_box_loss(outputs, batch, objectness_label, object_assignment,
                         mean_size_arr, num_heading_bin):
    """center + heading cls/reg + size cls/reg + sem CE
    (loss_vqa.py:117-192)."""
    obj = objectness_label.astype(jnp.float32)
    ga = object_assignment

    dist1, _, dist2, _ = nn_distance(
        outputs["center"], batch["center_label"][..., :3]
    )
    c1 = _masked_mean(dist1, obj)
    c2 = _masked_mean(dist2, batch["box_label_mask"].astype(jnp.float32))
    center_loss = c1 + c2

    hcls_label = jnp.take_along_axis(batch["heading_class_label"], ga, 1)
    logp = jax.nn.log_softmax(outputs["heading_scores"], -1)
    hcls = _masked_mean(
        -jnp.take_along_axis(logp, hcls_label[..., None], -1)[..., 0], obj
    )
    hres_label = jnp.take_along_axis(
        batch["heading_residual_label"], ga, 1
    ) / (jnp.pi / num_heading_bin)
    onehot = jax.nn.one_hot(hcls_label, num_heading_bin)
    pred_res = jnp.sum(
        outputs["heading_residuals_normalized"] * onehot, -1
    )
    hreg = _masked_mean(huber_loss(pred_res - hres_label, 1.0), obj)

    scls_label = jnp.take_along_axis(batch["size_class_label"], ga, 1)
    logp = jax.nn.log_softmax(outputs["size_scores"], -1)
    scls = _masked_mean(
        -jnp.take_along_axis(logp, scls_label[..., None], -1)[..., 0], obj
    )
    sres_label = jnp.take_along_axis(
        batch["size_residual_label"], ga[..., None], 1
    )
    mean = jnp.asarray(mean_size_arr)
    mean_label = mean[scls_label]
    sres_label_norm = sres_label / mean_label
    s_onehot = jax.nn.one_hot(scls_label, mean.shape[0])[..., None]
    pred_sres = jnp.sum(
        outputs["size_residuals_normalized"] * s_onehot, axis=-2
    )
    sreg = _masked_mean(
        jnp.mean(huber_loss(pred_sres - sres_label_norm, 1.0), -1), obj
    )

    sem_label = jnp.take_along_axis(batch["sem_cls_label"], ga, 1)
    logp = jax.nn.log_softmax(outputs["sem_cls_scores"], -1)
    sem = _masked_mean(
        -jnp.take_along_axis(logp, sem_label[..., None], -1)[..., 0], obj
    )
    return center_loss, hcls, hreg, scls, sreg, sem


def compute_vqa_reference_loss(outputs, batch, mean_size_arr):
    """Best-IoU proposal one-hot + SoftmaxRankingLoss
    (loss_vqa.py:195-245). Single ref per sample (VQA datasets)."""
    mean = jnp.asarray(mean_size_arr)
    gt_center = batch["ref_center_label"][..., :3]
    gt_size = mean[batch["ref_size_class_label"]] + batch[
        "ref_size_residual_label"
    ]
    ious = box3d_iou_aabb(
        outputs["pred_center"],
        outputs["pred_size"],
        gt_center[:, None, :],
        gt_size[:, None, :],
    )  # (B, K)
    labels = jax.lax.stop_gradient(
        jax.nn.one_hot(jnp.argmax(ious, -1), ious.shape[-1])
    )
    row_mask = jnp.ones(ious.shape[0])
    loss = jnp.mean(
        softmax_ranking_loss(
            outputs["cluster_ref"][:, None, :], labels[:, None, :],
            row_mask[:, None],
        )
    )
    return loss, labels, ious


def compute_vqa_loss(outputs, batch, mean_size_arr, *, num_heading_bin=1,
                     use_reference=True, use_lang_classifier=True,
                     use_answer=True, loss_weights=None):
    """get_loss (loss_vqa.py:268-357). Returns (loss, metrics)."""
    w = loss_weights or {}
    m = {}
    vote_loss = compute_vote_loss(
        outputs["seed_xyz"], outputs["vote_xyz"], outputs["seed_inds"],
        batch["vote_label"], batch["vote_label_mask"],
    )
    # the ScanQA path keeps VoteNet's 0.3/0.6 gray zone
    # (lib/vqa/loss_helper.py:18-19), unlike the joint path's NEAR=FAR=0.3
    obj_loss, obj_label, obj_mask, assignment = compute_objectness_loss(
        outputs["aggregated_vote_xyz"],
        outputs["objectness_scores"],
        batch["center_label"][..., :3],
        far_threshold=0.6,
    )
    center, hcls, hreg, scls, sreg, sem = compute_vqa_box_loss(
        outputs, batch, obj_label, assignment, mean_size_arr,
        num_heading_bin,
    )
    box_loss = center + 0.1 * hcls + hreg + 0.1 * scls + sreg
    m.update(
        vote_loss=vote_loss, objectness_loss=obj_loss, center_loss=center,
        heading_cls_loss=hcls, heading_reg_loss=hreg, size_cls_loss=scls,
        size_reg_loss=sreg, sem_cls_loss=sem, box_loss=box_loss,
        objectness_label=obj_label, objectness_mask=obj_mask,
        object_assignment=assignment,
    )

    ref_loss = jnp.float32(0.0)
    if use_reference:
        ref_loss, cluster_labels, ious = compute_vqa_reference_loss(
            outputs, batch, mean_size_arr
        )
        m["cluster_labels"] = cluster_labels
    m["ref_loss"] = ref_loss

    lang_loss = jnp.float32(0.0)
    if use_lang_classifier and "lang_scores" in outputs:
        logp = jax.nn.log_softmax(outputs["lang_scores"], -1)
        lang_loss = -jnp.mean(
            jnp.take_along_axis(
                logp, batch["object_cat"][:, None], -1
            )[:, 0]
        )
    m["lang_loss"] = lang_loss

    answer_loss = jnp.float32(0.0)
    if use_answer:
        answer_loss = compute_answer_classification_loss(
            outputs["answer_scores"],
            batch.get("answer_cat_scores"),
            batch.get("answer_cat"),
        )
    m["answer_loss"] = answer_loss

    loss = (
        w.get("vote_loss", 1.0) * vote_loss
        + w.get("objectness_loss", 1.0) * obj_loss
        + w.get("box_loss", 1.0) * box_loss
        + w.get("sem_cls_loss", 1.0) * sem
        + w.get("ref_loss", 1.0) * ref_loss
        + w.get("lang_loss", 1.0) * lang_loss
        + w.get("answer_loss", 1.0) * answer_loss
    ) * 10.0
    m["loss"] = loss
    return loss, m
