"""Detection losses: vote, objectness, box + semantic classification.

Vectorized ports of `lib/loss_helper/loss_detection.py` (thresholds
NEAR=FAR=0.3, objectness CE weights [0.2, 0.8], GT_VOTE_FACTOR=3,
distance huber delta 0.15; loss_detection.py:19-258). All reductions use
masked sums with the reference's +1e-6 denominators.

Like the reference (and VoteNet), GT boxes are zero-padded to MAX_NUM_OBJ
and the padding rows PARTICIPATE in the proposal<->GT center matching —
a deliberate parity quirk (loss_detection.py:87-92 matches against the
full padded center_label).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlp3d.geometry.boxes import rotate_rotz_rows
from vlp3d.geometry.nn_distance import huber_loss, nn_distance

NEAR_THRESHOLD = 0.3
FAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def _masked_mean(x, mask, eps=1e-6):
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def compute_vote_loss(
    seed_xyz: jax.Array,  # (B, S, 3)
    vote_xyz: jax.Array,  # (B, S*vf, 3)
    seed_inds: jax.Array,  # (B, S) i32
    vote_label: jax.Array,  # (B, N, 9)
    vote_label_mask: jax.Array,  # (B, N)
):
    """Min-of-min L1 Chamfer between predicted votes and the 3 GT votes
    (loss_detection.py:24-71)."""
    b, s, _ = seed_xyz.shape
    vf = vote_xyz.shape[1] // s

    seed_gt_mask = jnp.take_along_axis(vote_label_mask, seed_inds, axis=1)
    seed_gt_votes = jnp.take_along_axis(
        vote_label, seed_inds[..., None], axis=1
    )  # (B, S, 9)
    seed_gt_votes = seed_gt_votes + jnp.tile(seed_xyz, (1, 1, GT_VOTE_FACTOR))

    votes = vote_xyz.reshape(b * s, vf, 3)
    gt = seed_gt_votes.reshape(b * s, GT_VOTE_FACTOR, 3)
    _, _, dist2, _ = nn_distance(votes, gt, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(b, s)
    return _masked_mean(votes_dist, seed_gt_mask.astype(jnp.float32))


def compute_objectness_loss(
    aggregated_vote_xyz: jax.Array,  # (B, K, 3)
    objectness_scores: jax.Array,  # (B, K, 2)
    center_label: jax.Array,  # (B, K2, 3) zero-padded GT centers
    far_threshold: float = FAR_THRESHOLD,
):
    """Proposal<->GT center matching + weighted CE (loss_detection.py:73-113).

    far_threshold: the joint path has no gray zone (NEAR=FAR=0.3,
    loss_detection.py:19-22); the ScanQA path keeps VoteNet's
    FAR=0.6 gray zone (lib/vqa/loss_helper.py:18-19).

    Returns (loss, objectness_label (B,K) i32, objectness_mask (B,K) f32,
    object_assignment (B,K) i32).
    """
    dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, center_label)
    euclid = jnp.sqrt(dist1 + 1e-6)
    label = (euclid < NEAR_THRESHOLD).astype(jnp.int32)
    mask = (
        (euclid < NEAR_THRESHOLD) | (euclid > far_threshold)
    ).astype(jnp.float32)

    logp = jax.nn.log_softmax(objectness_scores, axis=-1)
    w = jnp.asarray(OBJECTNESS_CLS_WEIGHTS)[label]
    ce = -w * jnp.take_along_axis(logp, label[..., None], axis=-1)[..., 0]
    loss = _masked_mean(ce, mask)
    return loss, label, mask, ind1


def recover_assigned_gt_bboxes(
    aggregated_vote_xyz: jax.Array,  # (B, K, 3)
    object_assignment: jax.Array,  # (B, K) i32
    center_label: jax.Array,  # (B, K2, 3)
    heading_class_label: jax.Array,  # (B, K2) i32
    heading_residual_label: jax.Array,  # (B, K2)
    size_class_label: jax.Array,  # (B, K2) i32
    size_residual_label: jax.Array,  # (B, K2, 3)
    mean_size_arr: jax.Array,  # (num_size_cluster, 3)
    num_heading_bin: int,
):
    """Gather assigned GT box params and derive the 6-face distance targets
    (loss_detection.py:153-211)."""
    ga = object_assignment
    gt_center = jnp.take_along_axis(center_label, ga[..., None], axis=1)
    hcls = jnp.take_along_axis(heading_class_label, ga, axis=1)
    hres = jnp.take_along_axis(heading_residual_label, ga, axis=1)
    if num_heading_bin != 1:
        gt_heading = hcls.astype(jnp.float32) * (
            2 * jnp.pi / num_heading_bin
        ) + hres
    else:  # ScanNet: heading identically 0 (loss_detection.py:170-173)
        gt_heading = jnp.zeros_like(hres)

    scls = jnp.take_along_axis(size_class_label, ga, axis=1)
    sres = jnp.take_along_axis(size_residual_label, ga[..., None], axis=1)
    gt_size = mean_size_arr[scls] + sres  # (B, K, 3)
    half = gt_size / 2.0

    rel = aggregated_vote_xyz - gt_center
    rel = rotate_rotz_rows(rel, -gt_heading)  # row-vector @ R
    bld = half + rel
    fru = half - rel
    gt_distance = jnp.concatenate([bld, fru], axis=-1)  # (B, K, 6)
    return {
        "gt_center": gt_center,
        "gt_heading_class": hcls,
        "gt_heading_residual": hres,
        "gt_heading": gt_heading,
        "gt_distance": gt_distance,
        "gt_size": gt_size,
    }


def compute_box_and_sem_cls_loss(
    preds: dict,
    targets: dict,
    objectness_label: jax.Array,
    num_heading_bin: int,
    mean_size_arr: jax.Array,
):
    """Heading cls/reg + 6-distance huber + semantic CE
    (loss_detection.py:116-150, 215-258).

    preds needs: aggregated_vote_xyz, heading_scores,
    heading_residuals_normalized, rois, sem_cls_scores, object_assignment.
    targets needs: center_label, heading_class_label,
    heading_residual_label, size_class_label, size_residual_label,
    sem_cls_label.
    """
    gt = recover_assigned_gt_bboxes(
        preds["aggregated_vote_xyz"],
        preds["object_assignment"],
        targets["center_label"],
        targets["heading_class_label"],
        targets["heading_residual_label"],
        targets["size_class_label"],
        targets["size_residual_label"],
        mean_size_arr,
        num_heading_bin,
    )
    obj = objectness_label.astype(jnp.float32)

    # heading class CE
    logp = jax.nn.log_softmax(preds["heading_scores"], axis=-1)
    hcls_ce = -jnp.take_along_axis(
        logp, gt["gt_heading_class"][..., None], axis=-1
    )[..., 0]
    heading_cls_loss = _masked_mean(hcls_ce, obj)

    # heading residual huber on the GT bin
    hres_norm_label = gt["gt_heading_residual"] / (jnp.pi / num_heading_bin)
    onehot = jax.nn.one_hot(
        gt["gt_heading_class"], num_heading_bin, dtype=jnp.float32
    )
    pred_res = jnp.sum(
        preds["heading_residuals_normalized"] * onehot, axis=-1
    )
    heading_reg_loss = _masked_mean(
        huber_loss(pred_res - hres_norm_label, delta=1.0), obj
    )

    # 6-face distance huber (delta 0.15)
    dist_loss = jnp.mean(
        huber_loss(preds["rois"] - gt["gt_distance"], delta=0.15), axis=-1
    )
    size_distance_loss = _masked_mean(dist_loss, obj)

    # semantic CE on assigned class
    sem_label = jnp.take_along_axis(
        targets["sem_cls_label"], preds["object_assignment"], axis=1
    )
    logp = jax.nn.log_softmax(preds["sem_cls_scores"], axis=-1)
    sem_ce = -jnp.take_along_axis(logp, sem_label[..., None], axis=-1)[..., 0]
    sem_cls_loss = _masked_mean(sem_ce, obj)

    return heading_cls_loss, heading_reg_loss, size_distance_loss, sem_cls_loss
