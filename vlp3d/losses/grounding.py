"""Grounding losses: OID (IoU-guided DIoU reference loss), language
classification, attribute (vote compactness), vote-weight BCE.

Fully-vectorized ports of `lib/loss_helper/loss_grounding.py` — the
reference's Python double loop over batch x lang_num
(loss_grounding.py:195-321) becomes masked (B, L, K) tensor math.

Faithfully reproduced quirks:
  * the one-hot `labels` use the argmax of the RAW ious while the smooth
    labels use the argmax of the objectness-masked ious (the reference
    masks `ious` in place after snapshotting `ious_np`,
    loss_grounding.py:231-257);
  * epoch < 50: label smoothing 0.95/0.05 over the iou>=0.25 set when it
    has >= 2 members (:248-255);
  * diou_loss normalizes by batch size only, not sentence count (:360);
  * ref loss = SoftmaxRankingLoss with the reference's +1e-8 epsilons
    (lib/loss_helper/loss.py:6-17), per-batch mean over valid sentences.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vlp3d.geometry.boxes import box3d_diou


def softmax_ranking_loss(inputs, targets, row_mask):
    """-sum(log(softmax(x+1e-8)+1e-8) * t) averaged over masked rows
    (loss.py:10-17)."""
    probs = jax.nn.softmax(inputs + 1e-8, axis=-1)
    per_row = -jnp.sum(jnp.log(probs + 1e-8) * targets, axis=-1)
    return jnp.sum(per_row * row_mask, axis=-1) / jnp.maximum(
        jnp.sum(row_mask, axis=-1), 1.0
    )


def softmax_ranking_focal_loss(inputs, targets, mask=None, gamma=2.0,
                               alpha=None):
    """Focal softmax ranking (loss.py:20-51): the target-weighted softmax
    probability p gets the focal factor alpha*(1-p)^gamma before -log(p).

    `alpha` is a per-class weight vector broadcast over the last axis
    (defaults to ones, as the reference's class_num=10000 ones tensor);
    with `mask` the reduction is sum(loss*mask)/(sum(mask)+1e-8), else a
    plain mean over all rows.
    """
    probs = jax.nn.softmax(inputs + 1e-8, axis=-1)
    if alpha is None:
        a = jnp.sum(targets, axis=-1)  # ones[cls] weighted by targets
    else:
        a = jnp.sum(targets * alpha[..., : targets.shape[-1]], axis=-1)
    p = jnp.sum(probs * targets, axis=-1)
    loss = -a * (1.0 - p) ** gamma * jnp.log(p + 1e-8)
    if mask is None:
        return jnp.mean(loss)
    return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-8)


def sigmoid_ranking_loss(inputs, targets):
    """Element-wise BCE on sigmoid(inputs) with the reference's explicit
    +1e-8 epsilons, mean over all elements (loss.py:54-70)."""
    probs = jax.nn.sigmoid(inputs)
    loss = -jnp.log(probs + 1e-8) * targets - jnp.log(1.0 - probs + 1e-8) * (
        1.0 - targets
    )
    return jnp.mean(loss)


def sigmoid_ranking_focal_loss(inputs, targets, mask=None, gamma=2.0,
                               alpha=(1.0, 1.0)):
    """Focal BCE (loss.py:72-98): alpha = (negative, positive) weights;
    masked reduction sum(loss*mask)/(sum(mask)+1e-8) when mask given."""
    probs = jax.nn.sigmoid(inputs)
    pos = -alpha[1] * (1.0 - probs) ** gamma * jnp.log(probs + 1e-8) * targets
    neg = (
        -alpha[0]
        * probs**gamma
        * jnp.log(1.0 - probs + 1e-8)
        * (1.0 - targets)
    )
    loss = pos + neg
    if mask is None:
        return jnp.mean(loss)
    return jnp.sum(loss * mask) / (jnp.sum(mask) + 1e-8)


def compute_diou_loss(
    *,
    pred_center: jax.Array,  # (B, K, 3)
    pred_size: jax.Array,  # (B, K, 3)
    cluster_ref: jax.Array,  # (B*L, K) grounding confidences
    objectness_masks: jax.Array,  # (B, K) f32 argmax objectness
    gt_center: jax.Array,  # (B, L, 3) per-sentence ref GT centers
    gt_size: jax.Array,  # (B, L, 3) per-sentence ref GT sizes
    lang_num: jax.Array,  # (B,) valid sentences per scene
    epoch: jax.Array,  # scalar
    istrain: jax.Array,  # scalar bool/int
    random_gate: jax.Array,  # scalar in [0,1) — shared with match copy-paste
    pred_center_reg: jax.Array | None = None,  # (B, L, K, 3)
    pred_size_reg: jax.Array | None = None,  # (B, L, K, 3)
    alpha: jax.Array | None = None,  # (B, K, 6) heteroscedastic log-vars
):
    """OID loss (loss_grounding.py:129-365).

    Returns dict with ref_loss, diou_loss, cluster_labels (raw one-hot),
    smooth_labels, ious (B, L, K), max_iou_rate_0.25/0.5, and (when alpha
    is given) the heteroscedastic kl_loss of loss_grounding.py:309-321.

    KL quirks reproduced from the reference:
      * alpha channel 3 is unused: center = alpha[..., 0:3], size =
        alpha[..., 4:6] (loss_grounding.py:151-153);
      * nn.SmoothL1Loss() mean-reduces to a per-batch SCALAR, which then
        multiplies the full (K, 3) exp(-alpha_center) map (:316-318);
      * the size branch calls SmoothL1(kl_pred_size, kl_pred_size) — pred
        vs pred, identically zero — so it contributes 0.5*sum(alpha_size)
        exactly (:319-320);
      * preds and GT are detached — the gradient reaches only alpha;
      * the per-sentence target proposal is the RAW (unmasked) iou argmax
        (kl_ind appends ious_ind, :282-286).
    """
    b, k = pred_center.shape[:2]
    l = gt_center.shape[1]

    pc = pred_center[:, None, :, :]
    ps = pred_size[:, None, :, :]
    if pred_center_reg is not None:
        pc = pc + pred_center_reg
        ps = ps + pred_size_reg
    ious, dious = box3d_diou(
        pc, ps, gt_center[:, :, None, :], gt_size[:, :, None, :]
    )  # (B, L, K)

    lang_mask = (
        jnp.arange(l)[None, :] < lang_num[:, None]
    ).astype(jnp.float32)  # (B, L)

    apply_obj_mask = (istrain != 0) & (random_gate < 0.5)
    masked_ious = jnp.where(
        apply_obj_mask, ious * objectness_masks[:, None, :], ious
    )

    raw_ind = jnp.argmax(ious, axis=-1)  # (B, L)
    max_ious = jnp.max(ious, axis=-1)
    has_pos = (max_ious >= 0.25).astype(jnp.float32) * lang_mask

    labels = jax.nn.one_hot(raw_ind, k) * has_pos[..., None]

    masked_ind = jnp.argmax(masked_ious, axis=-1)
    masked_onehot = jax.nn.one_hot(masked_ind, k)
    smooth_mask = (masked_ious >= 0.25).astype(jnp.float32)
    cnt = jnp.sum(smooth_mask, axis=-1, keepdims=True)
    smoothed = jnp.where(
        cnt >= 2,
        smooth_mask * (0.05 / jnp.maximum(cnt - 1, 1.0))
        * (1.0 - masked_onehot)
        + masked_onehot * 0.95,
        masked_onehot,
    )
    smooth_labels = (
        jnp.where(epoch < 50, smoothed, masked_onehot) * has_pos[..., None]
    )
    smooth_labels = jax.lax.stop_gradient(smooth_labels)
    labels = jax.lax.stop_gradient(labels)

    preds = cluster_ref.reshape(b, l, k)
    ref_loss = jnp.mean(softmax_ranking_loss(preds, smooth_labels, lang_mask))
    diou_loss = (
        jnp.sum((1.0 - dious) * smooth_labels * lang_mask[..., None]) / b
    )

    total_lang = jnp.maximum(jnp.sum(lang_num), 1)
    out = {
        "ref_loss": ref_loss,
        "diou_loss": diou_loss,
        "cluster_labels": labels,
        "smooth_labels": smooth_labels,
        "ious": ious,
        "max_iou_rate_0.25": jnp.sum(has_pos) / total_lang,
        "max_iou_rate_0.5": jnp.sum(
            (max_ious >= 0.5).astype(jnp.float32) * lang_mask
        )
        / total_lang,
    }

    if alpha is not None:
        alpha_center = alpha[:, :, 0:3]  # (B, K, 3)
        alpha_size = alpha[:, :, 4:6]  # (B, K, 2); channel 3 unused
        kl_pred_center = jax.lax.stop_gradient(
            jnp.take_along_axis(pred_center, raw_ind[..., None], axis=1)
        )  # (B, L, 3)
        d = jnp.abs(kl_pred_center - jax.lax.stop_gradient(gt_center))
        sl1 = jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)  # beta=1.0
        # nn.SmoothL1Loss() mean over the stacked (lang_num[i], 3) tensor
        sl1_mean = jnp.sum(
            sl1 * lang_mask[..., None], axis=(1, 2)
        ) / jnp.maximum(3.0 * lang_num.astype(jnp.float32), 1.0)  # (B,)
        center_term = sl1_mean * jnp.sum(
            jnp.exp(-alpha_center), axis=(1, 2)
        ) + 0.5 * jnp.sum(alpha_center, axis=(1, 2))
        size_term = 0.5 * jnp.sum(alpha_size, axis=(1, 2))
        out["kl_loss"] = jnp.sum(center_term + size_term) / b

    return out


def compute_lang_classification_loss(
    lang_scores: jax.Array,  # (B*L, num_class)
    object_cat: jax.Array,  # (B, L) i32
    lang_num: jax.Array,  # (B,)
):
    """Per-sentence object-category CE (loss_grounding.py:476-487)."""
    b, l = object_cat.shape
    logp = jax.nn.log_softmax(lang_scores.reshape(b, l, -1), axis=-1)
    ce = -jnp.take_along_axis(logp, object_cat[..., None], axis=-1)[..., 0]
    mask = (jnp.arange(l)[None, :] < lang_num[:, None]).astype(jnp.float32)
    per_batch = jnp.sum(ce * mask, axis=-1) / jnp.maximum(
        jnp.sum(mask, axis=-1), 1.0
    )
    return jnp.mean(per_batch)


def compute_debug_diagnostics(
    *,
    ious: jax.Array,  # (B, L, K) raw (unmasked) per-sentence proposal IoUs
    cluster_ref: jax.Array,  # (B*L, K) grounding confidences
    object_cat: jax.Array,  # (B, L) i32 GT object categories
    gt_size: jax.Array,  # (B, L, 3) per-sentence GT box sizes
    lang_num: jax.Array,  # (B,)
    num_class: int = 18,
):
    """Vectorized `--debug` diagnostics of the reference's OID loop
    (loss_grounding.py:262-306, 327-345):

      * top_iou_rate_k (k=1..5): mean k-th-largest raw IoU per sentence
        (`top_iou_rate += sort_ious[-5:]` then `/ sum(lang_num)`);
      * pred_iou_rate_0.25/0.5: mean fraction of proposals above the
        threshold per sentence;
      * class_iou_rate_c / class_size_c: per GT class, mean IoU of the
        PREDICTED proposal (raw argmax of cluster_ref — not the
        objectness-masked argmax eval uses) and mean GT box volume,
        zero-count classes clamped (`class_cnt[class_cnt==0]+=1`);
      * top_ind: per-scene mean ascending-sort rank of the predicted
        proposal, averaged over scenes, +1. Float IoUs are assumed
        tie-free (rank = #proposals with strictly smaller IoU — matches
        torch.argsort position up to tie order).
    """
    b, l, k = ious.shape
    lang_mask = (
        jnp.arange(l)[None, :] < lang_num[:, None]
    ).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(lang_num).astype(jnp.float32), 1.0)

    out = {}
    top5 = jax.lax.top_k(ious, 5)[0]  # (B, L, 5) descending
    top_sums = jnp.sum(top5 * lang_mask[..., None], axis=(0, 1))  # (5,)
    for i in range(1, 6):
        out[f"top_iou_rate_{i}"] = top_sums[i - 1] / total

    for thr, key in ((0.25, "pred_iou_rate_0.25"), (0.5, "pred_iou_rate_0.5")):
        frac = jnp.mean((ious >= thr).astype(jnp.float32), axis=-1)
        out[key] = jnp.sum(frac * lang_mask) / total

    preds = cluster_ref.reshape(b, l, k)
    pred_ind = jnp.argmax(preds, axis=-1)  # (B, L) raw argmax
    chosen_iou = jnp.take_along_axis(ious, pred_ind[..., None], axis=-1)[
        ..., 0
    ]  # (B, L)

    flat_cat = object_cat.reshape(-1)
    flat_mask = lang_mask.reshape(-1)
    cnt = jax.ops.segment_sum(flat_mask, flat_cat, num_segments=num_class)
    cnt = jnp.maximum(cnt, 1.0)  # class_cnt[class_cnt==0]+=1
    iou_sum = jax.ops.segment_sum(
        (chosen_iou * lang_mask).reshape(-1), flat_cat, num_segments=num_class
    )
    vol = jnp.prod(gt_size, axis=-1)  # (B, L)
    vol_sum = jax.ops.segment_sum(
        (vol * lang_mask).reshape(-1), flat_cat, num_segments=num_class
    )
    # per-class scalar series named like the reference's
    # f"class_iou_rate_{type2class[i]}" TB keys (solver_3dvlp.py:435-436)
    from vlp3d.config import SCANNET_TYPES

    class_iou = iou_sum / cnt  # (num_class,)
    class_size = vol_sum / cnt
    names = (
        SCANNET_TYPES
        if num_class == len(SCANNET_TYPES)
        else [str(i) for i in range(num_class)]
    )
    for i, name in enumerate(names):
        out[f"class_iou_rate_{name}"] = class_iou[i]
        out[f"class_size_{name}"] = class_size[i]

    rank = jnp.sum(
        (ious < chosen_iou[..., None]).astype(jnp.float32), axis=-1
    )  # ascending-sort position
    per_scene = jnp.sum(rank * lang_mask, axis=1) / jnp.maximum(
        lang_num.astype(jnp.float32), 1.0
    )
    out["top_ind"] = jnp.mean(per_scene) + 1.0
    return out


def compute_attr_loss(
    vote_xyz: jax.Array,  # (B, S, 3)
    seed_inds: jax.Array,  # (B, S)
    instance_labels: jax.Array,  # (B, N) i32
    vote_label_mask: jax.Array,  # (B, N)
    num_instances: int = 256,
):
    """Vote compactness per instance (loss_grounding.py:71-126): L1 distance
    of each vote to its instance's mean vote, masked by the GT vote mask.
    The torch_scatter mean becomes a fixed-size segment mean."""
    seed_mask = jnp.take_along_axis(vote_label_mask, seed_inds, axis=1)
    seed_instance = jnp.take_along_axis(instance_labels, seed_inds, axis=1)

    def per_batch(votes, inst):
        seg_sum = jax.ops.segment_sum(votes, inst, num_segments=num_instances)
        seg_cnt = jax.ops.segment_sum(
            jnp.ones((votes.shape[0],)), inst, num_segments=num_instances
        )
        seg_mean = seg_sum / jnp.maximum(seg_cnt, 1.0)[:, None]
        return jnp.sum(jnp.abs(votes - seg_mean[inst]), axis=-1)

    attr_dist = jax.vmap(per_batch)(vote_xyz, seed_instance)
    m = seed_mask.astype(jnp.float32)
    return jnp.sum(attr_dist * m) / (jnp.sum(m) + 1e-6)


def compute_vote_weight_loss(
    vote_weights: jax.Array,  # (B, S, 1) sigmoid outputs
    seed_inds: jax.Array,
    vote_label_mask: jax.Array,
):
    """BCE of predicted vote weights vs GT vote mask
    (loss_grounding.py:60-69)."""
    target = jnp.take_along_axis(vote_label_mask, seed_inds, axis=1).astype(
        jnp.float32
    )
    p = jnp.clip(vote_weights[..., 0], 1e-7, 1.0 - 1e-7)
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.mean(bce)
