"""Positive match: per-sentence best-IoU proposal labels.

Vectorized port of `models/positive_match_module/
positive_match_module.py:30-86` (its call site in JointNet is commented
out, jointnet.py:178-179 — a dormant component kept for inventory parity).
Computes `positive_labels` (argmax-IoU proposal per sentence),
`target_ious`, and `good_bbox_masks` (max IoU >= 0.25).
"""

from __future__ import annotations

import jax.numpy as jnp

from vlp3d.geometry.boxes import box3d_diou


def positive_match(
    pred_center,  # (B, K, 3)
    pred_size,  # (B, K, 3)
    gt_center,  # (B, L, 3) per-sentence ref centers
    gt_size,  # (B, L, 3)
):
    ious, _ = box3d_diou(
        pred_center[:, None], pred_size[:, None],
        gt_center[:, :, None], gt_size[:, :, None],
    )  # (B, L, K)
    b, l, _ = ious.shape
    positive_labels = jnp.argmax(ious, axis=-1).reshape(b * l)
    target_ious = jnp.max(ious, axis=-1).reshape(b * l)
    good = target_ious >= 0.25
    pred_ious = jnp.sum(target_ious * good) / jnp.maximum(
        jnp.sum(good), 1
    )
    return {
        "positive_labels": positive_labels,
        "target_ious": target_ious,
        "good_bbox_masks": good,
        "pred_ious": pred_ious,
    }
