"""Proposal generation: vote aggregation + BRNet-style ROI head + box decode.

Mirrors `models/proposal_module/proposal_module_fcos.py:20-178` and
`ROI_heads/roi_heads.py:15-147`:

  * vote aggregation = SA module (npoint=num_proposal, radius 0.3,
    nsample 16, mlp [128, 128, 128], normalize_xyz);
  * head: 2x (Dense 128 + BN + ReLU), then predictors for objectness (2),
    6-face distances (exp-transformed), heading cls+reg, sem cls, optional
    KL alpha; box/objectness predictor weights use std=0.001 normal init
    (roi_heads.py:72-75);
  * decode (proposal_module_fcos.py:94-144): size = bld + fru; center =
    aggregated_xyz - rotz(heading) applied to (bld - fru)/2; corners via
    get_3d_box_batch — computed ON DEVICE (the reference round-trips
    through numpy each step, proposal_module_fcos.py:127-131; fixed here);
  * optional train-time 30% box masking augmentation (:161-178).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.geometry.boxes import rotate_rotz_rows
from vlp3d.models.layers import SAModule


class ROIHeads(nn.Module):
    """BRNet StandardROIHeads (roi_heads.py:15-147), channels-last."""

    num_heading_bin: int = 1
    num_class: int = 18
    use_kl_loss: bool = False
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, features: jax.Array, *, train: bool = False):
        """features: (B, K, 128) aggregated vote features."""
        x = features
        for _ in range(2):
            x = nn.Dense(
                128, kernel_init=nn.initializers.kaiming_normal()
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(x)
            x = nn.relu(x)

        small_init = nn.initializers.normal(stddev=0.001)
        out = {
            "objectness_scores": nn.Dense(2, kernel_init=small_init)(x),
            "rois": jnp.exp(nn.Dense(6, kernel_init=small_init)(x)),
            "heading_scores": nn.Dense(self.num_heading_bin)(x),
        }
        heading_reg = nn.Dense(self.num_heading_bin)(x)
        out["heading_residuals_normalized"] = heading_reg
        out["heading_residuals"] = heading_reg * (
            jnp.pi / self.num_heading_bin
        )
        out["sem_cls_scores"] = nn.Dense(self.num_class)(x)
        if self.use_kl_loss:
            out["alpha"] = nn.sigmoid(nn.Dense(6)(x)) * 0.1 - 0.05
        return out


def decode_boxes(
    aggregated_vote_xyz: jax.Array,
    rois: jax.Array,
    heading_scores: jax.Array,
    heading_residuals: jax.Array,
    num_heading_bin: int,
):
    """ROI distances -> (center, size, heading), all on device.

    Matches decode_pred_box (proposal_module_fcos.py:94-131): the (bld-fru)/2
    offset is rotated as a row vector through rotz(heading) and subtracted
    from the aggregation center. Corners are NOT produced here —
    (B, K, 8, 3) tensors are pathologically slow to materialize on TPU
    (~4s measured); consumers use closed forms
    (geometry.corner_offsets_flat) or compute corners host-side.
    """
    pred_heading_class = jnp.argmax(heading_scores, axis=-1)  # (B, K)
    pred_heading_residual = jnp.take_along_axis(
        heading_residuals, pred_heading_class[..., None], axis=-1
    )[..., 0]
    pred_heading = (
        pred_heading_class.astype(jnp.float32)
        * (2.0 * jnp.pi / num_heading_bin)
        + pred_heading_residual
    )

    pred_size = rois[..., 0:3] + rois[..., 3:6]
    offset = (rois[..., 0:3] - rois[..., 3:6]) / 2.0
    offset = rotate_rotz_rows(offset, pred_heading)  # row-vector @ R
    pred_center = aggregated_vote_xyz - offset
    return pred_center, pred_size, pred_heading


def mask_boxes(rng: jax.Array, pred_center: jax.Array, pred_size: jax.Array):
    """Train-time 30% box masking augmentation
    (proposal_module_fcos.py:161-178): masked boxes get center ~ N(0, 0.5)
    and size ~ N(1, 1)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    mask = jax.random.bernoulli(k1, 0.3, pred_center.shape[:2])[..., None]
    rand_center = jax.random.normal(k2, pred_center.shape) / 2.0
    rand_size = 1.0 + jax.random.normal(k3, pred_size.shape)
    center = jnp.where(mask, rand_center, pred_center)
    size = jnp.where(mask, rand_size, pred_size)
    return center, size


class ProposalModule(nn.Module):
    num_class: int = 18
    num_heading_bin: int = 1
    num_proposal: int = 256
    seed_feat_dim: int = 256
    mask_box: bool = False
    use_kl_loss: bool = False
    use_vote_weight: bool = False
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array,
        *,
        train: bool = False,
        rng: jax.Array | None = None,
    ):
        """xyz: (B, V, 3) votes; features: (B, V, C) L2-normalized vote feats.

        Returns dict with aggregated_vote_* and decoded box predictions.
        """
        out = {}
        if self.use_vote_weight:
            w = features
            w = nn.Dense(128)(w)
            w = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(w)
            from vlp3d.models.layers import PReLU

            w = PReLU(128)(w)
            w = nn.sigmoid(nn.Dense(1)(w))  # (B, V, 1)
            out["vote_weights"] = w
            features = features * w

        agg_xyz, agg_features, agg_inds = SAModule(
            self.num_proposal,
            0.3,
            16,
            [128, 128, 128],
            normalize_xyz=True,
            bn_momentum=self.bn_momentum,
            name="vote_aggregation",
        )(xyz, features, train=train)

        out["aggregated_vote_xyz"] = agg_xyz
        out["aggregated_vote_features"] = agg_features
        out["aggregated_vote_inds"] = agg_inds

        head = ROIHeads(
            self.num_heading_bin,
            self.num_class,
            self.use_kl_loss,
            self.bn_momentum,
            name="roi_heads",
        )(agg_features, train=train)
        out.update(head)

        center, size, heading = decode_boxes(
            agg_xyz,
            out["rois"],
            out["heading_scores"],
            out["heading_residuals"],
            self.num_heading_bin,
        )
        if self.mask_box and train and rng is not None:
            center, size = mask_boxes(rng, center, size)
        out["pred_center"] = center
        out["pred_size"] = size
        out["pred_heading"] = heading
        out["pred_bbox_feature"] = agg_features
        out["objectness_masks"] = jnp.argmax(
            out["objectness_scores"], axis=-1
        ).astype(jnp.float32)
        return out
