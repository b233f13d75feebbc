"""Classic VoteNet proposal head (the ScanQA-path detector).

Port of `models/vqa/proposal.py:20-120`: vote aggregation SA (npoint=256,
radius 0.3, nsample 16, mlp [128,128,128]) -> 2x Dense(no-bias)+BN+ReLU ->
one head emitting [objectness(2), center offset(3), heading cls+res (NH*2),
size cls+res (NS*4), sem_cls] — the heading/size CLASS+RESIDUAL
parametrization (vs the BRNet 6-distance head used by the joint model).
Decode: center = aggregated_xyz + offset; size = mean_size[argmax] +
residual.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.layers import SAModule


class VoteNetProposalModule(nn.Module):
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_proposal: int = 256
    proposal_size: int = 128
    radius: float = 0.3
    nsample: int = 16
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, xyz, features, mean_size_arr, *, train: bool = False):
        agg_xyz, agg_f, agg_inds = SAModule(
            self.num_proposal,
            self.radius,
            self.nsample,
            [self.proposal_size] * 3,
            normalize_xyz=True,
            bn_momentum=self.bn_momentum,
            name="vote_aggregation",
        )(xyz, features, train=train)

        x = agg_f
        for _ in range(2):
            x = nn.Dense(self.proposal_size, use_bias=False)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(x)
            x = nn.relu(x)
        nh, ns = self.num_heading_bin, self.num_size_cluster
        head = nn.Dense(2 + 3 + nh * 2 + ns * 4 + self.num_class)(x)

        i = 0
        objectness = head[..., i : i + 2]; i += 2
        center_offset = head[..., i : i + 3]; i += 3
        heading_scores = head[..., i : i + nh]; i += nh
        heading_res_norm = head[..., i : i + nh]; i += nh
        size_scores = head[..., i : i + ns]; i += ns
        size_res_norm = head[..., i : i + ns * 3].reshape(
            *head.shape[:-1], ns, 3
        ); i += ns * 3
        sem_cls_scores = head[..., i :]

        center = agg_xyz + center_offset
        heading_residuals = heading_res_norm * (jnp.pi / nh)
        mean = jnp.asarray(mean_size_arr)  # (ns, 3)
        size_residuals = size_res_norm * mean[None, None]
        size_cls = jnp.argmax(size_scores, axis=-1)
        pred_size = mean[size_cls] + jnp.take_along_axis(
            size_residuals, size_cls[..., None, None], axis=-2
        )[..., 0, :]

        return {
            "aggregated_vote_xyz": agg_xyz,
            "aggregated_vote_features": agg_f,
            "aggregated_vote_inds": agg_inds,
            "objectness_scores": objectness,
            "center": center,
            "pred_center": center,
            "heading_scores": heading_scores,
            "heading_residuals_normalized": heading_res_norm,
            "heading_residuals": heading_residuals,
            "size_scores": size_scores,
            "size_residuals_normalized": size_res_norm,
            "size_residuals": size_residuals,
            "pred_size": pred_size,
            "sem_cls_scores": sem_cls_scores,
            "objectness_masks": jnp.argmax(objectness, -1).astype(
                jnp.float32
            ),
        }
