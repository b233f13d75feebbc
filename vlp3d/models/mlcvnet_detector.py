"""MLCVNet standalone detector.

Port of `models/mlcvnet/mlcvnet.py:26-104` + `models/mlcvnet/
proposal_module.py`: PointNet++ backbone -> CGNL-augmented voting ->
vote aggregation whose proposal features pass through two SpatialCGNL
blocks (proposal_module.py:78-79) before the classic VoteNet head.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.config import Config
from vlp3d.models.backbone import PointNet2Backbone
from vlp3d.models.layers import SAModule
from vlp3d.models.mlcvnet import MLCVVotingModule, SpatialCGNL


class MLCVNetDetector(nn.Module):
    config: Config
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

        vote_xyz, vote_features = MLCVVotingModule(
            1, 256, self.bn_momentum, name="vgen"
        )(out["fp2_xyz"], out["fp2_features"], train=train)
        norm = jnp.linalg.norm(vote_features, axis=-1, keepdims=True)
        vote_features = vote_features / jnp.maximum(norm, 1e-12)
        out["vote_xyz"] = vote_xyz
        out["vote_features"] = vote_features

        # vote aggregation, then 2x CGNL over the proposal set
        agg_xyz, agg_f, agg_inds = SAModule(
            cfg.model.num_proposal, 0.3, 16, [128, 128, 128],
            normalize_xyz=True, bn_momentum=self.bn_momentum,
            name="vote_aggregation",
        )(vote_xyz, vote_features, train=train)
        agg_f = SpatialCGNL(128, 64, name="cgnl1")(agg_f)
        agg_f = SpatialCGNL(128, 64, name="cgnl2")(agg_f)

        # VoteNet predictor inlined on the CGNL-refined features (the
        # shared VoteNetProposalModule would re-run its own aggregation)
        x = agg_f
        for i in range(2):
            x = nn.Dense(128, use_bias=False, name=f"conv{i}")(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
                name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        nh = cfg.dataset.num_heading_bin
        ns = cfg.dataset.num_size_cluster
        nc = cfg.dataset.num_class
        headout = nn.Dense(2 + 3 + nh * 2 + ns * 4 + nc, name="predictor")(x)

        mean = jnp.asarray(cfg.dataset.mean_size_arr())
        i = 0
        out["aggregated_vote_xyz"] = agg_xyz
        out["aggregated_vote_features"] = agg_f
        out["aggregated_vote_inds"] = agg_inds
        out["objectness_scores"] = headout[..., i : i + 2]; i += 2
        center_offset = headout[..., i : i + 3]; i += 3
        out["heading_scores"] = headout[..., i : i + nh]; i += nh
        hres = headout[..., i : i + nh]; i += nh
        out["heading_residuals_normalized"] = hres
        out["heading_residuals"] = hres * (jnp.pi / nh)
        out["size_scores"] = headout[..., i : i + ns]; i += ns
        sres = headout[..., i : i + ns * 3].reshape(
            *headout.shape[:-1], ns, 3
        ); i += ns * 3
        out["size_residuals_normalized"] = sres
        out["size_residuals"] = sres * mean[None, None]
        out["sem_cls_scores"] = headout[..., i:]
        out["center"] = agg_xyz + center_offset
        out["pred_center"] = out["center"]
        size_cls = jnp.argmax(out["size_scores"], -1)
        out["pred_size"] = mean[size_cls] + jnp.take_along_axis(
            out["size_residuals"], size_cls[..., None, None], axis=-2
        )[..., 0, :]
        out["objectness_masks"] = jnp.argmax(
            out["objectness_scores"], -1
        ).astype(jnp.float32)
        return out
