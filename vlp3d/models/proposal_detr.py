"""DETR-style proposal module (alternative detector head).

Port of `models/proposal_module/proposal_module_detr.py:70-180` +
`models/detr/` (an alternative head never wired into JointNet — kept for
inventory parity): vote aggregation -> transformer over the aggregated
proposals with a learned xyz positional encoding -> per-proposal class
logits (2 objectness + num_class) and box parameters
(3 center offset + heading cls/res + size cls/res), decoded
votenet-style with center = aggregated_xyz + offset (center_with_bias).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.layers import SAModule


class DETRLayer(nn.Module):
    d_model: int = 128
    heads: int = 4
    d_ff: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        h, dk = self.heads, self.d_model // self.heads
        b, n, _ = x.shape
        y = nn.LayerNorm(epsilon=1e-5)(x)
        q = nn.Dense(self.d_model)(y).reshape(b, n, h, dk)
        k = nn.Dense(self.d_model)(y).reshape(b, n, h, dk)
        v = nn.Dense(self.d_model)(y).reshape(b, n, h, dk)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(jnp.float32(dk)),
            axis=-1,
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, self.d_model)
        x = x + nn.Dropout(self.dropout)(
            nn.Dense(self.d_model)(o), deterministic=deterministic
        )
        y = nn.LayerNorm(epsilon=1e-5)(x)
        y = nn.Dense(self.d_ff)(y)
        y = nn.relu(y)
        y = nn.Dense(self.d_model)(y)
        return x + nn.Dropout(self.dropout)(y, deterministic=deterministic)


class DETRProposalModule(nn.Module):
    num_class: int = 18
    num_heading_bin: int = 1
    num_size_cluster: int = 18
    num_proposal: int = 256
    n_layers: int = 4
    d_model: int = 128
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, xyz, features, mean_size_arr, *, train: bool = False):
        agg_xyz, agg_f, agg_inds = SAModule(
            self.num_proposal, 0.3, 16, [128, 128, 128],
            normalize_xyz=True, bn_momentum=self.bn_momentum,
            name="vote_aggregation",
        )(xyz, features, train=train)

        pos = nn.Dense(self.d_model, name="pos_mlp1")(agg_xyz)
        pos = nn.relu(pos)
        pos = nn.Dense(self.d_model, name="pos_mlp2")(pos)
        x = nn.Dense(self.d_model, name="input_proj")(agg_f) + pos
        for i in range(self.n_layers):
            x = DETRLayer(self.d_model, name=f"layer_{i}")(
                x, deterministic=not train
            )
        x = nn.LayerNorm(epsilon=1e-5, name="final_ln")(x)

        nh, ns = self.num_heading_bin, self.num_size_cluster
        logits = nn.Dense(2 + self.num_class, name="class_head")(x)
        box = nn.Dense(3 + nh * 2 + ns * 4, name="bbox_head")(x)

        i = 0
        center_offset = box[..., i : i + 3]; i += 3
        heading_scores = box[..., i : i + nh]; i += nh
        heading_res_norm = box[..., i : i + nh]; i += nh
        size_scores = box[..., i : i + ns]; i += ns
        size_res_norm = box[..., i:].reshape(*box.shape[:-1], ns, 3)

        mean = jnp.asarray(mean_size_arr)
        size_cls = jnp.argmax(size_scores, -1)
        size_res = size_res_norm * mean[None, None]
        pred_size = mean[size_cls] + jnp.take_along_axis(
            size_res, size_cls[..., None, None], axis=-2
        )[..., 0, :]

        return {
            "aggregated_vote_xyz": agg_xyz,
            "aggregated_vote_features": agg_f,
            "aggregated_vote_inds": agg_inds,
            "objectness_scores": logits[..., :2],
            "sem_cls_scores": logits[..., 2:],
            "center": agg_xyz + center_offset,
            "pred_center": agg_xyz + center_offset,
            "heading_scores": heading_scores,
            "heading_residuals_normalized": heading_res_norm,
            "heading_residuals": heading_res_norm * (jnp.pi / nh),
            "size_scores": size_scores,
            "size_residuals_normalized": size_res_norm,
            "size_residuals": size_res,
            "pred_size": pred_size,
            "objectness_masks": jnp.argmax(logits[..., :2], -1).astype(
                jnp.float32
            ),
        }
