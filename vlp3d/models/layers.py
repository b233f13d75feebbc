"""Shared NN building blocks: point MLPs, set-abstraction, feature propagation.

TPU-native equivalents of the reference's SharedMLP / PointnetSAModuleVotes /
PointnetFPModule (`lib/pointnet2/pytorch_utils.py`,
`lib/pointnet2/pointnet2_modules.py:164-416`). Everything is channels-last:
features are (B, N, C) so the channel axis maps to TPU lanes and the 1x1
convs become Dense matmuls on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from vlp3d.ops import furthest_point_sample, gather_points, query_and_group
from vlp3d.ops.interpolate import interpolate_features

# Residual tag for rematerialization: FPS / ball-query index tensors are
# expensive to recompute (the two no-grad whales of an SA block: the
# Pallas FPS scan and the fused distance/selection pass) but tiny to
# store (int32 (B, M[, K])), so a remat policy of
# `save_only_these_names(POINT_INDS)` keeps them as residuals while the
# fat gathered/MLP activations are recomputed in the backward
# (jax.checkpoint / nn.remat; see PointNet2Backbone.remat).
POINT_INDS = "point_inds"


class PointMLP(nn.Module):
    """Dense + BatchNorm + ReLU stack applied pointwise on the last axis.

    Equivalent to the reference SharedMLP (Conv2d k=1 + BN2d + ReLU,
    lib/pointnet2/pytorch_utils.py). BatchNorm statistics reduce over all
    leading axes, matching torch BN2d over (B, npoint, nsample).

    dtype: compute dtype for the Dense/BN chain (params stay f32).
    bfloat16 halves the HBM traffic of the (B, npoint, nsample, C)
    activations; OFF by default pending real-data accuracy validation.
    """

    channels: Sequence[int]
    bn: bool = True
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        in_dtype = x.dtype
        for c in self.channels:
            x = nn.Dense(c, use_bias=not self.bn, dtype=self.dtype)(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=1e-5,
                    dtype=self.dtype,
                )(x)
            x = nn.relu(x)
        return x.astype(in_dtype)


class SAModule(nn.Module):
    """Set abstraction with vote support (PointnetSAModuleVotes,
    pointnet2_modules.py:164-272): FPS -> ball query -> recentred
    (radius-normalized) grouping -> shared MLP -> max pool.

    TPU optimization (exact math): the first Dense of the shared MLP is a
    linear map, so its feature half is applied to the N points BEFORE the
    neighbourhood gather (linear-then-gather == gather-then-linear) and
    only the mlp[0]-wide pre-activations are gathered — roughly halving the
    dominant gather traffic at SA1/SA2. The xyz half (recentred, optionally
    radius-normalized coordinates) is added after grouping; BatchNorm still
    normalizes the gathered pre-activations, exactly as the reference's
    BN(conv(grouped)).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = True
    bn_momentum: float = 0.9
    dtype: "jnp.dtype | None" = None  # compute dtype for the MLP stack
    fuse_first_layer: bool = True
    # Set when xyz/features are autodiff leaves (raw inputs): in training,
    # the neighbourhood gather then has NO backward scatter at all —
    # gather raw rows, apply the first linear after (linear-before-gather
    # would force a 1M-row sorted-scatter, ~43ms/step at SA1 shapes, just
    # to reach the weight gradients). Inference keeps the fused 64-lane
    # gather, which is 2x faster forward (single-tile rows).
    leaf_inputs: bool = False
    # Tag the FPS/ball-query index tensors with the POINT_INDS residual
    # name for the remat save-policy. Only meaningful under jax.checkpoint
    # (PointNet2Backbone.remat); kept off otherwise so the non-remat
    # compiled program is byte-identical to pre-tag builds (the r04 bench
    # ran with unconditional tags — a bisect suspect, VERDICT r04).
    remat_tags: bool = False

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array | None = None,
        inds: jax.Array | None = None,
        *,
        train: bool = False,
        precomputed: tuple | None = None,
    ):
        """xyz (B, N, 3); features (B, N, C) or None.

        precomputed: optional (new_xyz, grouped, inds) from an external
        front end (the point-sharded large-scene path,
        vlp3d.parallel.point_parallel.large_scene_front): grouped is
        (B, npoint, nsample, 3[+C]) with the leading 3 channels already
        recentred (and radius-normalized when normalize_xyz); the module
        then only runs the MLP stack, with the SAME param tree as the
        dense path.

        Returns (new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]),
        inds (B, npoint) i32).
        """
        tag = (
            (lambda x: checkpoint_name(x, POINT_INDS))
            if self.remat_tags
            else (lambda x: x)
        )
        if precomputed is not None:
            new_xyz, grouped_pre, inds = precomputed
        else:
            grouped_pre = None
            if inds is None:
                inds = tag(furthest_point_sample(xyz, self.npoint))
            new_xyz = gather_points(xyz, inds)

        if not (self.fuse_first_layer and self.use_xyz and features is not None):
            if grouped_pre is not None:
                grouped = grouped_pre
            else:
                grouped, _ = query_and_group(
                    self.radius,
                    self.nsample,
                    xyz,
                    new_xyz,
                    features,
                    use_xyz=self.use_xyz,
                    normalize_xyz=self.normalize_xyz,
                    remat_tag=self.remat_tags,
                )  # (B, npoint, nsample, 3 + C)
            out = PointMLP(
                self.mlp, bn_momentum=self.bn_momentum, dtype=self.dtype
            )(grouped, train=train)
            out = jnp.max(out, axis=2)
            return new_xyz, out, inds

        from vlp3d.ops import ball_query, group_points

        c0 = self.mlp[0]
        # first layer split: W = [W_xyz; W_feat] (the reference's first
        # SharedMLP conv over the concat [xyz_rel, features])
        w_xyz = nn.Dense(c0, use_bias=False, name="first_xyz")
        w_feat = nn.Dense(c0, use_bias=False, name="first_feat")

        scale = 1.0 / self.radius if self.normalize_xyz else 1.0
        if grouped_pre is not None:
            # externally grouped raw rows (xyz half already recentred and
            # scaled); identical math + param tree to the paths below
            x = w_feat(grouped_pre[..., 3:]) + w_xyz(grouped_pre[..., :3])
        elif self.leaf_inputs and train:
            idx = tag(ball_query(self.radius, self.nsample, xyz, new_xyz))
            # xyz/features are raw inputs: gather rows FIRST (the gather
            # has no VJP to compute), then apply the split first linear.
            src = jax.lax.stop_gradient(
                jnp.concatenate([xyz, features], axis=-1)
            )
            grouped = group_points(src, idx)  # (B, M, K, 3 + Cin)
            gxyz = (
                grouped[..., :3] - new_xyz[:, :, None, :]
            ) * scale
            x = w_feat(grouped[..., 3:]) + w_xyz(gxyz)
        else:
            idx = tag(ball_query(self.radius, self.nsample, xyz, new_xyz))
            # Fold the xyz half into the gathered tensor:
            # W(g(xyz) - c)/r == g(W(xyz))/r - W(c)/r, so ONE gather moves
            # both the feature pre-activations and the recentred-coordinate
            # term (separate (B, M, K, 3) xyz gathers lower to ~ns-per-row
            # kCustom gathers, 7-10ms/step at SA1 shapes).
            pre_all = w_feat(features) + w_xyz(xyz) * scale  # (B, N, c0)
            grouped = group_points(pre_all, idx)  # (B, M, K, c0)
            x = grouped - (w_xyz(new_xyz) * scale)[:, :, None, :]

        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
        )(x)
        x = nn.relu(x)
        if len(self.mlp) > 1:
            x = PointMLP(
                self.mlp[1:], bn_momentum=self.bn_momentum, dtype=self.dtype
            )(x, train=train)
        out = jnp.max(x, axis=2)
        return new_xyz, out, inds


class FPModule(nn.Module):
    """Feature propagation (PointnetFPModule, pointnet2_modules.py:356-416):
    3-NN inverse-distance interpolation + skip concat + shared MLP."""

    mlp: Sequence[int]
    bn_momentum: float = 0.9
    dtype: "jnp.dtype | None" = None

    @nn.compact
    def __call__(
        self,
        unknown: jax.Array,
        known: jax.Array,
        unknown_feats: jax.Array | None,
        known_feats: jax.Array,
        *,
        train: bool = False,
    ) -> jax.Array:
        interp = interpolate_features(unknown, known, known_feats)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return PointMLP(
            self.mlp, bn_momentum=self.bn_momentum, dtype=self.dtype
        )(interp, train=train)


class PReLU(nn.Module):
    """Per-channel parametric ReLU (torch nn.PReLU(num_channels))."""

    channels: int
    init_alpha: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param(
            "alpha",
            lambda key, shape: jnp.full(shape, self.init_alpha),
            (self.channels,),
        )
        return jnp.where(x >= 0, x, alpha * x)


class RefLayerNorm(nn.Module):
    """The annotated-transformer LayerNorm the captioner stack uses
    (transformer_captioner.py:115-127): a*(x-mean)/(std + eps) + b, where
    std is torch's BESSEL-CORRECTED std and eps is added to the std (not
    the variance) — both unlike standard LN. Param names match
    nn.LayerNorm (scale/bias) so checkpoints are interchangeable.
    Verified bit-for-bit against the reference module in
    tests/test_refparity_caption.py."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True) * (d / (d - 1))
        return scale * (x - mean) / (jnp.sqrt(var) + self.eps) + bias
