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

from vlp3d.ops import furthest_point_sample, gather_points, query_and_group
from vlp3d.ops.interpolate import interpolate_features


class PointMLP(nn.Module):
    """Dense + BatchNorm + ReLU stack applied pointwise on the last axis.

    Equivalent to the reference SharedMLP (Conv2d k=1 + BN2d + ReLU,
    lib/pointnet2/pytorch_utils.py). BatchNorm statistics reduce over all
    leading axes, matching torch BN2d over (B, npoint, nsample).
    """

    channels: Sequence[int]
    bn: bool = True
    bn_momentum: float = 0.9  # flax momentum = 1 - torch momentum

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        for c in self.channels:
            x = nn.Dense(c, use_bias=not self.bn)(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=self.bn_momentum,
                    epsilon=1e-5,
                )(x)
            x = nn.relu(x)
        return x


class SAModule(nn.Module):
    """Set abstraction with vote support (PointnetSAModuleVotes,
    pointnet2_modules.py:164-272): FPS -> ball query -> recentred
    (radius-normalized) grouping -> shared MLP -> max pool.
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    use_xyz: bool = True
    normalize_xyz: bool = True
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: jax.Array | None = None,
        inds: jax.Array | None = None,
        *,
        train: bool = False,
    ):
        """xyz (B, N, 3); features (B, N, C) or None.

        Returns (new_xyz (B, npoint, 3), new_features (B, npoint, mlp[-1]),
        inds (B, npoint) i32).
        """
        if inds is None:
            inds = furthest_point_sample(xyz, self.npoint)
        new_xyz = gather_points(xyz, inds)
        grouped, _ = query_and_group(
            self.radius,
            self.nsample,
            xyz,
            new_xyz,
            features,
            use_xyz=self.use_xyz,
            normalize_xyz=self.normalize_xyz,
        )  # (B, npoint, nsample, 3 + C)
        out = PointMLP(self.mlp, bn_momentum=self.bn_momentum)(
            grouped, train=train
        )
        out = jnp.max(out, axis=2)  # max over the nsample neighbourhood
        return new_xyz, out, inds


class FPModule(nn.Module):
    """Feature propagation (PointnetFPModule, pointnet2_modules.py:356-416):
    3-NN inverse-distance interpolation + skip concat + shared MLP."""

    mlp: Sequence[int]
    bn_momentum: float = 0.9

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
        return PointMLP(self.mlp, bn_momentum=self.bn_momentum)(
            interp, train=train
        )


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
