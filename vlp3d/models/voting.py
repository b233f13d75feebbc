"""Hough voting module.

Mirrors `models/base_module/voting_module.py:11-60`: two Dense+BN+ReLU
blocks then a head predicting per-seed xyz offsets and feature residuals
(vote_factor votes per seed). Channels-last.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class VotingModule(nn.Module):
    vote_factor: int = 1
    seed_feature_dim: int = 256
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(
        self, seed_xyz: jax.Array, seed_features: jax.Array, *, train: bool = False
    ):
        """seed_xyz (B, S, 3); seed_features (B, S, C).

        Returns vote_xyz (B, S*vote_factor, 3), vote_features (B, S*vf, C).
        """
        b, s, _ = seed_xyz.shape
        c = self.seed_feature_dim
        x = seed_features
        for _ in range(2):
            x = nn.Dense(c)(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-5,
            )(x)
            x = nn.relu(x)
        x = nn.Dense((3 + c) * self.vote_factor)(x)
        x = x.reshape(b, s, self.vote_factor, 3 + c)
        offset = x[..., :3]
        vote_xyz = (seed_xyz[:, :, None, :] + offset).reshape(
            b, s * self.vote_factor, 3
        )
        residual = x[..., 3:]
        vote_features = (seed_features[:, :, None, :] + residual).reshape(
            b, s * self.vote_factor, c
        )
        return vote_xyz, vote_features
