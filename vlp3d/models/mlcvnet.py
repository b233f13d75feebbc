"""MLCVNet variant: CGNL non-local self-attention voting.

Port of `models/mlcvnet/{CGNL,voting_module}.py` (selected by
--use_mlcv_net, jointnet.py:63-69). The MLCVNet backbone is structurally
identical to the base PointNet++ backbone (models/mlcvnet/
backbone_module.py:21-132), so JointNet reuses PointNet2Backbone; the
difference is the voting module, which reshapes the 1024 seeds to a 32x32
grid and applies a grouped SpatialCGNL block before the vote MLP
(voting_module.py:38, 56-59).

SpatialCGNL with the linear dot-production kernel reduces to, per group:
att = <phi, g> (a scalar over all c*h*w elements), x = att * theta —
a rank-1 global aggregation (CGNL.py:128-151); then a grouped 1x1 conv,
GroupNorm, and the residual.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SpatialCGNL(nn.Module):
    """Channels-last CGNL. Input (B, N, C_in); planes = C_in // 2, groups=4."""

    inplanes: int
    planes: int
    groups: int = 4
    use_scale: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        residual = x
        t = nn.Dense(self.planes, use_bias=False, name="t")(x)
        p = nn.Dense(self.planes, use_bias=False, name="p")(x)
        g = nn.Dense(self.planes, use_bias=False, name="g")(x)

        gc = self.planes // self.groups
        t = t.reshape(b, n, self.groups, gc)
        p = p.reshape(b, n, self.groups, gc)
        g = g.reshape(b, n, self.groups, gc)
        att = jnp.einsum("bngc,bngc->bg", p, g)  # scalar per (batch, group)
        if self.use_scale:
            att = att / jnp.sqrt(jnp.float32(n * gc))
        out = att[:, None, :, None] * t  # rank-1 aggregation
        out = out.reshape(b, n, self.planes)

        # grouped 1x1 conv back to inplanes (z, groups=self.groups):
        # separate kernel per group via einsum parameterization
        out = out.reshape(b, n, self.groups, gc)
        zk = self.param(
            "z_kernel",
            nn.initializers.lecun_normal(),
            (self.groups, gc, self.inplanes // self.groups),
        )
        out = jnp.einsum("bngc,gco->bngo", out, zk).reshape(
            b, n, self.inplanes
        )
        out = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(out)
        return out + residual


class MLCVVotingModule(nn.Module):
    """CGNL-augmented Hough voting (mlcvnet/voting_module.py:17-70):
    seeds -> 32x32 CGNL grid -> 2x Dense+BN+ReLU -> vote offsets."""

    vote_factor: int = 1
    seed_feature_dim: int = 256
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, seed_xyz, seed_features, *, train: bool = False):
        b, s, c = seed_features.shape
        x = SpatialCGNL(c, c // 2, name="cgnl")(seed_features)
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
        vote_xyz = (seed_xyz[:, :, None, :] + x[..., :3]).reshape(
            b, s * self.vote_factor, 3
        )
        vote_features = (seed_features[:, :, None, :] + x[..., 3:]).reshape(
            b, s * self.vote_factor, c
        )
        return vote_xyz, vote_features
