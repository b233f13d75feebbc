"""PointPillars pillar encoder (the --use_pc_encoder path).

Port of `models/pointpillars/pointpillars.py:10-160` (PillarLayer +
PillarEncoder). NOTE: in the reference this component is DORMANT — JointNet
never instantiates pc_encoder (import commented out, jointnet.py:19; the
call site would crash) — it is provided here for inventory parity and
standalone use.

Fixed-shape deltas: voxelization returns padded (max_voxels, ...) with a
validity mask instead of the reference's dynamic concatenation; the pillar
canvas scatter uses a masked .at[].set.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.ops.voxelize import hard_voxelize


class PillarEncoder(nn.Module):
    voxel_size: tuple = (0.16, 0.16, 4.0)
    point_cloud_range: tuple = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    max_num_points: int = 32
    max_voxels: int = 16000
    out_channel: int = 64

    @nn.compact
    def __call__(self, points: jax.Array, *, train: bool = False):
        """points: (B, N, C>=3). Returns BEV canvas (B, y_l, x_l, out_c)."""
        vs = self.voxel_size
        pr = self.point_cloud_range
        x_l = int(round((pr[3] - pr[0]) / vs[0]))
        y_l = int(round((pr[4] - pr[1]) / vs[1]))

        def one(pts):
            return hard_voxelize(
                pts, vs, pr, self.max_num_points, self.max_voxels
            )

        vox = jax.vmap(one)(points)
        pillars = vox["voxels"]  # (B, V, P, C)
        coors = vox["coors"]  # (B, V, 3) xyz
        npoints = vox["num_points_per_voxel"]  # (B, V)
        vmask = vox["voxel_mask"]  # (B, V)

        denom = jnp.maximum(npoints, 1)[..., None, None].astype(jnp.float32)
        center = jnp.sum(pillars[..., :3], axis=2, keepdims=True) / denom
        offset_pt = pillars[..., :3] - center

        x_off = pillars[..., 0:1] - (
            coors[..., None, 0:1] * vs[0] + (vs[0] / 2 + pr[0])
        )
        y_off = pillars[..., 1:2] - (
            coors[..., None, 1:2] * vs[1] + (vs[1] / 2 + pr[1])
        )
        feats = jnp.concatenate(
            [pillars, offset_pt, x_off, y_off], axis=-1
        )
        # mmdet3d convention: xy channels replaced by pillar offsets
        # (pointpillars.py:93-96)
        feats = feats.at[..., 0:1].set(x_off).at[..., 1:2].set(y_off)

        pmask = (
            jnp.arange(pillars.shape[2])[None, None, :]
            < npoints[..., None]
        )
        feats = feats * pmask[..., None]

        h = nn.Dense(self.out_channel, use_bias=False)(feats)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(h)
        h = nn.relu(h)
        pooled = jnp.max(h, axis=2)  # (B, V, out_c)
        pooled = pooled * vmask[..., None]

        # scatter onto the BEV canvas
        def scatter(pool_b, coors_b, mask_b):
            canvas = jnp.zeros((y_l + 1, x_l + 1, self.out_channel))
            yx = jnp.where(
                mask_b[:, None], coors_b[:, [1, 0]], jnp.array([y_l, x_l])
            )
            canvas = canvas.at[yx[:, 0], yx[:, 1]].set(pool_b)
            return canvas[:y_l, :x_l]

        return jax.vmap(scatter)(pooled, coors, vmask)
