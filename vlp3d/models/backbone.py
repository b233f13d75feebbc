"""PointNet++ backbone: 4 set-abstraction + 2 feature-propagation layers.

Mirrors `models/base_module/backbone_module.py:23-135` (npoint
2048/1024/512/256, radii 0.2/0.4/0.8/1.2, nsample 64/32/16/16, MLPs ending
128/256/256/256, normalize_xyz=True; fp1/fp2 both [512, 256, 256]).
Emits seeds: fp2_xyz (= sa2_xyz), fp2_features (1024 x 256), fp2_inds
(= sa1_inds[:, :1024], indices into the raw input cloud).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlp3d.models.layers import POINT_INDS, FPModule, SAModule


class PointNet2Backbone(nn.Module):
    input_feature_dim: int = 0
    bn_momentum: float = 0.9
    dtype: "jnp.dtype | None" = None  # MLP compute dtype
    # Reference geometry (backbone_module.py:29-63); shrink for tests.
    npoints: tuple = (2048, 1024, 512, 256)
    radii: tuple = (0.2, 0.4, 0.8, 1.2)
    nsamples: tuple = (64, 32, 16, 16)
    # Rematerialize each SA/FP block in the backward pass
    # (jax.checkpoint): the fat per-neighbourhood activations — the
    # (B, npoint, nsample, C) gathered rows and MLP pre-activations that
    # dominate training HBM — are recomputed instead of stashed, while
    # the expensive-to-recompute no-grad index tensors (Pallas FPS, the
    # ball-query selection) stay saved via the POINT_INDS name policy.
    # Trades ~one extra backbone forward for an N-fold activation-memory
    # cut (measured in PERF.md); enables larger batch/points per chip.
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        point_clouds: jax.Array,
        *,
        train: bool = False,
        sa1_precomputed: tuple | None = None,
    ):
        """point_clouds: (B, N, 3 + input_feature_dim).

        sa1_precomputed: optional (new_xyz, grouped, inds) for SA1 from
        the point-sharded large-scene front end (see
        apply_backbone_large_scene); when given, the raw N-point cloud is
        never touched here and N may exceed single-chip capacity.

        Returns dict with sa*_xyz/features/inds and fp2_* seed outputs.
        """
        m = self.bn_momentum
        dt = self.dtype
        xyz = point_clouds[..., :3]
        features = (
            point_clouds[..., 3:] if point_clouds.shape[-1] > 3 else None
        )

        # remat boundaries: one checkpoint segment per SA/FP block, so
        # each block's residuals exist only while ITS backward runs.
        # `train` stays static via the closures. prevent_cse must stay
        # True (the default): the blocks are NOT under a scan, and with
        # False XLA's CSE merges the backward's recompute back into the
        # forward, silently undoing rematerialization (measured: temp
        # bytes bit-identical to the non-remat program).
        def call_sa(mod, xyz_a, feats_a, pre_a):
            return mod(xyz_a, feats_a, train=train, precomputed=pre_a)

        def call_fp(mod, unknown, known, uf, kf):
            return mod(unknown, known, uf, kf, train=train)

        if self.remat:
            policy = jax.checkpoint_policies.save_only_these_names(
                POINT_INDS
            )
            call_sa = nn.remat(call_sa, policy=policy)
            call_fp = nn.remat(call_fp, policy=policy)

        np_, r, ns = self.npoints, self.radii, self.nsamples
        sa1_xyz, sa1_f, sa1_inds = call_sa(SAModule(
            np_[0], r[0], ns[0], [64, 64, 128], bn_momentum=m, name="sa1", dtype=dt,
            leaf_inputs=True,  # raw inputs: scatter-free backward
            remat_tags=self.remat,
        ), xyz, features, sa1_precomputed)
        sa2_xyz, sa2_f, sa2_inds = call_sa(SAModule(
            np_[1], r[1], ns[1], [128, 128, 256], bn_momentum=m, dtype=dt, name="sa2",
            remat_tags=self.remat,
        ), sa1_xyz, sa1_f, None)
        sa3_xyz, sa3_f, sa3_inds = call_sa(SAModule(
            np_[2], r[2], ns[2], [128, 128, 256], bn_momentum=m, dtype=dt, name="sa3",
            remat_tags=self.remat,
        ), sa2_xyz, sa2_f, None)
        sa4_xyz, sa4_f, sa4_inds = call_sa(SAModule(
            np_[3], r[3], ns[3], [128, 128, 256], bn_momentum=m, dtype=dt, name="sa4",
            remat_tags=self.remat,
        ), sa3_xyz, sa3_f, None)

        f = call_fp(
            FPModule([256, 256], bn_momentum=m, dtype=dt, name="fp1"),
            sa3_xyz, sa4_xyz, sa3_f, sa4_f,
        )
        f = call_fp(
            FPModule([256, 256], bn_momentum=m, dtype=dt, name="fp2"),
            sa2_xyz, sa3_xyz, sa2_f, f,
        )

        num_seed = sa2_xyz.shape[1]
        return {
            "sa1_inds": sa1_inds,
            "sa1_xyz": sa1_xyz,
            "sa1_features": sa1_f,
            "sa2_inds": sa2_inds,
            "sa2_xyz": sa2_xyz,
            "sa2_features": sa2_f,
            "sa3_xyz": sa3_xyz,
            "sa3_features": sa3_f,
            "sa4_xyz": sa4_xyz,
            "sa4_features": sa4_f,
            "fp2_features": f,
            "fp2_xyz": sa2_xyz,
            # indices into the raw input cloud (backbone_module.py:134)
            "fp2_inds": sa1_inds[:, :num_seed],
        }


def apply_backbone_large_scene(
    backbone: PointNet2Backbone,
    variables,
    point_clouds: jax.Array,
    mesh,
    *,
    train: bool = False,
    mutable=False,
):
    """Run the backbone on a scene too large for one chip.

    The raw-point stage (SA1's FPS / ball query / neighbourhood grouping
    — the only place the full N-point cloud is touched) runs
    point-sharded over the mesh's 'point' axis
    (vlp3d.parallel.point_parallel.large_scene_front, exact parity vs
    the dense ops); the dense remainder of the backbone then runs on the
    small M=npoints[0] outputs with the SAME variables as a dense apply.

    Args:
      point_clouds: (B, N, 3 + input_feature_dim); shard it over the
        mesh's (data, point) axes with
        `NamedSharding(mesh, P('data', 'point', None))` so N never
        materializes on one device.
      mesh: a Mesh with a 'point' axis (make_mesh_point).

    Returns the standard backbone output dict (same as `apply`).
    """
    from vlp3d.parallel.point_parallel import large_scene_front

    xyz = point_clouds[..., :3]
    features = (
        point_clouds[..., 3:] if point_clouds.shape[-1] > 3 else None
    )
    front = large_scene_front(
        mesh,
        npoint=backbone.npoints[0],
        radius=backbone.radii[0],
        nsample=backbone.nsamples[0],
        use_xyz=True,
        normalize_xyz=True,
    )
    new_xyz, grouped, inds = front(xyz, features)
    return backbone.apply(
        variables,
        point_clouds,
        train=train,
        sa1_precomputed=(new_xyz, grouped, inds),
        mutable=mutable,
    )
