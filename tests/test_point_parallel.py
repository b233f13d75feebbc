"""Point-axis (SP) sharding: exact parity vs the dense single-device ops.

The point-sharded front end (vlp3d.parallel.point_parallel) must return
bit-identical indices and features to the dense ops on the concatenated
cloud — shard order is global index order, so FPS tie-breaks, ball-query
scan-order first-k, and pad-with-first semantics all merge exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp3d.ops.ball_query import ball_query, query_and_group
from vlp3d.ops.grouping import gather_points, group_points
from vlp3d.ops.sampling import furthest_point_sample
from vlp3d.parallel.point_parallel import (
    POINT_AXIS,
    ball_query_sharded,
    fps_sharded,
    gather_points_sharded,
    group_points_sharded,
    large_scene_front,
    make_mesh_point,
)


def _cloud(rng, b=2, n=1024, pad_origin=32):
    xyz = rng.standard_normal((b, n, 3)).astype(np.float32)
    # include origin-padding points (the FPS skip rule) and duplicated
    # points (tie-breaking)
    xyz[:, -pad_origin:] = 0.0
    xyz[:, 100:108] = xyz[:, 0:8]
    return jnp.asarray(xyz)


def _point_mesh(d=4):
    devices = jax.devices()[:d]
    return Mesh(np.asarray(devices), (POINT_AXIS,))


def test_fps_sharded_matches_dense(rng):
    xyz = _cloud(rng)
    mesh = _point_mesh()
    dense = furthest_point_sample(xyz, 64, impl="xla")

    fn = shard_map(
        lambda x: fps_sharded(x, 64),
        mesh=mesh,
        in_specs=(P(None, POINT_AXIS, None),),
        out_specs=P(),
    )
    sharded = fn(xyz)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(sharded))


@pytest.mark.parametrize(
    "radius,nsample,chunk", [(0.5, 16, 256), (2.0, 32, 32)]
)
def test_ball_query_sharded_matches_dense(rng, radius, nsample, chunk):
    # chunk=32 < M exercises the lax.map center-chunking path inside
    # shard_map (the large-scene configuration)
    xyz = _cloud(rng)
    centers = jnp.asarray(
        rng.standard_normal((2, 96, 3)).astype(np.float32)
    )
    mesh = _point_mesh()
    dense = ball_query(radius, nsample, xyz, centers)

    fn = shard_map(
        lambda x, c: ball_query_sharded(
            radius, nsample, x, c, chunk=chunk
        ),
        mesh=mesh,
        in_specs=(P(None, POINT_AXIS, None), P()),
        out_specs=P(),
    )
    sharded = fn(xyz, centers)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(sharded))


def test_gather_group_sharded_match_dense(rng):
    xyz = _cloud(rng)
    feats = jnp.asarray(
        rng.standard_normal((2, 1024, 8)).astype(np.float32)
    )
    idx2 = jnp.asarray(rng.integers(0, 1024, (2, 50)).astype(np.int32))
    idx3 = jnp.asarray(
        rng.integers(0, 1024, (2, 50, 16)).astype(np.int32)
    )
    mesh = _point_mesh()

    g2 = shard_map(
        lambda f, i: gather_points_sharded(f, i),
        mesh=mesh,
        in_specs=(P(None, POINT_AXIS, None), P()),
        out_specs=P(),
    )(feats, idx2)
    np.testing.assert_array_equal(
        np.asarray(gather_points(feats, idx2)), np.asarray(g2)
    )

    g3 = shard_map(
        lambda f, i: group_points_sharded(f, i),
        mesh=mesh,
        in_specs=(P(None, POINT_AXIS, None), P()),
        out_specs=P(),
    )(feats, idx3)
    np.testing.assert_array_equal(
        np.asarray(group_points(feats, idx3)), np.asarray(g3)
    )


def test_large_scene_front_matches_dense_sa_inputs(rng):
    """The composed point-sharded SA front end (FPS -> centers -> grouped
    neighbourhoods) equals the dense pipeline at SA1-like settings."""
    xyz = _cloud(rng)
    feats = jnp.asarray(
        rng.standard_normal((2, 1024, 6)).astype(np.float32)
    )
    mesh = make_mesh_point(4, 1)
    run = large_scene_front(
        mesh, npoint=64, radius=0.5, nsample=16, normalize_xyz=True
    )
    new_xyz, grouped, fps_idx = run(xyz, feats)

    dense_idx = furthest_point_sample(xyz, 64, impl="xla")
    dense_new = gather_points(xyz, dense_idx)
    dense_grouped, _ = query_and_group(
        0.5, 16, xyz, dense_new, feats, use_xyz=True, normalize_xyz=True
    )
    np.testing.assert_array_equal(
        np.asarray(dense_idx), np.asarray(fps_idx)
    )
    np.testing.assert_allclose(
        np.asarray(dense_new), np.asarray(new_xyz), rtol=0, atol=0
    )
    np.testing.assert_allclose(
        np.asarray(dense_grouped), np.asarray(grouped), atol=1e-6
    )


def test_backbone_large_scene_matches_dense(rng):
    """apply_backbone_large_scene == dense backbone.apply with the SAME
    variables (the SP front end feeds SA1's fused param tree exactly)."""
    from vlp3d.models.backbone import (
        PointNet2Backbone, apply_backbone_large_scene,
    )

    backbone = PointNet2Backbone(
        input_feature_dim=2,
        npoints=(64, 32, 16, 8),
        radii=(0.3, 0.5, 0.8, 1.2),
        nsamples=(8, 8, 4, 4),
    )
    pc = jnp.asarray(
        np.concatenate(
            [
                np.asarray(_cloud(rng, b=2, n=512)),
                rng.standard_normal((2, 512, 2)).astype(np.float32),
            ],
            axis=-1,
        )
    )
    variables = backbone.init(jax.random.key(0), pc)
    dense = backbone.apply(variables, pc)

    mesh = make_mesh_point(4, 1)
    sharded = apply_backbone_large_scene(backbone, variables, pc, mesh)
    assert dense.keys() == sharded.keys()
    np.testing.assert_array_equal(
        np.asarray(dense["sa1_inds"]), np.asarray(sharded["sa1_inds"])
    )
    for k in dense:
        np.testing.assert_allclose(
            np.asarray(dense[k]),
            np.asarray(sharded[k]),
            atol=2e-5,
            err_msg=k,
        )


def test_large_scene_front_dp_x_sp(rng):
    """2D (data, point) mesh: batch over data, points over point."""
    xyz = _cloud(rng, b=4)
    mesh = make_mesh_point(4, 2)
    run = large_scene_front(
        mesh, npoint=32, radius=0.7, nsample=8, normalize_xyz=False
    )
    new_xyz, grouped, fps_idx = run(xyz)

    dense_idx = furthest_point_sample(xyz, 32, impl="xla")
    dense_new = gather_points(xyz, dense_idx)
    dense_grouped, _ = query_and_group(
        0.7, 8, xyz, dense_new, None, use_xyz=True
    )
    np.testing.assert_array_equal(
        np.asarray(dense_idx), np.asarray(fps_idx)
    )
    np.testing.assert_array_equal(
        np.asarray(dense_new), np.asarray(new_xyz)
    )
    np.testing.assert_allclose(
        np.asarray(dense_grouped), np.asarray(grouped), atol=1e-6
    )
