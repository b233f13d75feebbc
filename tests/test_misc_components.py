"""Tests: positive match, visualizers, multiview projection, DETR head."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.data.multiview import (
    ProjectionHelper,
    maxpool_multiview_features,
)
from vlp3d.models.positive_match import positive_match
from vlp3d.utils.visualize import dump_scene


def test_positive_match():
    pred_c = jnp.array([[[0.0, 0, 0], [5, 5, 5]]])  # (1, 2, 3)
    pred_s = jnp.ones((1, 2, 3))
    gt_c = jnp.array([[[0.1, 0, 0], [9, 9, 9]]])  # (1, 2, 3) sentences
    gt_s = jnp.ones((1, 2, 3))
    out = positive_match(pred_c, pred_s, gt_c, gt_s)
    assert int(out["positive_labels"][0]) == 0
    assert bool(out["good_bbox_masks"][0])
    assert not bool(out["good_bbox_masks"][1])  # far box: max iou 0


def test_visualize_dumps(tmp_path):
    xyz = np.random.default_rng(0).normal(size=(50, 3))
    corners = np.random.default_rng(1).normal(size=(2, 8, 3))
    prefix = os.path.join(str(tmp_path), "scene")
    dump_scene(prefix, xyz, corners, corners,
               pcl_color=np.full((50, 3), 128))
    assert os.path.exists(prefix + "_scene.ply")
    assert os.path.exists(prefix + "_pred.obj")
    with open(prefix + "_scene.ply") as f:
        head = f.read(200)
    assert "element vertex 50" in head


def test_multiview_projection():
    # camera at origin looking down +z; one point straight ahead
    proj = ProjectionHelper(
        intrinsics=np.array(
            [[10, 0, 8, 0], [0, 10, 6, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            float,
        ),
        image_dims=(16, 12),
        depth_min=0.1,
        depth_max=10.0,
    )
    points = np.array([[0.0, 0.0, 2.0], [100.0, 0.0, 2.0]])
    fmap = np.zeros((12, 16, 4), np.float32)
    fmap[6, 8] = [1, 2, 3, 4]  # feature at the principal point
    depth = np.full((12, 16), 2.0, np.float32)
    pose = np.eye(4)
    feats = maxpool_multiview_features(points, [(fmap, depth, pose)], proj)
    np.testing.assert_allclose(feats[0], [1, 2, 3, 4])
    np.testing.assert_allclose(feats[1], 0)  # out of frustum


def test_detr_head():
    from vlp3d.models.proposal_detr import DETRProposalModule

    xyz = jnp.asarray(
        np.random.default_rng(0).uniform(0, 4, (2, 64, 3)).astype(np.float32)
    )
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 64, 256)).astype(np.float32)
    )
    mod = DETRProposalModule(num_proposal=16, n_layers=2)
    v = mod.init({"params": jax.random.key(0)}, xyz, feats,
                 np.ones((18, 3), np.float32))
    out, _ = mod.apply(v, xyz, feats, np.ones((18, 3), np.float32),
                       train=True, mutable=["batch_stats"],
                       rngs={"dropout": jax.random.key(1)})
    assert out["pred_center"].shape == (2, 16, 3)
    assert out["sem_cls_scores"].shape == (2, 16, 18)
    assert bool(jnp.isfinite(out["pred_size"]).all())
    # deformable decoder refines per-layer positions (transformer3D.py:424)
    assert out["transformer_weighted_xyz"].shape == (2, 16, 3)
    assert out["transformer_weighted_xyz_all"].shape == (2, 2, 16, 3)
    assert not np.allclose(
        np.asarray(out["transformer_weighted_xyz"]),
        np.asarray(out["aggregated_vote_xyz"]),
    )
    assert out["detr_features"].shape == (2, 16, 288)


def test_idw_attention_mask():
    """Nearest-5 inverse-distance weights, -1e9 elsewhere; rows of the
    finite entries sum to 1 (transformer3D.py:305-316)."""
    from vlp3d.models.proposal_detr import NEAR_KTH, idw_attention_mask

    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0, 4, (2, 32, 3)).astype(np.float32))
    mask = np.asarray(idw_attention_mask(pos, pos))[:, 0]  # (2, 32, 32)
    finite = mask > -1e8
    assert (finite.sum(-1) == NEAR_KTH).all()
    np.testing.assert_allclose(
        np.where(finite, mask, 0.0).sum(-1), 1.0, rtol=1e-4
    )
    # self is always among the nearest (dist 0 -> weight max)
    diag = mask[:, np.arange(32), np.arange(32)]
    assert (diag > -1e8).all()
