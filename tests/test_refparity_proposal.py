"""DIRECT parity for the proposal stack: the reference ProposalModule
(models/proposal_module/proposal_module_fcos.py — vote aggregation SA +
BRNet StandardROIHeads + decode_pred_box) running on CPU via the
pointnet2._ext shim vs our flax ProposalModule under imported weights.

Pins: the vote-weight predictor (Conv-BN-PReLU-Conv-sigmoid) and its
feature gating, FPS/ball-query index trails on votes, the aggregation
SA math, every ROI predictor head (objectness / exp ROIs / heading
cls+reg / sem cls / KL alpha), and the full box decode — rotz row-vector
rotation, center/size recovery, and corner reconstruction
(the reference's numpy get_3d_box_batch round-trip,
proposal_module_fcos.py:127-131, vs our host-side corners).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refimport import bn, dense, import_sa, randomize_bn_stats
from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.geometry import boxes as jboxes
from vlp3d.models.proposal import ProposalModule

B, V, K = 2, 1024, 256


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def _import_proposal(sd):
    params, stats = {}, {}
    # vote-weight predictor: Conv1d(256,128) BN PReLU Conv1d(128,1)
    params["Dense_0"] = dense(sd, "votes_weight_predictor.0")
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn(
        sd, "votes_weight_predictor.1")
    # torch nn.PReLU() has ONE shared alpha; broadcast over our
    # per-channel parameterization
    alpha = float(sd["votes_weight_predictor.2.weight"].numpy()[0])
    params["PReLU_0"] = {"alpha": jnp.full((128,), alpha)}
    params["Dense_1"] = dense(sd, "votes_weight_predictor.3")

    params["vote_aggregation"], stats["vote_aggregation"] = import_sa(
        sd, "vote_aggregation")

    rp, rs = {}, {}
    rp["Dense_0"] = dense(sd, "proposal.convs.0")
    rp["BatchNorm_0"], rs["BatchNorm_0"] = bn(sd, "proposal.convs.1")
    rp["Dense_1"] = dense(sd, "proposal.convs.3")
    rp["BatchNorm_1"], rs["BatchNorm_1"] = bn(sd, "proposal.convs.4")
    rp["Dense_2"] = dense(sd, "proposal.objectness_predictor")
    rp["Dense_3"] = dense(sd, "proposal.box_predictor")
    rp["Dense_4"] = dense(sd, "proposal.heading_cls_predictor")
    rp["Dense_5"] = dense(sd, "proposal.heading_reg_predictor")
    rp["Dense_6"] = dense(sd, "proposal.sem_cls_predictor")
    rp["Dense_7"] = dense(sd, "proposal.alpha_predictor")
    params["roi_heads"], stats["roi_heads"] = rp, rs
    return params, stats


def test_proposal_forward(torch, rng):
    from models.proposal_module.proposal_module_fcos import (
        ProposalModule as RefProposal)

    torch.manual_seed(11)
    ref = RefProposal(
        num_class=18, num_heading_bin=1, num_size_cluster=18,
        mean_size_arr=None, num_proposal=K, sampling="vote_fps",
        use_kl_loss=True, use_vote_weight=True).eval()
    randomize_bn_stats(torch, ref)

    xyz = rng.normal(0, 1.2, (B, V, 3)).astype(np.float32)
    feats = rng.normal(0, 1.0, (B, V, 256)).astype(np.float32)
    # the reference normalizes vote features before the proposal module
    # (jointnet.py:148-149); do the same so the vote-weight gate sees
    # realistic magnitudes
    feats = feats / np.linalg.norm(feats, axis=-1, keepdims=True)

    with torch.no_grad():
        td = ref(torch.from_numpy(xyz),
                 torch.from_numpy(feats.transpose(0, 2, 1).copy()), {})

    params, stats = _import_proposal(ref.state_dict())
    out = ProposalModule(use_kl_loss=True, use_vote_weight=True).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(xyz), jnp.asarray(feats), train=False)

    np.testing.assert_allclose(
        np.asarray(out["vote_weights"])[..., 0],
        td["vote_weights"].numpy()[:, 0, :], atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(out["aggregated_vote_inds"]),
        td["aggregated_vote_inds"].numpy())
    np.testing.assert_allclose(
        np.asarray(out["aggregated_vote_xyz"]),
        td["aggregated_vote_xyz"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out["aggregated_vote_features"]),
        td["aggregated_vote_features"].numpy(), rtol=5e-4, atol=5e-4)

    for k, ref_k, tol in (
        ("objectness_scores", "objectness_scores", 2e-4),
        ("rois", "rois", 2e-4),
        ("heading_scores", "heading_scores", 2e-4),
        ("heading_residuals_normalized", "heading_residuals_normalized",
         2e-4),
        ("heading_residuals", "heading_residuals", 2e-4),
        ("sem_cls_scores", "sem_cls_scores", 2e-4),
        ("alpha", "alpha", 1e-5),
        ("pred_center", "pred_center", 5e-4),
        ("pred_size", "pred_size", 5e-4),
        ("pred_heading", "pred_heading", 2e-4),
    ):
        np.testing.assert_allclose(
            np.asarray(out[k]), td[ref_k].numpy(), atol=tol, err_msg=k)

    # corner reconstruction: the reference materializes pred_bbox_corner
    # via a numpy round-trip each step; we reconstruct host-side from the
    # decoded params with the same get_3d_box_batch semantics
    ours_corners = np.asarray(jboxes.get_3d_box_batch(
        np.asarray(out["pred_size"]), np.asarray(out["pred_heading"]),
        np.asarray(out["pred_center"])))
    np.testing.assert_allclose(
        ours_corners, td["pred_bbox_corner"].numpy(), atol=2e-3)
