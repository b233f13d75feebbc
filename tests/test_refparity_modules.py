"""DIRECT module parity: the reference's torch nn.Modules (random-init,
eval mode) vs our flax modules running the IMPORTED weights.

Covers the transformer primitives (models/transformer/attention.py,
mmattention.py), VotingModule (base_module/voting_module.py),
RelationModule (proposal_module/relation_module.py) and MatchModule
(refnet/match_module.py). With these green plus the BERT golden tests
(test_bert_golden.py), every cross-modal block's math is validated
against the actual reference code, not a transcription.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refimport import randomize_bn_stats
from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.attention import (CrossAttentionDecoderLayer,
                                    MultiHeadAttention)
from vlp3d.models.match import MatchModule
from vlp3d.models.relation import RelationModule
from vlp3d.models.voting import VotingModule


@pytest.fixture(scope="module")
def torch():
    return load_reference()


# ---- torch state_dict -> flax tree helpers -------------------------------

def _lin(sd, name):
    return {"kernel": jnp.asarray(sd[name + ".weight"].numpy().T),
            "bias": jnp.asarray(sd[name + ".bias"].numpy())}


def _ln(sd, name):
    return {"scale": jnp.asarray(sd[name + ".weight"].numpy()),
            "bias": jnp.asarray(sd[name + ".bias"].numpy())}


def _conv1d(sd, name):
    # (out, in, 1) -> Dense (in, out)
    return {"kernel": jnp.asarray(sd[name + ".weight"].numpy()[:, :, 0].T),
            "bias": jnp.asarray(sd[name + ".bias"].numpy())}


def _bn(sd, name):
    params = {"scale": jnp.asarray(sd[name + ".weight"].numpy()),
              "bias": jnp.asarray(sd[name + ".bias"].numpy())}
    stats = {"mean": jnp.asarray(sd[name + ".running_mean"].numpy()),
             "var": jnp.asarray(sd[name + ".running_var"].numpy())}
    return params, stats


def _prelu(sd, name, channels):
    w = sd[name + ".weight"].numpy()
    return {"alpha": jnp.asarray(np.broadcast_to(w, (channels,)).copy())}


def _mha(sd, prefix):
    return {"fc_q": _lin(sd, prefix + ".attention.fc_q"),
            "fc_k": _lin(sd, prefix + ".attention.fc_k"),
            "fc_v": _lin(sd, prefix + ".attention.fc_v"),
            "fc_o": _lin(sd, prefix + ".attention.fc_o"),
            "LayerNorm_0": _ln(sd, prefix + ".layer_norm")}


def _cadl(sd, prefix):
    return {"self_attention": _mha(sd, prefix + ".self_attention"),
            "enc_dec_attention": _mha(sd, prefix + ".enc_dec_attention"),
            "ffn": {"Dense_0": _lin(sd, prefix + ".ffn.linear1"),
                    "Dense_1": _lin(sd, prefix + ".ffn.linear2")},
            "LayerNorm_0": _ln(sd, prefix + ".norm")}


def test_multi_head_attention(torch, rng):
    from models.transformer.attention import MultiHeadAttention as RefMHA

    ref = RefMHA(d_model=128, d_k=32, d_v=32, h=4).eval()
    sd = ref.state_dict()
    q = rng.normal(0, 1, (3, 10, 128)).astype(np.float32)
    kv = rng.normal(0, 1, (3, 17, 128)).astype(np.float32)
    bias = rng.normal(0, 0.5, (3, 4, 10, 17)).astype(np.float32)
    mask = (rng.uniform(size=(3, 1, 1, 17)) > 0.2).astype(np.float32)

    params = {"fc_q": _lin(sd, "attention.fc_q"),
              "fc_k": _lin(sd, "attention.fc_k"),
              "fc_v": _lin(sd, "attention.fc_v"),
              "fc_o": _lin(sd, "attention.fc_o"),
              "LayerNorm_0": _ln(sd, "layer_norm")}
    mod = MultiHeadAttention(128, 4)

    for way, w in (("add", bias), ("mul", np.abs(bias)), ("add", None)):
        with torch.no_grad():
            r = ref(torch.from_numpy(q), torch.from_numpy(kv),
                    torch.from_numpy(kv),
                    attention_mask=torch.from_numpy(mask),
                    attention_weights=(torch.from_numpy(w)
                                       if w is not None else None),
                    way=way)
        ours = mod.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv),
                         jnp.asarray(kv), attention_mask=jnp.asarray(mask),
                         attention_weights=(jnp.asarray(w)
                                            if w is not None else None),
                         way=way)
        np.testing.assert_allclose(np.asarray(ours), r.numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_cross_attention_decoder_layer(torch, rng):
    from models.transformer.mmattention import (
        CrossAttentionDecoderLayer as RefCADL)

    ref = RefCADL(hidden_size=128).eval()
    sd = ref.state_dict()
    q = rng.normal(0, 1, (2, 9, 128)).astype(np.float32)
    kv = rng.normal(0, 1, (2, 13, 128)).astype(np.float32)

    params = {"self_attention": _mha(sd, "self_attention"),
              "enc_dec_attention": _mha(sd, "enc_dec_attention"),
              "ffn": {"Dense_0": _lin(sd, "ffn.linear1"),
                      "Dense_1": _lin(sd, "ffn.linear2")},
              "LayerNorm_0": _ln(sd, "norm")}
    with torch.no_grad():
        r = ref(torch.from_numpy(q), torch.from_numpy(kv),
                torch.from_numpy(kv))
    ours = CrossAttentionDecoderLayer(128).apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
    np.testing.assert_allclose(np.asarray(ours), r.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_voting_module(torch, rng):
    from models.base_module.voting_module import VotingModule as RefVoting

    ref = RefVoting(1, 256).eval()
    sd = ref.state_dict()
    seed_xyz = rng.normal(0, 1, (2, 32, 3)).astype(np.float32)
    feats = rng.normal(0, 1, (2, 32, 256)).astype(np.float32)

    params, stats = {}, {}
    for i, (conv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        params[f"Dense_{i}"] = _conv1d(sd, conv)
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(sd, bn)
    params["Dense_2"] = _conv1d(sd, "conv3")

    with torch.no_grad():
        r_xyz, r_feat = ref(torch.from_numpy(seed_xyz),
                            torch.from_numpy(feats.transpose(0, 2, 1)))
    xyz, feat = VotingModule().apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(seed_xyz), jnp.asarray(feats), train=False)
    np.testing.assert_allclose(np.asarray(xyz), r_xyz.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(feat), r_feat.numpy().transpose(0, 2, 1),
        rtol=1e-4, atol=1e-5)


def test_mlcv_voting_module(torch, rng):
    """MLCVNet CGNL voting (models/mlcvnet/voting_module.py:17-70 +
    CGNL.py:102-151): rank-1 grouped non-local block, grouped z conv,
    GroupNorm residual, then the vote MLP."""
    from models.mlcvnet.voting_module import VotingModule as RefMLCVVoting

    from vlp3d.models.mlcvnet import MLCVVotingModule

    B, S, C = 2, 1024, 256  # the reference hard-codes the 32x32 grid view
    torch.manual_seed(7)
    ref = RefMLCVVoting(1, C).eval()
    randomize_bn_stats(torch, ref)
    sd = ref.state_dict()

    seed_xyz = rng.normal(0, 1, (B, S, 3)).astype(np.float32)
    feats = rng.normal(0, 1, (B, S, C)).astype(np.float32)

    groups, gc, ocg = 4, (C // 2) // 4, C // 4
    zw = sd["sa1.z.weight"].numpy()[:, :, 0, 0]  # (C, planes/groups)
    z_kernel = np.stack(
        [zw[g * ocg:(g + 1) * ocg].T for g in range(groups)])  # (g, gc, ocg)
    params = {
        "cgnl": {
            "t": {"kernel": jnp.asarray(sd["sa1.t.weight"].numpy()[:, :, 0, 0].T)},
            "p": {"kernel": jnp.asarray(sd["sa1.p.weight"].numpy()[:, :, 0, 0].T)},
            "g": {"kernel": jnp.asarray(sd["sa1.g.weight"].numpy()[:, :, 0, 0].T)},
            "z_kernel": jnp.asarray(z_kernel),
            "GroupNorm_0": _ln(sd, "sa1.gn"),
        },
    }
    stats = {}
    for i, (conv, bn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        params[f"Dense_{i}"] = _conv1d(sd, conv)
        params[f"BatchNorm_{i}"], stats[f"BatchNorm_{i}"] = _bn(sd, bn)
    params["Dense_2"] = _conv1d(sd, "conv3")

    with torch.no_grad():
        r_xyz, r_feat = ref(torch.from_numpy(seed_xyz),
                            torch.from_numpy(feats.transpose(0, 2, 1).copy()))
    xyz, feat = MLCVVotingModule(seed_feature_dim=C).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(seed_xyz), jnp.asarray(feats), train=False)
    np.testing.assert_allclose(np.asarray(xyz), r_xyz.numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(feat), r_feat.numpy().transpose(0, 2, 1),
        rtol=2e-4, atol=2e-4)


def test_relation_module(torch, rng):
    from models.proposal_module.relation_module import (
        RelationModule as RefRelation)
    from utils.box_util import get_3d_box_batch

    # N large enough that the reference's scrambled row indexing (see
    # below) stays in bounds, as it does at real scale (N=40960)
    B, K, S, N = 2, 16, 32, 256
    ref = RefRelation(num_proposals=K, hidden_size=128, det_channel=128,
                      head=4, depth=2).eval()
    sd = ref.state_dict()

    feats = rng.normal(0, 1, (B, K, 128)).astype(np.float32)
    center = rng.normal(0, 2, (B, K, 3)).astype(np.float32)
    size = rng.uniform(0.2, 2.0, (B, K, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (B, K)).astype(np.float32)
    corners = get_3d_box_batch(size, heading, center).astype(np.float32)
    # The multiview block is zeroed: the reference's obj-feature gather
    # permutes (B,N,128)->(B,128,N) then reshape(-1,128)s it, scrambling
    # rows (relation_module.py:101-117) — we implement the documented
    # intent (point->seed->proposal gather), so parity on that path is
    # only defined for constant features. The Linear's bias path is
    # still exercised.
    pc = np.zeros((B, N, 140), np.float32)
    pc[..., :6] = rng.normal(0, 1, (B, N, 6))
    seed_inds = rng.integers(0, N, (B, S)).astype(np.int64)
    vote_inds = rng.integers(0, S, (B, K)).astype(np.int64)

    params, stats = {}, {}
    params["Dense_0"] = _conv1d(sd, "features_concat.0")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "features_concat.1")
    params["PReLU_0"] = _prelu(sd, "features_concat.2", 128)
    params["Dense_1"] = _conv1d(sd, "features_concat.3")
    for i in range(2):
        for j, idx in enumerate((0, 3, 6)):
            params[f"attn_fc{i}_{j}"] = _lin(sd, f"self_attn_fc.{i}.{idx}")
        for j, idx in enumerate((2, 5)):
            params[f"attn_ln{i}_{j}"] = _ln(sd, f"self_attn_fc.{i}.{idx}")
        params[f"self_attn_{i}"] = _mha(sd, f"self_attn.{i}")
        params[f"obj_embedding_{i}"] = _lin(sd, f"obj_embedding.{i}")
        params[f"bbox_embedding_{i}"] = _lin(sd, f"bbox_embedding.{i}")

    td = {"pred_bbox_feature": torch.from_numpy(feats),
          "pred_bbox_corner": torch.from_numpy(corners),
          "point_clouds": torch.from_numpy(pc),
          "seed_inds": torch.from_numpy(seed_inds),
          "aggregated_vote_inds": torch.from_numpy(vote_inds)}
    with torch.no_grad():
        td = ref(td)

    out = RelationModule(num_proposals=K).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats), jnp.asarray(center), jnp.asarray(size),
        jnp.asarray(heading), jnp.asarray(pc),
        jnp.asarray(seed_inds.astype(np.int32)),
        jnp.asarray(vote_inds.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["bbox_feature"]),
                               td["bbox_feature"].numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["dist_weights"]),
                               td["dist_weights"].numpy(),
                               rtol=2e-4, atol=2e-4)


def test_match_module(torch, rng):
    from models.refnet.match_module import MatchModule as RefMatch

    B, K, L, T, H = 2, 16, 3, 10, 128
    ref = RefMatch(num_proposals=K, hidden_size=H, det_channel=H, head=4,
                   use_lang_emb=True, depth=2, use_reg_head=True).eval()
    sd = ref.state_dict()

    bbox_feature = rng.normal(0, 1, (B, K, H)).astype(np.float32)
    lang_fea = rng.normal(0, 1, (B * L, T, H)).astype(np.float32)
    lang_emb = rng.normal(0, 1, (B * L, H)).astype(np.float32)
    obj_scores = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    input_ids = np.zeros((B, L, T), np.int64)

    params, stats = {}, {}
    for i, idx in enumerate((0, 3, 6)):  # match MLP
        params[f"Dense_{i}"] = _lin(sd, f"match.{idx}")
    # lang_emb_proj conv stack
    params["Dense_3"] = _conv1d(sd, "lang_emb_proj.0")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "lang_emb_proj.1")
    params["prelu0"] = _prelu(sd, "lang_emb_proj.2", H)
    params["Dense_4"] = _conv1d(sd, "lang_emb_proj.3")
    params["BatchNorm_1"], stats["BatchNorm_1"] = _bn(sd, "lang_emb_proj.4")
    params["prelu1"] = _prelu(sd, "lang_emb_proj.5", H)
    params["Dense_5"] = _conv1d(sd, "lang_emb_proj.6")
    # reg head
    params["Dense_6"] = _lin(sd, "reg_head.0")
    params["BatchNorm_2"], stats["BatchNorm_2"] = _bn(sd, "reg_head.1")
    params["Dense_7"] = _lin(sd, "reg_head.3")
    params["BatchNorm_3"], stats["BatchNorm_3"] = _bn(sd, "reg_head.4")
    params["Dense_8"] = _lin(sd, "reg_head.6")
    for i in range(2):
        params[f"grounding_cross_attn_{i}"] = _cadl(
            sd, f"grounding_cross_attn.{i}")
    params["lang_emb_cross_attn"] = _mha(sd, "lang_emb_cross_attn")

    td = {"objectness_scores": torch.from_numpy(obj_scores),
          "bbox_feature": torch.from_numpy(bbox_feature),
          "input_ids": torch.from_numpy(input_ids),
          "lang_fea": torch.from_numpy(lang_fea),
          "lang_emb": torch.from_numpy(lang_emb),
          "istrain": torch.tensor([0])}
    with torch.no_grad():
        td = ref(td)

    out = MatchModule(num_proposals=K, hidden_size=H, use_lang_emb=True,
                      use_reg_head=True).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(bbox_feature), jnp.asarray(lang_fea),
        jnp.asarray(lang_emb),
        jnp.argmax(jnp.asarray(obj_scores), -1).astype(jnp.float32),
        lang_num_max=L, train=False)

    np.testing.assert_allclose(np.asarray(out["cross_box_feature"]),
                               td["cross_box_feature"].numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["cluster_ref"]),
                               td["cluster_ref"].numpy(),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["pred_center_reg"]),
                               td["pred_center_reg"].numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["pred_size_reg"]),
                               td["pred_size_reg"].numpy(),
                               rtol=2e-4, atol=1e-5)


def test_match_copy_paste_augmentation(torch, rng):
    """The istrain=1 copy-paste branch (match_module.py:96-121): the
    reference gates it on the DATA flag, not module.training, so eval
    mode + istrain=1 + a seeded sub-0.5 gate runs the deterministic
    paste under eval BN/dropout. Our fixed-shape rewrite
    (match.copy_paste_features) must place the same batch-pooled object
    features in the same slots — compared through the full module output
    by feeding the pasted features into the eval-mode forward."""
    import random as pyrandom

    from models.refnet.match_module import MatchModule as RefMatch

    from vlp3d.models.match import copy_paste_features

    B, K, L, T, H = 3, 12, 2, 8, 128
    ref = RefMatch(num_proposals=K, hidden_size=H, det_channel=H, head=4,
                   use_lang_emb=False, depth=2, use_reg_head=False).eval()
    sd = ref.state_dict()

    bbox_feature = rng.normal(0, 1, (B, K, H)).astype(np.float32)
    lang_fea = rng.normal(0, 1, (B * L, T, H)).astype(np.float32)
    lang_emb = rng.normal(0, 1, (B * L, H)).astype(np.float32)
    input_ids = np.zeros((B, L, T), np.int64)
    # objectness: scene 0 mixed, scene 1 nearly all objects, scene 2
    # NO objects (the obj_len-edge branches of the reference loop)
    obj = np.zeros((B, K), np.int64)
    obj[0, [1, 4, 5, 9]] = 1
    obj[1, :-1] = 1
    obj_scores = np.stack([1.0 - obj, obj], axis=-1).astype(np.float32) * 3

    params, stats = {}, {}
    for i, idx in enumerate((0, 3, 6)):
        params[f"Dense_{i}"] = _lin(sd, f"match.{idx}")
    for i in range(2):
        params[f"grounding_cross_attn_{i}"] = _cadl(
            sd, f"grounding_cross_attn.{i}")

    td = {"objectness_scores": torch.from_numpy(obj_scores),
          "bbox_feature": torch.from_numpy(bbox_feature),
          "input_ids": torch.from_numpy(input_ids),
          "lang_fea": torch.from_numpy(lang_fea),
          "lang_emb": torch.from_numpy(lang_emb),
          "istrain": torch.tensor([1])}
    # first draw after seed(1) is 0.134... < 0.5 -> gate ON
    pyrandom.seed(1)
    with torch.no_grad():
        td = ref(td)
    assert td["random"] < 0.5

    pasted = copy_paste_features(
        jnp.asarray(bbox_feature), jnp.asarray(obj.astype(bool))
    )
    # the paste must actually change the non-object slots of scenes 0/2
    assert not np.allclose(np.asarray(pasted), bbox_feature)
    out = MatchModule(num_proposals=K, hidden_size=H).apply(
        {"params": params, "batch_stats": stats},
        pasted, jnp.asarray(lang_fea), jnp.asarray(lang_emb),
        jnp.asarray(obj.astype(np.float32)),
        lang_num_max=L, train=False)
    np.testing.assert_allclose(
        np.asarray(out["cross_box_feature"]),
        td["cross_box_feature"].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out["cluster_ref"]), td["cluster_ref"].numpy(),
        rtol=2e-4, atol=2e-4)


def test_relation_reference_obj_gather(torch, rng):
    """reference_obj_gather=True replicates the scrambled obj-feature
    read BIT-FOR-BIT on nonzero multiview channels: permute+reshape rows
    (128 consecutive N-positions of one channel) indexed with the
    C-stride batch offset (relation_module.py:101-117). The default
    clean gather is intentionally different; this flag exists for exact
    reproduction of the published training setup."""
    from models.proposal_module.relation_module import (
        RelationModule as RefRelation)
    from utils.box_util import get_3d_box_batch

    B, K, S, N = 2, 16, 32, 256
    ref = RefRelation(num_proposals=K, hidden_size=128, det_channel=128,
                      head=4, depth=2).eval()
    sd = ref.state_dict()

    feats = rng.normal(0, 1, (B, K, 128)).astype(np.float32)
    center = rng.normal(0, 2, (B, K, 3)).astype(np.float32)
    size = rng.uniform(0.2, 2.0, (B, K, 3)).astype(np.float32)
    heading = rng.uniform(-np.pi, np.pi, (B, K)).astype(np.float32)
    corners = get_3d_box_batch(size, heading, center).astype(np.float32)
    pc = rng.normal(0, 1, (B, N, 140)).astype(np.float32)  # mv NONZERO
    seed_inds = rng.integers(0, N, (B, S)).astype(np.int64)
    vote_inds = rng.integers(0, S, (B, K)).astype(np.int64)

    params, stats = {}, {}
    params["Dense_0"] = _conv1d(sd, "features_concat.0")
    params["BatchNorm_0"], stats["BatchNorm_0"] = _bn(sd, "features_concat.1")
    params["PReLU_0"] = _prelu(sd, "features_concat.2", 128)
    params["Dense_1"] = _conv1d(sd, "features_concat.3")
    for i in range(2):
        for j, idx in enumerate((0, 3, 6)):
            params[f"attn_fc{i}_{j}"] = _lin(sd, f"self_attn_fc.{i}.{idx}")
        for j, idx in enumerate((2, 5)):
            params[f"attn_ln{i}_{j}"] = _ln(sd, f"self_attn_fc.{i}.{idx}")
        params[f"self_attn_{i}"] = _mha(sd, f"self_attn.{i}")
        params[f"obj_embedding_{i}"] = _lin(sd, f"obj_embedding.{i}")
        params[f"bbox_embedding_{i}"] = _lin(sd, f"bbox_embedding.{i}")

    td = {"pred_bbox_feature": torch.from_numpy(feats),
          "pred_bbox_corner": torch.from_numpy(corners),
          "point_clouds": torch.from_numpy(pc),
          "seed_inds": torch.from_numpy(seed_inds),
          "aggregated_vote_inds": torch.from_numpy(vote_inds)}
    with torch.no_grad():
        td = ref(td)

    out = RelationModule(num_proposals=K, reference_obj_gather=True).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats), jnp.asarray(center), jnp.asarray(size),
        jnp.asarray(heading), jnp.asarray(pc),
        jnp.asarray(seed_inds.astype(np.int32)),
        jnp.asarray(vote_inds.astype(np.int32)), train=False)
    np.testing.assert_allclose(np.asarray(out["bbox_feature"]),
                               td["bbox_feature"].numpy(),
                               rtol=2e-4, atol=2e-4)

    # and the clean default must NOT match on nonzero multiview — the
    # deviation is real, documented, and now opt-out
    out_clean = RelationModule(num_proposals=K).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feats), jnp.asarray(center), jnp.asarray(size),
        jnp.asarray(heading), jnp.asarray(pc),
        jnp.asarray(seed_inds.astype(np.int32)),
        jnp.asarray(vote_inds.astype(np.int32)), train=False)
    assert not np.allclose(np.asarray(out_clean["bbox_feature"]),
                           td["bbox_feature"].numpy(), atol=1e-3)
