"""DIRECT parity for the FULL JointNet forward: the reference
models/jointnet/jointnet.py composition running on CPU (pointnet2._ext
shim + offline-patched BERT construction) vs our flax JointNet under a
complete imported weight tree.

Module-level parity tests pin each block; this pins the WIRING between
them: seed/vote plumbing, the vote-feature L2 normalization
(jointnet.py:148-149), proposal decode feeding relation's distance bias,
the relation->match->contrast feature flow, BERT text-mode encode +
projection + CLS split, and the answer head on cross_box_feature — with
every flag-gated branch on (vote weights, KL alpha, reg head, lang_emb
scorer, OCC/OSC contrast, answer).

Offline BERT: the reference loads bert-base-uncased via
from_pretrained (lang_bert_module.py:34-38) and a config json missing
from the checkout; the test fabricates the standard bert-base config
(ALBEF fusion_layer=6), points CONF at it, and patches from_pretrained
to config-construction — weights are random either way, and are imported
into our encoder, so values still pin the math.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refimport import (bn, conv_kernel, dense, emb, import_point_mlp,
                       import_sa, import_xbert_text, lin, ln,
                       randomize_bn_stats)
from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.config import Config, DatasetConfig, ModelConfig
from vlp3d.models.jointnet import JointNet

B, N, K, L, T = 2, 2048, 32, 3, 50
N_ANSWERS = 7


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def ref_jointnet(torch, tmp_path_factory):
    ref, dc = build_ref_jointnet(
        torch, tmp_path_factory.mktemp("bertcfg"),
        input_feature_dim=132, num_proposal=K, use_answer=True,
        num_answers=N_ANSWERS,
    )
    return ref, dc


def build_ref_jointnet(torch, tmp, *, input_feature_dim, num_proposal,
                       use_answer=False, num_answers=1, seed=31):
    """Construct the reference JointNet on CPU with the offline-patched
    BERT machinery; reusable by the end-to-end loss capstone
    (tests/test_refparity_e2e.py)."""
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig

    dc = ScannetDatasetConfig()
    bert_cfg = {
        "architectures": ["BertForMaskedLM"],
        "attention_probs_dropout_prob": 0.1,
        "hidden_act": "gelu", "hidden_dropout_prob": 0.1,
        "hidden_size": 768, "initializer_range": 0.02,
        "intermediate_size": 3072, "layer_norm_eps": 1e-12,
        "max_position_embeddings": 512, "model_type": "bert",
        "num_attention_heads": 12, "num_hidden_layers": 12,
        "pad_token_id": 0, "type_vocab_size": 2, "vocab_size": 30522,
        "fusion_layer": 6, "encoder_width": 768,
    }
    cfg_path = tmp / "config_bert.json"
    cfg_path.write_text(json.dumps(bert_cfg))
    # minimal local tokenizer asset so from_pretrained works offline
    vocab_dir = tmp / "bert-local"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
                  + [f"tok{i}" for i in range(100)]))
    CONF.BERT_CONFIG = str(cfg_path)
    CONF.BERT_TEXT_ENCODER = str(vocab_dir)

    from models.lang_bert_module.bert import tokenization_bert, xbert

    orig = xbert.BertForMaskedLM.from_pretrained
    xbert.BertForMaskedLM.from_pretrained = classmethod(
        lambda cls, name, config=None, **kw: cls(config))
    # the vendored tokenizer targets an older transformers base class and
    # breaks on load under the installed version; the forward path never
    # uses it (only mlm()/decode do), so a stub suffices
    orig_tok = tokenization_bert.BertTokenizer.from_pretrained
    tokenization_bert.BertTokenizer.from_pretrained = classmethod(
        lambda cls, name, **kw: object())
    try:
        from models.jointnet.jointnet import JointNet as RefJointNet

        torch.manual_seed(seed)
        ref = RefJointNet(
            num_class=18, num_heading_bin=1, num_size_cluster=18,
            mean_size_arr=dc.mean_size_arr, vocabulary=None,
            input_feature_dim=input_feature_dim,
            num_proposal=num_proposal, no_caption=True,
            use_lang_classifier=True, dataset_config=dc, use_con=True,
            use_lang_emb=True, use_reg_head=True, use_kl_loss=True,
            use_answer=use_answer, num_answers=num_answers,
            use_vote_weight=True).eval()
    finally:
        xbert.BertForMaskedLM.from_pretrained = orig
        tokenization_bert.BertTokenizer.from_pretrained = orig_tok
    randomize_bn_stats(torch, ref)
    # the std=0.001 objectness init (roi_heads.py:72-75) plus randomized
    # BN stats leaves ~no positive-objectness proposals; bias class 1 so
    # the contrast/match masked paths are actually exercised
    with torch.no_grad():
        ref.proposal.proposal.objectness_predictor.bias.copy_(
            torch.tensor([-0.5, 0.5]))
    return ref, dc


# the full state-dict mapping is PRODUCT code; using it here makes the
# direct-parity forward below validate the production importer
from vlp3d.models.torch_import import import_jointnet_state_dict


def _import_jointnet(sd):
    return import_jointnet_state_dict(sd, fusion_layer=6)


def test_jointnet_forward(ref_jointnet, rng):
    import torch

    ref, dc = ref_jointnet

    pc = rng.normal(0, 1.5, (B, N, 3 + 132)).astype(np.float32)
    pc[..., 6:134] = 0.0  # multiview block (see test_refparity_modules)
    input_ids = rng.integers(1, 30000, (B, L, T))
    input_ids[..., 0] = 101
    bert_mask = np.ones((B, L, T), np.int64)
    bert_mask[:, :, -8:] = 0
    lang_num = np.array([L, L - 1], np.int64)
    ref_center = rng.normal(0, 1.5, (B, L, 3)).astype(np.float32)
    ref_size_cls = rng.integers(0, 18, (B, L))
    ref_size_res = rng.uniform(-0.05, 0.3, (B, L, 3)).astype(np.float32)

    # pass 1 (reference only): discover decoded proposal boxes so the
    # per-sentence GT can be planted on top of them — otherwise every
    # IoU>0.25 contrast target is zero and the OCC/OSC math is untested
    td = {
        "point_clouds": torch.from_numpy(pc),
        "input_ids": torch.from_numpy(input_ids),
        "bert_attention_mask": torch.from_numpy(bert_mask),
        "lang_num": torch.from_numpy(lang_num),
        "epoch": 60,
        "istrain": torch.tensor([0]),
        "ref_center_label_list": torch.from_numpy(ref_center),
        "ref_heading_class_label_list": torch.from_numpy(
            np.zeros((B, L), np.int64)),
        "ref_heading_residual_label_list": torch.from_numpy(
            np.zeros((B, L), np.float32)),
        "ref_size_class_label_list": torch.from_numpy(ref_size_cls),
        "ref_size_residual_label_list": torch.from_numpy(ref_size_res),
    }
    with torch.no_grad():
        probe = ref(dict(td))
    pc_np = probe["pred_center"].numpy()
    ps_np = probe["pred_size"].numpy()
    for i in range(B):
        for j in range(L):
            p = (7 * j + 3) % K
            ref_center[i, j] = pc_np[i, p] + 0.03
            ref_size_cls[i, j] = 5
            ref_size_res[i, j] = (
                ps_np[i, p] * 1.1 - dc.mean_size_arr[5]).astype(np.float32)
    td["ref_center_label_list"] = torch.from_numpy(ref_center)
    td["ref_size_class_label_list"] = torch.from_numpy(ref_size_cls)
    td["ref_size_residual_label_list"] = torch.from_numpy(ref_size_res)
    with torch.no_grad():
        td = ref(td)
    assert float(td["lang_con_loss"]) > 0 and float(td["iou_con_loss"]) > 0

    cfg = Config(
        dataset=DatasetConfig(
            mean_size_path="/root/reference/data/scannet/meta_data/"
                           "scannet_reference_means.npz"),
        model=ModelConfig(
            input_feature_dim=132, num_proposal=K, no_caption=True,
            use_con=True, use_lang_emb=True, use_reg_head=True,
            use_kl_loss=True, use_answer=True, num_answers=N_ANSWERS,
            use_vote_weight=True, use_lang_classifier=True),
    )
    params, stats = _import_jointnet(ref.state_dict())
    model = JointNet(cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats},
        {
            "point_clouds": jnp.asarray(pc),
            "input_ids": jnp.asarray(input_ids.astype(np.int32)),
            "bert_attention_mask": jnp.asarray(
                bert_mask.astype(np.int32)),
            "lang_num": jnp.asarray(lang_num),
            "epoch": jnp.asarray(60),
            "ref_center_label_list": jnp.asarray(ref_center),
            "ref_size_class_label_list": jnp.asarray(ref_size_cls),
            "ref_size_residual_label_list": jnp.asarray(ref_size_res),
        },
        train=False,
    )

    # exact index plumbing end-to-end
    np.testing.assert_array_equal(
        np.asarray(out["seed_inds"]), td["seed_inds"].numpy())
    np.testing.assert_array_equal(
        np.asarray(out["aggregated_vote_inds"]),
        td["aggregated_vote_inds"].numpy())

    def close(key, ref_val, tol, transpose=False):
        r = ref_val.numpy()
        if transpose:
            r = r.transpose(0, 2, 1)
        np.testing.assert_allclose(
            np.asarray(out[key]), r, rtol=tol, atol=tol, err_msg=key)

    close("vote_xyz", td["vote_xyz"], 1e-4)
    close("vote_features", td["vote_features"], 1e-3, transpose=True)
    close("aggregated_vote_xyz", td["aggregated_vote_xyz"], 1e-4)
    close("objectness_scores", td["objectness_scores"], 1e-3)
    close("rois", td["rois"], 1e-3)
    close("sem_cls_scores", td["sem_cls_scores"], 1e-3)
    close("alpha", td["alpha"], 1e-4)
    close("pred_center", td["pred_center"], 1e-3)
    close("pred_size", td["pred_size"], 1e-3)
    close("bbox_feature", td["bbox_feature"], 2e-3)
    close("lang_emb", td["lang_emb"], 2e-3)
    close("lang_fea", td["lang_fea"], 2e-3)
    close("lang_scores", td["lang_scores"], 2e-3)
    close("cluster_ref", td["cluster_ref"], 5e-3)
    close("cross_box_feature", td["cross_box_feature"], 5e-3)
    close("pred_center_reg", td["pred_center_reg"], 5e-3)
    close("pred_size_reg", td["pred_size_reg"], 5e-3)
    close("answer_scores", td["answer_scores"], 5e-3)
    np.testing.assert_allclose(
        float(out["lang_con_loss"]), float(td["lang_con_loss"]),
        rtol=5e-3)
    np.testing.assert_allclose(
        float(out["iou_con_loss"]), float(td["iou_con_loss"]), rtol=5e-3)


def test_import_torch_cli_roundtrip(ref_jointnet, tmp_path):
    """vlp3d-import-torch on a saved reference checkpoint reproduces the
    direct in-process import bit-for-bit, for both the bare .pth and the
    checkpoint.tar flavors (train_3dvlp.py:160-171)."""
    import torch

    from vlp3d.cli.import_torch import main as import_main
    from vlp3d.train.checkpoint import load_params

    ref, _ = ref_jointnet
    want_p, want_s = _import_jointnet(ref.state_dict())

    pth = tmp_path / "model_last.pth"
    torch.save(ref.state_dict(), pth)
    tar = tmp_path / "checkpoint.tar"
    torch.save({"epoch": 7, "model_state_dict": ref.state_dict(),
                "optimizer_state_dict": {}, "best": {}}, tar)

    for src_path, name in ((pth, "from_pth"), (tar, "from_tar")):
        out = tmp_path / f"out_{name}"
        rc = import_main(["--checkpoint", str(src_path),
                          "--out", str(out), "--name", "model"])
        assert rc == 0
        snap = load_params(str(out), "model")
        got_p, got_s = snap["params"], snap["batch_stats"]
        flat_want = jax.tree_util.tree_flatten_with_path(want_p)[0]
        flat_got = {
            jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_flatten_with_path(got_p)[0]
        }
        assert len(flat_want) == len(flat_got)
        for path, v in flat_want:
            np.testing.assert_array_equal(
                np.asarray(v), np.asarray(flat_got[jax.tree_util.keystr(path)]),
                err_msg=jax.tree_util.keystr(path))
        for path, v in jax.tree_util.tree_flatten_with_path(want_s)[0]:
            key = jax.tree_util.keystr(path)
            got = {
                jax.tree_util.keystr(k): vv
                for k, vv in jax.tree_util.tree_flatten_with_path(got_s)[0]
            }[key]
            np.testing.assert_array_equal(np.asarray(v), np.asarray(got),
                                          err_msg=key)
