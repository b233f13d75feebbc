"""END-TO-END parity capstone: real dataset items -> collate -> full
JointNet forward -> full joint loss, reference vs ours, on one shared
batch with imported weights.

Every stage has its own direct-parity suite (dataset / forward / losses /
optimizer); this pins the WIRING BETWEEN stages — the batch-key contract
between the production collate and the model/loss consumers — where
individually-green stages can still disagree (the str-vs-int
unique_multiple keying bug lived exactly on such a boundary).

Reference pipeline: ScannetReferenceDataset items (rng-seam-shared) ->
torch default_collate -> JointNet.forward (CPU, pointnet2 shim) ->
get_joint_loss. Ours: the same items through ScanReferJointDataset ->
vlp3d collate -> JointNet.apply -> compute_joint_loss.

Two forced conditions keep the comparison well-defined:
  * istrain=0 both sides, so the match module's random copy-paste gate
    (refnet/match_module.py:94-98) stays off;
  * the multiview block (cloud channels 6:134) is zero — the reference's
    relation obj-feature gather scrambles rows (permute+reshape,
    relation_module.py:101-117; see test_refparity_modules), so value
    parity on that path exists only for constant features.
"""

import argparse
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from test_refparity_dataset import (
    LANG_NUM_MAX, META, SCENE, SEED, TSV, WORDS,
    make_scanrefer, make_scene_files, write_bert_vocab,
)
from test_refparity_jointnet import _import_jointnet, build_ref_jointnet

from vlp3d.config import Config, DatasetConfig, LossConfig, ModelConfig
from vlp3d.data.dataset import (
    InMemorySceneSource, ScanReferJointDataset, build_nyu40id2class,
    collate, load_raw2label,
)
from vlp3d.data.tokenizer import BertWordPieceTokenizer
from vlp3d.models.jointnet import JointNet
from vlp3d.losses.joint import compute_joint_loss

K = 32
EPOCH = 60
NUM_POINTS = 1024
MV = 128  # zeroed multiview block baked into the preprocess cache


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def e2e_env(torch, tmp_path_factory):
    """Own sandbox (scene + datasets) with a WIDE preprocess cache:
    [xyz, 3 pseudo-normals, 128 zero multiview] = 134 cols, +height at
    load = 135 (input_feature_dim 132, the canonical channel layout)."""
    tmp = tmp_path_factory.mktemp("e2e")
    scannet_data = tmp / "scannet_data"
    bert_dir = tmp / "bert"
    scannet_data.mkdir()
    bert_dir.mkdir()
    write_bert_vocab(bert_dir / "vocab.txt")
    spw = ["pad_", "unk", "sos", "eos"]
    word2idx = {w: i for i, w in enumerate(spw)}
    for w in WORDS:
        word2idx.setdefault(w, len(word2idx))
    with open(tmp / "ScanRefer_vocabulary.json", "w") as f:
        json.dump({"word2idx": word2idx, "idx2word": {}}, f)

    scene = make_scene_files(str(scannet_data), np.random.default_rng(11),
                             include_id0=False)
    rng = np.random.default_rng(23)
    n = scene["point_cloud"].shape[0]
    wide = np.zeros((n, 6 + MV), np.float32)
    wide[:, :3] = scene["point_cloud"]
    wide[:, 3:6] = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    for split in ("train", "val"):
        np.save(
            os.path.join(str(scannet_data),
                         SCENE + f"_preprocess_{split}.npy"),
            wide,
        )
    scene = dict(scene, point_cloud=wide)

    from lib.configs.config import CONF as BASE_CONF

    BASE_CONF.PATH.SCANNET = "/root/reference/data/scannet"
    import lib.joint.dataset as refds

    refds.SCANNET_V2_TSV = TSV
    refds.VOCAB = str(tmp / "{}_vocabulary.json")
    refds.VOCAB_WEIGHTS = str(tmp / "{}_vocabulary_weights.json")
    refds.CONF.PATH.DATA = str(tmp)
    refds.CONF.PATH.SCANNET_META = META
    refds.CONF.PATH.SCANNET_DATA = str(scannet_data)
    refds.CONF.BERT_TEXT_ENCODER = str(bert_dir)

    scanrefer = make_scanrefer()
    ref_ds = refds.ScannetReferenceDataset(
        scanrefer=scanrefer,
        scanrefer_new=[scanrefer[:LANG_NUM_MAX],
                       scanrefer[LANG_NUM_MAX:]],
        scanrefer_all_scene=[SCENE],
        split="train", name="ScanRefer", num_points=NUM_POINTS,
        lang_num_max=LANG_NUM_MAX, use_height=True, seed=SEED,
    )
    our_ds = ScanReferJointDataset(
        scanrefer,
        InMemorySceneSource({SCENE: scene}),
        BertWordPieceTokenizer(str(bert_dir / "vocab.txt")),
        split="train", num_points=NUM_POINTS,
        lang_num_max=LANG_NUM_MAX, use_height=True,
        mean_size_arr=refds.DC.mean_size_arr.astype(np.float32),
        raw2label=load_raw2label(TSV),
        nyu40id2class=build_nyu40id2class(TSV),
        bert_max_len=50, seed=SEED,
    )
    return ref_ds, our_ds


@pytest.mark.slow
def test_end_to_end_loss_parity(torch, e2e_env, tmp_path_factory):
    ref_ds, our_ds = e2e_env
    ref_items, our_items = [], []
    for idx in range(2):
        ref_ds.rng = np.random.default_rng((SEED, 0, idx))
        ref_items.append(ref_ds[idx])
        our_items.append(our_ds[idx])

    from torch.utils.data import default_collate

    td = default_collate(ref_items)
    batch = collate(our_items, random_gate=0.9, epoch=EPOCH)
    td["epoch"] = EPOCH
    td["istrain"] = torch.zeros_like(td["istrain"])
    batch["istrain"] = np.zeros_like(batch["istrain"])
    batch["epoch"] = np.asarray(EPOCH)

    ref, dc = build_ref_jointnet(
        torch, tmp_path_factory.mktemp("e2ebert"),
        input_feature_dim=132, num_proposal=K,
    )
    # grad-enabled forward: the backward half of the capstone compares
    # d(total loss)/d(params) both sides below
    td = ref(td)

    args = argparse.Namespace(
        use_reg_head=True, use_kl_loss=True, debug=False,
        use_attr_loss=True, use_vote_weight=True, use_answer=False,
        use_con=True, use_mlm=False, use_diou_loss=True)
    td = __import__(
        "lib.loss_helper.loss_joint", fromlist=["get_joint_loss"]
    ).get_joint_loss(
        args, td, "cpu", dc, None, 0, detection=True, caption=False,
        reference=True, use_lang_classifier=True,
    )
    td["loss"].backward()

    cfg = Config(
        dataset=DatasetConfig(
            mean_size_path="/root/reference/data/scannet/meta_data/"
                           "scannet_reference_means.npz"),
        model=ModelConfig(
            input_feature_dim=132, num_proposal=K, no_caption=True,
            lang_num_max=LANG_NUM_MAX, use_con=True, use_lang_emb=True,
            use_reg_head=True, use_kl_loss=True, use_vote_weight=True,
            use_lang_classifier=True),
        loss=LossConfig(use_diou_loss=True, use_attr_loss=True),
    )
    params, stats = _import_jointnet(ref.state_dict())
    model = JointNet(cfg)
    jb = {
        k: jnp.asarray(v) for k, v in batch.items()
        if not isinstance(v, (list, tuple, str))
    }

    def loss_fn(p):
        o = model.apply({"params": p, "batch_stats": stats}, jb,
                        train=False)
        t, mm = compute_joint_loss(
            cfg, o, jb, detection=True, reference=True, caption=False
        )
        return t, (o, mm)

    import jax

    (total, (out, m)), our_grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)

    # the assignment integers must agree exactly
    np.testing.assert_array_equal(
        np.asarray(m["objectness_label"]), td["objectness_label"].numpy())
    np.testing.assert_array_equal(
        np.asarray(m["cluster_labels"]), td["cluster_labels"].numpy())

    # loss terms (forward tolerances amplified through the loss)
    for key, tol in (
        ("vote_loss", 1e-4), ("objectness_loss", 1e-4),
        ("box_loss", 1e-3), ("ref_loss", 1e-3), ("diou_loss", 2e-3),
        ("kl_loss", 2e-3), ("lang_loss", 1e-3), ("attr_loss", 1e-3),
        ("vote_weight_loss", 1e-3), ("obj_acc", 1e-6),
        ("pos_ratio", 1e-7), ("neg_ratio", 1e-7),
        ("con_loss", 2e-3),
    ):
        r = float(td[key])
        o = float(m[key])
        assert abs(o - r) <= tol * max(1.0, abs(r)), (key, o, r)
    r, o = float(td["loss"]), float(total)
    assert abs(o - r) <= 2e-3 * max(1.0, abs(r)), ("loss", o, r)

    # ---- gradient parity: every stop_gradient must sit where the
    # reference's .detach() does. The torch grads are mapped into our
    # param-tree layout by re-running the weight importer on a
    # grad-valued state dict (the import transforms — transposes,
    # reshapes — commute with d/dW). -------------------------------------
    sd = ref.state_dict()
    grads_named = {k: p.grad for k, p in ref.named_parameters()}
    sd_g = {}
    for k, v in sd.items():
        g = grads_named.get(k)
        sd_g[k] = g if g is not None else torch.zeros_like(v)
    ref_grads, _ = _import_jointnet(sd_g)

    import jax

    flat_ours = jax.tree_util.tree_flatten_with_path(our_grads)[0]
    flat_ref = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    }
    checked = skipped_alpha = 0
    for path, go in flat_ours:
        name = jax.tree_util.keystr(path)
        if "lang']['text_encoder" in name:
            # frozen both sides: requires_grad=False there, stop_gradient
            # here — our grads must be identically zero
            assert not np.any(np.asarray(go)), name
            continue
        if name not in flat_ref:
            continue  # flax-only leaves (none expected)
        gr = np.asarray(flat_ref[name], np.float64)
        goo = np.asarray(go, np.float64)
        if name.endswith("['alpha']"):
            # PReLU: torch holds a single shared slope whose grad is the
            # SUM of our per-channel grads (the import broadcasts the
            # value, which is not the grad transform)
            scale = abs(gr.reshape(-1)[0]) + 1e-8
            assert abs(goo.sum() - gr.reshape(-1)[0]) <= 2e-2 * scale, name
            skipped_alpha += 1
            continue
        norm = np.linalg.norm(gr)
        diff = np.linalg.norm(goo - gr)
        assert diff <= 2e-2 * norm + 1e-6, (name, diff, norm)
        checked += 1
    assert checked > 100 and skipped_alpha >= 2, (checked, skipped_alpha)
