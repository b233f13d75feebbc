"""DIRECT loss parity: the reference's actual lib/loss_helper code (torch
CPU, imported via tests/refshim.py) vs our vectorized JAX losses, on a
shared synthetic data_dict.

This removes transcription drift as an error class for the entire loss
system: vote / objectness / box+semcls (loss_detection.py), OID DIoU with
reg-head + KL variants, attr, vote-weight, lang classification
(loss_grounding.py), and caption CE/acc (loss_captioning.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.losses import detection as jdet
from vlp3d.losses import grounding as jgrd
from vlp3d.losses.captioning import compute_cap_loss as j_cap_loss

B, K, K2, L, S, N = 3, 32, 12, 4, 24, 200
NUM_CLASS = 18


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def dc(torch):
    """The reference's own ScannetDatasetConfig, pointed at the real meta
    assets shipped in the checkout."""
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig

    return ScannetDatasetConfig()


@pytest.fixture(scope="module")
def data(dc):
    """One synthetic scene batch with every key both loss stacks read."""
    rng = np.random.default_rng(7)
    mean_size = dc.mean_size_arr.astype(np.float32)

    d = {}
    d["seed_xyz"] = rng.normal(0, 1, (B, S, 3)).astype(np.float32)
    d["vote_xyz"] = rng.normal(0, 1, (B, S, 3)).astype(np.float32)
    d["seed_inds"] = rng.integers(0, N, (B, S)).astype(np.int64)
    d["vote_label"] = rng.normal(0, 0.3, (B, N, 9)).astype(np.float32)
    d["vote_label_mask"] = (rng.uniform(size=(B, N)) > 0.4).astype(np.int64)
    d["instance_labels"] = rng.integers(0, 30, (B, N)).astype(np.int64)
    d["vote_weights"] = rng.uniform(0.05, 0.95, (B, S, 1)).astype(np.float32)

    d["aggregated_vote_xyz"] = rng.normal(0, 1.5, (B, K, 3)).astype(np.float32)
    d["aggregated_vote_features"] = rng.normal(0, 1, (B, K, 8)).astype(
        np.float32)
    d["objectness_scores"] = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    d["center_label"] = rng.normal(0, 1.5, (B, K2, 3)).astype(np.float32)
    d["heading_class_label"] = np.zeros((B, K2), np.int64)
    d["heading_residual_label"] = np.zeros((B, K2), np.float32)
    d["size_class_label"] = rng.integers(0, NUM_CLASS, (B, K2)).astype(
        np.int64)
    d["size_residual_label"] = rng.normal(0, 0.1, (B, K2, 3)).astype(
        np.float32)
    d["sem_cls_label"] = rng.integers(0, NUM_CLASS, (B, K2)).astype(np.int64)

    d["heading_scores"] = rng.normal(0, 1, (B, K, 1)).astype(np.float32)
    d["heading_residuals_normalized"] = rng.normal(0, 0.2, (B, K, 1)).astype(
        np.float32)
    d["rois"] = rng.uniform(0.05, 1.5, (B, K, 6)).astype(np.float32)
    d["sem_cls_scores"] = rng.normal(0, 1, (B, K, NUM_CLASS)).astype(
        np.float32)

    # grounding: per-sentence GT boxes, with proposal j seeded near the
    # sentence-j GT so some matches clear the 0.25 IoU gate
    d["pred_center"] = rng.normal(0, 2, (B, K, 3)).astype(np.float32)
    d["pred_size"] = rng.uniform(0.2, 1.5, (B, K, 3)).astype(np.float32)
    d["pred_heading"] = np.zeros((B, K), np.float32)
    d["ref_center_label_list"] = rng.normal(0, 2, (B, L, 3)).astype(
        np.float32)
    d["ref_heading_class_label_list"] = np.zeros((B, L), np.int64)
    d["ref_heading_residual_label_list"] = np.zeros((B, L), np.float32)
    d["ref_size_class_label_list"] = rng.integers(0, NUM_CLASS, (B, L)).astype(
        np.int64)
    d["ref_size_residual_label_list"] = rng.normal(0, 0.1, (B, L, 3)).astype(
        np.float32)
    gt_size = (mean_size[d["ref_size_class_label_list"]]
               + d["ref_size_residual_label_list"])
    for i in range(B):
        for j in range(L):
            d["pred_center"][i, j] = (d["ref_center_label_list"][i, j]
                                      + rng.normal(0, 0.05, 3))
            d["pred_size"][i, j] = np.abs(gt_size[i, j]
                                          + rng.normal(0, 0.05, 3))
    d["gt_size"] = gt_size.astype(np.float32)

    d["cluster_ref"] = rng.normal(0, 1, (B * L, K)).astype(np.float32)
    d["lang_num"] = np.array([L, 2, 3][:B], np.int64)
    d["object_cat_list"] = rng.integers(0, NUM_CLASS, (B, L)).astype(np.int64)
    d["lang_scores"] = rng.normal(0, 1, (B * L, NUM_CLASS)).astype(np.float32)
    d["alpha"] = rng.normal(0, 0.5, (B, K, 6)).astype(np.float32)
    d["pred_center_reg"] = rng.normal(0, 0.05, (B, L, K, 3)).astype(
        np.float32)
    d["pred_size_reg"] = rng.normal(0, 0.05, (B, L, K, 3)).astype(np.float32)

    # captioning
    T, V = 12, 50
    ids = rng.integers(3, V, (B, L, T))
    lengths = rng.integers(3, T, (B, L))
    ids[np.arange(T)[None, None, :] >= lengths[..., None]] = 0
    d["input_ids"] = ids.astype(np.int64)
    d["lang_cap"] = rng.normal(0, 1, (B * L, T - 1, V)).astype(np.float32)
    d["good_bbox_masks"] = (rng.uniform(size=B * L) > 0.3)

    d["istrain"] = np.array([1], np.int64)
    d["epoch"] = 10
    d["random"] = 0.3
    return d


def as_torch(torch, d):
    return {k: (torch.from_numpy(np.asarray(v)) if isinstance(v, np.ndarray)
                else v) for k, v in d.items()}


def test_vote_loss(torch, data):
    from lib.loss_helper.loss_detection import compute_vote_loss

    ref = compute_vote_loss(as_torch(torch, data)).item()
    ours = jdet.compute_vote_loss(
        jnp.asarray(data["seed_xyz"]), jnp.asarray(data["vote_xyz"]),
        jnp.asarray(data["seed_inds"].astype(np.int32)),
        jnp.asarray(data["vote_label"]),
        jnp.asarray(data["vote_label_mask"].astype(np.float32)))
    assert abs(float(ours) - ref) < 1e-5


def test_objectness_loss(torch, data):
    from lib.loss_helper.loss_detection import compute_objectness_loss

    rl, rlabel, rmask, rassign = compute_objectness_loss(as_torch(torch, data))
    ours, label, mask, assign = jdet.compute_objectness_loss(
        jnp.asarray(data["aggregated_vote_xyz"]),
        jnp.asarray(data["objectness_scores"]),
        jnp.asarray(data["center_label"]))
    assert abs(float(ours) - rl.item()) < 1e-5
    np.testing.assert_array_equal(np.asarray(label), rlabel.numpy())
    np.testing.assert_array_equal(np.asarray(mask), rmask.numpy())
    np.testing.assert_array_equal(np.asarray(assign), rassign.numpy())


def test_box_and_sem_cls_loss(torch, dc, data):
    from lib.loss_helper.loss_detection import (compute_box_and_sem_cls_loss,
                                                compute_objectness_loss)

    td = as_torch(torch, data)
    _, rlabel, rmask, rassign = compute_objectness_loss(td)
    td["objectness_label"] = rlabel
    td["objectness_mask"] = rmask
    td["object_assignment"] = rassign
    rh, rhr, rdist, rsem = compute_box_and_sem_cls_loss(td, dc)

    _, label, _, assign = jdet.compute_objectness_loss(
        jnp.asarray(data["aggregated_vote_xyz"]),
        jnp.asarray(data["objectness_scores"]),
        jnp.asarray(data["center_label"]))
    preds = {k: jnp.asarray(data[k]) for k in (
        "aggregated_vote_xyz", "heading_scores",
        "heading_residuals_normalized", "rois", "sem_cls_scores")}
    preds["object_assignment"] = assign
    targets = {k: jnp.asarray(data[k]) for k in (
        "center_label", "heading_class_label", "heading_residual_label",
        "size_class_label", "size_residual_label", "sem_cls_label")}
    h, hr, dist, sem = jdet.compute_box_and_sem_cls_loss(
        preds, targets, label, dc.num_heading_bin,
        jnp.asarray(dc.mean_size_arr.astype(np.float32)))
    assert abs(float(h) - rh.item()) < 1e-5
    assert abs(float(hr) - rhr.item()) < 1e-5
    assert abs(float(dist) - rdist.item()) < 2e-5
    assert abs(float(sem) - rsem.item()) < 1e-5


@pytest.mark.parametrize("use_reg_head,use_kl_loss,epoch,rand", [
    (False, False, 10, 0.3),
    (False, False, 10, 0.7),
    (False, False, 80, 0.3),
    (True, False, 10, 0.3),
    (False, True, 10, 0.3),
    (True, True, 80, 0.7),
])
def test_diou_loss(torch, dc, data, use_reg_head, use_kl_loss, epoch, rand):
    from lib.loss_helper.loss_grounding import compute_diou_loss

    td = as_torch(torch, data)
    td["epoch"] = epoch
    td["random"] = rand
    td, ref_loss, _, cluster_labels = compute_diou_loss(
        td, dc, use_reg_head=use_reg_head, use_kl_loss=use_kl_loss)

    ours = jgrd.compute_diou_loss(
        pred_center=jnp.asarray(data["pred_center"]),
        pred_size=jnp.asarray(data["pred_size"]),
        cluster_ref=jnp.asarray(data["cluster_ref"]),
        objectness_masks=jnp.argmax(
            jnp.asarray(data["objectness_scores"]), -1).astype(jnp.float32),
        gt_center=jnp.asarray(data["ref_center_label_list"]),
        gt_size=jnp.asarray(data["gt_size"]),
        lang_num=jnp.asarray(data["lang_num"]),
        epoch=jnp.asarray(epoch),
        istrain=jnp.asarray(1),
        random_gate=jnp.asarray(rand),
        pred_center_reg=(jnp.asarray(data["pred_center_reg"])
                         if use_reg_head else None),
        pred_size_reg=(jnp.asarray(data["pred_size_reg"])
                       if use_reg_head else None),
        alpha=jnp.asarray(data["alpha"]) if use_kl_loss else None,
    )
    assert abs(float(ours["ref_loss"]) - ref_loss.item()) < 2e-5
    assert abs(float(ours["diou_loss"]) - td["diou_loss"].item()) < 2e-5
    np.testing.assert_array_equal(
        np.asarray(ours["cluster_labels"]), cluster_labels.numpy())
    assert abs(float(ours["max_iou_rate_0.25"])
               - float(td["max_iou_rate_0.25"])) < 1e-6
    assert abs(float(ours["max_iou_rate_0.5"])
               - float(td["max_iou_rate_0.5"])) < 1e-6
    if use_kl_loss:
        assert abs(float(ours["kl_loss"]) - td["kl_loss"].item()) < \
            2e-4 * max(1.0, abs(td["kl_loss"].item()))


def test_attr_loss(torch, data):
    from lib.loss_helper.loss_grounding import compute_attr_loss

    ref = compute_attr_loss(as_torch(torch, data)).item()
    ours = jgrd.compute_attr_loss(
        jnp.asarray(data["vote_xyz"]),
        jnp.asarray(data["seed_inds"].astype(np.int32)),
        jnp.asarray(data["instance_labels"].astype(np.int32)),
        jnp.asarray(data["vote_label_mask"].astype(np.float32)))
    assert abs(float(ours) - ref) < 1e-5


def test_vote_weight_loss(torch, data):
    from lib.loss_helper.loss_grounding import compute_vote_weight_loss

    td = as_torch(torch, data)
    td["vote_label_mask"] = td["vote_label_mask"].float()
    ref = compute_vote_weight_loss(td).item()
    ours = jgrd.compute_vote_weight_loss(
        jnp.asarray(data["vote_weights"]),
        jnp.asarray(data["seed_inds"].astype(np.int32)),
        jnp.asarray(data["vote_label_mask"].astype(np.float32)))
    assert abs(float(ours) - ref) < 1e-5


def test_lang_classification_loss(torch, data):
    from lib.loss_helper.loss_grounding import (
        compute_lang_classification_loss)

    ref = compute_lang_classification_loss(as_torch(torch, data)).item()
    ours = jgrd.compute_lang_classification_loss(
        jnp.asarray(data["lang_scores"]),
        jnp.asarray(data["object_cat_list"]),
        jnp.asarray(data["lang_num"]))
    assert abs(float(ours) - ref) < 1e-5


@pytest.mark.parametrize("epoch", [10, 80])
def test_joint_loss_orchestrator(torch, dc, data, epoch):
    """Full get_joint_loss (loss_joint.py:26-227) vs compute_joint_loss:
    pins the weight tree (10x detection, 0.3 blocks, epoch-50 ref-weight
    switch, 0.5/2.5 contrastive mix) and every stored metric key."""
    import argparse

    from lib.loss_helper.loss_joint import get_joint_loss

    from vlp3d.config import Config, DatasetConfig, LossConfig, ModelConfig

    args = argparse.Namespace(
        use_reg_head=False, use_kl_loss=True, debug=False,
        use_attr_loss=True, use_vote_weight=True, use_answer=True,
        use_con=True, use_mlm=False, use_diou_loss=True)

    rng = np.random.default_rng(13)
    n_ans = 7
    answer_scores = rng.normal(0, 1, (B, n_ans)).astype(np.float32)
    answer_cat_scores = rng.uniform(0, 1, (B, n_ans)).astype(np.float32)
    # contrast losses are computed by the module forward; the orchestrator
    # just mixes them in (epoch-gated inside the module on our side)
    lang_con = 0.37 if epoch >= 50 else 0.0
    iou_con = 0.81 if epoch >= 50 else 0.0

    td = as_torch(torch, data)
    td["epoch"] = epoch
    td["vote_label_mask"] = td["vote_label_mask"].float()
    td["answer_scores"] = torch.from_numpy(answer_scores)
    td["answer_cat_scores"] = torch.from_numpy(answer_cat_scores)
    td["lang_con_loss"] = torch.tensor(lang_con)
    td["iou_con_loss"] = torch.tensor(iou_con)
    td = get_joint_loss(
        args, td, "cpu", dc, None, 0, detection=True, caption=True,
        reference=True, use_lang_classifier=True)

    cfg = Config(
        dataset=DatasetConfig(
            mean_size_path="/root/reference/data/scannet/meta_data/"
                           "scannet_reference_means.npz"),
        model=ModelConfig(
            use_kl_loss=True, use_vote_weight=True, use_con=True,
            use_mlm=False, use_answer=True, use_lang_classifier=True),
        loss=LossConfig(use_diou_loss=True, use_attr_loss=True),
    )
    outputs = {
        "seed_xyz": jnp.asarray(data["seed_xyz"]),
        "vote_xyz": jnp.asarray(data["vote_xyz"]),
        "seed_inds": jnp.asarray(data["seed_inds"].astype(np.int32)),
        "aggregated_vote_xyz": jnp.asarray(data["aggregated_vote_xyz"]),
        "objectness_scores": jnp.asarray(data["objectness_scores"]),
        "heading_scores": jnp.asarray(data["heading_scores"]),
        "heading_residuals_normalized": jnp.asarray(
            data["heading_residuals_normalized"]),
        "rois": jnp.asarray(data["rois"]),
        "sem_cls_scores": jnp.asarray(data["sem_cls_scores"]),
        "pred_center": jnp.asarray(data["pred_center"]),
        "pred_size": jnp.asarray(data["pred_size"]),
        "cluster_ref": jnp.asarray(data["cluster_ref"]),
        "objectness_masks": jnp.argmax(
            jnp.asarray(data["objectness_scores"]), -1).astype(jnp.float32),
        "lang_scores": jnp.asarray(data["lang_scores"]),
        "vote_weights": jnp.asarray(data["vote_weights"]),
        "alpha": jnp.asarray(data["alpha"]),
        "lang_con_loss": jnp.asarray(lang_con, jnp.float32),
        "iou_con_loss": jnp.asarray(iou_con, jnp.float32),
        "answer_scores": jnp.asarray(answer_scores),
        "lang_cap": jnp.asarray(data["lang_cap"]),
        "good_bbox_masks": jnp.asarray(data["good_bbox_masks"]),
    }
    batch = {
        "vote_label": jnp.asarray(data["vote_label"]),
        "vote_label_mask": jnp.asarray(
            data["vote_label_mask"].astype(np.float32)),
        "center_label": jnp.asarray(data["center_label"]),
        "heading_class_label": jnp.asarray(data["heading_class_label"]),
        "heading_residual_label": jnp.asarray(
            data["heading_residual_label"]),
        "size_class_label": jnp.asarray(data["size_class_label"]),
        "size_residual_label": jnp.asarray(data["size_residual_label"]),
        "sem_cls_label": jnp.asarray(data["sem_cls_label"]),
        "ref_center_label_list": jnp.asarray(data["ref_center_label_list"]),
        "ref_size_class_label_list": jnp.asarray(
            data["ref_size_class_label_list"]),
        "ref_size_residual_label_list": jnp.asarray(
            data["ref_size_residual_label_list"]),
        "object_cat_list": jnp.asarray(data["object_cat_list"]),
        "instance_labels": jnp.asarray(
            data["instance_labels"].astype(np.int32)),
        "lang_num": jnp.asarray(data["lang_num"]),
        "input_ids": jnp.asarray(data["input_ids"]),
        "answer_cat_scores": jnp.asarray(answer_cat_scores),
        "epoch": jnp.asarray(epoch),
        "istrain": jnp.asarray(1),
        "random": jnp.asarray(data["random"], jnp.float32),
    }
    total, m = __import__(
        "vlp3d.losses.joint", fromlist=["compute_joint_loss"]
    ).compute_joint_loss(cfg, outputs, batch, detection=True,
                         reference=True, caption=True)

    for key, tol in (
        ("vote_loss", 1e-5), ("objectness_loss", 1e-5),
        ("heading_cls_loss", 1e-5), ("heading_reg_loss", 1e-5),
        ("size_distance_loss", 2e-5), ("sem_cls_loss", 1e-5),
        ("box_loss", 5e-4), ("ref_loss", 2e-5), ("diou_loss", 2e-5),
        ("kl_loss", 5e-4), ("lang_loss", 1e-5), ("attr_loss", 1e-5),
        ("vote_weight_loss", 1e-5), ("answer_loss", 1e-5),
        ("cap_loss", 2e-5), ("cap_acc", 1e-6), ("obj_acc", 1e-6),
        ("pos_ratio", 1e-7), ("neg_ratio", 1e-7),
    ):
        assert abs(float(m[key]) - float(td[key])) < tol, key
    if epoch >= 50:
        assert abs(float(m["con_loss"]) - float(td["con_loss"])) < 1e-6
    assert abs(float(total) - float(td["loss"])) < 1e-3
    np.testing.assert_array_equal(
        np.asarray(m["objectness_label"]), td["objectness_label"].numpy())
    np.testing.assert_array_equal(
        np.asarray(m["cluster_labels"]), td["cluster_labels"].numpy())


def test_cap_loss(torch, dc, data):
    from lib.loss_helper.loss_captioning import compute_cap_loss

    ref_loss, ref_acc = compute_cap_loss(
        as_torch(torch, data), dc, weight=None, pad_token_id=0,
        tokenizer=None)
    ours_loss, ours_acc = j_cap_loss(
        jnp.asarray(data["lang_cap"]),
        jnp.asarray(data["input_ids"]),
        jnp.asarray(data["good_bbox_masks"]))
    assert abs(float(ours_loss) - ref_loss.item()) < 2e-5
    assert abs(float(ours_acc) - ref_acc.item()) < 1e-6
