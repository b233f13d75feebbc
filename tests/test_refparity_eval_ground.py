"""DIRECT parity for grounding evaluation: the reference get_eval
(lib/joint/eval_ground.py:48-245 — the function that computes the
headline ScanRefer Acc@0.25/0.5 metrics) vs our numpy port
(vlp3d/eval/grounding.py) on identical synthetic predictions/labels.

Pins: the objectness-masked confidence argmax proposal choice, ref_acc
one-hot scoring, per-sentence corner IoU via the convex-hull box3d_iou,
the param2obb GT box recovery (mean-size table + residual), the
unique/multiple and "others" (cat==17) masks, lang_acc, obj_acc, and the
pred_mask-gated sem_acc.
"""

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.eval.grounding import get_eval as our_get_eval

B, K, K2, L = 2, 16, 20, 4


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def test_get_eval(torch, rng):
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig
    from lib.joint.eval_ground import get_eval as ref_get_eval

    dc = ScannetDatasetConfig()

    lang_num = np.array([L, L - 1], np.int64)
    objectness_scores = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    objectness_label = rng.integers(0, 2, (B, K))
    objectness_mask = rng.integers(0, 2, (B, K)).astype(np.float32)
    cluster_ref = rng.uniform(0, 1, (B * L, K)).astype(np.float32)
    cluster_labels = np.zeros((B, L, K), np.float32)
    cluster_labels[
        np.arange(B)[:, None], np.arange(L)[None, :],
        rng.integers(0, K, (B, L))] = 1.0

    # GT boxes + predictions overlapping some of them
    center_label = rng.normal(0, 2, (B, K2, 3)).astype(np.float32)
    size_class_label = rng.integers(0, 18, (B, K2))
    size_residual_label = rng.uniform(-0.1, 0.4, (B, K2, 3)).astype(
        np.float32)
    gt_sizes = dc.mean_size_arr[size_class_label] + size_residual_label

    pred_center = rng.normal(0, 2, (B, K, 3)).astype(np.float32)
    pred_size = rng.uniform(0.3, 1.5, (B, K, 3)).astype(np.float32)
    pred_heading = rng.uniform(-0.3, 0.3, (B, K)).astype(np.float32)
    ref_box_label_list = np.zeros((B, L, K2), np.float32)
    # plant chosen near-hits for half the sentences: the referred GT is
    # g=j, proposal p=2j copies its box, dominates the confidence, and
    # has positive objectness — so the eval must score an IoU hit there
    for i in range(B):
        for j in range(L):
            ref_box_label_list[i, j, j] = 1.0
            if j % 2 == 0:
                p = 2 * j
                pred_center[i, p] = center_label[i, j] + 0.05
                pred_size[i, p] = gt_sizes[i, j] * 1.05
                pred_heading[i, p] = 0.0
                cluster_ref[i * L + j, p] = 5.0
                objectness_scores[i, p, 1] = (
                    np.abs(objectness_scores[i, p, 0]) + 1.0)
    unique_multiple_list = rng.integers(0, 2, (B, L))
    object_cat_list = rng.integers(0, 18, (B, L))
    lang_scores = rng.normal(0, 1, (B * L, 18)).astype(np.float32)
    sem_cls_label = rng.integers(0, 18, (B, K2))
    object_assignment = rng.integers(0, K2, (B, K))
    sem_cls_scores = rng.normal(0, 1, (B, K, 18)).astype(np.float32)

    t = torch.from_numpy
    data_dict = {
        "objectness_scores": t(objectness_scores),
        "objectness_label": t(objectness_label),
        "objectness_mask": t(objectness_mask),
        "ref_center_label_list": t(np.zeros((B, L, 3), np.float32)),
        "cluster_ref": t(cluster_ref),
        "cluster_labels": t(cluster_labels),
        "pred_heading": t(pred_heading),
        "pred_center": t(pred_center),
        "pred_size": t(pred_size),
        "ref_box_label_list": t(ref_box_label_list),
        "center_label": t(center_label),
        "heading_class_label": t(np.zeros((B, K2), np.int64)),
        "heading_residual_label": t(np.zeros((B, K2), np.float32)),
        "size_class_label": t(size_class_label),
        "size_residual_label": t(size_residual_label),
        "lang_num": t(lang_num),
        "unique_multiple_list": t(unique_multiple_list),
        "object_cat_list": t(object_cat_list),
        "lang_scores": t(lang_scores),
        "sem_cls_label": t(sem_cls_label),
        "object_assignment": t(object_assignment),
        "sem_cls_scores": t(sem_cls_scores),
    }
    td = ref_get_eval(data_dict, dc, reference=True,
                      use_lang_classifier=True)

    ours = our_get_eval(
        {
            "objectness_scores": objectness_scores,
            "cluster_ref": cluster_ref,
            "pred_heading": pred_heading,
            "pred_center": pred_center,
            "pred_size": pred_size,
            "lang_scores": lang_scores,
            "sem_cls_scores": sem_cls_scores,
        },
        {
            "ref_center_label_list": np.zeros((B, L, 3), np.float32),
            "ref_box_label_list": ref_box_label_list,
            "center_label": center_label,
            "size_class_label": size_class_label,
            "size_residual_label": size_residual_label,
            "lang_num": lang_num,
            "unique_multiple_list": unique_multiple_list,
            "object_cat_list": object_cat_list,
            "sem_cls_label": sem_cls_label,
        },
        mean_size_arr=dc.mean_size_arr,
        cluster_labels=cluster_labels,
        objectness_label=objectness_label,
        objectness_mask=objectness_mask,
        object_assignment=object_assignment,
    )

    np.testing.assert_allclose(
        np.array(ours["ref_acc"]), np.array(td["ref_acc"]), atol=1e-6)
    assert len(ours["ref_iou"]) == len(td["ref_iou"]) == int(lang_num.sum())
    np.testing.assert_allclose(
        np.array(ours["ref_iou"]), np.array(td["ref_iou"]), atol=1e-5)
    assert any(i > 0.25 for i in ours["ref_iou"])  # planted hits matter
    np.testing.assert_allclose(
        ours["ref_iou_rate_0.25"], td["ref_iou_rate_0.25"], atol=1e-8)
    np.testing.assert_allclose(
        ours["ref_iou_rate_0.5"], td["ref_iou_rate_0.5"], atol=1e-8)
    assert ours["ref_multiple_mask"] == td["ref_multiple_mask"]
    assert ours["ref_others_mask"] == td["ref_others_mask"]
    np.testing.assert_allclose(
        np.array(ours["pred_bboxes"]), np.array(td["pred_bboxes"]),
        atol=1e-5)
    np.testing.assert_allclose(
        np.array(ours["gt_bboxes"]), np.array(td["gt_bboxes"]), atol=1e-5)
    np.testing.assert_allclose(
        ours["lang_acc"], float(td["lang_acc"]), atol=1e-6)
    np.testing.assert_allclose(
        ours["obj_acc"], float(td["obj_acc"]), atol=1e-6)
    np.testing.assert_allclose(
        ours["sem_acc"], float(td["sem_acc"]), atol=1e-6)
