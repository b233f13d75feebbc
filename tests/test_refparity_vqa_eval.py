"""DIRECT parity for the VQA evaluation entry: lib/vqa/eval_helper.py's
get_eval — the grounding half shares the joint eval shape (pinned in
test_refparity_eval_ground), so this focuses on what is VQA-specific:
the answer top-1/top-10 accuracies (eval_helper.py:221-237) vs
vlp3d/eval/vqa.answer_accuracy, plus the ref_iou rates flowing out of
the same call.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.eval.vqa import answer_accuracy

B, K, K2, L, A = 2, 16, 20, 1, 23


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def make_data(torch, rng, dc):
    t = torch.from_numpy
    lang_num = np.ones(B, np.int64)
    objectness_scores = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    cluster_ref = rng.uniform(0, 1, (B * L, K)).astype(np.float32)
    cluster_labels = np.zeros((B, L, K), np.float32)
    cluster_labels[:, :, 3] = 1.0
    ref_box_label_list = np.zeros((B, L, K2), np.float32)
    ref_box_label_list[:, :, 2] = 1.0
    answer_scores = rng.normal(0, 1, (B, A)).astype(np.float32)
    answer_cats = np.zeros((B, A), np.int64)
    for i in range(B):
        answer_cats[i, rng.choice(A, size=3, replace=False)] = 1
    # plant one exact top-1 hit so acc@1 is non-trivially > 0
    answer_scores[0, np.argmax(answer_cats[0])] = 10.0

    data = {
        "objectness_scores": t(objectness_scores),
        "objectness_label": t(rng.integers(0, 2, (B, K))),
        "objectness_mask": t(
            rng.integers(0, 2, (B, K)).astype(np.float32)),
        "ref_center_label_list": t(np.zeros((B, L, 3), np.float32)),
        "cluster_ref": t(cluster_ref),
        "cluster_labels": t(cluster_labels),
        "pred_heading": t(
            rng.uniform(-0.2, 0.2, (B, K)).astype(np.float32)),
        "pred_center": t(rng.normal(0, 2, (B, K, 3)).astype(np.float32)),
        "pred_size": t(rng.uniform(0.3, 1.5, (B, K, 3)).astype(np.float32)),
        "ref_box_label_list": t(ref_box_label_list),
        "center_label": t(rng.normal(0, 2, (B, K2, 3)).astype(np.float32)),
        "heading_class_label": t(np.zeros((B, K2), np.int64)),
        "heading_residual_label": t(np.zeros((B, K2), np.float32)),
        "size_class_label": t(rng.integers(0, 18, (B, K2))),
        "size_residual_label": t(
            rng.uniform(-0.1, 0.4, (B, K2, 3)).astype(np.float32)),
        "lang_num": t(lang_num),
        "unique_multiple_list": t(rng.integers(0, 2, (B, L))),
        "object_cat_list": t(rng.integers(0, 18, (B, L))),
        "object_cat": t(rng.integers(0, 18, (B,))),
        "sem_cls_label": t(rng.integers(0, 18, (B, K2))),
        "object_assignment": t(rng.integers(0, K2, (B, K))),
        "sem_cls_scores": t(rng.normal(0, 1, (B, K, 18)).astype(np.float32)),
        "answer_scores": t(answer_scores),
        "answer_cats": t(answer_cats),
    }
    return data, answer_scores, answer_cats


def test_vqa_get_eval_answer_metrics(torch, rng):
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig
    from lib.vqa.eval_helper import get_eval as ref_get_eval

    dc = ScannetDatasetConfig()
    data, answer_scores, answer_cats = make_data(torch, rng, dc)
    td = ref_get_eval(data, dc, use_lang_classifier=False)

    acc1, acc10 = answer_accuracy(
        jnp.asarray(answer_scores), jnp.asarray(answer_cats), topk=10
    )
    np.testing.assert_allclose(
        float(acc1), float(td["answer_acc_at1"]), atol=1e-6)
    np.testing.assert_allclose(
        float(acc10), float(td["answer_acc_at10"]), atol=1e-6)
    assert float(td["answer_acc_at1"]) > 0  # the planted hit counted

    # the grounding half still flows (ref_iou for every real sentence)
    assert len(td["ref_iou"]) == B * L
    assert 0.0 <= td["ref_iou_rate_0.25"] <= 1.0
