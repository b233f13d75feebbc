"""DIRECT parity for the detection-eval stack: the reference
parse_predictions / parse_groundtruths (lib/ap_helper/ap_helper_fcos.py)
and the eval_det mAP machinery (utils/eval_det.py) vs our numpy ports
(vlp3d/eval/detection.py) on identical synthetic predictions.

Pins: corner reconstruction, the remove-empty-box point test, all three
NMS branches (BEV 2D, plain 3D, class-aware 3D with the soft sem-score
option), the per-class proposal expansion with conf_thresh gating, GT
parsing via class2size, and the greedy-matching VOC AP / mAP / AR.
"""

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.eval import detection as jdet

B, K, K2, N = 2, 24, 10, 600


@pytest.fixture(scope="module")
def torch():
    return load_reference()


@pytest.fixture(scope="module")
def dc(torch):
    from lib.configs.config import CONF

    CONF.PATH.SCANNET = "/root/reference/data/scannet"
    from data.scannet.model_util_scannet import ScannetDatasetConfig

    return ScannetDatasetConfig()


@pytest.fixture(scope="module")
def data(dc):
    rng = np.random.default_rng(23)
    d = {}
    d["point_clouds"] = rng.normal(0, 1.5, (B, N, 3)).astype(np.float32)
    d["pred_center"] = rng.normal(0, 1.5, (B, K, 3)).astype(np.float32)
    d["pred_size"] = rng.uniform(0.3, 1.6, (B, K, 3)).astype(np.float32)
    # heading 0: ScanNet boxes are axis-aligned, and the reference's
    # remove-empty-box hull test (scipy Delaunay) equals our AABB test
    # only for unrotated boxes
    d["pred_heading"] = np.zeros((B, K), np.float32)
    # clusters of overlapping proposals so NMS actually suppresses
    for i in range(B):
        for j in range(0, K, 3):
            for m in (1, 2):
                if j + m < K:
                    d["pred_center"][i, j + m] = (
                        d["pred_center"][i, j] + rng.normal(0, 0.05, 3))
                    d["pred_size"][i, j + m] = (
                        d["pred_size"][i, j] * rng.uniform(0.9, 1.1, 3))
    d["objectness_scores"] = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    d["sem_cls_scores"] = rng.normal(0, 1, (B, K, 18)).astype(np.float32)

    d["center_label"] = rng.normal(0, 1.5, (B, K2, 3)).astype(np.float32)
    d["heading_class_label"] = np.zeros((B, K2), np.int64)
    d["heading_residual_label"] = np.zeros((B, K2), np.float32)
    d["size_class_label"] = rng.integers(0, 18, (B, K2))
    d["size_residual_label"] = rng.uniform(-0.05, 0.3, (B, K2, 3)).astype(
        np.float32)
    d["sem_cls_label"] = rng.integers(0, 18, (B, K2))
    d["box_label_mask"] = (rng.uniform(size=(B, K2)) > 0.3).astype(
        np.float32)
    # put some GT boxes on top of proposals so AP is non-trivial
    for i in range(B):
        for g, p in ((0, 0), (1, 6), (2, 12)):
            d["center_label"][i, g] = d["pred_center"][i, p]
            sz = d["pred_size"][i, p]
            d["size_residual_label"][i, g] = (
                sz - dc.mean_size_arr[d["size_class_label"][i, g]])
            d["box_label_mask"][i, g] = 1.0
            d["sem_cls_label"][i, g] = np.argmax(d["sem_cls_scores"][i, p])
    return d


def _post_dict(dc, **over):
    base = {
        "remove_empty_box": True, "use_3d_nms": True, "nms_iou": 0.25,
        "use_old_type_nms": False, "cls_nms": True,
        "per_class_proposal": True, "conf_thresh": 0.05,
        "dataset_config": dc,
    }
    base.update(over)
    return base


@pytest.mark.parametrize("variant", ["cls_nms", "plain_3d", "bev_2d"])
def test_parse_predictions(torch, dc, data, variant):
    from lib.ap_helper.ap_helper_fcos import parse_predictions

    over = {
        "cls_nms": {},
        "plain_3d": {"cls_nms": False},
        "bev_2d": {"use_3d_nms": False, "cls_nms": False},
    }[variant]
    td = {k: torch.from_numpy(np.asarray(v)) for k, v in data.items()}
    ref_list = parse_predictions(td, _post_dict(dc, **over))
    ref_mask = td["pred_mask"]

    ours_mask, ours_list = jdet.parse_predictions(
        data, {k: v for k, v in _post_dict(dc, **over).items()
               if k != "dataset_config"})
    np.testing.assert_array_equal(ours_mask, np.asarray(ref_mask))
    assert len(ours_list) == len(ref_list)
    for ours_i, ref_i in zip(ours_list, ref_list):
        assert len(ours_i) == len(ref_i)
        for (oc, ob, os_), (rc, rb, rs) in zip(ours_i, ref_i):
            assert int(oc) == int(rc)
            np.testing.assert_allclose(ob, rb, atol=1e-5)
            np.testing.assert_allclose(os_, rs, rtol=1e-5)


def test_parse_groundtruths_and_map(torch, dc, data):
    from lib.ap_helper.ap_helper_fcos import (parse_groundtruths,
                                              parse_predictions)
    from utils.eval_det import eval_det, get_iou_obb

    td = {k: torch.from_numpy(np.asarray(v)) for k, v in data.items()}
    ref_gt = parse_groundtruths(td, {"dataset_config": dc})
    ours_gt = jdet.parse_groundtruths(data, dc.mean_size_arr)
    assert len(ref_gt) == len(ours_gt)
    for ours_i, ref_i in zip(ours_gt, ref_gt):
        assert len(ours_i) == len(ref_i)
        for (oc, ob), (rc, rb) in zip(ours_i, ref_i):
            assert int(oc) == int(rc)
            np.testing.assert_allclose(ob, rb, atol=1e-5)

    ref_pred = parse_predictions(td, _post_dict(dc))
    _, ours_pred = jdet.parse_predictions(
        data, {k: v for k, v in _post_dict(dc).items()
               if k != "dataset_config"})

    # mAP: reference eval_det (the single-process variant of what
    # APCalculator.compute_metrics runs, eval_det.py:165-204) vs ours
    rec, _, ap = eval_det(
        {i: p for i, p in enumerate(ref_pred)},
        {i: g for i, g in enumerate(ref_gt)},
        ovthresh=0.25, get_iou_func=get_iou_obb)

    calc = jdet.APCalculator(ap_iou_thresh=0.25)
    calc.step(ours_pred, ours_gt)
    ours = calc.compute_metrics()

    ref_map = np.mean(list(ap.values()))
    assert abs(ours["mAP"] - ref_map) < 1e-6
    for cls in ap:
        assert abs(ours[f"{cls} Average Precision"] - ap[cls]) < 1e-6, cls
        ref_rec = rec[cls][-1] if len(rec[cls]) else 0.0
        assert abs(ours[f"{cls} Recall"] - ref_rec) < 1e-6, cls
