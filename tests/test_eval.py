"""Eval-layer tests: corner IoU oracle parity, breakdowns, caption metrics."""

import numpy as np

from tests.oracles import aabb_iou_oracle
from vlp3d.eval.box_iou import box3d_iou, get_3d_box
from vlp3d.eval.capeval import Bleu, Cider, Meteor, Rouge
from vlp3d.eval.grounding import final_eval_breakdown


class TestBoxIoU:
    def test_axis_aligned_matches_aabb(self, rng):
        for _ in range(20):
            c1 = rng.uniform(-1, 1, 3)
            c2 = c1 + rng.uniform(-0.5, 0.5, 3)
            s1 = rng.uniform(0.5, 1.5, 3)
            s2 = rng.uniform(0.5, 1.5, 3)
            got = box3d_iou(get_3d_box(s1, 0.0, c1), get_3d_box(s2, 0.0, c2))
            want = aabb_iou_oracle(
                c1[None], s1[None], c2[None], s2[None]
            )[0]
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)

    def test_identical_box(self):
        b = get_3d_box(np.array([1.0, 2.0, 3.0]), 0.3, np.zeros(3))
        assert abs(box3d_iou(b, b) - 1.0) < 1e-6

    def test_disjoint(self):
        b1 = get_3d_box(np.ones(3), 0.0, np.zeros(3))
        b2 = get_3d_box(np.ones(3), 0.0, np.full(3, 10.0))
        assert box3d_iou(b1, b2) == 0.0


def test_final_eval_breakdown():
    ious = [0.6, 0.3, 0.1, 0.8]
    multiple = [0, 0, 1, 1]
    others = [0, 1, 0, 1]
    out = final_eval_breakdown(ious, multiple, others)
    assert out["overall_acc@0.25"] == 0.75
    assert out["overall_acc@0.5"] == 0.5
    assert out["unique_acc@0.5"] == 0.5
    assert out["multiple_acc@0.25"] == 0.5
    assert out["unique_count"] == 2


class TestCaptionMetrics:
    gts = {
        "a": ["the red chair is next to the table",
              "a red chair beside the table"],
        "b": ["a large white bed in the corner"],
    }

    def test_perfect_candidates(self):
        res = {k: [v[0]] for k, v in self.gts.items()}
        bleu, _ = Bleu(4).compute_score(self.gts, res)
        assert bleu[3] > 0.99
        rouge, _ = Rouge().compute_score(self.gts, res)
        assert rouge > 0.99
        cider, _ = Cider().compute_score(self.gts, res)
        assert cider > 0.0
        meteor, _ = Meteor().compute_score(self.gts, res)
        assert meteor > 0.49  # perfect match -> 1 - gamma*1 chunk penalty edge

    def test_garbage_candidates(self):
        res = {"a": ["zebra xylophone"], "b": ["quantum flux"]}
        bleu, _ = Bleu(4).compute_score(self.gts, res)
        assert bleu[3] < 0.01
        rouge, _ = Rouge().compute_score(self.gts, res)
        assert rouge < 0.01
        meteor, _ = Meteor().compute_score(self.gts, res)
        assert meteor == 0.0

    def test_ranking_sane(self):
        good = {"a": ["the red chair is next to a table"],
                "b": ["a large white bed in a corner"]}
        bad = {"a": ["a dog"], "b": ["the sky is blue today"]}
        for scorer in (Bleu(4), Rouge(), Cider(), Meteor()):
            g = scorer.compute_score(self.gts, good)[0]
            b_ = scorer.compute_score(self.gts, bad)[0]
            if isinstance(g, list):
                g, b_ = g[3], b_[3]
            assert g > b_, type(scorer).__name__


def test_nms_2d_faster_parity():
    """nms_2d_faster vs a direct transcription of utils/nms.py:41-73."""
    from vlp3d.eval.detection import nms_2d_faster

    rng = np.random.default_rng(7)
    k = 40
    xy = rng.uniform(0, 4, (k, 2))
    wh = rng.uniform(0.3, 1.5, (k, 2))
    boxes = np.concatenate(
        [xy, xy + wh, rng.uniform(size=(k, 1))], axis=1
    ).astype(np.float64)

    def oracle(bxs, thr, old_type=False):
        x1, y1, x2, y2, score = (bxs[:, i] for i in range(5))
        area = (x2 - x1) * (y2 - y1)
        I = np.argsort(score)
        pick = []
        while I.size != 0:
            last = I.size
            i = I[-1]
            pick.append(i)
            xx1 = np.maximum(x1[i], x1[I[: last - 1]])
            yy1 = np.maximum(y1[i], y1[I[: last - 1]])
            xx2 = np.minimum(x2[i], x2[I[: last - 1]])
            yy2 = np.minimum(y2[i], y2[I[: last - 1]])
            w = np.maximum(0, xx2 - xx1)
            h = np.maximum(0, yy2 - yy1)
            if old_type:
                o = (w * h) / area[I[: last - 1]]
            else:
                inter = w * h
                o = inter / (area[i] + area[I[: last - 1]] - inter)
            I = np.delete(
                I,
                np.concatenate(
                    ([last - 1], np.where(o > thr)[0])
                ),
            )
        return pick

    for thr in (0.1, 0.25, 0.5):
        for old in (False, True):
            assert nms_2d_faster(boxes, thr, old) == [
                int(x) for x in oracle(boxes, thr, old)
            ], (thr, old)


def test_parse_predictions_2d_nms_branch(rng):
    """use_3d_nms=False routes through the BEV 2D NMS path."""
    from vlp3d.eval.detection import parse_predictions

    b, k = 2, 12
    outputs = {
        "pred_center": rng.uniform(0, 4, (b, k, 3)),
        "pred_size": rng.uniform(0.3, 1.0, (b, k, 3)),
        "pred_heading": np.zeros((b, k)),
        "objectness_scores": rng.normal(size=(b, k, 2)),
        "sem_cls_scores": rng.normal(size=(b, k, 18)),
        "point_clouds": rng.uniform(0, 4, (b, 2000, 3)),
    }
    mask, preds = parse_predictions(
        outputs, {"use_3d_nms": False, "remove_empty_box": False}
    )
    assert mask.shape == (b, k)
    assert mask.sum() > 0
    assert len(preds) == b


def test_parse_predictions_classform(rng):
    """VoteNet/ScanQA class-form decode (ap_helper_vqa.py:39-77): heading
    from argmax bin + residual, size from mean_size_arr[argmax] +
    residual, then the shared NMS path."""
    from vlp3d.eval.detection import (
        parse_predictions,
        parse_predictions_classform,
    )

    b, k, ns, nh = 2, 6, 18, 1
    mean_size = rng.uniform(0.5, 1.5, (ns, 3)).astype(np.float32)
    center = rng.uniform(0, 4, (b, k, 3)).astype(np.float32)
    size_scores = rng.normal(size=(b, k, ns)).astype(np.float32)
    size_residuals = rng.normal(size=(b, k, ns, 3)).astype(np.float32) * 0.1
    heading_scores = rng.normal(size=(b, k, nh)).astype(np.float32)
    heading_residuals = np.zeros((b, k, nh), np.float32)
    obj = rng.normal(size=(b, k, 2)).astype(np.float32)
    sem = rng.normal(size=(b, k, 18)).astype(np.float32)
    pc = rng.uniform(0, 4, (b, 512, 3)).astype(np.float32)

    outputs = {
        "center": center,
        "heading_scores": heading_scores,
        "heading_residuals": heading_residuals,
        "size_scores": size_scores,
        "size_residuals": size_residuals,
        "objectness_scores": obj,
        "sem_cls_scores": sem,
        "point_clouds": pc,
    }
    mask, preds = parse_predictions_classform(outputs, {}, mean_size)

    # manual decode -> shared path must agree exactly
    scls = np.argmax(size_scores, -1)
    size = mean_size[scls] + np.take_along_axis(
        size_residuals, scls[..., None, None], -2
    )[..., 0, :]
    manual = {
        "pred_center": center,
        "pred_size": size,
        "pred_heading": np.zeros((b, k), np.float32),  # 1 bin, res 0
        "objectness_scores": obj,
        "sem_cls_scores": sem,
        "point_clouds": pc,
    }
    mask2, preds2 = parse_predictions(manual, {})
    np.testing.assert_array_equal(mask, mask2)
    assert len(preds) == len(preds2)
    for a, c in zip(preds, preds2):
        assert len(a) == len(c)
        for (s1, box1, p1), (s2, box2, p2) in zip(a, c):
            assert s1 == s2 and p1 == p2
            np.testing.assert_allclose(box1, box2, atol=1e-6)
