"""pred.json contract round trip: the predict CLI's output scores cleanly
through the benchmark evaluator (benchmark/predict.py + eval.py contract,
train_3dvlp.py:521-536)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_predict_then_eval_benchmark(tmp_path):
    from vlp3d.cli.eval_benchmark import evaluate
    from vlp3d.cli.predict import main as predict_main

    out_path = os.path.join(str(tmp_path), "pred.json")
    predict_main(["--smoke", "--out", out_path])
    with open(out_path) as f:
        preds = json.load(f)
    assert preds, "predict produced no records"
    for rec in preds:
        assert set(rec) >= {
            "scene_id", "object_id", "ann_id", "bbox", "unique_multiple",
            "others",
        }, rec.keys()
        bbox = np.asarray(rec["bbox"])
        assert bbox.shape == (8, 3)
        assert np.isfinite(bbox).all()

    # GT keyed exactly like the benchmark's organized json: give every
    # annotation the predicted box of its FIRST record shifted by zero —
    # here we fabricate GT from the predictions themselves (score == 1.0
    # sanity) and from shifted boxes (score == 0.0 sanity).
    gts_perfect: dict = {}
    gts_wrong: dict = {}
    for rec in preds:
        sid, oid, ann = rec["scene_id"], str(rec["object_id"]), str(
            rec["ann_id"]
        )
        gts_perfect.setdefault(sid, {}).setdefault(oid, {})[ann] = {
            "bbox": rec["bbox"]
        }
        gts_wrong.setdefault(sid, {}).setdefault(oid, {})[ann] = {
            "bbox": (np.asarray(rec["bbox"]) + 100.0).tolist()
        }

    perfect = evaluate(preds, gts_perfect)
    assert perfect["num_scored"] == len(preds)
    assert perfect["overall_acc@0.5"] == 1.0
    wrong = evaluate(preds, gts_wrong)
    assert wrong["overall_acc@0.25"] == 0.0
    for key in ("unique_acc@0.25", "multiple_acc@0.5", "overall_count"):
        assert key in perfect
