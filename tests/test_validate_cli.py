"""Drive vlp3d-validate end-to-end on synthetic stand-in assets.

The CLI's purpose is the first environment WITH real assets
(VERDICT r2 #4); this test proves the runbook itself executes: every
check reaches 'ok' on stand-ins shaped like the real assets (HF-layout
torch checkpoint + vocab, preprocessed scene npys, ScanRefer json), the
report is machine-readable, and a stale cache flips the right check to
'fail' with a non-zero exit.
"""

import json
import os

import numpy as np
import pytest

from vlp3d.cli.validate import main as validate_main
from vlp3d.data.standins import (
    SCENE,
    write_scene_assets as _write_scene_assets,
    write_standin_assets,
)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("validate_assets")
    write_standin_assets(str(tmp))
    return tmp


@pytest.mark.slow
def test_validate_all_checks_ok(assets, tmp_path):
    out = tmp_path / "report.json"
    rc = validate_main([
        "--bert_dir", str(assets / "bert"),
        "--scannet_data", str(assets / "scannet_data"),
        "--scanrefer_dir", str(assets / "scanrefer"),
        "--scanqa_dir", str(assets / "scanqa"),
        "--multiview_nomv_data", str(assets / "scannet_data_nomv"),
        "--num_points", "512",
        "--num_proposals", "16",
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert rc == 0, report
    assert report["ok"], report
    for name in ("tokenizer_golden", "bert_weight_import", "scene_cache",
                 "predict_contract", "grounding_acc", "caption_smoke",
                 "vqa_smoke", "multiview_hdf5", "torch_import_chain"):
        assert report["checks"][name]["status"] == "ok", (
            name, report["checks"][name])
    # contract details
    assert report["checks"]["bert_weight_import"]["config"]["layers"] == 2
    assert any(
        "pooler" in k
        for k in report["checks"]["bert_weight_import"]["unconsumed_keys"]
    )
    pred = json.loads(
        open(report["checks"]["predict_contract"]["pred_json"]).read())
    assert pred and set(pred[0]) == {
        "scene_id", "object_id", "ann_id", "bbox", "unique_multiple",
        "others",
    }
    assert np.asarray(pred[0]["bbox"]).shape == (8, 3)
    acc = report["checks"]["grounding_acc"]
    assert 0.0 <= acc["acc_at_025"] <= 1.0 and acc["n"] > 0
    for v in report["checks"]["caption_smoke"]["metrics"].values():
        assert np.isfinite(v)
    vqa = report["checks"]["vqa_smoke"]
    assert vqa["questions"] == 3 and 0.0 <= vqa["em_at_1"] <= 1.0
    # the hdf5-assembled cloud reproduced the baked cache bit-for-bit
    mv = report["checks"]["multiview_hdf5"]
    assert mv["bit_identical_to_baked"] and mv["item_channels"] == 135
    # the .pth -> import CLI -> predict chain round-tripped the probe leaf
    chain = report["checks"]["torch_import_chain"]
    assert chain["pred_finite"] and chain["probe_leaf"]


@pytest.mark.slow
def test_validate_synthetic_standins_roundtrip(tmp_path):
    """`vlp3d-validate --synthetic_standins DIR` generates the stand-ins
    itself and runs every check — the per-round runbook-rot guard
    (`make validate-roundtrip` archives its report each round)."""
    out = tmp_path / "report.json"
    rc = validate_main([
        "--synthetic_standins", str(tmp_path / "standins"),
        "--num_points", "512",
        "--num_proposals", "16",
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert rc == 0, report
    assert report["ok"], report
    assert all(
        c["status"] == "ok" for c in report["checks"].values()
    ), report


def test_validate_skips_without_assets(tmp_path):
    out = tmp_path / "report.json"
    rc = validate_main(["--out", str(out)])
    report = json.loads(out.read_text())
    assert rc == 0
    assert all(c["status"] == "skipped"
               for c in report["checks"].values()), report


@pytest.mark.slow
def test_validate_fails_on_stale_cache(tmp_path):
    rng = np.random.default_rng(9)
    data = tmp_path / "scannet_data"
    data.mkdir()
    _write_scene_assets(data, rng, stale=True)
    out = tmp_path / "report.json"
    rc = validate_main([
        "--scannet_data", str(data),
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert rc == 1
    assert report["checks"]["scene_cache"]["status"] == "fail"
    assert "stale preprocess cache" in report["checks"]["scene_cache"].get(
        "error", "")


def test_multiview_check_standalone_gating(tmp_path):
    """check_multiview_hdf5 is gated on ITS OWN assets: with only
    --multiview_nomv_data it runs the assembly check (scene id derived
    from the nomv cache, dataset-item sub-check skipped without
    ScanRefer), and never hard-fails the runbook for missing unrelated
    flags (review finding r5)."""
    rng = np.random.default_rng(3)
    nomv = tmp_path / "nomv"
    nomv.mkdir()
    baked = tmp_path / "baked"
    baked.mkdir()
    from vlp3d.data.standins import write_scene_assets_nomv

    arrays = _write_scene_assets(baked, rng)
    write_scene_assets_nomv(str(nomv), arrays)

    out = tmp_path / "report.json"
    rc = validate_main([
        "--multiview_nomv_data", str(nomv),
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert rc == 0, report
    mv = report["checks"]["multiview_hdf5"]
    assert mv["status"] == "ok" and mv["columns"] == 134
    assert "skipped" in mv["item_check"]
