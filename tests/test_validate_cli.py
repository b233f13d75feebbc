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

SCENE = "scene0000_00"


def _write_bert_assets(bert_dir, rng):
    import torch

    words = [
        "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "a", "chair",
        "table", "brown", "wooden", "next", "to", "round", "gray", "couch",
        "against", "wall", "white", "refrigerator", "standing", "from",
        "left", "it", "is", "with", "an", "on", "this", "2nd", ",", ".",
        ";", "'", "s", "##s", "##word", "unusual", "in", "of",
    ]
    (bert_dir / "vocab.txt").write_text("\n".join(words) + "\n")

    v, h, i, pos = len(words), 32, 64, 64
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "embeddings.word_embeddings.weight": t(v, h),
        "embeddings.position_embeddings.weight": t(pos, h),
        "embeddings.token_type_embeddings.weight": t(2, h),
        "embeddings.LayerNorm.weight": torch.ones(h),
        "embeddings.LayerNorm.bias": torch.zeros(h),
        "pooler.dense.weight": t(h, h),  # deliberately unconsumed
        "pooler.dense.bias": torch.zeros(h),
    }
    for layer in range(2):
        p = f"encoder.layer.{layer}."
        for name, shape in (
            ("attention.self.query", (h, h)),
            ("attention.self.key", (h, h)),
            ("attention.self.value", (h, h)),
            ("attention.output.dense", (h, h)),
            ("intermediate.dense", (i, h)),
            ("output.dense", (h, i)),
        ):
            sd[p + name + ".weight"] = t(*shape)
            sd[p + name + ".bias"] = torch.zeros(shape[0])
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[p + ln + ".weight"] = torch.ones(h)
            sd[p + ln + ".bias"] = torch.zeros(h)
    torch.save(sd, bert_dir / "pytorch_model.bin")


def _write_scene_assets(scannet_data, rng, stale=False):
    n = 2000
    xyz = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    normals = rng.normal(size=(n, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    mv = rng.normal(0, 2, (n, 128)).astype(np.float32)
    ins = np.zeros(n, np.int64)
    sem = np.full(n, 3, np.int64)
    bboxes = np.zeros((2, 8), np.float64)
    for k in range(2):
        c = np.array([1.5 + k, 1.5, 1.0], np.float32)
        s = np.array([1.0, 1.0, 1.0], np.float32)
        sl = slice(k * 400, (k + 1) * 400)
        xyz[sl] = c + rng.uniform(-0.5, 0.5, (400, 3)) * s
        ins[sl] = k + 1
        bboxes[k] = [*c, *s, 3 if k == 0 else 4, k]
    # concatenate AFTER the cluster writes so the saved cloud contains
    # the instances its labels/bboxes describe
    blocks = [xyz, mv, normals] if stale else [xyz, normals, mv]
    pc = np.concatenate(blocks, axis=1)
    np.save(scannet_data / f"{SCENE}_preprocess_val.npy", pc)
    np.save(scannet_data / f"{SCENE}_ins_label.npy", ins)
    np.save(scannet_data / f"{SCENE}_sem_label.npy", sem)
    np.save(scannet_data / f"{SCENE}_aligned_bbox.npy", bboxes)


def _write_scanqa(scanqa_dir):
    qa = [
        {
            "scene_id": SCENE, "question_id": f"val-{SCENE}-{k}",
            "question": q, "answers": a,
            "object_ids": [0], "object_names": ["chair"],
        }
        for k, (q, a) in enumerate([
            ("what color is the chair", ["brown"]),
            ("where is the table", ["next to the chair", "center"]),
            ("how many chairs are there", ["2"]),
        ])
    ]
    with open(scanqa_dir / "ScanQA_v1.0_val.json", "w") as f:
        json.dump(qa, f)


def _write_scanrefer(scanrefer_dir):
    anns = [
        {
            "scene_id": SCENE, "object_id": str(oid),
            "object_name": name, "ann_id": str(k),
            "description": text, "token": text.split(),
        }
        for k, (oid, name, text) in enumerate([
            (0, "chair", "the brown wooden chair next to the table"),
            (0, "chair", "a chair standing against the wall"),
            (1, "table", "the round table in the wall"),
        ])
    ]
    with open(scanrefer_dir / "ScanRefer_filtered_val.json", "w") as f:
        json.dump(anns, f)


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    rng = np.random.default_rng(7)
    tmp = tmp_path_factory.mktemp("validate_assets")
    for d in ("bert", "scannet_data", "scanrefer", "scanqa"):
        (tmp / d).mkdir()
    _write_bert_assets(tmp / "bert", rng)
    _write_scene_assets(tmp / "scannet_data", rng)
    _write_scanrefer(tmp / "scanrefer")
    _write_scanqa(tmp / "scanqa")
    return tmp


@pytest.mark.slow
def test_validate_all_checks_ok(assets, tmp_path):
    out = tmp_path / "report.json"
    rc = validate_main([
        "--bert_dir", str(assets / "bert"),
        "--scannet_data", str(assets / "scannet_data"),
        "--scanrefer_dir", str(assets / "scanrefer"),
        "--scanqa_dir", str(assets / "scanqa"),
        "--num_points", "512",
        "--num_proposals", "16",
        "--out", str(out),
    ])
    report = json.loads(out.read_text())
    assert rc == 0, report
    assert report["ok"], report
    for name in ("tokenizer_golden", "bert_weight_import", "scene_cache",
                 "predict_contract", "grounding_acc", "caption_smoke",
                 "vqa_smoke"):
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
