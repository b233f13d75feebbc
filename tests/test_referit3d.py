"""ReferIt3D annotation conversion (scripts/preprocess/{nr3d,sr3d}.py)."""

import csv
import json
import os

from vlp3d.cli.preprocess_annotations import main as preprocess_main
from vlp3d.data.referit3d import convert_referit3d, parse_referit3d_csv


def _write_csv(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "scan_id", "target_id", "instance_type", "assignmentid",
                "utterance", "tokens",
            ],
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)


ROWS = [
    dict(scan_id="scene0000_00", target_id=3, instance_type="chair",
         assignmentid="A1", utterance="The RED chair",
         tokens="['the', 'red', 'chair']"),
    dict(scan_id="scene0500_00", target_id=7, instance_type="table",
         assignmentid="A2", utterance="a round table",
         tokens="['a', 'round', 'table']"),
    dict(scan_id="scene0999_00", target_id=1, instance_type="sofa",
         assignmentid="A3", utterance="dropped scene",
         tokens="['dropped']"),
]


def test_nr3d_conversion(tmp_path):
    csv_path = tmp_path / "nr3d.csv"
    _write_csv(csv_path, ROWS)
    (tmp_path / "train.txt").write_text("scene0000_00\n")
    (tmp_path / "val.txt").write_text("scene0500_00\n")
    train_path, val_path = convert_referit3d(
        str(csv_path), str(tmp_path / "out"),
        train_list=str(tmp_path / "train.txt"),
        val_list=str(tmp_path / "val.txt"),
    )
    train = json.load(open(train_path))
    val = json.load(open(val_path))
    assert [e["scene_id"] for e in train] == ["scene0000_00"]
    assert [e["scene_id"] for e in val] == ["scene0500_00"]
    e = train[0]
    # ScanRefer schema, lowercased description, literal-eval'd tokens,
    # nr3d keeps the CSV assignmentid (nr3d.py:42)
    assert e["object_id"] == "3" and e["object_name"] == "chair"
    assert e["description"] == "the red chair"
    assert e["token"] == ["the", "red", "chair"]
    assert e["ann_id"] == "A1"
    # ScanRefer loader can consume the output schema directly
    assert set(e) == {
        "scene_id", "object_id", "object_name", "ann_id", "description",
        "token",
    }


def test_sr3d_sequential_ann_ids(tmp_path):
    csv_path = tmp_path / "sr3d.csv"
    _write_csv(csv_path, ROWS)
    entries = parse_referit3d_csv(str(csv_path), ann_id_mode="sequential")
    assert [e["ann_id"] for e in entries] == [0, 1, 2]  # sr3d.py:39-47


def test_organize_cli(tmp_path):
    src = tmp_path / "scanrefer.json"
    json.dump(
        [
            {"scene_id": "s0", "object_id": "1", "ann_id": "0", "x": 1},
            {"scene_id": "s0", "object_id": "1", "ann_id": "1", "x": 2},
            {"scene_id": "s1", "object_id": "2", "ann_id": "0", "x": 3},
        ],
        open(src, "w"),
    )
    out = tmp_path / "organized.json"
    preprocess_main(["organize", "--scanrefer", str(src), "--out", str(out)])
    org = json.load(open(out))
    assert org["s0"]["1"]["1"]["x"] == 2
    assert org["s1"]["2"]["0"]["x"] == 3


def test_referit3d_cli_scanrefer_split(tmp_path):
    csv_path = tmp_path / "nr3d.csv"
    _write_csv(csv_path, ROWS)
    sr_dir = tmp_path / "sr"
    os.makedirs(sr_dir)
    json.dump(
        [{"scene_id": "scene0000_00"}],
        open(sr_dir / "ScanRefer_filtered_train.json", "w"),
    )
    json.dump(
        [{"scene_id": "scene0500_00"}],
        open(sr_dir / "ScanRefer_filtered_val.json", "w"),
    )
    preprocess_main(
        [
            "referit3d", "--csv", str(csv_path),
            "--out_dir", str(tmp_path / "out"),
            "--scanrefer_dir", str(sr_dir),
        ]
    )
    val = json.load(open(tmp_path / "out" / "nr3d_val.json"))
    assert len(val) == 1 and val[0]["scene_id"] == "scene0500_00"
