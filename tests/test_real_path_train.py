"""Disk-backed pipeline end to end: raw ScanNet-format scan -> offline
export + preprocess npys -> ScanRefer jsons + labels tsv ->
build_datasets' real (non-synthetic) branch -> solver epoch.

Every other training test uses the in-memory synthetic source; this one
exercises the file formats and loaders a real-data run goes through
(load_scanrefer, scannetv2-labels tsv parsing, DirectorySceneSource)."""

import json
import os

import numpy as np
import pytest

from test_scannet_export import make_scan

from vlp3d.data.scannet import build_preprocess, export_one_scan


def _fabricate_assets(tmp_path):
    """Returns (scanrefer_dir, scannet_data, labels_tsv)."""
    scan = "scene0001_00"
    make_scan(tmp_path, scan)
    label_map = {"chair": 5, "table": 7}
    out = tmp_path / "scannet_data"
    out.mkdir()
    export_one_scan(str(tmp_path), scan, label_map, str(out / scan))
    for split in ("train", "val"):
        build_preprocess(str(out), scan, split, use_normal=True)

    # scannetv2-labels.combined.tsv layout: elements[1]=raw name,
    # [4]=nyu40id, [7]=nyu40class (dataset.py:60-77)
    tsv = tmp_path / "labels.tsv"
    rows = ["id\traw_category\tcategory\tcount\tnyu40id\teigen13id"
            "\tnyuClass\tnyu40class"]
    rows.append("2\tchair\tchair\t10\t5\t6\tchair\tchair")
    rows.append("3\ttable\ttable\t10\t7\t10\ttable\ttable")
    tsv.write_text("\n".join(rows) + "\n")

    sr_dir = tmp_path / "scanrefer"
    sr_dir.mkdir()
    for split in ("train", "val"):
        anns = [
            {
                "scene_id": scan,
                "object_id": str(oid),
                "object_name": name,
                "ann_id": str(a),
                "description": f"the {name} near the wall",
                "token": ["the", name, "near", "the", "wall"],
            }
            for a in range(3)
            for oid, name in ((0, "chair"), (1, "table"))
        ]
        (sr_dir / f"ScanRefer_filtered_{split}.json").write_text(
            json.dumps(anns)
        )
    return str(sr_dir), str(out), str(tsv)


class _Args:
    def __init__(self, sr_dir, scannet_data, labels_tsv):
        self.synthetic = False
        self.dataset = "ScanRefer"
        self.scanrefer_dir = sr_dir
        self.scannet_data = scannet_data
        self.labels_tsv = labels_tsv
        self.bert_vocab = ""
        self.multiview_hdf5 = ""
        self.num_scenes = -1
        self.lang_num_aug = 0
        self.no_augment = False
        self.seed = 0


def test_real_branch_dataset_batch(tmp_path):
    from vlp3d.cli.common import build_datasets
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.synthetic import tiny_config

    config = tiny_config()
    args = _Args(*_fabricate_assets(tmp_path))
    train_ds, val_ds = build_datasets(args, config)
    assert len(train_ds) >= 1 and len(val_ds) >= 1

    batch = next(iter(BatchIterator(train_ds, 2, epoch=0)))
    n, l = config.dataset.num_points, config.model.lang_num_max
    assert batch["point_clouds"].shape == (2, n, 3 + 4)  # xyz+normals+height
    assert batch["input_ids"].shape == (2, l, config.model.bert_seq_len)
    # tsv-driven 18-class mapping reached the GT labels
    from vlp3d.data.dataset import SCANNET_TYPE2CLASS

    cats = np.asarray(batch["object_cat_list"])
    assert set(np.unique(cats)) <= {
        SCANNET_TYPE2CLASS["chair"], SCANNET_TYPE2CLASS["table"],
        SCANNET_TYPE2CLASS["others"],
    }
    assert SCANNET_TYPE2CLASS["chair"] in set(cats.reshape(-1))
    # GT votes regenerated from disk instance labels
    assert float(np.abs(batch["vote_label"]).sum()) > 0
    assert int(batch["vote_label_mask"].sum()) > 0


@pytest.mark.slow
def test_real_branch_solver_epoch(tmp_path):
    import dataclasses

    from vlp3d.cli.common import build_datasets
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.synthetic import tiny_config
    from vlp3d.train.solver import Solver

    config = tiny_config()
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, batch_size=2,
                                          epochs=1),
    )
    args = _Args(*_fabricate_assets(tmp_path))
    train_ds, val_ds = build_datasets(args, config)

    workdir = str(tmp_path / "run")
    solver = Solver(config, train_ds, val_ds, workdir, log_every=1)
    sample = next(iter(BatchIterator(train_ds, 2, epoch=0)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)
    best = solver(1, eval_every=1)
    assert np.isfinite(best["sum"])
    assert os.path.exists(os.path.join(workdir, "model_last"))
    with open(os.path.join(workdir, "log.jsonl")) as f:
        phases = {json.loads(line)["phase"] for line in f}
    assert {"train", "val"} <= phases
