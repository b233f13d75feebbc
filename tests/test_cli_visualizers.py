"""Visualizer CLI smoke tests (synthetic scenes, tiny shapes)."""

import glob
import json
import os

import numpy as np

import pytest


@pytest.mark.slow
def test_visualizer_clis(tmp_path):
    from vlp3d.cli.caption_visualize import main as cap_main
    from vlp3d.cli.ground_visualize import main as gv_main
    from vlp3d.cli.heatmap_visualize import main as hm_main

    gv_dir = str(tmp_path / "gv")
    n = gv_main(
        ["--synthetic", "--smoke", "--out_dir", gv_dir, "--max_scenes", "1"]
    )
    assert n == 1
    scene_dirs = glob.glob(os.path.join(gv_dir, "*"))
    assert scene_dirs
    files = os.listdir(scene_dirs[0])
    assert "pc.ply" in files
    assert any(f.startswith("gt_") for f in files)
    assert any(f.startswith("pred_") for f in files)

    hm_dir = str(tmp_path / "hm")
    n = hm_main(
        ["--synthetic", "--smoke", "--out_dir", hm_dir, "--max_scenes", "1"]
    )
    assert n == 1
    plys = glob.glob(os.path.join(hm_dir, "*", "*_*.ply"))
    assert plys  # per-head heatmap dumps exist

    cv_dir = str(tmp_path / "cv")
    n = cap_main(
        ["--synthetic", "--smoke", "--out_dir", cv_dir, "--max_scenes", "1"]
    )
    assert n == 1
    caps = glob.glob(os.path.join(cv_dir, "*", "captions.json"))
    assert caps
    with open(caps[0]) as f:
        data = json.load(f)
    for v in data.values():
        assert "description" in v and "object_name" in v


def test_dump_detection_results(tmp_path, rng):
    from vlp3d.utils.visualize import dump_detection_results

    b, k, k2 = 2, 8, 12
    outputs = {
        "pred_center": rng.uniform(0, 4, (b, k, 3)),
        "pred_size": rng.uniform(0.3, 1.0, (b, k, 3)),
        "pred_heading": np.zeros((b, k)),
        "objectness_scores": rng.normal(size=(b, k, 2)) * 3,
        "sem_cls_scores": rng.normal(size=(b, k, 18)),
        "objectness_label": (rng.uniform(size=(b, k)) < 0.5).astype(int),
    }
    batch = {
        "center_label": rng.uniform(0, 4, (b, k2, 3)),
        "box_label_mask": (rng.uniform(size=(b, k2)) < 0.7).astype(
            np.float32
        ),
    }
    dump_detection_results(outputs, batch, str(tmp_path))
    names = os.listdir(tmp_path)
    assert any(n.endswith("_gt_centroid_pc.ply") for n in names)
    assert any("gt_positive_proposal" in n for n in names)
