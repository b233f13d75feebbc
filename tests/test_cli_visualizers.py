"""Visualizer CLI smoke tests (synthetic scenes, tiny shapes)."""

import glob
import json
import os

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
