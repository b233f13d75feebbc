"""Preemption recovery: stable --workdir + --auto_resume continue a run
from its own checkpoint with the epoch/curriculum clock intact.

The reference's --use_checkpoint restores weights + best but restarts
the epoch loop at 0 (train_3dvlp.py:160-171), replaying the epoch-50
curriculum switches; Solver.__call__(start_epoch=...) continues the
clock instead.
"""

import json
import os

import pytest

from vlp3d.data.dataset import BatchIterator
from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
from vlp3d.train.solver import Solver


def test_start_epoch_skips_completed_epochs(tmp_path):
    """Pure epoch-loop logic (no jit): start_epoch=1 runs epochs [1, 3)."""
    config = tiny_config()
    ds = make_synthetic_dataset(config, n_scenes=1, anns_per_scene=2)
    solver = Solver(config, ds, ds, str(tmp_path))
    seen = []
    solver.train_epoch = lambda e: seen.append(e)
    solver.eval_epoch = lambda e: {
        "iou_rate_0.25": 0.1, "iou_rate_0.5": 0.1, "lang_acc": 0.5,
    }
    solver._snapshot = lambda name: None
    solver._save_full_checkpoint = lambda e: None
    solver(3, start_epoch=1)
    assert seen == [1, 2]


@pytest.mark.slow
def test_cli_auto_resume_continues_after_preemption(tmp_path):
    """Full CLI round trip: smoke run -> simulate preemption after epoch
    0 (checkpoint_meta rewound) -> rerun the SAME command with
    --auto_resume -> only epoch 1 trains, best/state restored."""
    from vlp3d.cli.train_3dvlp import main

    workdir = str(tmp_path / "run")
    args = ["--smoke", "--workdir", workdir, "--auto_resume", "--seed", "5"]
    best1 = main(args)
    meta_path = os.path.join(workdir, "checkpoint_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta["epoch"] == 1  # smoke = 2 epochs, final save at last epoch

    # simulate preemption right after epoch 0's periodic/interrupt save
    meta["epoch"] = 0
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    n_log_lines = sum(1 for _ in open(os.path.join(workdir, "log.jsonl")))

    best2 = main(args)  # identical restart command
    with open(os.path.join(workdir, "log.jsonl")) as f:
        new_records = [
            json.loads(line) for line in f.readlines()[n_log_lines:]
        ]
    trained_epochs = sorted({
        r["epoch"] for r in new_records if r.get("phase") == "train"
    })
    assert trained_epochs == [1], trained_epochs  # epoch 0 NOT replayed
    # best taxonomy restored and carried forward, not reset
    assert best2["epoch"] >= best1["epoch"] or best2["sum"] >= best1["sum"]
    with open(meta_path) as f:
        assert json.load(f)["epoch"] == 1  # final save re-stamped


@pytest.mark.slow
def test_fresh_start_when_no_checkpoint(tmp_path):
    """--auto_resume on an empty workdir is a plain fresh start."""
    from vlp3d.cli.train_3dvlp import main

    workdir = str(tmp_path / "fresh")
    best = main(["--smoke", "--workdir", workdir, "--auto_resume"])
    assert os.path.exists(os.path.join(workdir, "checkpoint_meta.json"))
    assert best["epoch"] >= 1
