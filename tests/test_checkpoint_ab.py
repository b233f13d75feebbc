"""Resume-checkpoint durability (ADVICE r04): A/B slot alternation so a
hard kill mid-save can never destroy the last good checkpoint, plus the
--use_checkpoint vs --auto_resume epoch-clock split."""

import json
import os
import shutil
from types import SimpleNamespace

import numpy as np

from vlp3d.train.checkpoint import (
    _live_ckpt_dir,
    load_checkpoint,
    save_checkpoint,
)


def _state(v: float):
    return {"x": np.full((4,), v, dtype=np.float32)}


def test_ab_alternation_and_meta_commit(tmp_path):
    root = str(tmp_path)
    save_checkpoint(root, _state(1.0), {"sum": 0.1}, epoch=1)
    assert _live_ckpt_dir(root) == "checkpoint_a"
    save_checkpoint(root, _state(2.0), {"sum": 0.2}, epoch=2)
    assert _live_ckpt_dir(root) == "checkpoint_b"
    state, meta = load_checkpoint(root, _state(0.0))
    assert meta["epoch"] == 2 and float(state["x"][0]) == 2.0
    # third save flips back to slot a
    save_checkpoint(root, _state(3.0), {"sum": 0.3}, epoch=3)
    assert _live_ckpt_dir(root) == "checkpoint_a"
    state, meta = load_checkpoint(root, _state(0.0))
    assert meta["epoch"] == 3 and float(state["x"][0]) == 3.0


def test_hard_kill_mid_save_keeps_previous(tmp_path):
    """A kill during the NEXT save (non-live slot half-written, meta not
    yet flipped) must leave the previous checkpoint loadable — the exact
    scenario orbax save(force=True) on a single dir loses (it deletes
    the old dir before serializing)."""
    root = str(tmp_path)
    save_checkpoint(root, _state(1.0), {"sum": 0.1}, epoch=1)
    # simulate the kill: garbage partial write in the non-live slot
    partial = os.path.join(root, "checkpoint_b")
    os.makedirs(partial)
    with open(os.path.join(partial, "junk"), "w") as f:
        f.write("partial")
    state, meta = load_checkpoint(root, _state(0.0))
    assert meta["epoch"] == 1 and float(state["x"][0]) == 1.0
    # recovery: the next save overwrites the garbage slot and commits
    save_checkpoint(root, _state(2.0), {"sum": 0.2}, epoch=2)
    state, meta = load_checkpoint(root, _state(0.0))
    assert meta["epoch"] == 2 and float(state["x"][0]) == 2.0


def test_legacy_single_dir_checkpoint_loads(tmp_path):
    """Pre-A/B snapshots (meta without 'dir', state in 'checkpoint/')
    keep loading; the next save migrates to the A/B scheme."""
    root = str(tmp_path)
    save_checkpoint(root, _state(7.0), {"sum": 0.7}, epoch=7)
    # rewrite as the legacy layout
    live = _live_ckpt_dir(root)
    shutil.move(os.path.join(root, live), os.path.join(root, "checkpoint"))
    with open(os.path.join(root, "checkpoint_meta.json")) as f:
        meta = json.load(f)
    meta.pop("dir")
    with open(os.path.join(root, "checkpoint_meta.json"), "w") as f:
        json.dump(meta, f)
    state, meta = load_checkpoint(root, _state(0.0))
    assert meta["epoch"] == 7 and float(state["x"][0]) == 7.0
    save_checkpoint(root, _state(8.0), {"sum": 0.8}, epoch=8)
    assert _live_ckpt_dir(root) in ("checkpoint_a", "checkpoint_b")
    state, meta = load_checkpoint(root, _state(0.0))
    assert meta["epoch"] == 8 and float(state["x"][0]) == 8.0


def test_use_checkpoint_restarts_clock_auto_resume_continues(tmp_path):
    """ADVICE r04: explicit --use_checkpoint is a fine-tuning restart
    (reference train_3dvlp.py:160-171 — weights restored, clock at 0);
    only --auto_resume from the run's own workdir continues the clock.
    The old behavior silently trained ZERO epochs when --use_checkpoint
    pointed at a finished run with the same --epochs."""
    from vlp3d.cli.common import resume_solver

    root = str(tmp_path)
    save_checkpoint(root, _state(5.0), {"sum": 0.5, "epoch": 5.0}, epoch=4)

    solver = SimpleNamespace(state=_state(0.0), best={})
    args = SimpleNamespace(use_checkpoint=root, auto_resume=False)
    assert resume_solver(solver, args, workdir=str(tmp_path / "new")) == 0
    assert float(solver.state["x"][0]) == 5.0  # weights restored
    assert solver.best["sum"] == 0.5

    solver2 = SimpleNamespace(state=_state(0.0), best={})
    args2 = SimpleNamespace(use_checkpoint="", auto_resume=True)
    assert resume_solver(solver2, args2, workdir=root) == 5
    assert float(solver2.state["x"][0]) == 5.0
