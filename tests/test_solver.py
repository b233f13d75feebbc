"""End-to-end tiny-train smoke: synthetic scenes -> solver -> checkpoints."""

import os

import numpy as np

from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
from vlp3d.data.dataset import BatchIterator, collate
from vlp3d.train.solver import Solver


def test_solver_one_epoch(tmp_path):
    config = tiny_config()
    config = config.__class__(
        dataset=config.dataset,
        model=config.model,
        loss=config.loss,
        train=config.train.__class__(batch_size=2, epochs=2),
    )
    train_ds = make_synthetic_dataset(config, n_scenes=2, anns_per_scene=5)
    val_ds = make_synthetic_dataset(
        config, n_scenes=1, anns_per_scene=3, split="val", seed=7
    )

    solver = Solver(
        config,
        train_ds,
        val_ds,
        str(tmp_path),
        log_every=1,
    )
    sample = next(iter(BatchIterator(train_ds, 2, epoch=0)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)

    best = solver(2, eval_every=1)
    assert best["epoch"] >= 1
    assert os.path.exists(os.path.join(str(tmp_path), "model_last"))
    assert os.path.exists(os.path.join(str(tmp_path), "checkpoint"))
    assert os.path.exists(os.path.join(str(tmp_path), "log.jsonl"))
    assert np.isfinite(best["sum"])

    # resume path
    from vlp3d.train.checkpoint import load_checkpoint

    state, meta = load_checkpoint(str(tmp_path), solver.state)
    assert int(state.step) == int(solver.state.step)
    assert meta["epoch"] == 1
