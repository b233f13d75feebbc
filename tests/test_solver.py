"""End-to-end tiny-train smoke: synthetic scenes -> solver -> checkpoints."""

import pytest
import os

import numpy as np

from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
from vlp3d.data.dataset import BatchIterator, collate
from vlp3d.train.solver import Solver


@pytest.mark.slow
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
    # A/B alternation: the committed resume checkpoint lives in the slot
    # checkpoint_meta.json names (never an in-place 'checkpoint' rewrite)
    from vlp3d.train.checkpoint import _live_ckpt_dir

    assert os.path.exists(
        os.path.join(str(tmp_path), _live_ckpt_dir(str(tmp_path)))
    )
    assert os.path.exists(os.path.join(str(tmp_path), "log.jsonl"))
    # tensorboard dual writers emitted event files with scalar records
    import glob

    for split in ("train", "val"):
        evs = glob.glob(
            os.path.join(str(tmp_path), "tensorboard", split, "events.*")
        )
        assert evs and os.path.getsize(evs[0]) > 100, split
    assert np.isfinite(best["sum"])

    # resume path
    from vlp3d.train.checkpoint import load_checkpoint

    state, meta = load_checkpoint(str(tmp_path), solver.state)
    assert int(state.step) == int(solver.state.step)
    assert meta["epoch"] == 1

    # KeyboardInterrupt -> checkpoint-and-exit (solver_3dvlp.py:356-359)
    import json

    def boom(epoch):
        raise KeyboardInterrupt

    solver.train_epoch = boom
    best2 = solver(5, eval_every=1)  # must not propagate the interrupt
    assert best2 is solver.best
    with open(os.path.join(str(tmp_path), "checkpoint_meta.json")) as f:
        # the interrupted call completed NO epoch (done_epoch -1), and
        # the on-disk record already says epoch 1 — the interrupt save
        # must not regress it (no-regress guard; --auto_resume would
        # otherwise rewind to replaying from epoch 0)
        assert json.load(f)["epoch"] == 1


@pytest.mark.slow
def test_warm_start_staged_pipeline(tmp_path):
    """Stage 1 grounding pretrain -> snapshot -> stage 2 caption run
    warm-started with strict=False semantics (the reference's --pretrain
    recipe, train_3dvlp.py:115-121 + train_caption.py:110-115)."""
    import jax

    ground_cfg = tiny_config(no_caption=True, use_con=False)
    ground_cfg = ground_cfg.__class__(
        dataset=ground_cfg.dataset,
        model=ground_cfg.model,
        loss=ground_cfg.loss,
        train=ground_cfg.train.__class__(batch_size=2, epochs=1),
    )
    train_ds = make_synthetic_dataset(ground_cfg, n_scenes=2, anns_per_scene=5)
    val_ds = make_synthetic_dataset(
        ground_cfg, n_scenes=1, anns_per_scene=3, split="val", seed=7
    )
    stage1 = Solver(
        ground_cfg, train_ds, val_ds, str(tmp_path / "s1"),
        caption=False, log_every=1,
    )
    sample = next(iter(BatchIterator(train_ds, 2, epoch=0)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    stage1.init_state(sample)
    stage1(1, eval_every=1)
    snap_path = os.path.join(str(tmp_path / "s1"), "model_last")
    assert os.path.exists(snap_path)

    # stage 2: caption-enabled model (superset of stage-1 modules)
    cap_cfg = tiny_config(no_caption=False, use_con=False)
    cap_cfg = cap_cfg.__class__(
        dataset=cap_cfg.dataset,
        model=cap_cfg.model,
        loss=cap_cfg.loss,
        train=cap_cfg.train.__class__(batch_size=2, epochs=1),
    )
    cap_train = make_synthetic_dataset(cap_cfg, n_scenes=2, anns_per_scene=5)
    stage2 = Solver(
        cap_cfg, cap_train, val_ds, str(tmp_path / "s2"),
        caption=True, log_every=1,
    )
    sample2 = next(iter(BatchIterator(cap_train, 2, epoch=0)))
    sample2 = {k: v for k, v in sample2.items() if not isinstance(v, list)}
    stage2.init_state(sample2)
    fresh_caption = jax.tree_util.tree_leaves(stage2.state.params["caption"])

    n_restored, n_skipped = stage2.warm_start(snap_path)
    assert n_restored > 0
    # the caption module wasn't in stage 1 -> its leaves stay fresh
    assert n_skipped >= len(fresh_caption)

    # every restored leaf matches the stage-1 snapshot exactly
    flat1 = jax.tree_util.tree_flatten_with_path(stage1.state.params)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(stage2.state.params)[0])
    checked = 0
    for path, leaf in flat1:
        other = flat2.get(path)
        if other is not None and other.shape == leaf.shape:
            np.testing.assert_allclose(
                np.asarray(other), np.asarray(leaf), rtol=0, atol=0
            )
            checked += 1
    assert checked > 0
    # BN running stats warm-start too (state_dict parity)
    s1_stats = jax.tree_util.tree_flatten_with_path(stage1.state.batch_stats)[0]
    s2_stats = dict(
        jax.tree_util.tree_flatten_with_path(stage2.state.batch_stats)[0]
    )
    stat_checked = 0
    for path, leaf in s1_stats:
        other = s2_stats.get(path)
        if other is not None and other.shape == leaf.shape:
            np.testing.assert_allclose(np.asarray(other), np.asarray(leaf))
            stat_checked += 1
    assert stat_checked > 0


def test_caption_best_model_snapshot(tmp_path):
    """caption_model saved on best bleu-4+cider+rouge+meteor sum
    (solver_3dvlp.py:1166-1181) — pure epoch-loop logic, no jit."""
    config = tiny_config()
    config = config.__class__(
        dataset=config.dataset,
        model=config.model,
        loss=config.loss,
        train=config.train.__class__(batch_size=2, epochs=3),
    )
    ds = make_synthetic_dataset(config, n_scenes=1, anns_per_scene=2)
    solver = Solver(config, ds, ds, str(tmp_path), caption=True)

    # caption metric trajectory: up, down, up — expect snapshots at
    # epochs 0 and 2 only
    cap_vals = [
        {"bleu-4": 0.1, "cider": 0.2, "rouge": 0.1, "meteor": 0.1},
        {"bleu-4": 0.0, "cider": 0.1, "rouge": 0.1, "meteor": 0.1},
        {"bleu-4": 0.3, "cider": 0.3, "rouge": 0.2, "meteor": 0.1},
    ]
    ground_vals = [0.1, 0.2, 0.15]
    snapshots = []
    solver.train_epoch = lambda epoch: {}
    solver.eval_epoch = lambda epoch: {
        "iou_rate_0.25": ground_vals[epoch],
        "iou_rate_0.5": ground_vals[epoch],
        "lang_acc": 0.5,
        **cap_vals[epoch],
    }
    solver._snapshot = lambda name: snapshots.append(name)
    solver._save_full_checkpoint = lambda epoch: None

    best = solver(3, eval_every=1)
    assert snapshots.count("caption_model") == 2
    assert best["caption_sum"] == pytest.approx(0.9)
    assert best["best_caption_epoch"] == 3
    assert best["best_caption_bleu-4"] == pytest.approx(0.3)
    # grounding taxonomy still keyed on its own trajectory
    assert best["ground_5"] == pytest.approx(0.2)
    # grounding-only run (no caption metrics) never saves caption_model
    snapshots.clear()
    solver.best["caption_sum"] = -1e10
    solver.eval_epoch = lambda epoch: {
        "iou_rate_0.25": 0.5, "iou_rate_0.5": 0.5, "lang_acc": 0.5,
    }
    solver(1, eval_every=1)
    assert "caption_model" not in snapshots


@pytest.mark.slow
def test_train_step_donation(tmp_path):
    """Default donate=True aliases the state into the step's outputs:
    the pre-step buffers are deleted (one state copy of transient HBM
    saved), threading keeps working, and --no_donate keeps them alive.
    Also covers the interrupt-mid-step guard: a donated (deleted) live
    state must not crash the save-and-exit path."""
    import jax

    config = tiny_config()
    config = config.__class__(
        dataset=config.dataset,
        model=config.model,
        loss=config.loss,
        train=config.train.__class__(batch_size=2, epochs=1),
    )
    ds = make_synthetic_dataset(config, n_scenes=2, anns_per_scene=5)
    sample = next(iter(BatchIterator(ds, 2, epoch=0)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}

    solver = Solver(config, ds, ds, str(tmp_path / "d"), log_every=1)
    solver.init_state(sample)
    old_leaves = jax.tree.leaves(solver.state.params) + jax.tree.leaves(
        solver.state.opt_state
    )
    _, train_step, _ = solver._get_steps(0)
    batch = solver._shard(sample)
    solver.state, metrics = train_step(solver.state, batch, solver.rng)
    assert np.isfinite(float(metrics["loss"]))
    n_deleted = sum(leaf.is_deleted() for leaf in old_leaves)
    assert n_deleted == len(old_leaves), (n_deleted, len(old_leaves))
    # threading continues: a second step from the NEW state works
    solver.state, metrics2 = train_step(solver.state, batch, solver.rng)
    assert np.isfinite(float(metrics2["loss"]))

    # interrupt-mid-step guard: with the live state donated, the
    # KeyboardInterrupt path must neither crash on the deleted buffers
    # NOR attempt the save (orbax save(force=True) deletes the existing
    # checkpoint dir before serializing — a doomed save would destroy
    # the last good checkpoint)
    solver._save_full_checkpoint(0)  # a good checkpoint exists on disk
    stale = solver.state
    solver.state, _ = train_step(solver.state, batch, solver.rng)
    solver.state = stale  # simulate ^C landing inside the dispatch

    def boom(epoch):
        raise KeyboardInterrupt

    solver.train_epoch = boom
    best = solver(1, eval_every=1)  # must not raise
    assert best is solver.best
    from vlp3d.train.checkpoint import _live_ckpt_dir

    root = str(tmp_path / "d")
    ckpt_dir = os.path.join(root, _live_ckpt_dir(root))
    assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
    with open(os.path.join(str(tmp_path / "d"),
                           "checkpoint_meta.json")) as f:
        import json

        assert json.load(f)["epoch"] == 0  # the GOOD save, untouched

    # --no_donate: pre-step buffers stay alive
    solver2 = Solver(
        config, ds, ds, str(tmp_path / "nd"), log_every=1, donate=False
    )
    solver2.init_state(sample)
    old2 = jax.tree.leaves(solver2.state.params)
    _, step2, _ = solver2._get_steps(0)
    solver2.state, _ = step2(solver2.state, solver2._shard(sample),
                             solver2.rng)
    assert not any(leaf.is_deleted() for leaf in old2)
