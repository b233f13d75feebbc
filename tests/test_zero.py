"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the virtual
8-device CPU mesh: moment buffers shard 1/N over the data axis, the
jitted train step keeps them sharded, and the param trajectory is the
replicated run's."""

import pytest
import jax
import numpy as np

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.models.jointnet import JointNet
from vlp3d.parallel.mesh import DATA_AXIS, make_mesh, replicate, shard_batch
from vlp3d.parallel.zero import (
    MIN_SHARD_ELEMS, opt_state_pspecs, zero_shard_state,
)
from vlp3d.train.optimizer import make_optimizer
from vlp3d.train.state import create_state, make_train_step


def _setup(batch_size=8):
    mesh = make_mesh()
    config = tiny_config()
    batch = make_batch(config, batch_size=batch_size, num_points=256)
    model = JointNet(config)
    optimizer = make_optimizer()
    state = create_state(model, optimizer, batch)
    step = jax.jit(make_train_step(model, config, optimizer))
    return mesh, config, batch, model, optimizer, state, step


def _loss_only(model, config, params, batch_stats, batch):
    from vlp3d.losses.joint import compute_joint_loss

    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, batch, train=True,
        rngs={"dropout": jax.random.key(1), "aug": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    loss, _ = compute_joint_loss(config, out, batch)
    return loss


def _sharded_leaves(opt_state):
    return [
        leaf for leaf in jax.tree.leaves(opt_state)
        if hasattr(leaf, "sharding") and not leaf.sharding.is_fully_replicated
    ]


def test_zero1_shards_moments_and_matches_replicated():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh, config, batch, model, optimizer, state, train_step = _setup()
    sharded_batch = shard_batch(mesh, batch)
    rng = jax.random.key(0)

    state_repl = replicate(mesh, state)
    state_zero = zero_shard_state(mesh, state)

    # every large moment buffer actually sharded 1/8
    big = _sharded_leaves(state_zero.opt_state)
    assert len(big) > 0
    for leaf in big:
        local = leaf.addressable_shards[0].data.size
        assert local * 8 == leaf.size, (leaf.shape, leaf.sharding)
    # and nothing below the size floor was
    specs = jax.tree.leaves(
        opt_state_pspecs(state.opt_state, mesh.shape[DATA_AXIS])
    )
    leaves = jax.tree.leaves(state.opt_state)
    assert len(specs) == len(leaves)
    for leaf, spec in zip(leaves, specs):
        if hasattr(leaf, "size") and leaf.size < MIN_SHARD_ELEMS:
            assert spec == jax.sharding.PartitionSpec()

    # --- update parity from IDENTICAL grads -------------------------------
    # (comparing two full train steps is hopeless: they are different XLA
    # executables whose grad rounding differs, and Adam's g/|g| shape
    # amplifies near-zero-grad coordinates into full +-lr sign flips.
    # The ZeRO-specific claim is that the PARTITIONED elementwise update +
    # GSPMD all-gather equals the replicated update for the same grads.)
    import functools

    grads = jax.jit(
        lambda p, b: jax.grad(
            lambda pp: _loss_only(model, config, pp, state.batch_stats, b)
        )(p)
    )(state_repl.params, sharded_batch)

    @functools.partial(jax.jit, static_argnums=())
    def apply(opt_state, params, grads):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state

    p_r, os_r = apply(state_repl.opt_state, state_repl.params, grads)
    p_z, os_z = apply(state_zero.opt_state, state_zero.params, grads)
    for a, b in zip(jax.tree.leaves(p_r), jax.tree.leaves(p_z)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        )

    # the update's OUTPUT opt_state is still sharded (GSPMD propagated the
    # input shardings; nothing silently re-replicated)
    assert len(_sharded_leaves(os_z)) == len(big)
    # params stay replicated (ZeRO-1, not 3)
    leaf = jax.tree.leaves(p_z)[0]
    assert leaf.sharding.is_fully_replicated

    # --- end-to-end integration: losses track over 5 steps ----------------
    sr, sz = state_repl, state_zero
    for _ in range(5):
        sr, m_r = train_step(sr, sharded_batch, rng)
        sz, m_z = train_step(sz, sharded_batch, rng)
        np.testing.assert_allclose(
            float(m_r["loss"]), float(m_z["loss"]), rtol=2e-3
        )
    assert len(_sharded_leaves(sz.opt_state)) == len(big)


def test_zero1_solver_flag(tmp_path):
    """Solver(zero1=True) places and trains; warm_start keeps the
    shardings."""
    from vlp3d.data.synthetic import make_synthetic_dataset
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.train.solver import Solver
    from vlp3d.train import checkpoint as ckpt

    config = tiny_config()
    import dataclasses

    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, batch_size=8)
    )
    train_ds = make_synthetic_dataset(config, n_scenes=8, anns_per_scene=2)
    solver = Solver(config, train_ds, train_ds, str(tmp_path), zero1=True)
    sample = next(iter(BatchIterator(train_ds, 8)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)
    assert len(_sharded_leaves(solver.state.opt_state)) > 0

    metrics = solver.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    assert len(_sharded_leaves(solver.state.opt_state)) > 0

    # warm_start re-places with the same policy
    ckpt.save_params(
        str(tmp_path / "snap"), "model",
        jax.tree.map(np.asarray, solver.state.params),
        batch_stats=jax.tree.map(np.asarray, solver.state.batch_stats),
    )
    ckpt.wait_until_finished()
    solver.warm_start(str(tmp_path / "snap" / "model"))
    assert len(_sharded_leaves(solver.state.opt_state)) > 0
