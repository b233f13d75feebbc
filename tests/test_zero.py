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


@pytest.mark.slow
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


def _make_tp_toy():
    """Tiny flax model whose param paths hit the TP_RULES patterns
    (blk/ffn1 + blk/ffn2 = the caption-decoder column/row pair) —
    reproduces the round-3 ZeRO x TP layout-drift mechanism in seconds
    instead of the full JointNet's minutes."""
    import flax.linen as nn

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(256, name="ffn1")(x)
            x = jax.nn.gelu(x)
            return nn.Dense(128, name="ffn2")(x)

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Block(name="blk")(x)
            return nn.Dense(1, name="head")(x)

    return Toy()


def _tp_mesh_4x2():
    import numpy as np
    from jax.sharding import Mesh

    from vlp3d.parallel.tensor_parallel import MODEL_AXIS

    return Mesh(
        np.asarray(jax.devices()[:8]).reshape(4, 2), (DATA_AXIS, MODEL_AXIS)
    )


def test_zero1_tp_layout_is_fixed_point_of_step():
    """The round-3 red-dryrun regression (VERDICT item 1): on a dp x tp
    mesh the ZeRO-1 opt-state layout must be a fixed point of the jitted
    train step — leaf-for-leaf spec equality after a step, and step 2
    must hit the same executable (no layout ping-pong recompile)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vlp3d.parallel.zero import state_shardings, zero_shard_state
    from vlp3d.train.state import TrainState

    mesh = _tp_mesh_4x2()
    model = _make_tp_toy()
    x = jax.random.normal(jax.random.key(0), (8, 64, 128))
    y = jax.random.normal(jax.random.key(1), (8, 64, 1))
    params = model.init(jax.random.key(2), x)["params"]
    # 128x256 = 32768 >= MIN_SHARD_ELEMS: the ffn moments are in play
    tx = make_optimizer()
    state = TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params, batch_stats={}, opt_state=tx.init(params),
    )
    zstate = zero_shard_state(mesh, state)

    # the TP-sharded ffn params must have TP-sharded (param-aware)
    # moments — the shape-only derivation replicated them, which is the
    # layout GSPMD then drifted
    zspecs = {
        "/".join(str(getattr(k, "key", k)) for k in path): leaf.sharding.spec
        for path, leaf in jax.tree_util.tree_flatten_with_path(
            zstate.opt_state
        )[0]
        if hasattr(leaf, "sharding") and leaf.ndim == 2
    }
    ffn1_mu = [
        v for k, v in zspecs.items()
        if "mu/" in k and k.endswith("ffn1/kernel")
    ]
    assert ffn1_mu and all("model" in str(s) for s in ffn1_mu), zspecs

    # recompile detector: a layout change in the carried state forces a
    # fresh trace, so the Python body running more than once across the
    # two calls IS the step-2 recompile. (NOT `step._cache_size()` — the
    # jit cache is a globally shared LRU that a long suite run evicts,
    # which makes the size read 0 regardless of recompiles.)
    n_traces = [0]

    def train_step(state, x, y):
        n_traces[0] += 1

        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jax.numpy.mean((pred - y) ** 2)

        grads = jax.grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return state.replace(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        )

    step = jax.jit(train_step, out_shardings=state_shardings(zstate))
    from vlp3d.parallel.mesh import batch_sharding

    spec = batch_sharding(mesh, 8)
    xs, ys = jax.device_put(x, spec(x)), jax.device_put(y, spec(y))

    in_sh = jax.tree.leaves(state_shardings(zstate))
    z1 = step(zstate, xs, ys)
    out_sh = jax.tree.leaves(state_shardings(z1))
    drifted = [
        (a.spec, b.spec) for a, b in zip(in_sh, out_sh) if a.spec != b.spec
    ]
    assert not drifted, drifted
    z2 = step(z1, xs, ys)
    jax.block_until_ready(z2.step)
    assert n_traces[0] == 1, f"step 2 re-traced ({n_traces[0]} traces)"


def test_moment_spec_coverage_jointnet():
    """Structural inventory (VERDICT item 7): on the REAL JointNet param
    tree (shape-only, via eval_shape — no compile), every trainable
    moment >= MIN_SHARD_ELEMS must shard over 'data' or 'model'; an
    explicit allowlist covers shapes no axis divides. A new module whose
    moments silently fall back to replicated fails this test."""
    from jax.sharding import PartitionSpec as P

    from vlp3d.models.jointnet import JointNet
    from vlp3d.parallel.tensor_parallel import param_pspecs
    from vlp3d.parallel.zero import opt_state_pspecs
    from vlp3d.train.optimizer import make_optimizer

    config = tiny_config(no_caption=False)
    batch = make_batch(config, batch_size=1, num_points=256)
    model = JointNet(config)
    vs = jax.eval_shape(
        lambda: model.init({"params": jax.random.key(0)}, batch, train=False)
    )
    params = vs["params"]
    tx = make_optimizer()
    opt_state = jax.eval_shape(tx.init, params)

    n_data, n_model = 4, 2
    pspecs = param_pspecs(params, n_model)
    specs = opt_state_pspecs(
        opt_state, n_data, params=params, param_specs=pspecs
    )

    # leaves where NO dim divides n_data and the param is not TP-sharded
    # may replicate; everything else big must shard
    allowlist_ok = lambda shape: not any(  # noqa: E731
        d >= n_data and d % n_data == 0 for d in shape
    )
    flat_specs = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, P)
    )[0]
    flat_leaves = jax.tree.leaves(opt_state)
    assert len(flat_specs) == len(flat_leaves)
    big = sharded = 0
    offenders = []
    for (path, spec), leaf in zip(flat_specs, flat_leaves):
        if not hasattr(leaf, "size") or leaf.ndim < 1:
            continue
        if leaf.size < MIN_SHARD_ELEMS:
            continue
        big += 1
        axes = {a for a in spec if a is not None}
        if axes:
            sharded += 1
        elif not allowlist_ok(leaf.shape):
            offenders.append(
                ("/".join(str(getattr(k, "key", k)) for k in path),
                 leaf.shape, spec)
            )
    assert big >= 40, big  # the finder must not go vacuous
    assert not offenders, offenders[:10]

    # TP-sharded params must have TP-sharded moments (param-aware rule)
    from vlp3d.train.optimizer import FROZEN_PREFIXES

    plookup = {
        tuple(str(k.key) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            pspecs, is_leaf=lambda s: isinstance(s, P)
        )[0]
        if spec != P()
    }
    assert len(plookup) >= 30  # JointNet has >=30 TP leaves at n_model=2
    # frozen leaves (set_to_zero) have no moments; only trainable TP
    # leaves must show up in the opt state with their TP axes intact
    trainable_tp = {
        sp for sp in plookup
        if not any(sp[: len(p)] == p for p in FROZEN_PREFIXES)
    }
    assert len(trainable_tp) >= 20
    n_checked = 0
    for (path, spec), leaf in zip(flat_specs, flat_leaves):
        sp = tuple(str(getattr(k, "key", k)) for k in path)
        for k in range(len(sp) - 1, 0, -1):
            want = plookup.get(sp[-k:])
            if want is not None:
                for axis, name in enumerate(want):
                    if name is not None:
                        assert spec[axis] == name, (sp, spec, want)
                n_checked += 1
                break
    assert n_checked >= 2 * len(trainable_tp)  # mu and nu at least


@pytest.mark.slow
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
