"""Gradient accumulation (make_optimizer grad_accum / Solver --grad_accum):
K micro-steps at batch B must reproduce ONE step at batch K*B exactly
(batch-mean losses => grad of the big batch == mean of the micro-grads),
params must only move on every K-th micro-step, and the accumulator tree
must pick up ZeRO-1's param-aware sharding like any other moment.

A scaling knob the reference lacks entirely (its DataParallel path has
no accumulation, SURVEY §2.5/§2.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import optax
from jax.sharding import PartitionSpec as P

from vlp3d.parallel.mesh import DATA_AXIS
from vlp3d.parallel.zero import MIN_SHARD_ELEMS, opt_state_pspecs
from vlp3d.train.optimizer import make_optimizer


def _toy():
    import flax.linen as nn

    class Toy(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(64, name="h")(x)
            return nn.Dense(1, name="out")(jax.nn.relu(h))

    return Toy()


def _sgd_like_step(model, tx):
    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jnp.mean((pred - y) ** 2)

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    return jax.jit(step)


def test_k_micro_steps_equal_one_big_batch_step():
    model = _toy()
    k, bs, d = 4, 8, 32
    x = jax.random.normal(jax.random.key(0), (k * bs, d))
    y = jax.random.normal(jax.random.key(1), (k * bs, 1))
    params = model.init(jax.random.key(2), x)["params"]

    tx_acc = make_optimizer(grad_accum=k)
    tx_big = make_optimizer()
    step_acc = _sgd_like_step(model, tx_acc)
    step_big = _sgd_like_step(model, tx_big)

    p_acc, s_acc = params, tx_acc.init(params)
    for i in range(k):
        p_prev = p_acc
        p_acc, s_acc = step_acc(
            p_acc, s_acc, x[i * bs:(i + 1) * bs], y[i * bs:(i + 1) * bs]
        )
        moved = any(
            float(jnp.max(jnp.abs(a - b))) > 0
            for a, b in zip(jax.tree.leaves(p_prev), jax.tree.leaves(p_acc))
        )
        # params move ONLY on the K-th micro-step
        assert moved == (i == k - 1), (i, moved)

    p_big, _ = step_big(params, tx_big.init(params), x, y)
    for a, b in zip(jax.tree.leaves(p_acc), jax.tree.leaves(p_big)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )


def test_accumulator_gets_zero1_sharding():
    """The MultiSteps acc_grads tree mirrors the params, so the ZeRO-1
    suffix-matched specs must shard it (and the nested inner moments)."""
    model = _toy()
    x = jax.random.normal(jax.random.key(0), (4, 512))
    params = model.init(jax.random.key(1), x)["params"]
    # h kernel: 512 x 64 = 32768 >= MIN_SHARD_ELEMS
    assert params["h"]["kernel"].size >= MIN_SHARD_ELEMS
    tx = make_optimizer(grad_accum=2)
    opt_state = jax.eval_shape(tx.init, params)
    specs = opt_state_pspecs(opt_state, 4, params=params)
    flat = jax.tree_util.tree_flatten_with_path(
        specs, is_leaf=lambda s: isinstance(s, P)
    )[0]
    hits = {}
    for path, spec in flat:
        name = "/".join(str(getattr(kk, "key", kk)) for kk in path)
        if name.endswith("h/kernel"):
            hits[name] = spec
    acc = {k: v for k, v in hits.items() if "acc_grads" in k}
    mu = {k: v for k, v in hits.items() if "mu" in k}
    assert acc and all(DATA_AXIS in tuple(s) for s in acc.values()), hits
    assert mu and all(DATA_AXIS in tuple(s) for s in mu.values()), hits


@pytest.mark.slow
def test_solver_grad_accum_flag(tmp_path):
    """Solver(grad_accum=2) trains end-to-end; params move every other
    iteration only."""
    import dataclasses

    from vlp3d.data.dataset import BatchIterator
    from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
    from vlp3d.train.solver import Solver

    config = tiny_config()
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, batch_size=4)
    )
    ds = make_synthetic_dataset(config, n_scenes=8, anns_per_scene=2)
    solver = Solver(config, ds, ds, str(tmp_path), grad_accum=2)
    sample = next(iter(BatchIterator(ds, 4)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)

    _, train_step, _ = solver._get_steps(0)
    sharded = solver._shard(sample)
    p0 = jax.tree.map(np.asarray, solver.state.params)
    s1, m1 = train_step(solver.state, sharded, solver.rng)
    assert np.isfinite(float(m1["loss"]))
    # micro-step 1: accumulate only, params unchanged
    same = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(s1.params))
    )
    assert same, "params moved on an accumulation-only micro-step"
    s2, m2 = train_step(s1, sharded, solver.rng)
    assert np.isfinite(float(m2["loss"]))
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(s2.params))
    )
    assert moved, "params did not move on the K-th micro-step"
