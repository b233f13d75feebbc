"""Tensor parallelism: 2D (data, model) mesh runs the same math.

The reference never had TP (SURVEY §2.7); here it is a first-class mesh
axis. The train step jitted over a (4, 2) mesh with Megatron-style
weight shardings must reproduce the pure-data-parallel loss.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from vlp3d.data.synthetic import make_batch, tiny_config
from vlp3d.models.jointnet import JointNet
from vlp3d.parallel.mesh import make_mesh, replicate, shard_batch
from vlp3d.parallel.tensor_parallel import (
    MODEL_AXIS,
    make_mesh_2d,
    param_pspecs,
    shard_state,
)
from vlp3d.train.optimizer import make_optimizer
from vlp3d.train.schedules import cosine_lr
from vlp3d.train.state import create_state, make_train_step

pytestmark = pytest.mark.slow


def test_rules_hit_expected_paths():
    fake = {
        "lang": {"text_encoder": {"layer_0": {
            "query": {"kernel": np.zeros((768, 768)),
                      "bias": np.zeros((768,))},
            "output": {"kernel": np.zeros((3072, 768))},
        }}},
        "caption": {"layer_0": {"ffn1": {"kernel": np.zeros((128, 512))}}},
        "backbone": {"mlp": {"kernel": np.zeros((64, 64))}},
        "odd": {"intermediate": {"kernel": np.zeros((7, 9))}},  # indivisible
    }
    specs = param_pspecs(fake, n_model=2)
    assert specs["lang"]["text_encoder"]["layer_0"]["query"]["kernel"] == P(
        None, MODEL_AXIS
    )
    assert specs["lang"]["text_encoder"]["layer_0"]["query"]["bias"] == P(
        MODEL_AXIS
    )
    assert specs["lang"]["text_encoder"]["layer_0"]["output"]["kernel"] == P(
        MODEL_AXIS, None
    )
    assert specs["caption"]["layer_0"]["ffn1"]["kernel"] == P(None, MODEL_AXIS)
    assert specs["backbone"]["mlp"]["kernel"] == P()
    assert specs["odd"]["intermediate"]["kernel"] == P()  # fallback


def test_tp_matches_dp_loss():
    config = tiny_config(use_mlm=False, no_caption=False, use_answer=False)
    batch = make_batch(config, batch_size=4, num_points=256)
    model = JointNet(config)
    optimizer = make_optimizer(
        lr_schedule=lambda e, lr0: cosine_lr(e, lr0, 200), steps_per_epoch=10
    )
    state = create_state(model, optimizer, batch)
    step = make_train_step(model, config, optimizer, caption=True)
    rng = jax.random.key(0)

    # pure data parallel over 8 devices? batch 4 -> 4-device data mesh
    mesh_dp = make_mesh(4)
    s_dp = replicate(mesh_dp, state)
    b_dp = shard_batch(mesh_dp, batch)
    _, m_dp = jax.jit(step)(s_dp, b_dp, rng)
    loss_dp = float(m_dp["loss"])

    # (4 data, 2 model) mesh with TP weight shardings
    mesh_tp = make_mesh_2d(4, 2)
    s_tp = shard_state(mesh_tp, state)
    # at least one leaf must actually be model-sharded (not vacuous)
    shardings = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, s_tp.params)
    )
    assert any(MODEL_AXIS in str(s) for s in shardings)
    b_tp = shard_batch(mesh_tp, batch)
    s_tp2, m_tp = jax.jit(step)(s_tp, b_tp, rng)
    loss_tp = float(m_tp["loss"])

    assert np.isfinite(loss_dp) and np.isfinite(loss_tp)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-4, atol=2e-4)

    # updated params stay numerically equivalent on a TP-sharded leaf
    lt = np.asarray(
        s_tp2.params["lang"]["text_encoder"]["layer_0"]["query"]["kernel"]
    )
    assert np.isfinite(lt).all()


def test_solver_tp_smoke(tmp_path):
    """Solver(tp=2) trains a tiny config on the (4, 2) virtual mesh."""
    from vlp3d.data.synthetic import make_synthetic_dataset
    from vlp3d.data.dataset import BatchIterator
    from vlp3d.train.solver import Solver
    import dataclasses

    config = tiny_config()
    config = dataclasses.replace(
        config, train=dataclasses.replace(config.train, batch_size=4,
                                          epochs=1)
    )
    train_ds = make_synthetic_dataset(config, n_scenes=4, anns_per_scene=5)
    val_ds = make_synthetic_dataset(
        config, n_scenes=2, anns_per_scene=2, split="val", seed=3
    )
    solver = Solver(config, train_ds, val_ds, str(tmp_path), tp=2)
    assert solver.mesh.shape == {"data": 4, "model": 2}
    sample = next(iter(BatchIterator(train_ds, 4)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)
    from vlp3d.parallel.tensor_parallel import MODEL_AXIS

    specs = jax.tree.leaves(
        jax.tree.map(lambda x: str(x.sharding.spec), solver.state.params)
    )
    assert any(MODEL_AXIS in s for s in specs)
    metrics = solver.train_epoch(0)
    assert np.isfinite(metrics["loss"])
    val = solver.eval_epoch(0)
    assert np.isfinite(val["iou_rate_0.25"])
