"""Shape/finiteness tests for the model-family variants."""

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.data.synthetic import make_batch, tiny_config


def test_mlcvnet_voting_variant():
    config = tiny_config(use_mlcv_net=True, use_con=False)
    batch = make_batch(config, batch_size=2, num_points=256)
    from vlp3d.models.jointnet import JointNet

    model = JointNet(config)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["cluster_ref"].shape == (2 * 4, 16)
    assert bool(jnp.isfinite(out["cluster_ref"]).all())
    # CGNL params exist
    assert "cgnl" in variables["params"]["vgen"]


def test_refnet():
    config = tiny_config(use_con=False)
    batch = make_batch(config, batch_size=2, num_points=256)
    b, l, t = 2, 4, 12
    batch["lang_feat"] = np.random.default_rng(0).normal(
        size=(b, l, t, 300)
    ).astype(np.float32)
    batch["lang_len"] = np.full((b, l), t // 2, np.int32)
    from vlp3d.models.refnet import RefNet

    model = RefNet(config)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["cluster_ref"].shape == (b * l, 16)
    assert out["pred_center"].shape == (b, 16, 3)
    assert bool(jnp.isfinite(out["cluster_ref"]).all())


def test_scanqa_standalone():
    config = tiny_config(use_con=False)
    batch = make_batch(config, batch_size=2, num_points=256)
    b, t = 2, 12
    batch["lang_feat"] = np.random.default_rng(0).normal(
        size=(b, t, 300)
    ).astype(np.float32)
    batch["lang_len"] = np.full((b,), t // 2, np.int32)
    from vlp3d.models.scanqa import ScanQA

    model = ScanQA(config, num_answers=64)
    variables = model.init({"params": jax.random.key(0)}, batch, train=False)
    out = model.apply(variables, batch, train=False)
    assert out["answer_scores"].shape == (b, 64)
    assert out["cluster_ref"].shape == (b, 16)
    assert out["lang_scores"].shape == (b, 18)
    assert out["pred_size"].shape == (b, 16, 3)
    assert bool(jnp.isfinite(out["answer_scores"]).all())
