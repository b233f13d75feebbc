"""Pipeline parallelism (pp): GPipe microbatching over the BERT text
layers must match the sequential layer loop — forward values and
parameter gradients — and compose with the data axis in one mesh.

Oracle: BertTextEncoder.apply(mode='text') on one device
(models/bert.py:176-199). The pipeline runs the same per-layer ops in the
same order; only the schedule (and the stage ppermutes) differ, so
tolerances are pure float-reassociation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vlp3d.models.bert import BertConfig, BertEmbeddings, BertLayer, BertTextEncoder
from vlp3d.parallel.pipeline import (
    PIPE_AXIS,
    build_pipeline,
    pipeline_text_encoder,
    stack_text_layer_params,
    stack_text_layer_params_sharded,
    unstack_text_layer_params,
)

CFG = BertConfig(
    vocab_size=97,
    hidden_size=32,
    num_hidden_layers=4,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=40,
    fusion_layer=4,
)
B, SEQ = 8, 10


@pytest.fixture(scope="module")
def setup():
    enc = BertTextEncoder(CFG)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, SEQ)), jnp.int32)
    mask = jnp.asarray(
        rng.integers(0, 2, (B, SEQ)) | np.eye(1, SEQ, dtype=np.int64)[0],
        jnp.int32,
    )
    params = enc.init(jax.random.PRNGKey(0), ids, mask)["params"]
    oracle = enc.apply({"params": params}, ids, mask, mode="text")
    return enc, params, ids, mask, oracle


def _mesh(pp, dp=1):
    devs = np.asarray(jax.devices()[: pp * dp])
    if dp > 1:
        return Mesh(devs.reshape(dp, pp), ("data", PIPE_AXIS))
    return Mesh(devs, (PIPE_AXIS,))


@pytest.mark.parametrize("pp,mb", [(4, 4), (2, 8), (4, 2)])
def test_forward_matches_sequential(setup, pp, mb):
    _, params, ids, mask, oracle = setup
    mesh = _mesh(pp)
    out = pipeline_text_encoder(
        mesh, CFG, params, ids, mask, num_microbatches=mb
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-5)


def test_dp_pp_composed(setup):
    """2x4 data x pipe mesh: microbatch batch dim sharded over data."""
    _, params, ids, mask, oracle = setup
    mesh = _mesh(pp=4, dp=2)
    out = pipeline_text_encoder(
        mesh, CFG, params, ids, mask, num_microbatches=4
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-5)


def test_stack_roundtrip(setup):
    _, params, _, _, _ = setup
    stacked = stack_text_layer_params(params, CFG.fusion_layer)
    flat = unstack_text_layer_params(stacked)
    for i in range(CFG.fusion_layer):
        a = jax.tree.leaves(flat[f"layer_{i}"])
        b = jax.tree.leaves(params[f"layer_{i}"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_gradients_match_sequential(setup):
    """jax.grad through the pipeline (scan + ppermute transpose = the
    mirrored drain schedule) must match sequential-layer gradients."""
    _, params, ids, mask, _ = setup
    mesh = _mesh(pp=4)
    layer = BertLayer(CFG)
    emb = BertEmbeddings(CFG).apply({"params": params["embeddings"]}, ids)
    stacked = jax.device_put(
        stack_text_layer_params(params, CFG.fusion_layer),
        NamedSharding(mesh, P(PIPE_AXIS)),
    )
    run = build_pipeline(mesh, CFG, CFG.fusion_layer, num_microbatches=4)

    def piped_loss(stacked):
        return jnp.mean(run(stacked, emb, mask) ** 2)

    def seq_loss(stacked):
        h = emb
        m = mask.astype(emb.dtype)
        for i in range(CFG.fusion_layer):
            p = jax.tree.map(lambda x, i=i: x[i], stacked)
            h = layer.apply({"params": p}, h, m)
        return jnp.mean(h**2)

    g_pipe = jax.jit(jax.grad(piped_loss))(stacked)
    g_seq = jax.jit(jax.grad(seq_loss))(jax.device_get(stacked))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5
        ),
        g_pipe,
        g_seq,
    )


def test_sharded_stack_matches_and_places(setup):
    """Per-stage assembly must equal the plain stack, with each leaf
    sharded P('pipe') (no full copy on any single device)."""
    _, params, _, _, _ = setup
    mesh = _mesh(pp=4)
    plain = stack_text_layer_params(params, CFG.fusion_layer)
    sharded = stack_text_layer_params_sharded(mesh, params, CFG.fusion_layer)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        sharded,
        plain,
    )
    leaf = jax.tree.leaves(sharded)[0]
    assert leaf.sharding.spec[0] == PIPE_AXIS
    # each device holds exactly 1/4 of the stacked leading axis
    assert all(
        s.data.shape[0] == CFG.fusion_layer // 4
        for s in leaf.addressable_shards
    )


def test_bad_shapes_raise(setup):
    _, params, ids, mask, _ = setup
    mesh = _mesh(pp=4)
    with pytest.raises(ValueError, match="not divisible"):
        build_pipeline(mesh, CFG, 6, 4)  # 6 layers over 4 stages
    run = build_pipeline(mesh, CFG, 4, 3)  # B=8 into 3 microbatches
    emb = BertEmbeddings(CFG).apply({"params": params["embeddings"]}, ids)
    stacked = stack_text_layer_params(params, CFG.fusion_layer)
    with pytest.raises(ValueError, match="not divisible"):
        run(stacked, emb, mask)
    # dp x pp: microbatch size must divide over the data axis
    mesh2 = _mesh(pp=2, dp=4)
    run2 = build_pipeline(mesh2, CFG, 4, 4)  # B=8 -> microbatch 2 over dp=4
    with pytest.raises(ValueError, match="data-axis"):
        run2(stacked, emb, mask)
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        pipeline_text_encoder(
            Mesh(np.asarray(jax.devices()[:2]), ("data",)), CFG, params,
            ids, mask,
        )
