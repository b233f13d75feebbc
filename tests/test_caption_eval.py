"""End-to-end caption-eval pipeline on synthetic scenes (tiny shapes)."""

import pytest
import numpy as np

from vlp3d.data.dataset import BatchIterator
from vlp3d.data.synthetic import make_synthetic_dataset, tiny_config
from vlp3d.data.tokenizer import HashTokenizer
from vlp3d.eval.captioning import organize_scanrefer, prepare_corpus
from vlp3d.train.solver import Solver


@pytest.mark.slow
def test_solver_caption_eval(tmp_path):
    config = tiny_config(no_caption=False)
    config = config.__class__(
        dataset=config.dataset,
        model=config.model,
        loss=config.loss,
        train=config.train.__class__(batch_size=2, epochs=1),
    )
    train_ds = make_synthetic_dataset(config, n_scenes=2, anns_per_scene=4)
    val_ds = make_synthetic_dataset(
        config, n_scenes=1, anns_per_scene=3, split="val", seed=5
    )

    corpus = prepare_corpus(val_ds.scanrefer, config.model.max_des_len)
    organized = organize_scanrefer(val_ds.scanrefer)
    solver = Solver(
        config,
        train_ds,
        val_ds,
        str(tmp_path),
        caption=True,
        caption_eval_ctx={
            "corpus": corpus,
            "organized": organized,
            "tokenizer": HashTokenizer(),
        },
    )
    sample = next(iter(BatchIterator(train_ds, 2)))
    sample = {k: v for k, v in sample.items() if not isinstance(v, list)}
    solver.init_state(sample)
    result = solver.eval_epoch(0)
    for key in ("bleu-4", "cider", "rouge", "meteor"):
        assert key in result
        assert np.isfinite(result[key])


def test_kv_cached_greedy_decode_matches_uncached():
    """greedy_decode (KV cache) must reproduce the reference-shaped
    full-redecode loop token for token."""
    import jax
    import jax.numpy as jnp

    from vlp3d.models.caption import (
        CaptionDecoder,
        greedy_decode,
        greedy_decode_uncached,
    )

    dec = CaptionDecoder(vocab_size=211, n_layers=3, d_model=32, d_ff=64,
                         heads=4, max_len=12)
    obj = jax.random.normal(jax.random.key(1), (6, 1, 32))
    variables = dec.init(
        {"params": jax.random.key(0)}, obj,
        jnp.zeros((6, 12), jnp.int32), None,
    )
    a = jax.jit(lambda v, o: greedy_decode_uncached(dec, v, o, 10))(
        variables, obj
    )
    b = jax.jit(lambda v, o: greedy_decode(dec, v, o, 10))(variables, obj)
    assert (jnp.asarray(a) == jnp.asarray(b)).all(), (a, b)
