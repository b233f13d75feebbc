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


def _tiny_decoder(n=6, vocab=211, max_len=12, seed=0, obj_seed=1):
    import jax
    import jax.numpy as jnp

    from vlp3d.models.caption import CaptionDecoder

    dec = CaptionDecoder(vocab_size=vocab, n_layers=3, d_model=32, d_ff=64,
                         heads=4, max_len=max_len)
    obj = jax.random.normal(jax.random.key(obj_seed), (n, 1, 32))
    variables = dec.init(
        {"params": jax.random.key(seed)}, obj,
        jnp.zeros((n, max_len), jnp.int32), None,
    )
    return dec, variables, obj


def _seq_logprobs(dec, variables, ys, eos_id):
    """Recompute each row's cumulative log-prob with the FULL (uncached,
    unsearched) decoder: logits row j+1 (token position j) predict
    ys[:, j+1]. Sums over generated tokens up to and including the first
    EOS (or the whole buffer when none). Independent bookkeeping oracle
    for beam_decode's internal scores."""
    import jax.numpy as jnp

    from vlp3d.models.caption import causal_caption_mask

    n, t = ys.shape
    obj = _seq_logprobs.obj
    logp = dec.apply(variables, obj, ys[:, :-1], causal_caption_mask(ys[:, :-1]))
    # logp: (N, T, vocab) log-softmax rows; row j+1 predicts ys[:, j+1]
    tok_lp = jnp.take_along_axis(
        logp[:, 1:], ys[:, 1:, None], axis=-1
    )[..., 0]  # (N, T-1)
    gen = jnp.arange(1, t)[None, :]
    first_eos = jnp.where(
        (ys[:, 1:] == eos_id).any(axis=1),
        jnp.argmax(ys[:, 1:] == eos_id, axis=1) + 1,
        t - 1,
    )  # position of first EOS in ys (or last index)
    mask = gen <= first_eos[:, None]
    return (tok_lp * mask).sum(axis=1), first_eos


def test_beam1_matches_greedy_up_to_eos():
    """num_beams=1 must reproduce greedy_decode tokens up to (and incl.)
    the first EOS; past it beam freezes to PAD while greedy keeps
    argmax-decoding."""
    import jax

    from vlp3d.models.caption import PAD_ID, beam_decode, greedy_decode

    dec, variables, obj = _tiny_decoder()
    g = jax.jit(lambda v, o: greedy_decode(dec, v, o, 10))(variables, obj)
    b, _ = jax.jit(
        lambda v, o: beam_decode(dec, v, o, 10, 1, eos_id=102)
    )(variables, obj)
    g, b = np.asarray(g), np.asarray(b)
    assert g.shape == b.shape
    for row_g, row_b in zip(g, b):
        eos = np.where(row_g == 102)[0]
        cut = (eos[0] + 1) if len(eos) else len(row_g)
        assert (row_g[:cut] == row_b[:cut]).all(), (row_g, row_b)
        assert (row_b[cut:] == PAD_ID).all(), row_b


def test_beam_score_bookkeeping_and_quality():
    """beam_decode's returned score must equal the full-decoder recompute
    of its returned sequence, and (fixed seed) beam 4 must not lose
    cumulative log-prob vs greedy."""
    import jax
    import jax.numpy as jnp

    from vlp3d.models.caption import beam_decode

    dec, variables, obj = _tiny_decoder()
    _seq_logprobs.obj = obj
    ys1, s1 = jax.jit(
        lambda v, o: beam_decode(dec, v, o, 10, 1, eos_id=102,
                                 length_penalty=0.0)
    )(variables, obj)
    ys4, s4 = jax.jit(
        lambda v, o: beam_decode(dec, v, o, 10, 4, eos_id=102,
                                 length_penalty=0.0)
    )(variables, obj)
    lp1, _ = _seq_logprobs(dec, variables, jnp.asarray(ys1), 102)
    lp4, _ = _seq_logprobs(dec, variables, jnp.asarray(ys4), 102)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(lp1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(s4), np.asarray(lp4),
                               rtol=2e-4, atol=2e-4)
    # beam search explores a superset per step; with this fixed seed it
    # must find sequences at least as likely as greedy's on every row
    assert (np.asarray(s4) >= np.asarray(s1) - 1e-5).all(), (s4, s1)


def test_beam_min_len_and_eos_freeze():
    """min_len gates EOS out; choosing the greedy first token as EOS
    forces early finishes whose rows freeze to PAD."""
    import jax

    from vlp3d.models.caption import PAD_ID, beam_decode, greedy_decode

    dec, variables, obj = _tiny_decoder()
    g = np.asarray(
        jax.jit(lambda v, o: greedy_decode(dec, v, o, 10))(variables, obj)
    )
    eos = int(g[0, 1])  # a token the decoder actually likes early
    ys, _ = jax.jit(
        lambda v, o: beam_decode(dec, v, o, 10, 3, eos_id=eos)
    )(variables, obj)
    ys = np.asarray(ys)
    assert (ys[:, 1:] == eos).any(), "expected at least one EOS finish"
    for row in ys:
        hit = np.where(row == eos)[0]
        if len(hit):
            assert (row[hit[0] + 1:] == PAD_ID).all(), row
    # with min_len beyond the horizon, EOS may never be emitted
    ys2, _ = jax.jit(
        lambda v, o: beam_decode(dec, v, o, 10, 3, eos_id=eos, min_len=99)
    )(variables, obj)
    assert not (np.asarray(ys2)[:, 1:] == eos).any()
