"""Alt xbert captioner (BertLMHeadModel + CaptionModuleX) contract."""

import jax
import jax.numpy as jnp
import numpy as np

from vlp3d.models.caption_xbert import CaptionModuleX, CLS_ID


def _make(rng, b=2, k=8, h=32, l=2, t=10, vocab=64):
    feats = jnp.asarray(rng.normal(size=(b, k, h)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, vocab, (b, l, t)).astype(np.int32))
    mask = jnp.ones((b, l, t), jnp.int32)
    pos = jnp.asarray(rng.integers(0, k, (b, l)).astype(np.int32))
    return feats, ids, mask, pos


def test_caption_xbert_train_logits(rng):
    feats, ids, mask, pos = _make(rng)
    mod = CaptionModuleX(hidden_size=32, depth=2, vocab_size=64, max_len=6)
    v = mod.init({"params": jax.random.key(0)}, feats, ids, mask, pos)
    logits = mod.apply(v, feats, ids, mask, pos)
    # object token and final step dropped: T tokens -> T-1 predictions
    assert logits.shape == (2 * 2, 10 - 1, 64)
    assert bool(jnp.isfinite(logits).all())


def test_caption_xbert_causal_and_generate(rng):
    feats, ids, mask, pos = _make(rng)
    mod = CaptionModuleX(hidden_size=32, depth=2, vocab_size=64, max_len=6)
    v = mod.init({"params": jax.random.key(0)}, feats, ids, mask, pos)

    # causality: perturbing a LATER token cannot change earlier logits
    ids2 = ids.at[:, :, 7].set((ids[:, :, 7] + 1) % 64)
    l1 = mod.apply(v, feats, ids, mask, pos)
    l2 = mod.apply(v, feats, ids2, mask, pos)
    np.testing.assert_allclose(
        np.asarray(l1)[:, :6], np.asarray(l2)[:, :6], atol=1e-5
    )
    assert not np.allclose(np.asarray(l1)[:, 7:], np.asarray(l2)[:, 7:])

    out = mod.apply(v, feats, method=CaptionModuleX.generate)
    assert out.shape == (2, 8, 7)  # (B, K, max_len + CLS slot)
    assert (np.asarray(out)[:, :, 0] == CLS_ID).all()
    # greedy decode is deterministic
    out2 = mod.apply(v, feats, method=CaptionModuleX.generate)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
