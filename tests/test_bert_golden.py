"""Cross-framework BERT validation.

Real pretrained bert-base-uncased weights are an external asset (zero
egress here), but every parity-critical mechanism — the HF state_dict
import (kernel transposes, LayerNorm naming), the encoder math, the
text-mode fusion_layer slicing, and WordPiece tokenization — is validated
against torch/transformers running the SAME (randomly initialized)
weights on CPU. With these green, loading the real checkpoint is pure
data. Ref: lang_bert_module.py:98-140, xbert.py:550-558.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from vlp3d.models.bert import BertConfig, BertTextEncoder, load_hf_bert_params


def test_hf_import_matches_torch_activations():
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=30522,
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()

    ids = np.array(
        [[101, 2023, 2003, 1037, 3231, 102, 0, 0],
         [101, 27227, 7592, 2088, 1012, 999, 2232, 102]],
        np.int32,
    )
    mask = np.array(
        [[1, 1, 1, 1, 1, 1, 0, 0], [1] * 8], np.int32
    )
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            output_hidden_states=True,
        )
    # hidden_states[k] = activations after k layers
    golden_6 = out.hidden_states[6].numpy()

    cfg = BertConfig(hidden_dropout=0.0, attention_dropout=0.0)
    enc = BertTextEncoder(cfg)
    params = enc.init(
        {"params": jax.random.key(0)}, jnp.asarray(ids), jnp.asarray(mask)
    )["params"]
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = load_hf_bert_params({"text_encoder": params}, sd)["text_encoder"]

    # text mode == first fusion_layer(=6) layers (xbert.py:550-558)
    got = enc.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask), mode="text"
    )
    np.testing.assert_allclose(
        np.asarray(got), golden_6, rtol=2e-4, atol=2e-4
    )

    # padded positions must not influence unpadded activations: perturb a
    # pad token id, outputs at valid positions stay identical
    ids2 = ids.copy()
    ids2[0, 6] = 9999
    got2 = enc.apply(
        {"params": params}, jnp.asarray(ids2), jnp.asarray(mask), mode="text"
    )
    np.testing.assert_allclose(
        np.asarray(got2)[0, :6], np.asarray(got)[0, :6], atol=1e-5
    )


def test_hf_distilbert_import_matches_torch_activations():
    from vlp3d.models.bert import distilbert_config, load_hf_distilbert_params

    torch.manual_seed(0)
    hf_cfg = transformers.DistilBertConfig(
        vocab_size=30522,
        dim=768,
        n_layers=6,
        n_heads=12,
        hidden_dim=3072,
        dropout=0.0,
        attention_dropout=0.0,
        attn_implementation="eager",
    )
    hf = transformers.DistilBertModel(hf_cfg).eval()

    ids = np.array(
        [[101, 2023, 2003, 1037, 3231, 102, 0, 0],
         [101, 27227, 7592, 2088, 1012, 999, 2232, 102]],
        np.int32,
    )
    mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0], [1] * 8], np.int32)
    with torch.no_grad():
        golden = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()

    cfg = dataclasses_replace(
        distilbert_config(), hidden_dropout=0.0, attention_dropout=0.0
    )
    enc = BertTextEncoder(cfg)
    params = enc.init(
        {"params": jax.random.key(0)}, jnp.asarray(ids), jnp.asarray(mask)
    )["params"]
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = load_hf_distilbert_params({"text_encoder": params}, sd)[
        "text_encoder"
    ]
    # distil "text mode" runs all 6 layers (lang_bert_module.py:99-101)
    got = enc.apply(
        {"params": params}, jnp.asarray(ids), jnp.asarray(mask), mode="text"
    )
    # DistilBERT masks attention rather than padding positions; compare
    # valid positions only
    np.testing.assert_allclose(
        np.asarray(got)[0, :6], golden[0, :6], rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got)[1], golden[1], rtol=2e-4, atol=2e-4
    )


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_wordpiece_matches_hf(tmp_path):
    from transformers.models.bert.tokenization_bert import (
        BasicTokenizer,
        WordpieceTokenizer,
    )

    from vlp3d.data.tokenizer import BertWordPieceTokenizer

    vocab = (
        "[PAD] [UNK] [CLS] [SEP] [MASK] the a an desk chair is on next to "
        "left right of ##s ##ing brown dark ##er look find it this that "
        "table near room corner wall door window shelf cabinet trash can "
        "##ed , . ! ? ' \" - white black red blue green with under over"
    ).split()
    vpath = tmp_path / "vocab.txt"
    vpath.write_text("\n".join(vocab) + "\n")

    mine = BertWordPieceTokenizer(str(vpath))
    basic = BasicTokenizer(do_lower_case=True)
    wp = WordpieceTokenizer(
        vocab={w: i for i, w in enumerate(vocab)}, unk_token="[UNK]"
    )

    sentences = [
        "The brown chair is next to the desk.",
        "a darker table, near the wall!",
        "Looking for the trash can under the window?",
        "it's the chairs on the left-of the door",
        "AN UNKNOWNWORD with weird  spacing\tand CAPS",
    ]
    v2i = {w: i for i, w in enumerate(vocab)}
    for s in sentences:
        hf_ids = [
            v2i[t] for w in basic.tokenize(s) for t in wp.tokenize(w)
        ]
        assert mine.tokenize_ids(s) == hf_ids, s


def test_lang_cross_mlm_shapes_and_grads():
    """LangCrossMLM (the dormant LangBertModule.mlm head,
    lang_bert_module.py:142-249): logits cover the sampled sentences, loss
    is finite and reads only masked positions, gradients reach the decoder
    stack but NOT the frozen text encoder."""
    from vlp3d.models.bert import LangCrossMLM, cross_mlm_loss

    cfg = BertConfig(
        vocab_size=120, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, fusion_layer=1,
    )
    b, l, t, k, h = 2, 3, 8, 5, 16
    model = LangCrossMLM(
        depth=2, heads=2, hidden_size=h, bert_config=cfg, mask_ratio=0.5
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, 120, size=(b, l, t)), jnp.int32)
    am = jnp.ones((b, l, t), jnp.int32)
    bbox = jnp.asarray(rng.normal(size=(b, k, h)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, k, size=(b, l)), jnp.int32)

    variables = model.init(
        jax.random.key(0), jax.random.key(1), ids, am, bbox, pos
    )
    logits, targets, masked = model.apply(
        variables, jax.random.key(2), ids, am, bbox, pos
    )
    assert logits.shape == (b, t, 120)
    assert targets.shape == (b, t)
    assert bool(masked.any())
    loss = cross_mlm_loss(logits, targets, masked)
    assert np.isfinite(float(loss))

    def f(params):
        lg, tg, mk = model.apply(
            {"params": params}, jax.random.key(2), ids, am, bbox, pos
        )
        return cross_mlm_loss(lg, tg, mk)

    grads = jax.grad(f)(variables["params"])
    gnorm = lambda tree: float(
        sum(np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(tree))
    )
    assert gnorm(grads["prediction"]) > 0
    assert gnorm(grads["cross_attn_0"]) > 0
    assert gnorm(grads["pc_proj"]) > 0
    assert gnorm(grads["text_encoder"]) == 0.0  # frozen (stop_gradient)
