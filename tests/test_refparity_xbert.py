"""DIRECT parity for the vendored ALBEF-style xbert
(models/lang_bert_module/bert/xbert.py) vs our BertTextEncoder
(vlp3d/models/bert.py) under imported random-init weights, in all three
modes (xbert.py:550-558):

  * 'text'        — layers [0, fusion_layer), what LangBertModule.encode
                    runs (lang_bert_module.py:103-104);
  * 'fusion'      — layers [fusion_layer, N) with cross-attention over
                    provided hidden states;
  * 'multi_modal' — both.

This pins the fusion-layer sublayer ORDER (self-attn -> cross-attn ->
FFN, xbert.py:458-516 — the FFN consumes the cross-attention output),
which module-shape tests cannot see.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.bert import BertConfig as JBertConfig
from vlp3d.models.bert import BertTextEncoder

B, S, T, H, LAYERS, FUSION = 2, 10, 7, 64, 4, 2


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def _import_xbert(sd, layers, fusion):
    def lin(name):
        return {"kernel": jnp.asarray(sd[name + ".weight"].numpy().T),
                "bias": jnp.asarray(sd[name + ".bias"].numpy())}

    def ln(name):
        return {"scale": jnp.asarray(sd[name + ".weight"].numpy()),
                "bias": jnp.asarray(sd[name + ".bias"].numpy())}

    def emb(name):
        return {"embedding": jnp.asarray(sd[name + ".weight"].numpy())}

    params = {"embeddings": {
        "word_embeddings": emb("embeddings.word_embeddings"),
        "position_embeddings": emb("embeddings.position_embeddings"),
        "token_type_embeddings": emb("embeddings.token_type_embeddings"),
        "LayerNorm": ln("embeddings.LayerNorm"),
    }}
    for i in range(layers):
        p = f"encoder.layer.{i}"
        self_tree = {
            "query": lin(f"{p}.attention.self.query"),
            "key": lin(f"{p}.attention.self.key"),
            "value": lin(f"{p}.attention.self.value"),
            "attention_output": lin(f"{p}.attention.output.dense"),
            "attention_LayerNorm": ln(f"{p}.attention.output.LayerNorm"),
        }
        ffn_tree = {
            "intermediate": lin(f"{p}.intermediate.dense"),
            "output": lin(f"{p}.output.dense"),
            "output_LayerNorm": ln(f"{p}.output.LayerNorm"),
        }
        if i < fusion:
            params[f"layer_{i}"] = {**self_tree, **ffn_tree}
        else:
            params[f"layer_{i}"] = {
                "self": self_tree,
                "xq": lin(f"{p}.crossattention.self.query"),
                "xk": lin(f"{p}.crossattention.self.key"),
                "xv": lin(f"{p}.crossattention.self.value"),
                "xout": lin(f"{p}.crossattention.output.dense"),
                "xln": ln(f"{p}.crossattention.output.LayerNorm"),
                **ffn_tree,
            }
    return params


@pytest.fixture(scope="module")
def setup(torch):
    from transformers.models.bert.configuration_bert import BertConfig
    from models.lang_bert_module.bert.xbert import BertModel

    cfg = BertConfig(
        vocab_size=100, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, fusion_layer=FUSION,
        encoder_width=H)
    torch.manual_seed(21)
    ref = BertModel(cfg, add_pooling_layer=False).eval()

    jcfg = JBertConfig(
        vocab_size=100, hidden_size=H, num_hidden_layers=LAYERS,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_dropout=0.0,
        attention_dropout=0.0, fusion_layer=FUSION)
    enc = BertTextEncoder(jcfg)
    params = _import_xbert(ref.state_dict(), LAYERS, FUSION)

    rng = np.random.default_rng(4)
    ids = rng.integers(1, 100, (B, S)).astype(np.int32)
    mask = np.ones((B, S), np.int32)
    mask[0, -3:] = 0
    enc_states = rng.normal(0, 1, (B, T, H)).astype(np.float32)
    enc_mask = np.ones((B, T), np.int32)
    enc_mask[1, -2:] = 0
    return torch, ref, enc, params, ids, mask, enc_states, enc_mask


def test_text_mode(setup):
    torch, ref, enc, params, ids, mask, _, _ = setup
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids.astype(np.int64)),
                  attention_mask=torch.from_numpy(mask.astype(np.int64)),
                  mode="text", return_dict=True)
    ours = enc.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(mask), mode="text")
    np.testing.assert_allclose(
        np.asarray(ours), out.last_hidden_state.numpy(),
        rtol=2e-4, atol=2e-4)


def test_multi_modal_mode(setup):
    torch, ref, enc, params, ids, mask, enc_states, enc_mask = setup
    with torch.no_grad():
        out = ref(input_ids=torch.from_numpy(ids.astype(np.int64)),
                  attention_mask=torch.from_numpy(mask.astype(np.int64)),
                  encoder_hidden_states=torch.from_numpy(enc_states),
                  encoder_attention_mask=torch.from_numpy(
                      enc_mask.astype(np.int64)),
                  mode="multi_modal", return_dict=True)
    ours = enc.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(mask), mode="multi_modal",
                     encoder_states=jnp.asarray(enc_states),
                     encoder_mask=jnp.asarray(enc_mask))
    np.testing.assert_allclose(
        np.asarray(ours), out.last_hidden_state.numpy(),
        rtol=2e-4, atol=2e-4)


def test_fusion_mode(setup):
    torch, ref, enc, params, ids, mask, enc_states, enc_mask = setup
    rng = np.random.default_rng(9)
    hidden = rng.normal(0, 1, (B, S, H)).astype(np.float32)
    with torch.no_grad():
        out = ref(encoder_embeds=torch.from_numpy(hidden),
                  attention_mask=torch.from_numpy(mask.astype(np.int64)),
                  encoder_hidden_states=torch.from_numpy(enc_states),
                  encoder_attention_mask=torch.from_numpy(
                      enc_mask.astype(np.int64)),
                  mode="fusion", return_dict=True)
    ours = enc.apply({"params": params}, jnp.asarray(ids),
                     jnp.asarray(mask), mode="fusion",
                     hidden_states=jnp.asarray(hidden),
                     encoder_states=jnp.asarray(enc_states),
                     encoder_mask=jnp.asarray(enc_mask))
    np.testing.assert_allclose(
        np.asarray(ours), out.last_hidden_state.numpy(),
        rtol=2e-4, atol=2e-4)
