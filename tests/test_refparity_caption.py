"""DIRECT parity for the caption transformer: the reference's
TransformerDecoderModel (models/caption_module/transformer_captioner.py,
random-init, eval mode) vs our CaptionDecoder under imported weights.

Covers the teacher-forced training path (early_guide decoder-only stack,
object-indicator conditioning, log-softmax generator), the non-causal
caption-MLM mask shape, and the greedy eval decode token-for-token
(B*K sequences). The reference needs two assets missing from its repo
(config_caption.json, the HF tokenizer download) — both are only read for
constants, stubbed here.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.caption import (CaptionDecoder, causal_caption_mask,
                                  greedy_decode, nearest_proposal_token,
                                  padding_caption_mask)

B, K, L, T, H, VOCAB = 2, 256, 2, 12, 128, 30522


@pytest.fixture(scope="module")
def torch():
    return load_reference()


class _Tok:
    vocab_size = VOCAB
    cls_token_id = 101
    pad_token_id = 0
    mask_token_id = 103

    @staticmethod
    def from_pretrained(*a, **k):
        return _Tok()


@pytest.fixture(scope="module")
def ref_model(torch, tmp_path_factory):
    import models.caption_module.transformer_captioner as tc
    from lib.configs.config_captioning import CONF as CONF_CAP

    cfg = tmp_path_factory.mktemp("cap") / "config_caption.json"
    cfg.write_text(json.dumps({"architectures": ["BertModel"]}))
    CONF_CAP.CAPTION_CONFIG = str(cfg)
    CONF_CAP.TRAIN.MAX_DES_LEN = 8  # shrink the eval loop
    tc.BertTokenizer = _Tok
    torch.manual_seed(3)
    model = tc.TransformerDecoderModel(VOCAB, caption_mlm=False).eval()
    # keep PAD from ever winning the random-weight argmax: the eval decode
    # comparison would otherwise hinge on our pad-masking (the reference's
    # eval attends generated pads; ours masks them)
    with torch.no_grad():
        model.model.generator.proj.bias[0] = -5.0
    return model


def _import_params(sd):
    def lin(name):
        return {"kernel": jnp.asarray(sd[name + ".weight"].numpy().T),
                "bias": jnp.asarray(sd[name + ".bias"].numpy())}

    def norm(name):
        return {"scale": jnp.asarray(sd[name + ".a_2"].numpy()),
                "bias": jnp.asarray(sd[name + ".b_2"].numpy())}

    params = {
        "embed": {"embedding": jnp.asarray(
            sd["model.tgt_embed.0.lut.weight"].numpy())},
        "final_ln": norm("model.decoder.norm"),
        "generator": lin("model.generator.proj"),
    }
    for i in range(6):
        p = f"model.decoder.layers.{i}"
        params[f"layer_{i}"] = {
            "ln_attn": norm(f"{p}.sublayer.0.norm"),
            "ln_ffn": norm(f"{p}.sublayer.2.norm"),
            "self_attn": {
                "q": lin(f"{p}.self_attn.linears.0"),
                "k": lin(f"{p}.self_attn.linears.1"),
                "v": lin(f"{p}.self_attn.linears.2"),
                "o": lin(f"{p}.self_attn.linears.3"),
            },
            "ffn1": lin(f"{p}.feed_forward.w_1"),
            "ffn2": lin(f"{p}.feed_forward.w_2"),
        }
    return params


@pytest.fixture(scope="module")
def data(rng_module=None):
    rng = np.random.default_rng(11)
    feats = rng.normal(0, 1, (B, K, H)).astype(np.float32)
    xyz = rng.normal(0, 2, (B, K, 3)).astype(np.float32)
    ref_center = rng.normal(0, 2, (B, L, 3)).astype(np.float32)
    ids = rng.integers(3, VOCAB, (B, L, T))
    lengths = rng.integers(4, T, (B, L))
    ids[np.arange(T)[None, None, :] >= lengths[..., None]] = 0
    ids[..., 0] = 101
    obj_scores = rng.normal(0, 1, (B, K, 2)).astype(np.float32)
    return {"feats": feats, "xyz": xyz, "ref_center": ref_center,
            "ids": ids.astype(np.int64), "obj_scores": obj_scores}


def test_forward_train(torch, ref_model, data):
    endpoints = {
        "aggregated_vote_features": torch.from_numpy(data["feats"]),
        "aggregated_vote_xyz": torch.from_numpy(data["xyz"]),
        "ref_center_label_list": torch.from_numpy(data["ref_center"]),
        "input_ids": torch.from_numpy(data["ids"]),
        "objectness_scores": torch.from_numpy(data["obj_scores"]),
    }
    with torch.no_grad():
        endpoints = ref_model.forward_train(endpoints)
    ref_cap = endpoints["lang_cap"].numpy()  # (B*L, T-1, vocab) log-probs

    params = _import_params(ref_model.state_dict())
    obj_token, match_idx, dist = nearest_proposal_token(
        jnp.asarray(data["feats"]), jnp.asarray(data["xyz"]),
        jnp.asarray(data["ref_center"]), L)
    seq = jnp.asarray(data["ids"].reshape(B * L, T)[:, :-1])
    logp = CaptionDecoder(vocab_size=VOCAB).apply(
        {"params": params}, obj_token, seq, causal_caption_mask(seq))
    np.testing.assert_allclose(np.asarray(logp[:, 1:]), ref_cap,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(match_idx), endpoints["match_idx"].numpy().reshape(-1))
    np.testing.assert_array_equal(
        np.asarray(dist > -1.0), endpoints["good_bbox_masks"].numpy())


def test_forward_mlm_outputs(torch, ref_model, data):
    # mask_ratio=0 makes the (torch-RNG) masking a no-op, isolating the
    # non-causal captioning=False decode path (lang_mlm outputs)
    ref_model.mask_ratio = 0.0
    endpoints = {
        "aggregated_vote_features": torch.from_numpy(data["feats"]),
        "aggregated_vote_xyz": torch.from_numpy(data["xyz"]),
        "ref_center_label_list": torch.from_numpy(data["ref_center"]),
        "input_ids": torch.from_numpy(data["ids"]),
        "objectness_scores": torch.from_numpy(data["obj_scores"]),
    }
    with torch.no_grad():
        endpoints = ref_model.forward_mlm(endpoints)
    ref_mlm = endpoints["lang_mlm"].numpy()

    params = _import_params(ref_model.state_dict())
    obj_token, _, _ = nearest_proposal_token(
        jnp.asarray(data["feats"]), jnp.asarray(data["xyz"]),
        jnp.asarray(data["ref_center"]), L)
    seq = jnp.asarray(data["ids"].reshape(B * L, T)[:, :-1])
    logp = CaptionDecoder(vocab_size=VOCAB).apply(
        {"params": params}, obj_token, seq, padding_caption_mask(seq))
    np.testing.assert_allclose(np.asarray(logp[:, 1:]), ref_mlm,
                               rtol=2e-4, atol=2e-4)
    assert abs(float(endpoints["mlm_loss"])) < 1e-6  # nothing masked


@pytest.mark.slow
def test_forward_eval_greedy_tokens(torch, ref_model, data):
    endpoints = {
        "aggregated_vote_features": torch.from_numpy(data["feats"]),
        "aggregated_vote_xyz": torch.from_numpy(data["xyz"]),
        "heading_class_label": torch.zeros(B, K, dtype=torch.long),
        "objectness_scores": torch.from_numpy(data["obj_scores"]),
    }
    with torch.no_grad():
        endpoints = ref_model.forward_eval(endpoints)
    ref_tokens = endpoints["lang_cap"].numpy().reshape(B * K, -1)

    params = _import_params(ref_model.state_dict())
    obj_token = jnp.asarray(data["feats"]).reshape(B * K, 1, H)
    ys = greedy_decode(CaptionDecoder(vocab_size=VOCAB), {"params": params},
                       obj_token, max_len=8)
    assert ys.shape == ref_tokens.shape
    ours = np.asarray(ys)

    # fp32 summation-order differences (torch vs XLA) can flip a near-tie
    # argmax; one flipped token diverges that row's suffix. Require
    # row-level agreement >= 99% and verify every divergence starts at a
    # genuine near-tie: the reference's token scores within 1e-3 of our
    # max logit at the first differing step.
    row_equal = (ours == ref_tokens).all(axis=1)
    assert row_equal.mean() >= 0.99, row_equal.mean()
    dec = CaptionDecoder(vocab_size=VOCAB)
    for r in np.where(~row_equal)[0]:
        t = int(np.argmax(ours[r] != ref_tokens[r]))  # first diff position
        seq = jnp.asarray(ours[r:r + 1, :-1])
        logits = np.asarray(dec.apply(
            {"params": params}, obj_token[r:r + 1], seq,
            causal_caption_mask(seq)))[0]  # rows: obj, tok0, tok1, ...
        step = logits[t]  # log-probs predicting position t
        gap = step.max() - step[ref_tokens[r, t]]
        assert gap < 1e-3, (r, t, gap)
