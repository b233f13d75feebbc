"""Round-trip validation of the torch-checkpoint EXPORTER
(vlp3d/models/torch_export.py) against the reference's own models:
export(import(state_dict)) must reproduce the reference state dict
key-for-key and bit-for-bit, and the result must load back into the
torch model with strict=True (via --base merge for the dead BERT tail
the text-mode tree deliberately doesn't carry).

This pins the exporter the same way the importer is pinned — by the
reference's real module trees, not by our own expectations.
"""

import numpy as np
import pytest

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.torch_export import (export_caption_state_dict,
                                       export_jointnet_state_dict)
from vlp3d.models.torch_import import (import_caption_state_dict,
                                       import_jointnet_state_dict)


@pytest.fixture(scope="module")
def torch():
    return load_reference()


# caption DecoderLayer dead branch (early_guide leaves src_attn +
# sublayer.1 serialized but unused — transformer_captioner.py:251-254):
# exported as zero-attn + identity-norm, so compare shape/dtype only
DEAD_SUBSTRINGS = (".src_attn.", ".sublayer.1.norm.")
# recomputed sin/cos table (float32 transcendentals: libm vs torch may
# differ in the last ulp) — compare numerically, not bitwise
PE_SUFFIX = ".pe"


def _compare(out: dict, sd: dict):
    for k, v in out.items():
        assert k in sd, f"exported key missing from reference: {k}"
        r = sd[k]
        assert tuple(v.shape) == tuple(r.shape), (k, v.shape, r.shape)
        assert v.dtype == r.dtype, (k, v.dtype, r.dtype)
        if any(s in k for s in DEAD_SUBSTRINGS):
            continue
        if k.endswith(PE_SUFFIX):
            # sin/cos at float32-rounded arguments: |Δsin| <= |Δarg| <=
            # pos * eps32, so the tail of the 5000-position table drifts
            # up to ~6e-4 vs torch's stored buffer. Decoding only ever
            # reads positions < MAX_DES_LEN (~30) — pin those tightly.
            np.testing.assert_allclose(
                v[:, :64], r[:, :64], rtol=0, atol=1e-5, err_msg=k)
            np.testing.assert_allclose(v, r, rtol=0, atol=1e-3, err_msg=k)
        else:
            np.testing.assert_array_equal(v, r, err_msg=k)


def test_jointnet_round_trip(torch, tmp_path_factory):
    from test_refparity_jointnet import build_ref_jointnet

    ref, _ = build_ref_jointnet(
        torch, tmp_path_factory.mktemp("bertcfg_export"),
        input_feature_dim=132, num_proposal=16, use_answer=True,
        num_answers=5,
    )
    sd_t = ref.state_dict()
    sd = {k: v.detach().numpy() for k, v in sd_t.items()}

    params, stats = import_jointnet_state_dict(sd)
    out = export_jointnet_state_dict(params, stats)
    _compare(out, sd)

    # coverage: every reference key the export does NOT produce must be
    # part of the dead BERT tail (text mode runs layers [0, fusion) only,
    # xbert.py:550-552) — anything else unmapped is an exporter gap
    fusion = 6
    dead_prefixes = (
        tuple(f"lang.text_encoder.bert.encoder.layer.{i}."
              for i in range(fusion, 12))
        + ("lang.text_encoder.bert.pooler.", "lang.text_encoder.cls.",
           # answer-module params serialized but never touched by the
           # live forward (answer_module.py:59-110 — everything except
           # attflat_visual + answer_cls is commented-out QA backbone)
           "answer.lang_feat_linear.", "answer.object_feat_linear.",
           "answer.object_cls.", "answer.attflat_lang.",
           # LangModule's own mlm() machinery is dead in the JointNet
           # path — the joint model wires a TransformerDecoderModel as
           # self.mlm instead (jointnet.py:106-107, 187-188)
           "lang.cross_attn.", "lang.prediction.", "lang.pos_head.",
           "lang.dist_fc.", "lang.pc_proj.",
           # constructed unconditionally, never read by any forward
           # (match_module.py:71-74 — the use_match_con_loss flag is
           # stored but dead)
           "match.box_con_proj.", "match.lang_con_proj.", "match.temp")
    )
    unmapped = sorted(set(sd) - set(out))
    stray = [k for k in unmapped
             if not any(k.startswith(p) for p in dead_prefixes)]
    assert not stray, f"unmapped non-dead keys: {stray[:10]}"

    # strict load: exported keys + --base merge for the dead tail
    merged = {k: torch.from_numpy(np.ascontiguousarray(out[k]))
              if k in out else v for k, v in sd_t.items()}
    ref.load_state_dict(merged, strict=True)

    # dp_prefix variant mirrors nn.DataParallel checkpoints
    dp = export_jointnet_state_dict(params, stats, dp_prefix=True)
    assert set(dp) == {"module." + k for k in out}


def test_caption_round_trip(torch, tmp_path_factory):
    import json

    import models.caption_module.transformer_captioner as tc
    from lib.configs.config_captioning import CONF as CONF_CAP

    cfg = tmp_path_factory.mktemp("cap_export") / "config_caption.json"
    cfg.write_text(json.dumps({"architectures": ["BertModel"]}))
    CONF_CAP.CAPTION_CONFIG = str(cfg)

    # constructor-only tokenizer stub (the HF download is unavailable
    # offline; the state dict never touches it)
    class _Tok:
        vocab_size = 512
        cls_token_id = 101
        pad_token_id = 0
        mask_token_id = 103

        @staticmethod
        def from_pretrained(*a, **k):
            return _Tok()

    tok_orig = tc.BertTokenizer
    tc.BertTokenizer = _Tok
    try:
        torch.manual_seed(11)
        model = tc.TransformerDecoderModel(512, caption_mlm=False).eval()
    finally:
        tc.BertTokenizer = tok_orig
    sd_t = model.state_dict()
    sd = {k: v.detach().numpy() for k, v in sd_t.items()}

    params = import_caption_state_dict(sd, prefix="model.")
    out = export_caption_state_dict(params, prefix="model.")
    _compare(out, sd)
    # the standalone decoder round-trips its FULL key set (dead branch
    # included — exported as inert zeros/identity)
    assert set(out) == set(sd)

    merged = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in out.items()}
    model.load_state_dict(merged, strict=True)


def test_export_activation_parity_jointnet(torch, tmp_path_factory):
    """VERDICT r04 item 7: the reference model RUNNING exported weights
    reproduces our forward — activation-level (not just key/shape)
    parity of the export mapping, on weights that did NOT originate from
    torch (a fresh flax init). Covers the lang/relation/match/answer
    heads end-to-end through the reference's own JointNet.forward
    (match_module.py:134-145 etc.; the pointnet2 ops run through the
    refshim CPU oracles)."""
    import jax
    import jax.numpy as jnp

    from test_refparity_jointnet import build_ref_jointnet
    from vlp3d.config import Config, DatasetConfig, ModelConfig
    from vlp3d.models.jointnet import JointNet

    B, N, K, L, T = 2, 2048, 16, 2, 50
    ref, dc = build_ref_jointnet(
        torch, tmp_path_factory.mktemp("bertcfg_actparity"),
        input_feature_dim=132, num_proposal=K, use_answer=True,
        num_answers=5,
    )

    cfg = Config(
        dataset=DatasetConfig(
            mean_size_path="/root/reference/data/scannet/meta_data/"
                           "scannet_reference_means.npz"),
        model=ModelConfig(
            input_feature_dim=132, num_proposal=K, no_caption=True,
            use_con=True, use_lang_emb=True, use_reg_head=True,
            use_kl_loss=True, use_answer=True, num_answers=5,
            use_vote_weight=True, use_lang_classifier=True),
    )
    model = JointNet(cfg)

    rng = np.random.default_rng(23)
    pc = rng.normal(0, 1.5, (B, N, 3 + 132)).astype(np.float32)
    pc[..., 6:134] = 0.0  # multiview block (see test_refparity_modules)
    input_ids = rng.integers(1, 30000, (B, L, T))
    input_ids[..., 0] = 101
    bert_mask = np.ones((B, L, T), np.int64)
    bert_mask[:, :, -8:] = 0
    lang_num = np.array([L, L - 1], np.int64)
    zeros_f = np.zeros((B, L, 3), np.float32)
    zeros_i = np.zeros((B, L), np.int64)

    jb = {
        "point_clouds": jnp.asarray(pc),
        "input_ids": jnp.asarray(input_ids.astype(np.int32)),
        "bert_attention_mask": jnp.asarray(bert_mask.astype(np.int32)),
        "lang_num": jnp.asarray(lang_num),
        "epoch": jnp.asarray(0),  # contrast branch inert on both sides
        "ref_center_label_list": jnp.asarray(zeros_f),
        "ref_size_class_label_list": jnp.asarray(zeros_i),
        "ref_size_residual_label_list": jnp.asarray(zeros_f),
    }
    variables = jax.jit(
        lambda b: model.init({"params": jax.random.key(7)}, b, train=False)
    )(jb)
    out = model.apply(variables, jb, train=False)

    # export OUR init into the reference model (strict via base merge
    # for the dead BERT tail, as in test_jointnet_round_trip)
    exported = export_jointnet_state_dict(
        variables["params"],
        variables.get("batch_stats", {}),
    )
    sd_t = ref.state_dict()
    merged = {
        k: torch.from_numpy(np.ascontiguousarray(exported[k]))
        if k in exported else v
        for k, v in sd_t.items()
    }
    ref.load_state_dict(merged, strict=True)
    ref.eval()

    td = {
        "point_clouds": torch.from_numpy(pc),
        "input_ids": torch.from_numpy(input_ids),
        "bert_attention_mask": torch.from_numpy(bert_mask),
        "lang_num": torch.from_numpy(lang_num),
        "epoch": 0,
        "istrain": torch.tensor([0]),
        "ref_center_label_list": torch.from_numpy(zeros_f),
        "ref_heading_class_label_list": torch.from_numpy(zeros_i),
        "ref_heading_residual_label_list": torch.from_numpy(
            zeros_f[..., 0].copy()),
        "ref_size_class_label_list": torch.from_numpy(zeros_i),
        "ref_size_residual_label_list": torch.from_numpy(zeros_f),
    }
    with torch.no_grad():
        td = ref(td)

    np.testing.assert_array_equal(
        np.asarray(out["seed_inds"]), td["seed_inds"].numpy())

    def close(key, tol):
        np.testing.assert_allclose(
            np.asarray(out[key]), td[key].numpy(), rtol=tol, atol=tol,
            err_msg=key)

    close("objectness_scores", 1e-3)
    close("pred_center", 1e-3)
    close("pred_size", 1e-3)
    close("bbox_feature", 2e-3)
    close("lang_emb", 2e-3)
    close("lang_fea", 2e-3)
    close("lang_scores", 2e-3)
    close("cluster_ref", 5e-3)
    close("cross_box_feature", 5e-3)
    close("pred_center_reg", 5e-3)
    close("pred_size_reg", 5e-3)
    close("answer_scores", 5e-3)


def test_export_activation_parity_caption(torch, tmp_path_factory):
    """Export-direction activation parity for the caption head
    (transformer_captioner.py:475-539): the reference forward_train on
    OUR fresh-init exported weights matches our CaptionDecoder apply."""
    import json

    import jax
    import jax.numpy as jnp

    import models.caption_module.transformer_captioner as tc
    from lib.configs.config_captioning import CONF as CONF_CAP

    from vlp3d.models.caption import (CaptionDecoder, causal_caption_mask,
                                      nearest_proposal_token)

    # K=256: forward_train hardcodes the proposal count
    # (transformer_captioner.py:500 .view(B*L, 256, 3))
    B, K, L, T, H, VOCAB = 2, 256, 2, 12, 128, 512

    cfg = tmp_path_factory.mktemp("cap_actparity") / "config_caption.json"
    cfg.write_text(json.dumps({"architectures": ["BertModel"]}))
    CONF_CAP.CAPTION_CONFIG = str(cfg)

    class _Tok:
        vocab_size = VOCAB
        cls_token_id = 101
        pad_token_id = 0
        mask_token_id = 103

        @staticmethod
        def from_pretrained(*a, **k):
            return _Tok()

    tok_orig = tc.BertTokenizer
    tc.BertTokenizer = _Tok
    try:
        torch.manual_seed(29)
        ref = tc.TransformerDecoderModel(VOCAB, caption_mlm=False).eval()
    finally:
        tc.BertTokenizer = tok_orig

    rng = np.random.default_rng(5)
    feats = rng.normal(0, 1, (B, K, H)).astype(np.float32)
    xyz = rng.normal(0, 2, (B, K, 3)).astype(np.float32)
    ref_center = rng.normal(0, 2, (B, L, 3)).astype(np.float32)
    ids = rng.integers(3, VOCAB, (B, L, T))
    ids[..., 0] = 101
    obj_scores = rng.normal(0, 1, (B, K, 2)).astype(np.float32)

    # OUR fresh init -> exported -> loaded strict into the reference
    dec = CaptionDecoder(vocab_size=VOCAB)
    obj_token, _, _ = nearest_proposal_token(
        jnp.asarray(feats), jnp.asarray(xyz), jnp.asarray(ref_center), L)
    seq = jnp.asarray(ids.reshape(B * L, T)[:, :-1].astype(np.int32))
    variables = dec.init(
        jax.random.key(11), obj_token, seq, causal_caption_mask(seq))
    exported = export_caption_state_dict(
        variables["params"], prefix="model.")
    merged = {k: torch.from_numpy(np.ascontiguousarray(v))
              for k, v in exported.items()}
    ref.load_state_dict(merged, strict=True)

    endpoints = {
        "aggregated_vote_features": torch.from_numpy(feats),
        "aggregated_vote_xyz": torch.from_numpy(xyz),
        "ref_center_label_list": torch.from_numpy(ref_center),
        "input_ids": torch.from_numpy(ids.astype(np.int64)),
        "objectness_scores": torch.from_numpy(obj_scores),
    }
    with torch.no_grad():
        endpoints = ref.forward_train(endpoints)

    logp = dec.apply(variables, obj_token, seq, causal_caption_mask(seq))
    np.testing.assert_allclose(
        np.asarray(logp[:, 1:]), endpoints["lang_cap"].numpy(),
        rtol=2e-4, atol=2e-4)
