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
