"""DIRECT parity for the VQA stack: reference MCAN blocks
(models/vqa/mcan_module.py) and AnswerModule
(models/answer_module/answer_module.py) vs our flax ports under imported
weights. The MCAN LayerNorm is the torch-std variant (std unbiased, eps
added to std) — RefLayerNorm, shared with the caption decoder.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from refshim import load_reference

pytestmark = pytest.mark.refparity

from vlp3d.models.answer import AnswerModule, AttFlat
from vlp3d.models.mcan import MCAN_ED


@pytest.fixture(scope="module")
def torch():
    return load_reference()


def _lin(sd, name):
    return {"kernel": jnp.asarray(sd[name + ".weight"].numpy().T),
            "bias": jnp.asarray(sd[name + ".bias"].numpy())}


def _norm(sd, name):
    return {"scale": jnp.asarray(sd[name + ".a_2"].numpy()),
            "bias": jnp.asarray(sd[name + ".b_2"].numpy())}


def _attflat(sd, p):
    p = p + "." if p else ""
    return {"Dense_0": _lin(sd, p + "mlp.fc.linear"),
            "Dense_1": _lin(sd, p + "mlp.linear"),
            "linear_merge": _lin(sd, p + "linear_merge")}


def _mhatt(sd, p):
    return {k: _lin(sd, f"{p}.{k}")
            for k in ("linear_v", "linear_k", "linear_q", "linear_merge")}


def _ffn(sd, p):
    return {"Dense_0": _lin(sd, p + ".mlp.fc.linear"),
            "Dense_1": _lin(sd, p + ".mlp.linear")}


def test_attflat(torch, rng):
    from models.vqa.mcan_module import AttFlat as RefAttFlat

    ref = RefAttFlat(128, 512, 1, 512, 0.1).eval()
    sd = ref.state_dict()
    x = rng.normal(0, 1, (5, 20, 128)).astype(np.float32)
    mask = (rng.uniform(size=(5, 1, 1, 20)) > 0.7)

    params = _attflat(sd, "")
    mod = AttFlat(128, 512, 1, 512)

    with torch.no_grad():
        r0 = ref(torch.from_numpy(x), None)
        r1 = ref(torch.from_numpy(x), torch.from_numpy(mask))
    o0 = mod.apply({"params": params}, jnp.asarray(x))
    o1 = mod.apply({"params": params}, jnp.asarray(x),
                   jnp.asarray(mask[:, 0, 0, :]))
    np.testing.assert_allclose(np.asarray(o0), r0.numpy(), rtol=2e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o1), r1.numpy(), rtol=2e-4,
                               atol=1e-4)


def test_answer_module(torch, rng):
    from models.answer_module.answer_module import AnswerModule as RefAnswer

    ref = RefAnswer(num_answers=40).eval()
    sd = ref.state_dict()
    cross = rng.normal(0, 1, (6, 32, 128)).astype(np.float32)

    params = {"attflat_visual": _attflat(sd, "attflat_visual"),
              "Dense_0": _lin(sd, "answer_cls.0"),
              "Dense_1": _lin(sd, "answer_cls.3")}
    with torch.no_grad():
        td = ref({"cross_box_feature": torch.from_numpy(cross)})
    ours = AnswerModule(num_answers=40).apply(
        {"params": params}, jnp.asarray(cross))
    np.testing.assert_allclose(np.asarray(ours),
                               td["answer_scores"].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_mcan_ed(torch, rng):
    from models.vqa.mcan_module import MCAN_ED as RefMCAN

    ref = RefMCAN(128, num_heads=8, num_layers=2, pdrop=0.1).eval()
    sd = ref.state_dict()
    lang = rng.normal(0, 1, (4, 14, 128)).astype(np.float32)
    obj = rng.normal(0, 1, (4, 24, 128)).astype(np.float32)
    lang_mask = (rng.uniform(size=(4, 14)) > 0.8)
    obj_mask = (rng.uniform(size=(4, 24)) > 0.9)

    params = {}
    for i in range(2):
        params[f"enc_{i}"] = {
            "MHAtt_0": _mhatt(sd, f"enc_list.{i}.mhatt"),
            "FFN_0": _ffn(sd, f"enc_list.{i}.ffn"),
            "RefLayerNorm_0": _norm(sd, f"enc_list.{i}.norm1"),
            "RefLayerNorm_1": _norm(sd, f"enc_list.{i}.norm2"),
        }
        params[f"dec_{i}"] = {
            "MHAtt_0": _mhatt(sd, f"dec_list.{i}.mhatt1"),
            "MHAtt_1": _mhatt(sd, f"dec_list.{i}.mhatt2"),
            "FFN_0": _ffn(sd, f"dec_list.{i}.ffn"),
            "RefLayerNorm_0": _norm(sd, f"dec_list.{i}.norm1"),
            "RefLayerNorm_1": _norm(sd, f"dec_list.{i}.norm2"),
            "RefLayerNorm_2": _norm(sd, f"dec_list.{i}.norm3"),
        }

    lm = torch.from_numpy(lang_mask)[:, None, None, :]
    om = torch.from_numpy(obj_mask)[:, None, None, :]
    with torch.no_grad():
        r_lang, r_obj = ref(torch.from_numpy(lang), torch.from_numpy(obj),
                            lm, om)
    o_lang, o_obj = MCAN_ED(128, num_heads=8, num_layers=2).apply(
        {"params": params}, jnp.asarray(lang), jnp.asarray(obj),
        jnp.asarray(lang_mask), jnp.asarray(obj_mask))
    # fp32 accumulation across 5 attention+LN blocks (plus torch's
    # oneDNN reassociation) reaches ~2.3e-4 abs on O(1) activations
    np.testing.assert_allclose(np.asarray(o_lang), r_lang.numpy(),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(o_obj), r_obj.numpy(),
                               rtol=5e-4, atol=5e-4)
