"""Torch-checkpoint importers: reference PyTorch weights -> vlp3d trees.

Lets a user of the reference switch to vlp3d with their trained
checkpoints (model.pth / model_last.pth / ground_model*.pth /
checkpoint.tar["model_state_dict"], saved by
scripts/joint_scripts/train_3dvlp.py + lib/joint/solver_3dvlp.py), and
loads the external pretrained assets (bert via
vlp3d.models.bert.load_hf_bert_params, ENet via
vlp3d.models.enet.convert_enet_state_dict).

Layout conventions (validated value-for-value by the direct-parity
suites, which import the reference modules and compare activations
through these exact mappings — tests/test_refparity_jointnet.py,
tests/test_refparity_e2e.py, tests/test_refparity_twin_training.py):

  * Conv1d/Conv2d k=1 weights (out, in, 1[, 1]) -> Dense kernel
    (in, out);
  * BatchNorm*d -> flax BatchNorm {scale, bias} params + {mean, var}
    batch_stats;
  * SharedMLP stacks (lib/pointnet2/pytorch_utils.py) -> the SAModule's
    split first layer (first_xyz rows 0:3 / first_feat rows 3:) +
    PointMLP tail;
  * torch nn.PReLU's single shared slope broadcasts onto our
    per-channel alpha;
  * xbert text mode -> BertTextEncoder layers [0, fusion_layer).

Accepts torch tensors or numpy arrays (state dicts loaded with
`torch.load(..., map_location="cpu")` or pre-converted).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "import_jointnet_state_dict", "import_caption_state_dict",
    "conv_kernel", "dense", "bn", "lin", "ln", "emb",
    "import_sa", "import_point_mlp", "import_xbert_text",
]


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach()
    if hasattr(v, "numpy"):
        v = v.numpy()
    return np.asarray(v)


def conv_kernel(sd, name):
    """Conv k=1 weight (out, in, 1[, 1]) -> Dense kernel (in, out)."""
    w = _np(sd[name])
    w = w.reshape(w.shape[0], w.shape[1])
    return jnp.asarray(w.T)


def dense(sd, name, bias=True):
    p = {"kernel": conv_kernel(sd, name + ".weight")}
    if bias:
        p["bias"] = jnp.asarray(_np(sd[name + ".bias"]))
    return p


def bn(sd, name):
    """BatchNorm*d -> (params, stats)."""
    params = {
        "scale": jnp.asarray(_np(sd[name + ".weight"])),
        "bias": jnp.asarray(_np(sd[name + ".bias"])),
    }
    stats = {
        "mean": jnp.asarray(_np(sd[name + ".running_mean"])),
        "var": jnp.asarray(_np(sd[name + ".running_var"])),
    }
    return params, stats


def lin(sd, name):
    """torch nn.Linear -> Dense params."""
    return {"kernel": jnp.asarray(_np(sd[name + ".weight"]).T),
            "bias": jnp.asarray(_np(sd[name + ".bias"]))}


def ln(sd, name):
    """torch LayerNorm -> flax LayerNorm params."""
    return {"scale": jnp.asarray(_np(sd[name + ".weight"])),
            "bias": jnp.asarray(_np(sd[name + ".bias"]))}


def emb(sd, name):
    return {"embedding": jnp.asarray(_np(sd[name + ".weight"]))}


def prelu(sd, name, channels):
    """torch nn.PReLU (shared scalar OR per-channel) -> per-channel alpha."""
    w = _np(sd[name + ".weight"])
    return {"alpha": jnp.asarray(np.broadcast_to(w, (channels,)).copy())}


def import_sa(sd, prefix):
    """PointnetSAModuleVotes state dict -> our SAModule tree."""
    w0 = conv_kernel(sd, f"{prefix}.mlp_module.layer0.conv.weight")
    params = {
        "first_xyz": {"kernel": w0[:3]},
        "first_feat": {"kernel": w0[3:]},
    }
    stats = {}
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn(
        sd, f"{prefix}.mlp_module.layer0.bn.bn")
    pm, sm = {}, {}
    j = 1
    while f"{prefix}.mlp_module.layer{j}.conv.weight" in sd:
        pm[f"Dense_{j-1}"] = {
            "kernel": conv_kernel(
                sd, f"{prefix}.mlp_module.layer{j}.conv.weight")}
        pm[f"BatchNorm_{j-1}"], sm[f"BatchNorm_{j-1}"] = bn(
            sd, f"{prefix}.mlp_module.layer{j}.bn.bn")
        j += 1
    params["PointMLP_0"], stats["PointMLP_0"] = pm, sm
    return params, stats


def import_point_mlp(sd, prefix, layers):
    """SharedMLP (no split first layer) -> PointMLP tree."""
    pm, sm = {}, {}
    for i, j in enumerate(layers):
        pm[f"Dense_{i}"] = {
            "kernel": conv_kernel(sd, f"{prefix}.layer{j}.conv.weight")}
        pm[f"BatchNorm_{i}"], sm[f"BatchNorm_{i}"] = bn(
            sd, f"{prefix}.layer{j}.bn.bn")
    return pm, sm


def import_xbert_text(sd, fusion_layer, prefix="bert."):
    """Vendored-xbert BertModel state dict -> BertTextEncoder text-mode
    tree: embeddings + self-attention layers [0, fusion_layer)
    (xbert.py:550-552)."""
    p = prefix
    params = {"embeddings": {
        "word_embeddings": emb(sd, f"{p}embeddings.word_embeddings"),
        "position_embeddings": emb(
            sd, f"{p}embeddings.position_embeddings"),
        "token_type_embeddings": emb(
            sd, f"{p}embeddings.token_type_embeddings"),
        "LayerNorm": ln(sd, f"{p}embeddings.LayerNorm"),
    }}
    for i in range(fusion_layer):
        q = f"{p}encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": lin(sd, f"{q}.attention.self.query"),
            "key": lin(sd, f"{q}.attention.self.key"),
            "value": lin(sd, f"{q}.attention.self.value"),
            "attention_output": lin(sd, f"{q}.attention.output.dense"),
            "attention_LayerNorm": ln(
                sd, f"{q}.attention.output.LayerNorm"),
            "intermediate": lin(sd, f"{q}.intermediate.dense"),
            "output": lin(sd, f"{q}.output.dense"),
            "output_LayerNorm": ln(sd, f"{q}.output.LayerNorm"),
        }
    return params


def mha(sd, prefix):
    """models/transformer/attention.py MultiHeadAttention."""
    return {"fc_q": lin(sd, prefix + ".attention.fc_q"),
            "fc_k": lin(sd, prefix + ".attention.fc_k"),
            "fc_v": lin(sd, prefix + ".attention.fc_v"),
            "fc_o": lin(sd, prefix + ".attention.fc_o"),
            "LayerNorm_0": ln(sd, prefix + ".layer_norm")}


def cadl(sd, prefix):
    """mmattention.py CrossAttentionDecoderLayer."""
    return {"self_attention": mha(sd, prefix + ".self_attention"),
            "enc_dec_attention": mha(sd, prefix + ".enc_dec_attention"),
            "ffn": {"Dense_0": lin(sd, prefix + ".ffn.linear1"),
                    "Dense_1": lin(sd, prefix + ".ffn.linear2")},
            "LayerNorm_0": ln(sd, prefix + ".norm")}


def attflat(sd, prefix):
    """models/vqa/mcan_module.py AttFlat."""
    p = prefix + "." if prefix else ""
    return {"Dense_0": lin(sd, p + "mlp.fc.linear"),
            "Dense_1": lin(sd, p + "mlp.linear"),
            "linear_merge": lin(sd, p + "linear_merge")}


def _refnorm(sd, name):
    """annotated-transformer LayerNorm (a_2/b_2 naming)."""
    return {"scale": jnp.asarray(_np(sd[name + ".a_2"])),
            "bias": jnp.asarray(_np(sd[name + ".b_2"]))}


def import_caption_state_dict(sd, prefix="model.", n_layers=6):
    """TransformerDecoderModel (transformer_captioner.py) -> our
    CaptionDecoder tree. prefix: "model." standalone, "caption.model."
    inside JointNet."""
    p = prefix
    params = {
        "embed": {"embedding": jnp.asarray(
            _np(sd[p + "tgt_embed.0.lut.weight"]))},
        "final_ln": _refnorm(sd, p + "decoder.norm"),
        "generator": lin(sd, p + "generator.proj"),
    }
    for i in range(n_layers):
        q = f"{p}decoder.layers.{i}"
        params[f"layer_{i}"] = {
            "ln_attn": _refnorm(sd, f"{q}.sublayer.0.norm"),
            "ln_ffn": _refnorm(sd, f"{q}.sublayer.2.norm"),
            "self_attn": {
                "q": lin(sd, f"{q}.self_attn.linears.0"),
                "k": lin(sd, f"{q}.self_attn.linears.1"),
                "v": lin(sd, f"{q}.self_attn.linears.2"),
                "o": lin(sd, f"{q}.self_attn.linears.3"),
            },
            "ffn1": lin(sd, f"{q}.feed_forward.w_1"),
            "ffn2": lin(sd, f"{q}.feed_forward.w_2"),
        }
    return params


def import_jointnet_state_dict(sd, *, fusion_layer: int = 6):
    """Full reference JointNet state dict -> (params, batch_stats).

    Optional submodules (caption / mlm / answer / reg+kl heads / vote
    weights) are mapped when their keys are present, so checkpoints from
    any flag combination import. DataParallel's 'module.' prefix is
    stripped.
    """
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):]: v for k, v in sd.items()
              if k.startswith("module.")}
    params: dict = {}
    stats: dict = {}

    # backbone
    bp, bs = {}, {}
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        bp[sa], bs[sa] = import_sa(sd, f"backbone_net.{sa}")
    for fp in ("fp1", "fp2"):
        pm, sm = import_point_mlp(sd, f"backbone_net.{fp}.mlp", range(2))
        bp[fp] = {"PointMLP_0": pm}
        bs[fp] = {"PointMLP_0": sm}
    params["backbone_net"], stats["backbone_net"] = bp, bs

    # voting
    vp, vs = {}, {}
    for i, (conv, bnn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        vp[f"Dense_{i}"] = dense(sd, f"vgen.{conv}")
        vp[f"BatchNorm_{i}"], vs[f"BatchNorm_{i}"] = bn(sd, f"vgen.{bnn}")
    vp["Dense_2"] = dense(sd, "vgen.conv3")
    params["vgen"], stats["vgen"] = vp, vs

    # proposal (optional vote-weight predictor + aggregation SA + ROI heads)
    pp, ps = {}, {}
    if "proposal.votes_weight_predictor.0.weight" in sd:
        pp["Dense_0"] = dense(sd, "proposal.votes_weight_predictor.0")
        pp["BatchNorm_0"], ps["BatchNorm_0"] = bn(
            sd, "proposal.votes_weight_predictor.1")
        pp["PReLU_0"] = prelu(sd, "proposal.votes_weight_predictor.2", 128)
        pp["Dense_1"] = dense(sd, "proposal.votes_weight_predictor.3")
    pp["vote_aggregation"], ps["vote_aggregation"] = import_sa(
        sd, "proposal.vote_aggregation")
    rp, rs = {}, {}
    rp["Dense_0"] = dense(sd, "proposal.proposal.convs.0")
    rp["BatchNorm_0"], rs["BatchNorm_0"] = bn(sd, "proposal.proposal.convs.1")
    rp["Dense_1"] = dense(sd, "proposal.proposal.convs.3")
    rp["BatchNorm_1"], rs["BatchNorm_1"] = bn(sd, "proposal.proposal.convs.4")
    rp["Dense_2"] = dense(sd, "proposal.proposal.objectness_predictor")
    rp["Dense_3"] = dense(sd, "proposal.proposal.box_predictor")
    rp["Dense_4"] = dense(sd, "proposal.proposal.heading_cls_predictor")
    rp["Dense_5"] = dense(sd, "proposal.proposal.heading_reg_predictor")
    rp["Dense_6"] = dense(sd, "proposal.proposal.sem_cls_predictor")
    if "proposal.proposal.alpha_predictor.weight" in sd:
        rp["Dense_7"] = dense(sd, "proposal.proposal.alpha_predictor")
    pp["roi_heads"], ps["roi_heads"] = rp, rs
    params["proposal"], stats["proposal"] = pp, ps

    # relation
    rp, rs = {}, {}
    rp["Dense_0"] = dense(sd, "relation.features_concat.0")
    rp["BatchNorm_0"], rs["BatchNorm_0"] = bn(sd, "relation.features_concat.1")
    rp["PReLU_0"] = prelu(sd, "relation.features_concat.2", 128)
    rp["Dense_1"] = dense(sd, "relation.features_concat.3")
    for i in range(2):
        for j, idx in enumerate((0, 3, 6)):
            rp[f"attn_fc{i}_{j}"] = lin(sd, f"relation.self_attn_fc.{i}.{idx}")
        for j, idx in enumerate((2, 5)):
            rp[f"attn_ln{i}_{j}"] = ln(sd, f"relation.self_attn_fc.{i}.{idx}")
        rp[f"self_attn_{i}"] = mha(sd, f"relation.self_attn.{i}")
        rp[f"obj_embedding_{i}"] = lin(sd, f"relation.obj_embedding.{i}")
        rp[f"bbox_embedding_{i}"] = lin(sd, f"relation.bbox_embedding.{i}")
    params["relation"], stats["relation"] = rp, rs

    # language branch: xbert text layers + proj + lang classifier
    if "lang.proj.weight" in sd:
        lp = {"text_encoder": import_xbert_text(
            sd, fusion_layer, prefix="lang.text_encoder.bert.")}
        lp["proj"] = lin(sd, "lang.proj")
        if "lang.lang_cls.0.weight" in sd:
            lp["lang_cls"] = lin(sd, "lang.lang_cls.0")
        params["lang"] = lp

    # match
    if "match.match.0.weight" in sd:
        mp, ms = {}, {}
        for i, idx in enumerate((0, 3, 6)):
            mp[f"Dense_{i}"] = lin(sd, f"match.match.{idx}")
        if "match.lang_emb_proj.0.weight" in sd:
            mp["Dense_3"] = dense(sd, "match.lang_emb_proj.0")
            mp["BatchNorm_0"], ms["BatchNorm_0"] = bn(
                sd, "match.lang_emb_proj.1")
            mp["prelu0"] = prelu(sd, "match.lang_emb_proj.2", 128)
            mp["Dense_4"] = dense(sd, "match.lang_emb_proj.3")
            mp["BatchNorm_1"], ms["BatchNorm_1"] = bn(
                sd, "match.lang_emb_proj.4")
            mp["prelu1"] = prelu(sd, "match.lang_emb_proj.5", 128)
            mp["Dense_5"] = dense(sd, "match.lang_emb_proj.6")
        if "match.reg_head.0.weight" in sd:
            mp["Dense_6"] = lin(sd, "match.reg_head.0")
            mp["BatchNorm_2"], ms["BatchNorm_2"] = bn(sd, "match.reg_head.1")
            mp["Dense_7"] = lin(sd, "match.reg_head.3")
            mp["BatchNorm_3"], ms["BatchNorm_3"] = bn(sd, "match.reg_head.4")
            mp["Dense_8"] = lin(sd, "match.reg_head.6")
        for i in range(2):
            mp[f"grounding_cross_attn_{i}"] = cadl(
                sd, f"match.grounding_cross_attn.{i}")
        if "match.lang_emb_cross_attn.attention.fc_q.weight" in sd:
            mp["lang_emb_cross_attn"] = mha(sd, "match.lang_emb_cross_attn")
        params["match"], stats["match"] = mp, ms

    # contrast (OCC/OSC)
    if "constrast.pc_proj.weight" in sd:
        params["constrast"] = {
            "pc_proj": {"kernel": jnp.asarray(
                _np(sd["constrast.pc_proj.weight"]).T)},
            "text_proj": {"kernel": jnp.asarray(
                _np(sd["constrast.text_proj.weight"]).T)},
            "pc_proj_iou": {"kernel": jnp.asarray(
                _np(sd["constrast.pc_proj_iou.0.weight"]).T)},
            "tau": jnp.asarray(_np(sd["constrast.nce_loss.tau"])),
        }

    # caption decoder / MLM decoder (separate modules, as in the
    # reference: jointnet.py:103-107)
    if "caption.model.generator.proj.weight" in sd:
        params["caption"] = import_caption_state_dict(
            sd, prefix="caption.model.")
    if "mlm.model.generator.proj.weight" in sd:
        params["mlm"] = import_caption_state_dict(sd, prefix="mlm.model.")

    # answer head
    if "answer.answer_cls.0.weight" in sd:
        params["answer"] = {
            "attflat_visual": attflat(sd, "answer.attflat_visual"),
            "Dense_0": lin(sd, "answer.answer_cls.0"),
            "Dense_1": lin(sd, "answer.answer_cls.3"),
        }
    return params, stats
