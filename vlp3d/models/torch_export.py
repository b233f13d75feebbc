"""Torch-checkpoint exporter: vlp3d trees -> reference PyTorch state dicts.

The inverse of vlp3d.models.torch_import: lets a user train on TPU with
vlp3d and hand the checkpoint BACK to the reference stack (torch
evaluation harnesses, existing serving, further finetuning) — the other
half of the migration loop. Emits a state dict that
`JointNet(...).load_state_dict(sd, strict=True)` accepts on the
reference model (models/jointnet/jointnet.py), including the
non-learned buffers torch serializes (BatchNorm num_batches_tracked,
BertEmbeddings.position_ids — xbert.py:183, PositionalEncoding.pe —
transformer_captioner.py:163).

Layout inverses (validated key-for-key and value-for-value by the
round-trip test tests/test_torch_export.py: export(import(sd)) == the
reference model's own state dict):

  * Dense kernel (in, out) -> Conv1d/Conv2d k=1 weight (out, in, 1[, 1])
    — rank per site: SharedMLP stacks are Conv2d
    (lib/pointnet2/pytorch_utils.py:28), everything else Conv1d;
  * flax BatchNorm params+stats -> weight/bias/running_mean/running_var
    + num_batches_tracked=0 (we don't carry torch's batch counter; it
    only matters for momentum=None cumulative averaging, which the
    reference never uses);
  * per-channel PReLU alpha -> torch's shape: per-channel where the
    reference declares nn.PReLU(C) (relation_module.py:23), the MEAN
    collapsed to shape (1,) where it declares a shared scalar
    nn.PReLU() (proposal_module_fcos.py:54, refnet/match_module.py) —
    lossy only if TPU training diverged the broadcast-imported slope,
    which frozen imports never do;
  * caption DecoderLayer dead branch (early_guide=True leaves src_attn
    and sublayer.1 unused but serialized,
    transformer_captioner.py:240-254): src_attn linears export as
    ZEROS and sublayer.1.norm as identity (a_2=1, b_2=0), so a
    late_guide flip degrades to the residual identity instead of
    garbage.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "export_jointnet_state_dict", "export_caption_state_dict",
    "sinusoid_pe",
]


def _np(v) -> np.ndarray:
    return np.asarray(v)


def _f32(v) -> np.ndarray:
    return np.ascontiguousarray(_np(v), dtype=np.float32)


def inv_conv(kernel, rank: int) -> np.ndarray:
    """Dense kernel (in, out) -> conv k=1 weight (out, in, 1[, 1])."""
    w = _f32(kernel).T
    return w.reshape(w.shape + (1,) * rank)


def inv_dense(p, name: str, out: dict, *, rank: int = 1):
    out[name + ".weight"] = inv_conv(p["kernel"], rank)
    if "bias" in p:
        out[name + ".bias"] = _f32(p["bias"])


def inv_bn(params, stats, name: str, out: dict):
    out[name + ".weight"] = _f32(params["scale"])
    out[name + ".bias"] = _f32(params["bias"])
    out[name + ".running_mean"] = _f32(stats["mean"])
    out[name + ".running_var"] = _f32(stats["var"])
    out[name + ".num_batches_tracked"] = np.array(0, dtype=np.int64)


def inv_lin(p, name: str, out: dict):
    out[name + ".weight"] = _f32(p["kernel"]).T.copy()
    if "bias" in p:
        out[name + ".bias"] = _f32(p["bias"])


def inv_ln(p, name: str, out: dict):
    out[name + ".weight"] = _f32(p["scale"])
    out[name + ".bias"] = _f32(p["bias"])


def inv_emb(p, name: str, out: dict):
    out[name + ".weight"] = _f32(p["embedding"])


def inv_prelu(p, name: str, out: dict, *, scalar: bool):
    a = _f32(p["alpha"])
    out[name + ".weight"] = (
        np.mean(a, keepdims=True).astype(np.float32) if scalar else a
    )


def export_sa(params, stats, prefix: str, out: dict):
    """SAModule tree -> PointnetSAModuleVotes keys (SharedMLP: Conv2d,
    bias folded away by BN — pytorch_utils.py:87)."""
    w0 = np.concatenate(
        [_f32(params["first_xyz"]["kernel"]),
         _f32(params["first_feat"]["kernel"])], axis=0
    )
    out[f"{prefix}.mlp_module.layer0.conv.weight"] = inv_conv(w0, 2)
    inv_bn(params["BatchNorm_0"], stats["BatchNorm_0"],
           f"{prefix}.mlp_module.layer0.bn.bn", out)
    pm, sm = params["PointMLP_0"], stats["PointMLP_0"]
    j = 1
    while f"Dense_{j-1}" in pm:
        out[f"{prefix}.mlp_module.layer{j}.conv.weight"] = inv_conv(
            pm[f"Dense_{j-1}"]["kernel"], 2)
        inv_bn(pm[f"BatchNorm_{j-1}"], sm[f"BatchNorm_{j-1}"],
               f"{prefix}.mlp_module.layer{j}.bn.bn", out)
        j += 1


def export_point_mlp(pm, sm, prefix: str, layers, out: dict):
    """PointMLP tree -> SharedMLP keys (Conv2d, no split first layer)."""
    for i, j in enumerate(layers):
        out[f"{prefix}.layer{j}.conv.weight"] = inv_conv(
            pm[f"Dense_{i}"]["kernel"], 2)
        inv_bn(pm[f"BatchNorm_{i}"], sm[f"BatchNorm_{i}"],
               f"{prefix}.layer{j}.bn.bn", out)


def export_xbert_text(params, out: dict, prefix: str = "bert."):
    """BertTextEncoder text-mode tree -> vendored-xbert keys, layers
    [0, fusion_layer) inferred from the tree; emits the position_ids
    buffer torch serializes (xbert.py:182-183)."""
    p = prefix
    e = params["embeddings"]
    inv_emb(e["word_embeddings"], f"{p}embeddings.word_embeddings", out)
    inv_emb(e["position_embeddings"],
            f"{p}embeddings.position_embeddings", out)
    inv_emb(e["token_type_embeddings"],
            f"{p}embeddings.token_type_embeddings", out)
    inv_ln(e["LayerNorm"], f"{p}embeddings.LayerNorm", out)
    max_pos = _np(e["position_embeddings"]["embedding"]).shape[0]
    out[f"{p}embeddings.position_ids"] = (
        np.arange(max_pos, dtype=np.int64)[None, :]
    )
    i = 0
    while f"layer_{i}" in params:
        lp, q = params[f"layer_{i}"], f"{p}encoder.layer.{i}"
        inv_lin(lp["query"], f"{q}.attention.self.query", out)
        inv_lin(lp["key"], f"{q}.attention.self.key", out)
        inv_lin(lp["value"], f"{q}.attention.self.value", out)
        inv_lin(lp["attention_output"], f"{q}.attention.output.dense", out)
        inv_ln(lp["attention_LayerNorm"],
               f"{q}.attention.output.LayerNorm", out)
        inv_lin(lp["intermediate"], f"{q}.intermediate.dense", out)
        inv_lin(lp["output"], f"{q}.output.dense", out)
        inv_ln(lp["output_LayerNorm"], f"{q}.output.LayerNorm", out)
        i += 1


def inv_mha(p, prefix: str, out: dict):
    inv_lin(p["fc_q"], prefix + ".attention.fc_q", out)
    inv_lin(p["fc_k"], prefix + ".attention.fc_k", out)
    inv_lin(p["fc_v"], prefix + ".attention.fc_v", out)
    inv_lin(p["fc_o"], prefix + ".attention.fc_o", out)
    inv_ln(p["LayerNorm_0"], prefix + ".layer_norm", out)


def inv_cadl(p, prefix: str, out: dict):
    inv_mha(p["self_attention"], prefix + ".self_attention", out)
    inv_mha(p["enc_dec_attention"], prefix + ".enc_dec_attention", out)
    inv_lin(p["ffn"]["Dense_0"], prefix + ".ffn.linear1", out)
    inv_lin(p["ffn"]["Dense_1"], prefix + ".ffn.linear2", out)
    inv_ln(p["LayerNorm_0"], prefix + ".norm", out)


def inv_attflat(p, prefix: str, out: dict):
    q = prefix + "." if prefix else ""
    inv_lin(p["Dense_0"], q + "mlp.fc.linear", out)
    inv_lin(p["Dense_1"], q + "mlp.linear", out)
    inv_lin(p["linear_merge"], q + "linear_merge", out)


def inv_refnorm(p, name: str, out: dict):
    """annotated-transformer LayerNorm (a_2/b_2 naming)."""
    out[name + ".a_2"] = _f32(p["scale"])
    out[name + ".b_2"] = _f32(p["bias"])


def sinusoid_pe(d_model: int, max_len: int = 5000) -> np.ndarray:
    """The PositionalEncoding buffer torch serializes
    (transformer_captioner.py:151-163), recomputed: (1, max_len,
    d_model) float32 sin/cos table."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32)
        * np.float32(-(np.log(10000.0) / d_model))
    ).astype(np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe[None]


def export_caption_state_dict(params, prefix: str = "model.",
                              out: dict | None = None) -> dict:
    """CaptionDecoder tree -> TransformerDecoderModel keys. prefix:
    "model." standalone, "caption.model."/"mlm.model." inside JointNet.

    The dead early_guide branch (src_attn + sublayer.1, serialized but
    unused — transformer_captioner.py:251-254) exports as zero attention
    + identity norm: functionally inert either way.
    """
    sd = out if out is not None else {}
    p = prefix
    emb_w = _f32(params["embed"]["embedding"])
    d_model = emb_w.shape[1]
    sd[p + "tgt_embed.0.lut.weight"] = emb_w
    sd[p + "tgt_embed.1.pe"] = sinusoid_pe(d_model)
    inv_refnorm(params["final_ln"], p + "decoder.norm", sd)
    inv_lin(params["generator"], p + "generator.proj", sd)
    zero_w = np.zeros((d_model, d_model), dtype=np.float32)
    zero_b = np.zeros((d_model,), dtype=np.float32)
    i = 0
    while f"layer_{i}" in params:
        lp, q = params[f"layer_{i}"], f"{p}decoder.layers.{i}"
        inv_refnorm(lp["ln_attn"], f"{q}.sublayer.0.norm", sd)
        inv_refnorm(lp["ln_ffn"], f"{q}.sublayer.2.norm", sd)
        for j, k in enumerate(("q", "k", "v", "o")):
            inv_lin(lp["self_attn"][k], f"{q}.self_attn.linears.{j}", sd)
        inv_lin(lp["ffn1"], f"{q}.feed_forward.w_1", sd)
        inv_lin(lp["ffn2"], f"{q}.feed_forward.w_2", sd)
        # dead branch: zero src-attn + identity norm (see module doc)
        for j in range(4):
            sd[f"{q}.src_attn.linears.{j}.weight"] = zero_w.copy()
            sd[f"{q}.src_attn.linears.{j}.bias"] = zero_b.copy()
        sd[f"{q}.sublayer.1.norm.a_2"] = np.ones(
            (d_model,), dtype=np.float32)
        sd[f"{q}.sublayer.1.norm.b_2"] = zero_b.copy()
        i += 1
    return sd


def export_jointnet_state_dict(params, batch_stats, *,
                               dp_prefix: bool = False) -> dict:
    """Full vlp3d JointNet (params, batch_stats) -> reference state dict.

    Optional submodules export when present in the tree (mirrors
    import_jointnet_state_dict's key gating), so any flag combination
    round-trips. dp_prefix=True prepends 'module.' to every key (the
    layout nn.DataParallel checkpoints carry —
    scripts/joint_scripts/train_3dvlp.py saves the wrapped model).
    """
    params, stats = dict(params), dict(batch_stats)
    if "backbone_net" not in stats:
        raise ValueError(
            "export requires the BN running stats (batch_stats) — the "
            "reference state dict carries running_mean/var for every "
            "BatchNorm. This snapshot is params-only; re-save it with "
            "batch_stats (Solver snapshots and vlp3d-import-torch "
            "output both include them)."
        )
    sd: dict = {}

    # backbone
    bp, bs = params["backbone_net"], stats["backbone_net"]
    for sa in ("sa1", "sa2", "sa3", "sa4"):
        export_sa(bp[sa], bs[sa], f"backbone_net.{sa}", sd)
    for fp in ("fp1", "fp2"):
        export_point_mlp(bp[fp]["PointMLP_0"], bs[fp]["PointMLP_0"],
                         f"backbone_net.{fp}.mlp", range(2), sd)

    # voting
    vp, vs = params["vgen"], stats["vgen"]
    for i, (conv, bnn) in enumerate((("conv1", "bn1"), ("conv2", "bn2"))):
        inv_dense(vp[f"Dense_{i}"], f"vgen.{conv}", sd)
        inv_bn(vp[f"BatchNorm_{i}"], vs[f"BatchNorm_{i}"], f"vgen.{bnn}", sd)
    inv_dense(vp["Dense_2"], "vgen.conv3", sd)

    # proposal
    pp, ps = params["proposal"], stats["proposal"]
    if "Dense_0" in pp:
        inv_dense(pp["Dense_0"], "proposal.votes_weight_predictor.0", sd)
        inv_bn(pp["BatchNorm_0"], ps["BatchNorm_0"],
               "proposal.votes_weight_predictor.1", sd)
        inv_prelu(pp["PReLU_0"], "proposal.votes_weight_predictor.2", sd,
                  scalar=True)
        inv_dense(pp["Dense_1"], "proposal.votes_weight_predictor.3", sd)
    export_sa(pp["vote_aggregation"], ps["vote_aggregation"],
              "proposal.vote_aggregation", sd)
    rp, rs = pp["roi_heads"], ps["roi_heads"]
    inv_dense(rp["Dense_0"], "proposal.proposal.convs.0", sd)
    inv_bn(rp["BatchNorm_0"], rs["BatchNorm_0"],
           "proposal.proposal.convs.1", sd)
    inv_dense(rp["Dense_1"], "proposal.proposal.convs.3", sd)
    inv_bn(rp["BatchNorm_1"], rs["BatchNorm_1"],
           "proposal.proposal.convs.4", sd)
    inv_dense(rp["Dense_2"], "proposal.proposal.objectness_predictor", sd)
    inv_dense(rp["Dense_3"], "proposal.proposal.box_predictor", sd)
    inv_dense(rp["Dense_4"], "proposal.proposal.heading_cls_predictor", sd)
    inv_dense(rp["Dense_5"], "proposal.proposal.heading_reg_predictor", sd)
    inv_dense(rp["Dense_6"], "proposal.proposal.sem_cls_predictor", sd)
    if "Dense_7" in rp:
        inv_dense(rp["Dense_7"], "proposal.proposal.alpha_predictor", sd)

    # relation
    rp, rs = params["relation"], stats["relation"]
    inv_dense(rp["Dense_0"], "relation.features_concat.0", sd)
    inv_bn(rp["BatchNorm_0"], rs["BatchNorm_0"],
           "relation.features_concat.1", sd)
    inv_prelu(rp["PReLU_0"], "relation.features_concat.2", sd,
              scalar=False)  # nn.PReLU(hidden_size), relation_module.py:23
    inv_dense(rp["Dense_1"], "relation.features_concat.3", sd)
    for i in range(2):
        for j, idx in enumerate((0, 3, 6)):
            inv_lin(rp[f"attn_fc{i}_{j}"], f"relation.self_attn_fc.{i}.{idx}",
                    sd)
        for j, idx in enumerate((2, 5)):
            inv_ln(rp[f"attn_ln{i}_{j}"], f"relation.self_attn_fc.{i}.{idx}",
                   sd)
        inv_mha(rp[f"self_attn_{i}"], f"relation.self_attn.{i}", sd)
        inv_lin(rp[f"obj_embedding_{i}"], f"relation.obj_embedding.{i}", sd)
        inv_lin(rp[f"bbox_embedding_{i}"], f"relation.bbox_embedding.{i}", sd)

    # language branch
    if "lang" in params:
        lp = params["lang"]
        export_xbert_text(lp["text_encoder"], sd,
                          prefix="lang.text_encoder.bert.")
        inv_lin(lp["proj"], "lang.proj", sd)
        if "lang_cls" in lp:
            inv_lin(lp["lang_cls"], "lang.lang_cls.0", sd)

    # match
    if "match" in params:
        mp = params["match"]
        ms = stats.get("match", {})
        for i, idx in enumerate((0, 3, 6)):
            inv_lin(mp[f"Dense_{i}"], f"match.match.{idx}", sd)
        if "Dense_3" in mp:
            inv_dense(mp["Dense_3"], "match.lang_emb_proj.0", sd)
            inv_bn(mp["BatchNorm_0"], ms["BatchNorm_0"],
                   "match.lang_emb_proj.1", sd)
            inv_prelu(mp["prelu0"], "match.lang_emb_proj.2", sd, scalar=True)
            inv_dense(mp["Dense_4"], "match.lang_emb_proj.3", sd)
            inv_bn(mp["BatchNorm_1"], ms["BatchNorm_1"],
                   "match.lang_emb_proj.4", sd)
            inv_prelu(mp["prelu1"], "match.lang_emb_proj.5", sd, scalar=True)
            inv_dense(mp["Dense_5"], "match.lang_emb_proj.6", sd)
        if "Dense_6" in mp:
            inv_lin(mp["Dense_6"], "match.reg_head.0", sd)
            inv_bn(mp["BatchNorm_2"], ms["BatchNorm_2"],
                   "match.reg_head.1", sd)
            inv_lin(mp["Dense_7"], "match.reg_head.3", sd)
            inv_bn(mp["BatchNorm_3"], ms["BatchNorm_3"],
                   "match.reg_head.4", sd)
            inv_lin(mp["Dense_8"], "match.reg_head.6", sd)
        for i in range(2):
            inv_cadl(mp[f"grounding_cross_attn_{i}"],
                     f"match.grounding_cross_attn.{i}", sd)
        if "lang_emb_cross_attn" in mp:
            inv_mha(mp["lang_emb_cross_attn"], "match.lang_emb_cross_attn",
                    sd)

    # contrast (OCC/OSC; linears are bias-free — constrast_module.py:43-50)
    if "constrast" in params:
        cp = params["constrast"]
        sd["constrast.pc_proj.weight"] = _f32(cp["pc_proj"]["kernel"]).T.copy()
        sd["constrast.text_proj.weight"] = (
            _f32(cp["text_proj"]["kernel"]).T.copy())
        sd["constrast.pc_proj_iou.0.weight"] = (
            _f32(cp["pc_proj_iou"]["kernel"]).T.copy())
        sd["constrast.nce_loss.tau"] = _f32(cp["tau"])

    # caption / MLM decoders
    if "caption" in params:
        export_caption_state_dict(params["caption"], prefix="caption.model.",
                                  out=sd)
    if "mlm" in params:
        export_caption_state_dict(params["mlm"], prefix="mlm.model.", out=sd)

    # answer head
    if "answer" in params:
        ap = params["answer"]
        inv_attflat(ap["attflat_visual"], "answer.attflat_visual", sd)
        inv_lin(ap["Dense_0"], "answer.answer_cls.0", sd)
        inv_lin(ap["Dense_1"], "answer.answer_cls.3", sd)

    if dp_prefix:
        sd = {"module." + k: v for k, v in sd.items()}
    return sd
